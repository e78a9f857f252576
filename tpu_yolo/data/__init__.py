from tpu_yolo.data.image import load_image, letterbox
from tpu_yolo.data.labels import load_labels
from tpu_yolo.data.dataset import DetectionDataset, collate
from tpu_yolo.data.loader import DataLoader
