from tpu_yolo.models.yolov11 import (
    init_params,
    forward,
    forward_raw,
    decode_predictions,
    fold_batchnorm,
)
