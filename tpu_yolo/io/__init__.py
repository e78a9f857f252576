from tpu_yolo.io.weights import (
    load_torch_state_dict,
    convert_state_dict,
    load_checkpoint_params,
)
from tpu_yolo.io.checkpoint import save_checkpoint, load_checkpoint, strip_checkpoint
