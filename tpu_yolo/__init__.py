"""tpu_yolo — a TPU-native (JAX/XLA/Pallas) YOLOv11 detection framework.

A from-scratch rebuild of the capabilities of t0saki/YOLO-Infer-pt
(reference: /root/reference, PyTorch/CUDA) designed TPU-first:

  * model + ops are pure functions over explicit param pytrees (NHWC, bf16
    compute / fp32 params), jit-compiled by XLA;
  * anchors/strides are static functions of the input size (the reference
    derives them from a dummy forward, nets/nn.py:288-290);
  * NMS is a batched fixed-shape on-device kernel (the reference calls
    torchvision.ops.nms per image, utils/util.py:123-169);
  * data parallelism is a jax.sharding.Mesh axis (the reference wraps the
    model in NCCL DistributedDataParallel, main.py:342-344).

Package layout:
  core/     config, dtype policy, mesh/sharding helpers, PRNG plumbing
  ops/      conv/pool/upsample primitives, attention, DFL decode, IoU,
            batched NMS, device letterbox
  models/   the YOLOv11 graph (n/t/s/m/l/x) as pure functions
  data/     host input pipeline (decode, mosaic/mixup/affine/HSV, loader)
  train/    losses + TAL assigner, optimizer/EMA/schedules, sharded step
  eval/     COCO val loop, mAP metrics, curve plots
  io/       checkpoints + torch/Ultralytics .pt weight converter
  parallel/ mesh construction and sharding rules
  cli/      command-line driver (train/test/profile/export)
"""

__version__ = "0.1.0"

from tpu_yolo.core.config import (  # noqa: E402
    COCO_NAMES,
    MODEL_CONFIGS,
    ModelConfig,
    get_model_config,
    load_hyperparams,
)
from tpu_yolo.models.yolov11 import (  # noqa: E402
    decode_predictions,
    fold_batchnorm,
    fold_stem_space_to_depth,
    forward,
    forward_nms,
    forward_raw,
    init_params,
)
from tpu_yolo.ops.nms import batched_nms, nms_from_raw  # noqa: E402
from tpu_yolo.io.weights import (  # noqa: E402
    convert_state_dict,
    export_reference_state_dict,
    export_ultralytics_state_dict,
    load_checkpoint_params,
    load_partial,
    load_torch_state_dict,
    save_torch_checkpoint,
)
from tpu_yolo.io.checkpoint import (  # noqa: E402
    load_checkpoint,
    save_checkpoint,
    strip_checkpoint,
)
from tpu_yolo.parallel import DataParallel, make_mesh  # noqa: E402

__all__ = [
    "COCO_NAMES", "MODEL_CONFIGS", "ModelConfig", "get_model_config",
    "load_hyperparams", "decode_predictions", "fold_batchnorm",
    "fold_stem_space_to_depth", "forward", "forward_nms", "forward_raw",
    "init_params", "batched_nms", "nms_from_raw", "convert_state_dict",
    "export_reference_state_dict", "export_ultralytics_state_dict",
    "save_torch_checkpoint",
    "load_checkpoint_params", "load_partial", "load_torch_state_dict",
    "load_checkpoint", "save_checkpoint", "strip_checkpoint",
    "DataParallel", "make_mesh", "Detector",
]


def __getattr__(name):
    # Lazy: serve/train/eval pull in heavier deps (cv2, native loader);
    # keep the base import light.
    if name == "Detector":
        from tpu_yolo.serve import Detector
        return Detector
    raise AttributeError(f"module 'tpu_yolo' has no attribute {name!r}")
