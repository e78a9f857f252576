from tpu_yolo.ops.nn import (
    Context,
    silu,
    identity,
    conv2d,
    conv_bn,
    max_pool,
    upsample2x,
    apply_stat_updates,
)
from tpu_yolo.ops.anchors import make_anchors
from tpu_yolo.ops.boxes import (
    xywh_to_xyxy,
    xyxy_to_xywh,
    box_iou_pairwise,
    ciou,
    dfl_decode,
)
from tpu_yolo.ops.nms import batched_nms
