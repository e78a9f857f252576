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
