"""Host-side training orchestration: epochs, schedule, logging, ckpts.

Counterpart of reference main.py:22-221 (train()). The per-step device
work is one jitted SPMD program (train/step.py); this module does only
what must stay on host: the data pipeline, LR lookup, CSV logging,
per-epoch eval, checkpoint save/resume and the mosaic cutoff.

Parity contract kept from the reference:
  * accumulate = max(round(64 / global_batch), 1) (main.py:44);
  * weight_decay *= global_batch * accumulate / 64 (main.py:45);
  * LinearLR over micro-steps with >=100-step / 3-epoch warmup
    (util.py:581-596);
  * mosaic disabled when 10 epochs remain (main.py:109-110);
  * per-epoch eval of the EMA params -> step.csv rows
    {epoch, box, cls, dfl, Recall, Precision, mAP@50, mAP}
    (main.py:98-103, 192-200);
  * best/last checkpoints + strip at the end (main.py:207-221).
"""
from __future__ import annotations

import csv
import os

import jax.numpy as jnp
import numpy as np

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.data.dataset import DetectionDataset
from tpu_yolo.data.loader import DataLoader, ShardSampler
from tpu_yolo.eval.evaluator import evaluate
from tpu_yolo.io import checkpoint as ckpt_io
from tpu_yolo.models import yolov11
from tpu_yolo.parallel import DataParallel
from tpu_yolo.train import optim
from tpu_yolo.train.loss import build_padded_targets
from tpu_yolo.train.step import init_train_state, train_step

_GT_BUCKETS = (32, 64, 128, 256, 512)


def _gt_bucket(n: int) -> int:
    for b in _GT_BUCKETS:
        if n <= b:
            return b
    return _GT_BUCKETS[-1]


class AverageMeter:
    """Running mean (reference util.py:630-640)."""

    def __init__(self):
        self.num = 0.0
        self.sum = 0.0
        self.avg = 0.0

    def update(self, v, n):
        v = float(v)
        if not np.isnan(v):
            self.num += n
            self.sum += v * n
            self.avg = self.sum / self.num


def _save_train_ckpt(path: str, state, epoch: int, best: float,
                     meta: dict | None = None):
    """Serialize the full training state (the last.ckpt payload shape)."""
    import jax

    from tpu_yolo.io import checkpoint as ckpt_io

    payload = {"epoch": epoch + 1, "best": best, "meta": meta or {},
               **{k: jax.device_get(state[k]) for k in
                  ("params", "opt", "step", "ema_updates", "ema_params")}}
    ckpt_io.save_checkpoint(path, payload)


def train(args, hyp: dict, cfg: ModelConfig, dp: DataParallel | None = None):
    """Full training run. `args` needs: data_dir, input_size, batch_size
    (global), epochs, save_dir, resume (path|None), weights (path|None),
    val_batch_size, eval_every (int), max_gt."""
    os.makedirs(args.save_dir, exist_ok=True)
    import jax

    # --- model + state ------------------------------------------------
    params = yolov11.init_params(jax.random.PRNGKey(0), cfg)
    start_epoch, best = 0, 0.0

    global_bs = args.batch_size
    accumulate = max(round(64 / global_bs), 1)
    wd = hyp["weight_decay"] * global_bs * accumulate / 64

    state = None
    if args.resume:
        payload = ckpt_io.load_checkpoint(args.resume)
        if "opt" in payload:  # full training state
            state = {k: payload[k] for k in
                     ("params", "opt", "step", "ema_updates", "ema_params")}
            state = jax.tree_util.tree_map(jnp.asarray, state)
            start_epoch = int(payload.get("epoch", 0))
            best = float(payload.get("best", 0.0))
            print(f"resumed from {args.resume} at epoch {start_epoch}")
        else:  # stripped (inference-only) checkpoint: params only, fresh
               # optimizer/EMA — fine-tune semantics, so epoch/best reset
               # too (a stripped ckpt keeps the old run's epoch=600, which
               # would otherwise make range(start, epochs) empty)
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.float32), payload["params"])
            print(f"fine-tuning from stripped checkpoint {args.resume} "
                  "(fresh optimizer/EMA, epoch 0)")
    elif args.weights:
        from tpu_yolo.io.weights import load_checkpoint_params
        params = load_checkpoint_params(args.weights, params)

    if state is None:
        state = init_train_state(params, ema=True, accumulate=accumulate)
    if dp is not None:
        state = dp.replicate(state)

    # --- data ----------------------------------------------------------
    with open(os.path.join(args.data_dir, "train2017.txt")) as f:
        filenames = [
            os.path.join(args.data_dir, "images", "train2017",
                         os.path.basename(line.strip()))
            for line in f if line.strip()]

    dataset = DetectionDataset(
        filenames, args.input_size, hyp, augment=True,
        cache_path=os.path.join(args.data_dir, "train2017.cache.npy"))

    n_hosts = jax.process_count()
    fixed_bucket = int(getattr(args, "gt_bucket", 0) or 0)
    warned_gt_overflow = False
    sampler = None
    if n_hosts > 1:
        sampler = ShardSampler(len(dataset), n_hosts, jax.process_index())
    loader = DataLoader(dataset, global_bs // n_hosts, shuffle=sampler is None,
                        num_workers=args.workers, drop_last=True,
                        sampler=sampler)

    # Device-augment path: raw staged sources + transform params on
    # host, all pixel work (mosaic/affine/HSV/flips) in one jitted
    # program (ops/augment_device.py). The final-10-epoch mosaic cutoff
    # (reference main.py:109-110) switches the loader to its plain
    # (letterbox+affine) program, still on device.
    dev_loader = None
    if getattr(args, "device_augment", False):
        from tpu_yolo.data.device_augment import DeviceAugmentLoader
        dev_loader = DeviceAugmentLoader(
            filenames, args.input_size, hyp, global_bs // n_hosts,
            cache_path=os.path.join(args.data_dir, "train2017.cache.npy"),
            threads=args.workers, seed=getattr(args, "seed", 0),
            num_shards=n_hosts, shard=jax.process_index())

    # --native-train: decode + prescale through the C++ pool, augment
    # on host (data/native_train.py) — the train-side analogue of
    # --native-eval. Yields the DataLoader batch contract, so it slots
    # in as `loader`; mutually exclusive with --device-augment (which
    # already stages through the native pipeline).
    native_train = getattr(args, "native_train", "off")
    if native_train not in ("auto", "on", "off"):
        raise ValueError(f"--native-train must be auto|on|off, "
                         f"got {native_train!r}")
    if native_train != "off" and dev_loader is None:
        from tpu_yolo.data import native_loader as _nl
        if _nl.available():
            from tpu_yolo.data.native_train import NativeTrainLoader
            loader = NativeTrainLoader(
                filenames, args.input_size, hyp, global_bs // n_hosts,
                cache_path=os.path.join(args.data_dir,
                                        "train2017.cache.npy"),
                threads=args.workers, seed=getattr(args, "seed", 0),
                num_shards=n_hosts, shard=jax.process_index())
        elif native_train == "on":
            raise RuntimeError(
                "--native-train on requires native/libtpuyolo_data.so; "
                "run `make -C native`")

    # the ACTIVE loader drives the LR schedule / step accounting — with
    # --device-augment its length can differ from the host DataLoader
    # (label filtering, shard//batch floor arithmetic)
    num_steps = len(dev_loader if dev_loader is not None else loader)
    schedule = optim.linear_lr(args.epochs, num_steps, hyp)
    optim.plot_lr(schedule, os.path.join(args.save_dir, "lr.png"))

    hyp_gains = jnp.asarray([hyp["box"], hyp["cls"], hyp["dfl"]], jnp.float32)
    is_rank0 = jax.process_index() == 0

    log_path = os.path.join(args.save_dir, "step.csv")
    log = open(log_path, "w", newline="") if is_rank0 else None
    logger = None
    if log:
        logger = csv.DictWriter(log, fieldnames=[
            "epoch", "box", "cls", "dfl", "Recall", "Precision", "mAP@50", "mAP"])
        logger.writeheader()

    # Optional TensorBoard (reference has CSV only, SURVEY.md §5; the CSV
    # contract above is kept either way).
    tb = None
    if is_rank0 and getattr(args, "tensorboard", False):
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb = SummaryWriter(os.path.join(args.save_dir, "tb"))
        except Exception as e:  # keep training if TB is unavailable
            print(f"tensorboard disabled: {e}")

    def put(batch):
        return dp.shard_batch(batch) if dp is not None else batch

    try:
        for epoch in range(start_epoch, args.epochs):
            # mosaic off once 10 epochs remain (reference main.py:
            # 109-110); `<=` rather than the reference's `==` so a
            # resume that lands past the crossing still disables it.
            # Runs shorter than 10 epochs never cross, keeping mosaic.
            mosaic_on = args.epochs - epoch > 10 or args.epochs < 10
            dataset.mosaic = mosaic_on
            active = loader if dev_loader is None else dev_loader
            if hasattr(active, "mosaic"):  # DeviceAugment/NativeTrain
                active.mosaic = mosaic_on and hyp.get("mosaic", 1.0) > 0
            active.set_epoch(epoch)

            # The reference zeroes gradients at every EPOCH START
            # (main.py:119 optimizer.zero_grad() inside the epoch loop),
            # which discards any accumulated-but-unapplied tail grads
            # when num_steps % accumulate != 0 — a behavioral quirk the
            # long-horizon trajectory golden pins
            # (tests/test_train_trajectory.py). Match it exactly.
            if accumulate > 1:
                state["opt"]["accum"] = jax.tree_util.tree_map(
                    jnp.zeros_like, state["opt"]["accum"])

            meters = {k: AverageMeter() for k in ("box", "cls", "dfl")}
            epoch_gt_truncated = 0  # --gt-bucket label loss this epoch
            it = active
            if is_rank0:
                import tqdm
                it = tqdm.tqdm(active, total=num_steps,
                               desc=f"epoch {epoch + 1}/{args.epochs}")

            for i, batch in enumerate(it):
                if active is dev_loader:
                    from tpu_yolo.ops import augment_device as AD

                    # shard staging + params over the data axis FIRST so
                    # the augment program runs SPMD next to the train
                    # step instead of serializing on one chip
                    sput = lambda x: put(jnp.asarray(x))
                    # general-affine (rotation/shear) batches carry the
                    # "minv" param format and run the gather programs
                    if len(batch) == 3:        # mosaic / mixup mode
                        staged, aug_params, targets = batch
                        mix = staged.ndim == 6
                        gen = "minv" in (aug_params.get("a", aug_params))
                        prog = (
                            (AD.mixup_augment_batch_general if gen
                             else AD.mixup_augment_batch) if mix else
                            (AD.augment_batch_general if gen
                             else AD.augment_batch))
                        images = prog(
                            sput(staged),
                            jax.tree_util.tree_map(sput, aug_params),
                            out_size=args.input_size)
                    else:                      # plain (mosaic cutoff)
                        staged, hw, aug_params, targets = batch
                        prog = (AD.plain_augment_batch_general
                                if "minv" in aug_params
                                else AD.plain_augment_batch)
                        images = prog(
                            sput(staged), sput(hw),
                            jax.tree_util.tree_map(sput, aug_params),
                            out_size=args.input_size)
                    # `images` is already a (possibly global, multi-host)
                    # sharded device array — it must NOT round-trip
                    # through put()/shard_batch (np.asarray on a
                    # non-addressable global array raises); targets are
                    # per-host and pad to the PER-HOST batch below.
                    local_bs = staged.shape[0]
                    images_dev = images
                else:
                    images, targets = batch
                    local_bs = images.shape[0]
                    images_dev = put(images)
                step = i + num_steps * epoch
                lr = float(schedule[min(step, len(schedule) - 1)])
                apply_update = (step % accumulate) == 0

                max_n = int(np.max(np.bincount(
                    np.asarray(targets["idx"], np.int64),
                    minlength=local_bs))) if len(targets["idx"]) else 1
                if fixed_bucket:
                    # --gt-bucket: fixed pad shape; no cross-host shape
                    # agreement needed (the adaptive path's per-step
                    # allgather is a DCN sync point on real multi-host).
                    # Must stay truly fixed — a conditional escalation
                    # would need a conditional collective (deadlock when
                    # hosts disagree); overflow rows are truncated by
                    # build_padded_targets. Truncated boxes are counted
                    # host-side per epoch (no collective, shape fixed)
                    # so sustained label loss is visible in the epoch
                    # summary, not just a once-per-run warning.
                    bucket = fixed_bucket
                    if max_n > fixed_bucket:
                        counts = np.bincount(
                            np.asarray(targets["idx"], np.int64),
                            minlength=local_bs)
                        epoch_gt_truncated += int(
                            np.maximum(counts - fixed_bucket, 0).sum())
                        if not warned_gt_overflow:
                            warned_gt_overflow = True
                            print(f"[train] warning: image with {max_n} "
                                  f"GT boxes truncated to --gt-bucket="
                                  f"{fixed_bucket}")
                else:
                    bucket = _gt_bucket(max(max_n, 1))
                    if n_hosts > 1:
                        # Hosts must agree on the padded GT shape before
                        # the per-host slices become one global array.
                        from jax.experimental import multihost_utils
                        bucket = int(np.max(
                            multihost_utils.process_allgather(
                                np.int32(bucket))))
                gt = build_padded_targets(
                    targets, local_bs, bucket,
                    (args.input_size, args.input_size))

                remat = getattr(args, "remat", False) and getattr(
                    args, "remat_level", "stage")
                state, metrics = train_step(
                    state, images_dev, put(gt), lr, hyp_gains, wd,
                    hyp["momentum"], cfg=cfg, accumulate=accumulate,
                    apply_update=apply_update, remat=remat)

                bs = local_bs
                for k, v in (("box", metrics["loss_box"]),
                             ("cls", metrics["loss_cls"]),
                             ("dfl", metrics["loss_dfl"])):
                    v = float(v)
                    if not np.isfinite(v):
                        # Divergence guard (beyond the reference, which
                        # trains on silently): save the blown state for
                        # post-mortem and stop with a pointer to the
                        # last good checkpoint. Rank 0 writes (the loss
                        # is replicated; concurrent writers would race
                        # on the shared save_dir).
                        crash = os.path.join(args.save_dir, "crash.ckpt")
                        if is_rank0:
                            _save_train_ckpt(
                                crash, state, epoch, best,
                                meta={"size": args.model_size,
                                      "num_classes": cfg.num_classes})
                        raise FloatingPointError(
                            f"loss_{k} is {v} at epoch {epoch + 1} step "
                            f"{i} (lr={lr:.2e}); diverged state saved to "
                            f"{crash}; resume from "
                            f"{os.path.join(args.save_dir, 'last.ckpt')}")
                    meters[k].update(v, bs)
                if is_rank0 and hasattr(it, "set_postfix"):
                    it.set_postfix(box=f"{meters['box'].avg:.3f}",
                                   cls=f"{meters['cls'].avg:.3f}",
                                   dfl=f"{meters['dfl'].avg:.3f}")

            if epoch_gt_truncated:
                # Persistent --gt-bucket overflow must stay visible (a
                # too-small bucket silently degrades training labels);
                # per-host count, printed by every host that loses boxes.
                print(f"[train] epoch {epoch + 1}: {epoch_gt_truncated} "
                      f"GT boxes truncated by --gt-bucket={fixed_bucket} "
                      f"on this host (raise the bucket if persistent)")

            # --- per-epoch eval + checkpoint (rank 0; main.py:188-216) --
            if is_rank0:
                eval_params = yolov11.fold_batchnorm(
                    jax.device_get(state["ema_params"]))
                m_ap, m_ap50, recall, precision = _run_eval(
                    args, hyp, cfg, eval_params)
                if logger:
                    logger.writerow({
                        "epoch": str(epoch + 1).zfill(3),
                        "box": f"{meters['box'].avg:.3f}",
                        "cls": f"{meters['cls'].avg:.3f}",
                        "dfl": f"{meters['dfl'].avg:.3f}",
                        "mAP": f"{m_ap:.3f}", "mAP@50": f"{m_ap50:.3f}",
                        "Recall": f"{recall:.3f}", "Precision": f"{precision:.3f}"})
                    log.flush()

                if tb is not None:
                    for k, v in (("loss/box", meters["box"].avg),
                                 ("loss/cls", meters["cls"].avg),
                                 ("loss/dfl", meters["dfl"].avg),
                                 ("val/mAP", m_ap), ("val/mAP50", m_ap50),
                                 ("val/recall", recall),
                                 ("val/precision", precision)):
                        tb.add_scalar(k, v, epoch + 1)
                    tb.flush()

                best = max(best, m_ap)
                meta = {"size": args.model_size,
                        "num_classes": cfg.num_classes}
                _save_train_ckpt(os.path.join(args.save_dir, "last.ckpt"),
                                 state, epoch, best, meta=meta)
                if best == m_ap:
                    _save_train_ckpt(
                        os.path.join(args.save_dir, "best.ckpt"),
                        state, epoch, best, meta=meta)
    finally:
        if log:
            log.close()
        if tb is not None:
            tb.close()

    if is_rank0:
        for name in ("best.ckpt", "last.ckpt"):
            p = os.path.join(args.save_dir, name)
            if os.path.exists(p):
                ckpt_io.strip_checkpoint(p)  # reference main.py:219-221


def _run_eval(args, hyp, cfg, folded_params):
    """Build the val loader and run evaluate() (reference test(), main.py:224)."""
    val_txt = os.path.join(args.data_dir, "val2017.txt")
    if not os.path.exists(val_txt):
        return 0.0, 0.0, 0.0, 0.0
    with open(val_txt) as f:
        filenames = [
            os.path.join(args.data_dir, "images", "val2017",
                         os.path.basename(line.strip()))
            for line in f if line.strip()]
    dataset = DetectionDataset(
        filenames, args.input_size, hyp, augment=False,
        cache_path=os.path.join(args.data_dir, "val2017.cache.npy"))
    from tpu_yolo.data.loader import make_val_loader
    loader = make_val_loader(dataset, args.val_batch_size,
                             num_workers=args.workers,
                             native=getattr(args, "native_eval", "auto"))
    return evaluate(folded_params, loader, cfg, args.input_size,
                    progress=True,
                    max_nms=getattr(args, "max_nms", 2048))
