#!/usr/bin/env python
"""Multi-host SPMD rehearsal worker: N coordinated CPU processes.

Executes the trainer's real multi-host code paths with
jax.process_count() > 1 — jax.distributed.initialize, the
make_array_from_process_local_data batch assembly (parallel/mesh.py
shard_batch), the per-step GT-bucket process_allgather agreement
(train/trainer.py), and a sharded eval forward — on virtual CPU
devices, so the multi-host branches are exercised without a multi-host
slice (VERDICT round-2 item 2; reference launcher contract main.sh,
main.py:338-344).

Run one process per host:
  python tools/multihost_rehearsal.py --coordinator localhost:PORT \
      --num-processes 2 --process-id I [--steps 3]
With --num-processes 1 it computes the single-process reference on the
same global batch (the oracle the test compares against). Prints one
JSON line: {"process_id", "losses" [[box, cls, dfl]...], "eval_counts",
and with --eval-ap also "map"/"map50"}.

Further rehearsal modes (VERDICT r3 item 4):
  --local-devices N  virtual CPU devices per process. The SPMD compile
                     cache key depends only on the GLOBAL topology, so
                     an oracle run at `--num-processes 1
                     --local-devices 8` populates the persistent cache
                     with the very executables a following 2x4 (or 4x2)
                     multi-process run needs — the ranks then compile
                     warm and reach their first collective together.
                     That is the root fix for the Gloo 30 s
                     connect-window flake the test suite used to retry
                     around (cold-compile rank skew on a 1-core host).
  --ckpt PATH        after the last step, process 0 saves the full
                     training state (the trainer last.ckpt payload);
                     all ranks barrier on it.
  --resume-from PATH all ranks load the state instead of init (the
                     save -> kill -> resume cycle; pair with
                     --start-step so the data stream continues).
  --eval-ap          full AP-producing distributed eval: sharded
                     forward, per-host detection rows allgathered, the
                     SAME host-side matching + 101-pt AP as
                     eval/evaluator.py on every rank (reference
                     distributed eval contract: main.py:224-304 under
                     torchrun).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_global_batch(step: int, global_bs: int, size: int, nc: int):
    """Deterministic synthetic global batch — every process draws the
    SAME global arrays and slices its host rows (idx stays host-local,
    the collate() contract)."""
    import numpy as np

    rng = np.random.default_rng(1234 + step)
    images = rng.integers(0, 256, (global_bs, size, size, 3), np.uint8)
    cls, box, idx = [], [], []
    for b in range(global_bs):
        n = int(rng.integers(1, 6))
        x1 = rng.uniform(0, size * 0.7, (n, 2))
        wh = rng.uniform(4, size * 0.3, (n, 2))
        xyxy = np.concatenate([x1, np.minimum(x1 + wh, size - 1)], 1)
        c = rng.integers(0, nc, (n, 1)).astype(np.float32)
        # normalized cxcywh, the dataset contract build_padded_targets
        # expects
        cx = (xyxy[:, 0:1] + xyxy[:, 2:3]) / 2 / size
        cy = (xyxy[:, 1:2] + xyxy[:, 3:4]) / 2 / size
        w = (xyxy[:, 2:3] - xyxy[:, 0:1]) / size
        h = (xyxy[:, 3:4] - xyxy[:, 1:2]) / size
        cls.append(c)
        box.append(np.concatenate([cx, cy, w, h], 1).astype(np.float32))
        idx.append(np.full(n, b, np.float32))
    targets = {"cls": np.concatenate(cls), "box": np.concatenate(box),
               "idx": np.concatenate(idx)}
    return images, targets


def slice_host(images, targets, pid: int, host_bs: int):
    """This host's rows, with idx re-based to host-local image numbers."""
    import numpy as np

    lo, hi = pid * host_bs, (pid + 1) * host_bs
    rows = (targets["idx"] >= lo) & (targets["idx"] < hi)
    local = {"cls": targets["cls"][rows], "box": targets["box"][rows],
             "idx": targets["idx"][rows] - lo}
    return np.ascontiguousarray(images[lo:hi]), local


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="localhost:9911")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--global-batch", type=int, default=8)
    ap.add_argument("--gt-bucket", type=int, default=0,
                    help="fixed GT pad bucket (trainer --gt-bucket): "
                         "skip the per-step allgather agreement")
    ap.add_argument("--local-devices", type=int, default=4,
                    help="virtual CPU devices per process (4x2 and 2x4 "
                         "topologies must agree with the oracle)")
    ap.add_argument("--start-step", type=int, default=0,
                    help="first synthetic-data step index (resume runs "
                         "continue the oracle's data stream)")
    ap.add_argument("--ckpt", default="",
                    help="save full train state here after the last step")
    ap.add_argument("--resume-from", default="",
                    help="load train state from this checkpoint")
    ap.add_argument("--eval-ap", action="store_true",
                    help="run the AP-producing distributed eval section")
    args = ap.parse_args()

    # Each process needs its OWN local device set; this must be in the
    # env before the backend initializes (the test parent's conftest
    # exports 8).
    n_devices = args.num_processes * args.local_devices
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               f"{args.local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
        assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == n_devices

    import jax.numpy as jnp
    import numpy as np

    from tpu_yolo.core.config import ModelConfig
    from tpu_yolo.eval.evaluator import predict_step
    from tpu_yolo.models import yolov11
    from tpu_yolo.parallel import DataParallel, make_mesh
    from tpu_yolo.train.loss import build_padded_targets
    from tpu_yolo.train.step import init_train_state, train_step

    cfg = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                      csp=(False, True), num_classes=8)
    if args.resume_from:
        # the save -> kill -> resume cycle: every rank loads the same
        # host-numpy payload (trainer.py resume flow, _save_train_ckpt
        # shape) and re-replicates it over its own mesh
        from tpu_yolo.io import checkpoint as ckpt_io
        payload = ckpt_io.load_checkpoint(args.resume_from)
        state = {k: jax.tree_util.tree_map(jnp.asarray, payload[k])
                 for k in ("params", "opt", "step", "ema_updates",
                           "ema_params")}
    else:
        params = yolov11.init_params(jax.random.PRNGKey(0), cfg)
        state = init_train_state(params, ema=True, accumulate=1)
    dp = DataParallel(make_mesh(n_data=n_devices))
    state = dp.replicate(state)

    host_bs = args.global_batch // args.num_processes
    hyp_gains = np.asarray([7.5, 0.5, 1.5], np.float32)
    from tpu_yolo.train.trainer import _gt_bucket

    def barrier(name: str, timeout_ms: int = 1_800_000):
        """Coordination-service barrier (gRPC to the coordinator — NOT a
        Gloo collective, so it tolerates arbitrary rank skew). Placed
        between each XLA compile and its first execution: on this 1-core
        host two concurrent cold compiles of the train step can end
        minutes apart, and the rank that finishes first would time out
        Gloo's 30 s context-init window waiting for its peer inside the
        first collective. AOT-compile + barrier makes the first
        execution start near-simultaneously on every rank."""
        if args.num_processes > 1:
            from jax._src import distributed
            distributed.global_state.client.wait_at_barrier(
                name, timeout_in_ms=timeout_ms)

    compiled_steps = {}

    def run_step(state, images, gt):
        """train_step via a rank-synchronized AOT executable."""
        key = (images.shape, gt.shape)
        if key not in compiled_steps:
            compiled_steps[key] = train_step.lower(
                state, images, gt, 0.01, hyp_gains, 5e-4, 0.937,
                cfg=cfg, accumulate=1, apply_update=True,
                compute_dtype=jnp.float32).compile()
            barrier(f"train_step-compiled-{len(compiled_steps)}")
        return compiled_steps[key](
            state, images, gt, 0.01, hyp_gains, 5e-4, 0.937)

    losses = []
    for step in range(args.start_step, args.start_step + args.steps):
        images_g, targets_g = make_global_batch(
            step, args.global_batch, args.size, cfg.num_classes)
        images, targets = slice_host(images_g, targets_g,
                                     args.process_id, host_bs)

        # the trainer's bucket flow (train/trainer.py): fixed bucket
        # (--gt-bucket, sync-free) or adaptive + allgather agreement
        if args.gt_bucket:
            bucket = args.gt_bucket
        else:
            max_n = int(np.max(np.bincount(
                np.asarray(targets["idx"], np.int64), minlength=host_bs)))
            bucket = _gt_bucket(max(max_n, 1))
            if args.num_processes > 1:
                from jax.experimental import multihost_utils
                bucket = int(np.max(multihost_utils.process_allgather(
                    np.int32(bucket))))
        gt = build_padded_targets(targets, host_bs, bucket,
                                  (args.size, args.size))

        # f32 compute: this rehearsal checks the multi-host PLUMBING
        # (array assembly, collectives, bucket agreement) against a
        # single-process oracle — bf16 rounding under a different
        # device partitioning would amplify over steps and only blur
        # that signal (measured ~15% rel drift on near-zero box loss
        # by step 3 in bf16; f32 matches to ~1e-6)
        state, metrics = run_step(state, dp.shard_batch(images),
                                  dp.shard_batch(gt))
        losses.append([float(metrics["loss_box"]),
                       float(metrics["loss_cls"]),
                       float(metrics["loss_dfl"])])

    if args.ckpt:
        # every rank holds the replicated state; process 0 serializes
        # it exactly like the trainer (_save_train_ckpt payload), a
        # barrier makes the file durable before any rank exits
        if args.process_id == 0:
            from tpu_yolo.io import checkpoint as ckpt_io
            ckpt_io.save_checkpoint(args.ckpt, {
                "epoch": 0, "best": 0.0, "meta": {},
                **{k: jax.device_get(state[k]) for k in
                   ("params", "opt", "step", "ema_updates",
                    "ema_params")}})
        barrier("ckpt-saved")

    # one sharded eval forward on the trained params (replicated loss
    # already proves the gradient psum; this proves the eval path's
    # batch assembly + global reduction)
    images_g, _ = make_global_batch(999, args.global_batch, args.size,
                                    cfg.num_classes)
    images, _ = slice_host(images_g, {"cls": np.zeros((0, 1), np.float32),
                                      "box": np.zeros((0, 4), np.float32),
                                      "idx": np.zeros(0, np.float32)},
                           args.process_id, host_bs)
    folded = yolov11.fold_batchnorm(jax.tree_util.tree_map(
        np.asarray, jax.device_get(state["ema_params"])))
    folded = dp.replicate(folded)
    images_sharded = dp.shard_batch(images)
    predict_c = predict_step.lower(folded, images_sharded, cfg=cfg,
                                   conf_thres=0.001).compile()
    barrier("predict_step-compiled")
    out = predict_c(folded, images_sharded)
    # each process can only read its ADDRESSABLE shards of the global
    # result; sum locally, then allgather the per-host sums
    local_total = int(sum(int(np.sum(np.asarray(s.data)))
                          for s in out["count"].addressable_shards))
    if args.num_processes > 1:
        from jax.experimental import multihost_utils
        total = int(np.sum(multihost_utils.process_allgather(
            np.int64(local_total))))
    else:
        total = local_total

    result = {"process_id": args.process_id, "losses": losses,
              "eval_counts": total}

    if args.eval_ap:
        # Full AP-producing distributed eval (reference distributed
        # test(): main.py:224-304 under torchrun): sharded forward per
        # val batch, then every rank gathers the per-host detection
        # rows and runs the IDENTICAL host-side TP matching + 101-pt
        # AP the single-host evaluator uses (eval/evaluator.py,
        # eval/metrics.py) — so mAP is a replicated scalar, equal
        # across ranks and equal to the single-process oracle.
        from tpu_yolo.eval.evaluator import IOU_THRESHOLDS, _gt_pixel_boxes
        from tpu_yolo.eval.metrics import (average_precision,
                                           match_predictions)

        def host_rows(garr):
            """This process's rows of a batch-sharded global array,
            in global row order."""
            shards = sorted(garr.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            return np.concatenate([np.asarray(s.data) for s in shards], 0)

        all_tp, all_conf, all_pcls, all_tcls = [], [], [], []
        for vstep in (1001, 1002):
            images_g, targets_g = make_global_batch(
                vstep, args.global_batch, args.size, cfg.num_classes)
            images, _ = slice_host(images_g, targets_g,
                                   args.process_id, host_bs)
            out = predict_c(folded, dp.shard_batch(images))
            local = {k: host_rows(out[k])
                     for k in ("boxes", "scores", "classes", "count")}
            if args.num_processes > 1:
                from jax.experimental import multihost_utils
                out_h = {k: np.concatenate(
                    list(multihost_utils.process_allgather(v)), 0)
                    for k, v in local.items()}
            else:
                out_h = local
            for b in range(args.global_batch):
                cnt = int(out_h["count"][b])
                det = np.zeros((cnt, 6), np.float32)
                det[:, :4] = out_h["boxes"][b][:cnt]
                det[:, 4] = out_h["scores"][b][:cnt]
                det[:, 5] = out_h["classes"][b][:cnt]
                gt = _gt_pixel_boxes(targets_g, b, (args.size, args.size))
                if cnt == 0:
                    if gt.shape[0]:
                        all_tcls.append(gt[:, 0])
                    continue
                all_tp.append(match_predictions(det, gt, IOU_THRESHOLDS))
                all_conf.append(det[:, 4])
                all_pcls.append(det[:, 5])
                all_tcls.append(gt[:, 0])
        if all_tp:
            res = average_precision(
                np.concatenate(all_tp, 0), np.concatenate(all_conf, 0),
                np.concatenate(all_pcls, 0),
                np.concatenate(all_tcls, 0) if all_tcls else np.zeros(0))
            result["map"] = float(res["map"])
            result["map50"] = float(res["map50"])
        else:
            result["map"] = result["map50"] = 0.0

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
