"""Multi-step training-trajectory parity vs the reference.

Replays tests/golden/train_traj.npz — 4 full reference training steps
(torch forward in train mode -> ComputeLoss -> backward -> nesterov SGD
with set_params groups -> EMA) captured by tools/make_goldens.py — and
asserts our jitted training stack reproduces, in order of strictness:

  1. the step-0 losses and the step-0 parameter GRADIENTS (the exact
     backward check, free of trajectory chaos);
  2. the post-step-0 parameter state (one SGD+EMA update: nesterov
     momentum-buffer init, decay-mask groups, BN running-stat update);
  3. the 4-step loss trajectory and final model/EMA states (compounded
     optimizer dynamics; tolerances reflect f32 drift through the TAL
     assigner's discrete selections, measured 2026-08-17).

This pins, jointly: gradients through the whole architecture, BN
running-stat updates (momentum 0.03, unbiased var), optimizer
decay-mask groups, nesterov momentum, the loss*batch backward scaling,
and the EMA decay ramp — the entire training stack beyond any
single-op golden (reference main.py:95-170, util.py:519-534,
util.py:599-627).
"""
import numpy as np
import pytest

from conftest import load_golden


def _subtree(g, prefix):
    return {k[len(prefix):]: g[k] for k in g.files if k.startswith(prefix)}


def _dequant_subtree(g, tag, base=None):
    """Decode a quantize16 section (tools/make_goldens.py): int16 codes
    under '<tag>q.' times the f32 scale under '<tag>s.', plus the f32
    `base` leaf when the section stores deltas; integer leaves pass
    through raw. Per-leaf error bound max|stored|/65534 — >=45x under
    every tolerance below (quantize16 docstring)."""
    out = {}
    qpre, spre = f"{tag}q.", f"{tag}s."
    for k in g.files:
        if not k.startswith(qpre):
            continue
        leaf = k[len(qpre):]
        v = g[k]
        if v.dtype == np.int16:
            v = v.astype(np.float32) * g[spre + leaf]
            if base is not None:
                v = base[leaf].astype(np.float32) + v
        out[leaf] = v
    return out


def _leaf_diffs(ref_tree, our_tree):
    """[(max_abs_diff, ref_leaf_max_abs, keystr)] over aligned leaves."""
    import jax

    out = []
    for (kp, r), (kp2, o) in zip(
            jax.tree_util.tree_leaves_with_path(ref_tree),
            jax.tree_util.tree_leaves_with_path(our_tree)):
        assert jax.tree_util.keystr(kp) == jax.tree_util.keystr(kp2)
        r = np.array(r, np.float64)
        o = np.array(o, np.float64)
        out.append((float(np.abs(o - r).max()), float(np.abs(r).max()),
                    jax.tree_util.keystr(kp)))
    return out


@pytest.mark.slow
def test_train_trajectory_long_matches_reference():
    """112-step production-schedule trajectory vs the reference
    (tools/make_goldens.py::golden_train_trajectory_long): LinearLR
    warmup->decay transition at step 100, gradient accumulation at the
    production rule (accumulate=16, updates at step % 16 == 0, 7 real
    updates), the reference's epoch-start zero_grad quirk (tail
    accumulated grads discarded, main.py:119 — 14-step epochs make the
    step-16 update see only 3 batches), EMA coupled to update count,
    and wd at the production scaling. This is the drift net the 4-step
    golden cannot provide: a slow bug in wd/EMA/schedule coupling that
    only compounds over tens of steps lands outside these tolerances
    (VERDICT r4 item 3). The mosaic-cutoff epoch boundary is a host
    data toggle with no step-numerics content (inputs are a fixed
    8-batch pool); its control path is pinned by tests/test_e2e.py."""
    import jax
    import jax.numpy as jnp

    from tpu_yolo.core.config import get_model_config
    from tpu_yolo.io.weights import convert_state_dict
    from tpu_yolo.models import yolov11
    from tpu_yolo.train import optim
    from tpu_yolo.train.loss import build_padded_targets
    from tpu_yolo.train.step import init_train_state, train_step

    g = load_golden("train_traj_long.npz")
    g0 = load_golden("train_traj.npz")     # shared torch-seed(0) init
    cfg = get_model_config("n")
    template = yolov11.init_params(jax.random.PRNGKey(0), cfg)
    sd0 = _subtree(g0, "sd0.")
    p0 = convert_state_dict(sd0, template, source_format="reference")
    gains = np.asarray([7.5, 0.5, 1.5], np.float32)
    bs, size = 4, 96
    num_steps, epochs, accumulate = 14, 8, 16
    wd, momentum = 5e-4, 0.937

    # schedule parity: our linear_lr must equal the reference LinearLR
    # arrays element-for-element (util.py:581-592); lrs are the stock
    # hyp x0.1 (the stock max_lr diverges the REFERENCE on this tiny
    # synthetic config — golden_train_trajectory_long docstring)
    hyp = {"max_lr": 0.001, "min_lr": 0.00001, "warmup_epochs": 3.0}
    np.testing.assert_allclose(
        optim.linear_lr(epochs, num_steps, hyp), g["total_lr"],
        rtol=2e-6, atol=0)

    def batch(b):
        img = np.transpose(g[f"pimg_{b}"], (0, 2, 3, 1))
        gt = build_padded_targets(
            {"idx": g[f"pidx_{b}"], "cls": g[f"pcls_{b}"],
             "box": g[f"pbox_{b}"]},
            batch_size=bs, max_gt=32, input_hw=(size, size))
        return jnp.asarray(img), jnp.asarray(gt)

    batches = [batch(b) for b in range(8)]
    ref = np.asarray(g["losses"])

    # f32 drift through the TAL assigner's discrete selections
    # amplifies ~30x per APPLIED UPDATE (measured per-update-window
    # max-rel profile at this fixture's lr, 2026-08-20:
    # 1e-5 -> 3e-5 -> 4.6e-4 -> 1.5e-2 -> 0.23 -> 0.43 -> 0.59 over
    # the 7 windows), so the trajectory is STITCHED: the second half
    # re-anchors on the reference's stored epoch-4 state (model + EMA
    # + momentum; no pending accumulation there by the zero_grad
    # quirk), keeping BOTH halves in the tight-tolerance regime. A
    # systematic wd/EMA/schedule bug cannot hide: it would break the
    # sub-1e-3 windows of either half.
    anchor_epoch = epochs // 2
    sdm_np = _dequant_subtree(g, "sdm", sd0)

    def run_half(state, epoch_lo, epoch_hi):
        losses = []
        for epoch in range(epoch_lo, epoch_hi):
            # the reference's epoch-start zero_grad (trainer.py mirrors)
            state["opt"]["accum"] = jax.tree_util.tree_map(
                jnp.zeros_like, state["opt"]["accum"])
            for i in range(num_steps):
                step = epoch * num_steps + i
                img, gt = batches[step % 8]
                state, m = train_step(
                    state, img, gt, float(g["total_lr"][step]), gains,
                    wd, momentum, cfg=cfg, accumulate=accumulate,
                    apply_update=(step % accumulate == 0),
                    compute_dtype=jnp.float32)
                losses.append([float(m["loss_box"]),
                               float(m["loss_cls"]),
                               float(m["loss_dfl"])])
        return state, np.asarray(losses)

    def check_losses(losses, ref_part, label, early_tol):
        rel = np.abs(losses - ref_part) / np.maximum(np.abs(ref_part),
                                                     1e-6)
        n = len(rel)
        # measured (2026-08-20): first-half early windows stay <4e-4;
        # the second half re-anchors into the PEAK-lr updates (steps
        # 64/80 at ~1e-3) plus the anchor's int16 quantization seed, so
        # its early bound is an order looser (measured 9e-3 max)
        assert rel[:min(32, n)].max() < early_tol, (label, rel[:32].max())
        assert rel.max() < 0.12, (label, rel.max(), rel.argmax())
        assert np.median(rel) < 2e-3, (label, np.median(rel))

    # -- first half: epochs 0..3 from the shared init ------------------
    state = init_train_state(p0, ema=True, accumulate=accumulate)
    state, l1 = run_half(state, 0, anchor_epoch)
    check_losses(l1, ref[:anchor_epoch * num_steps], "first-half",
                 early_tol=2e-3)
    assert int(state["ema_updates"]) == int(g["ema_updates_mid"]) == 4

    def check_state(tag, ours, base, tol):
        # scale-normalized: BN running-var leaves reach |ref| ~3 and
        # drift proportionally with the (bounded) loss chaos
        ref_tree = convert_state_dict(_dequant_subtree(g, tag, base),
                                      template, source_format="reference")
        scaled = [(d / max(s, 1.0), k)
                  for d, s, k in _leaf_diffs(ref_tree, ours)]
        assert max(v for v, _ in scaled) < tol, \
            (tag, max(scaled, key=lambda t: t[0]))

    # our epoch-4 state vs the reference anchor (4 compounded updates)
    check_state("sdm", state["params"], sd0, 2e-2)
    check_state("sme", state["ema_params"], sd0, 2e-2)

    # -- second half: re-anchor EVERYTHING on the reference state ------
    p_mid = convert_state_dict(sdm_np, template,
                               source_format="reference")
    state = init_train_state(p_mid, ema=True, accumulate=accumulate)
    state["ema_params"] = convert_state_dict(
        _dequant_subtree(g, "sme", sd0), template,
        source_format="reference")
    state["opt"]["momentum"] = convert_state_dict(
        _dequant_subtree(g, "smo"), template, source_format="reference")
    state["ema_updates"] = jnp.asarray(int(g["ema_updates_mid"]),
                                       jnp.int32)
    state, l2 = run_half(state, anchor_epoch, epochs)
    check_losses(l2, ref[anchor_epoch * num_steps:], "second-half",
                 early_tol=3e-2)
    assert int(state["ema_updates"]) == int(g["ema_updates"]) == 7

    # final model + EMA states after the stitched second half. The
    # widest channel is BN running-var (quadratic in the drifting
    # activations, 56 compounded per-step stat updates in the half —
    # measured 3.8e-2 normalized); weights/EMA sit far tighter.
    check_state("sdf", state["params"], sdm_np, 6e-2)
    check_state("sde", state["ema_params"], sdm_np, 6e-2)


@pytest.mark.slow
def test_train_trajectory_matches_reference():
    import jax
    import jax.numpy as jnp

    from tpu_yolo.core.config import get_model_config
    from tpu_yolo.io.weights import convert_state_dict
    from tpu_yolo.models import yolov11
    from tpu_yolo.train.loss import build_padded_targets
    from tpu_yolo.train.step import (init_train_state, loss_and_grads,
                                     train_step)

    g = load_golden("train_traj.npz")
    cfg = get_model_config("n")
    template = yolov11.init_params(jax.random.PRNGKey(0), cfg)
    sd0 = _subtree(g, "sd0.")
    p0 = convert_state_dict(sd0, template, source_format="reference")
    gains = np.asarray([7.5, 0.5, 1.5], np.float32)

    def batch(s):
        img = np.transpose(g[f"img_{s}"], (0, 2, 3, 1))  # NCHW -> NHWC
        gt = build_padded_targets(
            {"idx": g[f"idx_{s}"], "cls": g[f"cls_{s}"],
             "box": g[f"box_{s}"]},
            batch_size=2, max_gt=32, input_hw=img.shape[1:3])
        return jnp.asarray(img), jnp.asarray(gt)

    # --- 1. step-0 backward: losses + every parameter gradient --------
    img0, gt0 = batch(0)
    (lb, lc, ld), grads = loss_and_grads(p0, img0, gt0, gains, cfg=cfg)
    np.testing.assert_allclose(
        [float(lb), float(lc), float(ld)], g["losses"][0], rtol=1e-4)

    gref = convert_state_dict(_dequant_subtree(g, "gr"), template,
                              source_format="reference")
    scaled = [(d / max(scale, 1e-6), key)
              for d, scale, key in _leaf_diffs(gref, grads)]
    worst = max(s for s, _ in scaled)
    # measured: <=2.2e-4 on all leaves except three cancellation-prone
    # PSA-attention beta grads (sums of signed upstream grads) at ~1e-2
    assert worst < 2.5e-2, max(scaled)
    assert float(np.median([s for s, _ in scaled])) < 1e-3

    # --- 2.-3. the 4-step trajectory ----------------------------------
    state = init_train_state(p0, ema=True, accumulate=1)
    losses = []
    for s in range(4):
        img, gt = batch(s)
        state, m = train_step(
            state, img, gt, 0.002, gains, 5e-4, 0.937, cfg=cfg,
            accumulate=1, apply_update=True, compute_dtype=jnp.float32)
        losses.append([float(m["loss_box"]), float(m["loss_cls"]),
                       float(m["loss_dfl"])])
        if s == 0:
            # one full update: nesterov buffer init + decay groups +
            # BN running stats (measured <=1.2e-6)
            sd1 = convert_state_dict(_dequant_subtree(g, "sd1", sd0),
                                     template, source_format="reference")
            diffs = _leaf_diffs(sd1, state["params"])
            assert max(d for d, _, _ in diffs) < 1e-4, \
                max(diffs, key=lambda t: t[0])

    # per-step losses track the reference (measured <=4e-4 rel)
    np.testing.assert_allclose(np.asarray(losses), g["losses"],
                               rtol=5e-3, atol=1e-4)

    # final model + EMA states after 4 compounded updates
    # (measured <=1.9e-3 abs; f32 drift amplified by discrete assigner
    # selections, not a systematic divergence — step-1 is 1e-6-exact)
    for tag, ours in (("sdf", state["params"]),
                      ("sde", state["ema_params"])):
        ref_tree = convert_state_dict(_dequant_subtree(g, tag, sd0),
                                      template, source_format="reference")
        diffs = _leaf_diffs(ref_tree, ours)
        assert max(d for d, _, _ in diffs) < 1e-2, \
            (tag, max(diffs, key=lambda t: t[0]))
