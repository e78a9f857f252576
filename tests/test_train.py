"""Training-stack tests: optimizer parity, schedules, EMA, and one SPMD
train step on the 8-device virtual CPU mesh (the multi-device answer to
the reference's untestable-without-GPUs DDP path, SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.models import yolov11
from tpu_yolo.parallel import DataParallel, make_mesh
from tpu_yolo.train import optim
from tpu_yolo.train.step import init_train_state, train_step

TINY = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                   csp=(False, True), num_classes=8)


def test_sgd_matches_torch():
    """Our SGD+nesterov+wd == torch.optim.SGD on a toy problem."""
    torch = pytest.importorskip("torch")

    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    g_seq = [np.random.RandomState(i + 1).randn(4, 3).astype(np.float32)
             for i in range(5)]

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([tw], lr=0.01, momentum=0.937, nesterov=True,
                          weight_decay=5e-4)
    for g in g_seq:
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    params = {"w": jnp.asarray(w0)}
    state = optim.init_sgd_state(params)
    masks = (optim.trainable_mask(params), optim.decay_mask(params))
    for g in g_seq:
        params, state["momentum"] = optim.sgd_update(
            params, {"w": jnp.asarray(g)}, state, lr=0.01, momentum=0.937,
            weight_decay=5e-4, masks=masks)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_decay_mask_groups():
    """'w' leaves decay; biases/norm-params/buffers don't
    (reference set_params, util.py:519-534)."""
    params = yolov11.init_params(jax.random.PRNGKey(0), TINY)
    flat = jax.tree_util.tree_leaves_with_path(optim.decay_mask(params))
    by_name = {}
    for path, v in flat:
        name = path[-1].key
        by_name.setdefault(name, set()).add(v)
    assert by_name["w"] == {True}
    for k in ("b", "gamma", "beta", "mean", "var"):
        assert by_name[k] == {False}, k


def test_lr_schedules():
    hyp = {"max_lr": 0.01, "min_lr": 1e-4, "warmup_epochs": 3}
    lin = optim.linear_lr(10, 100, hyp)
    assert len(lin) == 1000
    assert lin[0] == pytest.approx(1e-4)
    warm = int(max(3 * 100, 100))
    assert lin[warm] == pytest.approx(0.01)       # warmup peak
    assert lin[-1] == pytest.approx(1e-4)          # decayed back
    cos = optim.cosine_lr(10, 100, hyp)
    assert cos.max() == pytest.approx(0.01)
    assert cos[-1] == pytest.approx(1e-4, rel=1e-2)
    # >=100-step warmup floor (reference util.py:566)
    short = optim.linear_lr(300, 10, hyp)
    assert np.argmax(short) >= 99


def test_ema_decay_ramp():
    d = optim.ema_decay(jnp.asarray(2000.0))
    assert float(d) == pytest.approx(0.9999 * (1 - np.exp(-1.0)))
    e = {"w": jnp.zeros(3)}
    p = {"w": jnp.ones(3)}
    out = optim.ema_update(e, p, jnp.asarray(1))
    d1 = 0.9999 * (1 - np.exp(-1 / 2000))
    np.testing.assert_allclose(np.asarray(out["w"]), (1 - d1) * np.ones(3),
                               rtol=1e-5)


def test_spmd_train_step_runs_and_learns():
    """One jitted train step on the 8-device mesh; loss decreases over a
    few steps; BN stats and EMA actually move."""
    dp = DataParallel(make_mesh(n_data=8))
    params = yolov11.init_params(jax.random.PRNGKey(0), TINY)
    state = dp.replicate(init_train_state(params, ema=True))

    rng = np.random.default_rng(0)
    images = dp.shard_batch(jnp.asarray(
        rng.integers(0, 256, (8, 64, 64, 3), np.uint8)))
    gt = np.zeros((8, 2, 5), np.float32)
    gt[:, 0] = [1, 8.0, 8.0, 40.0, 40.0]
    gt = dp.shard_batch(jnp.asarray(gt))
    hyp = jnp.asarray([7.5, 0.5, 1.5], jnp.float32)

    mean0 = np.asarray(state["params"]["net"]["p1"][0]["mean"])
    losses = []
    for _ in range(8):
        state, m = train_step(state, images, gt, 0.01, hyp, 5e-4, 0.937,
                              cfg=TINY, accumulate=1, apply_update=True)
        losses.append(float(m["loss_box"] + m["loss_cls"] + m["loss_dfl"]))
    # This 8-image lr=0.01 bf16 toy oscillates (single-step cls-loss
    # spikes of 2-4x are normal before it overfits), so sample a window,
    # not one step: sustained divergence (the bf16-instability signature,
    # loss 16 -> 74 monotone) still fails this, a transient spike does
    # not. test_convergence is the stronger stability gate.
    assert min(losses[-3:]) < losses[0], losses
    assert all(np.isfinite(losses)), losses
    assert int(state["step"]) == 8
    mean5 = np.asarray(state["params"]["net"]["p1"][0]["mean"])
    assert np.abs(mean5 - mean0).max() > 0, "BN running stats never updated"
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state["params"], state["ema_params"])
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_grad_accumulation_equivalence():
    """accumulate=2 over two half-batches == accumulate=1 over the sum of
    their gradients (same update, reference main.py:158-169 semantics)."""
    params = yolov11.init_params(jax.random.PRNGKey(1), TINY)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3), np.uint8))
    gt = np.zeros((2, 2, 5), np.float32)
    gt[:, 0] = [1, 8.0, 8.0, 40.0, 40.0]
    gt = jnp.asarray(gt)
    hyp = jnp.asarray([7.5, 0.5, 1.5], jnp.float32)

    state = init_train_state(params, ema=False, accumulate=2)
    # micro-step 1 stores grads, micro-step 2 applies
    state, _ = train_step(state, imgs, gt, 0.01, hyp, 0.0, 0.9,
                          cfg=TINY, accumulate=2, apply_update=False)
    assert "accum" in state["opt"]
    before = np.asarray(state["params"]["net"]["p1"][0]["w"]).copy()
    state, _ = train_step(state, imgs, gt, 0.01, hyp, 0.0, 0.9,
                          cfg=TINY, accumulate=2, apply_update=True)
    after = np.asarray(state["params"]["net"]["p1"][0]["w"])
    assert np.abs(after - before).max() > 0, "no update applied"


def test_remat_train_step_matches():
    """remat (per-stage and nested per-block) computes identical
    losses/updates to remat=False."""
    params = yolov11.init_params(jax.random.PRNGKey(2), TINY)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3), np.uint8))
    gt = np.zeros((2, 2, 5), np.float32)
    gt[:, 0] = [1, 8.0, 8.0, 40.0, 40.0]
    gt = jnp.asarray(gt)
    hyp = jnp.asarray([7.5, 0.5, 1.5], jnp.float32)

    outs = {}
    for remat in (False, True, "blocks"):
        state = init_train_state(params, ema=False)
        state, m = train_step(state, imgs, gt, 0.01, hyp, 5e-4, 0.937,
                              cfg=TINY, accumulate=1, apply_update=True,
                              remat=remat, compute_dtype=jnp.float32)
        outs[remat] = (m, state["params"])
    ref_leaves, treedef = jax.tree_util.tree_flatten(outs[False][1])
    for level in (True, "blocks"):
        for k in outs[False][0]:
            np.testing.assert_allclose(float(outs[False][0][k]),
                                       float(outs[level][0][k]), rtol=1e-5)
        # every updated weight AND every BN running stat (incl. the ones
        # produced inside nested per-block remat regions) must match
        leaves = treedef.flatten_up_to(outs[level][1])
        assert len(leaves) == len(ref_leaves)
        for a, b in zip(ref_leaves, leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
