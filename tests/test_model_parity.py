"""Golden parity: full YOLOv11-n forward vs the PyTorch reference.

Fixtures in tests/golden/model_n.npz were produced by tools/make_goldens.py
from the reference implementation (seeded random weights, 256x256 input).
Covers: weight converter (reference format), every op/block, backbone,
FPN, head train path, and the eval decode (anchors + DFL + sigmoid).
"""
import numpy as np
import pytest

from conftest import load_golden


@pytest.fixture(scope="module")
def setup():
    import jax

    from tpu_yolo.core.config import get_model_config
    from tpu_yolo.io.weights import convert_state_dict
    from tpu_yolo.models import yolov11

    g = load_golden("model_n.npz")
    state = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    cfg = get_model_config("n")
    template = yolov11.init_params(jax.random.PRNGKey(0), cfg)
    params = convert_state_dict(state, template, source_format="reference")
    x = np.transpose(g["input"], (0, 2, 3, 1))  # NCHW -> NHWC
    return g, cfg, params, x


def _close(mine, ref, tol=2e-4, name=""):
    mine = np.asarray(mine, dtype=np.float32)
    ref = np.asarray(ref, dtype=np.float32)
    assert mine.shape == ref.shape, f"{name}: {mine.shape} vs {ref.shape}"
    denom = np.maximum(np.abs(ref), 1.0)
    err = np.max(np.abs(mine - ref) / denom)
    assert err < tol, f"{name}: max rel err {err:.2e}"


def test_converter_full_coverage(setup):
    # convert_state_dict raised if any leaf were missing; sanity-check count
    import jax

    _, _, params, _ = setup
    leaves = jax.tree_util.tree_leaves(params)
    n_params = sum(l.size for l in leaves)
    assert n_params > 2_500_000  # yolo11n ~2.6M params + BN stats


def test_backbone_features(setup):
    from tpu_yolo.models.yolov11 import _backbone
    from tpu_yolo.ops.nn import Context

    g, cfg, params, x = setup
    p3, p4, p5 = _backbone(params["net"], x, Context(train=False), cfg)
    for mine, name in ((p3, "p3"), (p4, "p4"), (p5, "p5")):
        _close(np.transpose(mine, (0, 3, 1, 2)), g[name], name=name)


def test_fpn_features(setup):
    from tpu_yolo.models.yolov11 import _backbone, _fpn
    from tpu_yolo.ops.nn import Context

    g, cfg, params, x = setup
    ctx = Context(train=False)
    feats = _backbone(params["net"], x, ctx, cfg)
    f3, f4, f5 = _fpn(params["fpn"], feats, ctx, cfg)
    for mine, name in ((f3, "f3"), (f4, "f4"), (f5, "f5")):
        _close(np.transpose(mine, (0, 3, 1, 2)), g[name], name=name)


def test_train_forward(setup):
    from tpu_yolo.models import yolov11
    from tpu_yolo.ops.nn import Context

    g, cfg, params, x = setup
    ctx = Context(train=True)
    maps = yolov11.forward_raw(params, x, cfg, ctx)
    for i, m in enumerate(maps):
        _close(np.transpose(m, (0, 3, 1, 2)), g[f"train_out_{i}"],
               tol=5e-4, name=f"train_out_{i}")
    assert len(ctx.updates) > 0  # BN stats were collected


def _close_decoded(mine, ref, name):
    """Decoded predictions: boxes in pixels (atol 0.2 px — DFL expectation
    times stride amplifies f32 noise), class probabilities (atol 2e-3)."""
    mine = np.asarray(mine, np.float32)
    ref = np.asarray(ref, np.float32)
    assert mine.shape == ref.shape, f"{name}: {mine.shape} vs {ref.shape}"
    box_err = np.max(np.abs(mine[:, :4] - ref[:, :4]))
    cls_err = np.max(np.abs(mine[:, 4:] - ref[:, 4:]))
    assert box_err < 0.2, f"{name}: box err {box_err:.3f} px"
    assert cls_err < 2e-3, f"{name}: prob err {cls_err:.2e}"


def test_eval_forward(setup):
    from tpu_yolo.models import yolov11

    g, cfg, params, x = setup
    out = yolov11.forward(params, x, cfg, train=False)  # (B, A, 84)
    _close_decoded(np.transpose(out, (0, 2, 1)), g["eval_out"], "eval_out")


def test_bn_fold_matches_unfolded(setup):
    from tpu_yolo.models import yolov11

    g, cfg, params, x = setup
    folded = yolov11.fold_batchnorm(params)
    out_folded = yolov11.forward(folded, x, cfg, train=False)
    _close_decoded(np.transpose(out_folded, (0, 2, 1)), g["eval_out"],
                   "folded eval_out")
