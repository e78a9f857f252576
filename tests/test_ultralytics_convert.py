"""Ultralytics YOLO11 checkpoint mapping, proven without a real .pt.

The names and shapes of an ultralytics yolo11 state dict are fully
determined by the published architecture (ultralytics yolo11.yaml +
nn/modules: Conv = conv+bn, C3k2/C2f = cv1/cv2/m.N, C3k = cv1/cv2/cv3 +
Bottlenecks, SPPF = cv1/cv2, C2PSA = cv1/cv2 + PSABlock(attn.qkv/pe/proj,
ffn.0/ffn.1), Detect = cv2 (box: Conv,Conv,Conv2d) / cv3 (cls:
(DWConv,Conv),(DWConv,Conv),Conv2d) / dfl). This test synthesizes a
complete state dict in that layout — the name builder below is written
from the ultralytics structure directly, NOT from io/weights.py's
translation tables, so the two implementations cross-check each other —
and proves convert_state_dict(source_format="ultralytics") routes every
tensor to the right leaf with 100% coverage.

Covers every entry of _ULTRA_LAYERS and _ULTRA_HEAD (io/weights.py),
which the reference's own converter gets wrong (utils/util.py:454-477
silently drops PSA/head weights — SURVEY.md §2 fidelity notes).
"""
import numpy as np
import pytest

from tpu_yolo.core.config import get_model_config
from tpu_yolo.io.weights import convert_state_dict
from tpu_yolo.models import yolov11

# ultralytics DetectionModel layer indices (yolo11.yaml graph order;
# 11/12/14/15/18/21 are Upsample/Concat, no params) -> our subtrees.
_LAYER_OF = {
    ("net", "p1", "0"): 0, ("net", "p2", "0"): 1, ("net", "p2", "1"): 2,
    ("net", "p3", "0"): 3, ("net", "p3", "1"): 4, ("net", "p4", "0"): 5,
    ("net", "p4", "1"): 6, ("net", "p5", "0"): 7, ("net", "p5", "1"): 8,
    ("net", "p5", "2"): 9, ("net", "p5", "3"): 10,
    ("fpn", "h1"): 13, ("fpn", "h2"): 16, ("fpn", "h3"): 17,
    ("fpn", "h4"): 19, ("fpn", "h5"): 20, ("fpn", "h6"): 22,
}

# Detect-head cls branch: our cls/i/k stage -> ultralytics cv3.i module
# path (two DWConv+Conv pairs then the logits Conv2d).
_CLS_STAGE = {0: "0.0", 1: "0.1", 2: "1.0", 3: "1.1", 4: "2"}


def _leaf_items(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_items(v, prefix + (k,))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            yield from _leaf_items(v, prefix + (str(i),))
    else:
        yield prefix, tree


def _group_by_module(template):
    """{module path (tuple): {leaf name: shape}} over the param tree."""
    mods = {}
    for path, leaf in _leaf_items(template):
        mods.setdefault(path[:-1], {})[path[-1]] = tuple(leaf.shape)
    return mods


def _ultra_module_name(path):
    """Our module path -> the ultralytics module name (independent of
    io/weights.py: written from the yolo11 module structure)."""
    if path[0] == "head":
        branch, scale, stage = path[1], path[2], int(path[3])
        if branch == "box":
            return f"model.23.cv2.{scale}.{stage}"
        return f"model.23.cv3.{scale}.{_CLS_STAGE[stage]}"

    key = path[:3] if path[0] == "net" else path[:2]
    layer = _LAYER_OF[key]
    inner = path[3:] if path[0] == "net" else path[2:]

    parts = []
    i = 0
    while i < len(inner):
        seg = inner[i]
        if seg in ("conv1", "conv2", "conv3"):
            parts.append("cv" + seg[-1])
        elif seg == "m":
            parts.append(f"m.{inner[i + 1]}")
            i += 1
        elif seg == "ffn":
            parts.append(f"ffn.{inner[i + 1]}")
            i += 1
        else:  # attn, qkv, pe, proj
            parts.append(seg)
        i += 1
    return ".".join(["model", str(layer)] + parts)


def make_ultra_state(template, rng):
    """(state dict in ultralytics layout, {our leaf path: expected f32})."""
    state, expect = {}, {}
    for mod_path, leaves in _group_by_module(template).items():
        name = _ultra_module_name(mod_path)
        is_conv_bn = "gamma" in leaves
        for leaf, shape in leaves.items():
            val = rng.standard_normal(shape).astype(np.float32)
            expect["/".join(mod_path + (leaf,))] = val
            if leaf == "w":
                src = val.transpose(3, 2, 0, 1)  # HWIO -> torch OIHW
                state[f"{name}.conv.weight" if is_conv_bn
                      else f"{name}.weight"] = src
            elif leaf == "b":
                state[f"{name}.bias"] = val
            else:
                bn_leaf = {"gamma": "weight", "beta": "bias",
                           "mean": "running_mean", "var": "running_var"}[leaf]
                state[f"{name}.bn.{bn_leaf}"] = val
        if is_conv_bn:
            state[f"{name}.bn.num_batches_tracked"] = np.asarray(
                0, np.float32)
    # The DFL expectation conv (non-trainable iota; we build it from
    # cfg.reg_max instead of loading it) — must be skipped, not an error.
    state["model.23.dfl.conv.weight"] = np.arange(16, dtype=np.float32).reshape(
        1, 16, 1, 1)
    return state, expect


@pytest.mark.parametrize("size", ["n", "m"])
def test_full_coverage_and_exact_routing(size):
    """Every tensor of a complete yolo11 state dict lands on the right
    leaf (distinct random values, so a swapped mapping cannot pass)."""
    cfg = get_model_config(size)
    template = yolov11.init_params(0, cfg)
    state, expect = make_ultra_state(template, np.random.default_rng(7))

    params = convert_state_dict(state, template, source_format="ultralytics")

    got = {"/".join(p): np.asarray(v) for p, v in _leaf_items(params)}
    assert set(got) == set(expect)
    for path, want in expect.items():
        np.testing.assert_array_equal(
            got[path], want, err_msg=f"wrong tensor routed to {path}")


def test_autodetects_ultralytics_format():
    cfg = get_model_config("n")
    template = yolov11.init_params(0, cfg)
    state, _ = make_ultra_state(template, np.random.default_rng(1))
    params = convert_state_dict(state, template)  # no source_format
    assert "net" in params


def test_head_branch_channels_disambiguate_box_vs_cls():
    """Semantic anchor: in a real yolo11 checkpoint cv2's final conv has
    4*reg_max output channels and cv3's has num_classes. Our template
    must agree — this is what makes a swapped cv2/cv3 mapping (the
    reference converter's bug, utils/util.py:454-477) a hard shape error
    rather than a silent mis-load."""
    cfg = get_model_config("n")
    template = yolov11.init_params(0, cfg)
    state, _ = make_ultra_state(template, np.random.default_rng(2))
    for i in range(3):
        assert state[f"model.23.cv2.{i}.2.weight"].shape[0] == 4 * cfg.reg_max
        assert state[f"model.23.cv3.{i}.2.weight"].shape[0] == cfg.num_classes
    assert 4 * cfg.reg_max != cfg.num_classes

    # Swap one box/cls logits tensor pair -> must raise, naming the key.
    bad = dict(state)
    bad["model.23.cv2.0.2.weight"] = state["model.23.cv3.0.2.weight"]
    with pytest.raises(ValueError, match="cv2.0.2"):
        convert_state_dict(bad, template, source_format="ultralytics")


def test_missing_tensor_is_an_error():
    """The reference silently skips unloaded weights (util.py:501-505);
    here an incomplete checkpoint is a hard error listing the gap."""
    cfg = get_model_config("n")
    template = yolov11.init_params(0, cfg)
    state, _ = make_ultra_state(template, np.random.default_rng(3))
    del state["model.10.m.0.attn.qkv.conv.weight"]
    with pytest.raises(ValueError, match="not filled"):
        convert_state_dict(state, template, source_format="ultralytics")


def test_unknown_layer_is_an_error():
    cfg = get_model_config("n")
    template = yolov11.init_params(0, cfg)
    state, _ = make_ultra_state(template, np.random.default_rng(4))
    state["model.24.conv.weight"] = np.zeros((8, 8, 1, 1), np.float32)
    with pytest.raises(KeyError, match="model.24|24"):
        convert_state_dict(state, template, source_format="ultralytics")
