"""Inverse weight converter: our pytree -> torch-layout state dicts.

Three oracles:
  * bit-exact round-trip through the importer for both layouts;
  * reference layout key set == the ACTUAL reference model's state-dict
    keys (captured in tests/golden/model_n.npz from the reference net);
  * ultralytics layout key set == the independent synthetic builder in
    test_ultralytics_convert.py (written from the published yolo11
    structure, not from io/weights.py).
"""
import numpy as np
import pytest

import jax

from tpu_yolo.core.config import get_model_config
from tpu_yolo.io.weights import (convert_state_dict,
                                 export_reference_state_dict,
                                 export_ultralytics_state_dict,
                                 load_torch_state_dict,
                                 save_torch_checkpoint)
from tpu_yolo.models import yolov11


def _params(size="n", nc=80):
    cfg = get_model_config(size, num_classes=nc)
    return cfg, yolov11.init_params(jax.random.PRNGKey(0), cfg)


def _leaves(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_leaves(v, f"{prefix}{k}/"))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.update(_leaves(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


@pytest.mark.parametrize("fmt,export", [
    ("reference", export_reference_state_dict),
    ("ultralytics", export_ultralytics_state_dict),
])
def test_roundtrip_bit_exact(fmt, export):
    cfg, params = _params()
    state = export(params, cfg)
    back = convert_state_dict(state, params, source_format=fmt)
    a, b = _leaves(params), _leaves(back)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], np.asarray(b[k]), err_msg=k)


def test_reference_keys_match_golden_model():
    """Key set equals the reference network's real state dict (golden)."""
    from conftest import load_golden
    g = load_golden("model_n.npz")
    golden = {k[3:] for k in g.files if k.startswith("sd.")}
    cfg, params = _params()
    got = set(export_reference_state_dict(params, cfg))
    assert got == golden, (
        f"missing={sorted(golden - got)[:5]} extra={sorted(got - golden)[:5]}")
    # shapes too (OIHW)
    state = export_reference_state_dict(params, cfg)
    for k in golden:
        assert tuple(state[k].shape) == tuple(g["sd." + k].shape), k


def test_ultralytics_keys_match_independent_builder():
    from test_ultralytics_convert import make_ultra_state

    cfg, params = _params()
    synth, _ = make_ultra_state(params, np.random.default_rng(0))
    got = export_ultralytics_state_dict(params, cfg)
    assert set(got) == set(synth), (
        f"missing={sorted(set(synth) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(synth))[:5]}")


def test_folded_params_refuse_export():
    cfg, params = _params()
    folded = yolov11.fold_batchnorm(params)
    with pytest.raises(ValueError, match="unfolded"):
        export_ultralytics_state_dict(folded, cfg)


def test_save_torch_checkpoint_file_roundtrip(tmp_path):
    """torch.save artifact -> load_torch_state_dict -> importer: the
    full file path TPU-trained weights travel to the torch ecosystem."""
    cfg, params = _params()
    p = str(tmp_path / "exported.pt")
    save_torch_checkpoint(p, params, cfg, target_format="ultralytics")
    state = load_torch_state_dict(p)
    back = convert_state_dict(state, params, source_format="ultralytics")
    a, b = _leaves(params), _leaves(back)
    for k in a:
        np.testing.assert_array_equal(a[k], np.asarray(b[k]), err_msg=k)
