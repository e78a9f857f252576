"""Torch-checkpoint import: .pt / .npz state dicts -> tpu_yolo param pytrees.

Replaces reference utils/util.py:345-516 (load_weight /
load_ultralytics_weight). The reference converter silently skips keys on
shape mismatch (util.py:501-505) and in fact drops all PSA-attention and
most head weights (its 23.cv2/cv3 mapping is swapped — see SURVEY.md §2
fidelity notes). Here every mapping is exact and coverage is asserted at
100%: any unconsumed source tensor or unfilled destination leaf raises.

Supported sources:
  * "reference" format — state_dict names from the reference's own module
    tree (net.p1.0.conv.weight, ..., head.box.0.2.weight);
  * "ultralytics" format — YOLO11 checkpoints (model.0.conv.weight ...,
    model.23.cv2/cv3/dfl); cv2 is the box branch and cv3 the cls branch,
    mapped correctly (unlike the reference, util.py:454-477);
  * .npz archives of either naming scheme;
  * pickled torch checkpoints whose model classes are unavailable are
    unpickled with stub classes and scavenged for parameters/buffers.

Layout transform: torch conv weights are OIHW; ours are HWIO
(transpose 2,3,1,0). Works unchanged for grouped/depthwise convs.
"""
from __future__ import annotations

import pickle
import re

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Raw tensor extraction from torch files (no ultralytics / source modules).
# ---------------------------------------------------------------------------


class _StubUnpickler(pickle.Unpickler):
    """Unpickler that fabricates bare classes for unimportable modules so
    pickled nn.Module trees can be loaded structurally (their __dict__ is
    restored onto a stub) and scavenged for tensors."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (), {"__module__": module})


class _StubPickleModule:
    Unpickler = _StubUnpickler
    # torch.load probes these attributes:
    load = staticmethod(pickle.load)
    loads = staticmethod(pickle.loads)
    dumps = staticmethod(pickle.dumps)
    UnpicklingError = pickle.UnpicklingError


def _scavenge_state_dict(obj, prefix="", out=None):
    """Walk a (possibly stub-class) module tree collecting parameter and
    buffer tensors by dotted name, mirroring nn.Module.state_dict()."""
    out = {} if out is None else out
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return out
    for name, t in (d.get("_parameters") or {}).items():
        if t is not None:
            out[prefix + name] = t
    for name, t in (d.get("_buffers") or {}).items():
        if t is not None:
            out[prefix + name] = t
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            _scavenge_state_dict(child, prefix + name + ".", out)
    return out


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a torch .pt / .npz file into {name: float32 numpy array}."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k], dtype=np.float32) for k in z.files}

    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False,
                         pickle_module=_StubPickleModule)

    # Checkpoint dict wrappers: {'model': ..., 'ema': ..., 'state_dict': ...}
    if isinstance(obj, dict):
        for key in ("ema", "model", "state_dict"):
            if key in obj and obj[key] is not None:
                obj = obj[key]
                break

    if hasattr(obj, "state_dict") and callable(getattr(obj, "state_dict", None)):
        try:
            obj = obj.state_dict()
        except Exception:
            obj = _scavenge_state_dict(obj)
    elif not isinstance(obj, dict):
        obj = _scavenge_state_dict(obj)

    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            v = v.detach().to(torch.float32).numpy()
        out[k] = np.asarray(v, dtype=np.float32)
    return out


# ---------------------------------------------------------------------------
# Name translation.
# ---------------------------------------------------------------------------

_LEAF_MAP = {
    "conv.weight": "w",
    "norm.weight": "gamma",
    "norm.bias": "beta",
    "norm.running_mean": "mean",
    "norm.running_var": "var",
    "bn.weight": "gamma",
    "bn.bias": "beta",
    "bn.running_mean": "mean",
    "bn.running_var": "var",
    "weight": "w",      # plain conv
    "bias": "b",
}

# Ultralytics DetectionModel layer index -> our subtree (YOLO11 graph order;
# 11/12/14/15/18/21 are param-free Upsample/Concat layers).
_ULTRA_LAYERS = {
    "0": "net/p1/0", "1": "net/p2/0", "2": "net/p2/1", "3": "net/p3/0",
    "4": "net/p3/1", "5": "net/p4/0", "6": "net/p4/1", "7": "net/p5/0",
    "8": "net/p5/1", "9": "net/p5/2", "10": "net/p5/3",
    "13": "fpn/h1", "16": "fpn/h2", "17": "fpn/h3", "19": "fpn/h4",
    "20": "fpn/h5", "22": "fpn/h6", "23": "head",
}

# Detect-head submodule translation: cv2 = box branch, cv3 = cls branch.
_ULTRA_HEAD = [
    (re.compile(r"^cv2\.(\d)\.([01])\."), r"box/\1/\2/"),
    (re.compile(r"^cv2\.(\d)\.2\."), r"box/\1/2/"),
    (re.compile(r"^cv3\.(\d)\.0\.0\."), r"cls/\1/0/"),
    (re.compile(r"^cv3\.(\d)\.0\.1\."), r"cls/\1/1/"),
    (re.compile(r"^cv3\.(\d)\.1\.0\."), r"cls/\1/2/"),
    (re.compile(r"^cv3\.(\d)\.1\.1\."), r"cls/\1/3/"),
    (re.compile(r"^cv3\.(\d)\.2\."), r"cls/\1/4/"),
]


def _split_leaf(rest: str):
    """Split the trailing module-leaf suffix and return (stem, our-leaf)."""
    for suffix, leaf in _LEAF_MAP.items():
        if rest.endswith("." + suffix):
            return rest[: -len(suffix) - 1], leaf
        if rest == suffix:
            return "", leaf
    return None, None


def _translate_reference_key(key: str):
    """reference module names -> our path, or None to skip."""
    if "num_batches_tracked" in key or key.startswith("head.dfl"):
        return None
    stem, leaf = _split_leaf(key)
    if leaf is None:
        raise KeyError(f"unrecognized reference key: {key}")

    # PSA region: net.p5.3.res_m.N.{conv1->attn{qkv,pe,proj}, conv2->ffn}.
    m = re.match(r"^net\.p5\.3\.res_m\.(\d+)\.(.*)$", stem)
    if m:
        idx, rest = m.groups()
        rest = re.sub(r"^conv1\.qkv$", "attn.qkv", rest)
        rest = re.sub(r"^conv1\.conv1$", "attn.pe", rest)
        rest = re.sub(r"^conv1\.conv2$", "attn.proj", rest)
        rest = re.sub(r"^conv2\.([01])$", r"ffn.\1", rest)
        stem = f"net.p5.3.m.{idx}.{rest}"
    stem = stem.replace(".res_m.", ".m.")
    return stem.replace(".", "/") + "/" + leaf


def _translate_ultralytics_key(key: str):
    """ultralytics YOLO11 names -> our path, or None to skip."""
    if "num_batches_tracked" in key:
        return None
    key = key.removeprefix("model.")
    layer, _, rest = key.partition(".")
    if layer not in _ULTRA_LAYERS:
        raise KeyError(f"unmapped ultralytics layer in key: {key}")
    base = _ULTRA_LAYERS[layer]

    if base == "head":
        if rest.startswith("dfl."):
            return None
        for pat, repl in _ULTRA_HEAD:
            if pat.match(rest):
                rest = pat.sub(repl, rest)
                break
        else:
            raise KeyError(f"unmapped head key: {key}")
        stem, leaf = _split_leaf(rest.replace("/", "."))
        if leaf is None:
            raise KeyError(f"unrecognized head leaf: {key}")
        return "head/" + stem.replace(".", "/") + "/" + leaf

    stem, leaf = _split_leaf(rest)
    if leaf is None:
        raise KeyError(f"unrecognized leaf: {key}")
    stem = stem.replace("cv1", "conv1").replace("cv2", "conv2").replace("cv3", "conv3")
    stem = stem.replace(".", "/")
    return f"{base}/{stem}/{leaf}" if stem else f"{base}/{leaf}"


def _detect_format(names) -> str:
    for n in names:
        if n.startswith(("net.", "fpn.", "head.")):
            return "reference"
        if re.match(r"^(model\.)?\d+\.", n):
            return "ultralytics"
    raise ValueError("cannot detect checkpoint format from key names")


# ---------------------------------------------------------------------------
# Pytree fill.
# ---------------------------------------------------------------------------


def _tree_paths(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_tree_paths(v, f"{prefix}{k}/"))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.update(_tree_paths(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def _tree_set(tree, path, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[int(k)] if k.isdigit() else node[k]
    last = keys[-1]
    node[int(last) if last.isdigit() else last] = value


def convert_state_dict(state: dict[str, np.ndarray], template_params,
                       source_format: str | None = None):
    """Fill `template_params` (from models.init_params) with torch tensors.

    Asserts 100% coverage both ways (reference's silent-skip bug class is a
    hard error here).
    """
    source_format = source_format or _detect_format(state.keys())
    translate = (_translate_reference_key if source_format == "reference"
                 else _translate_ultralytics_key)

    import jax
    params = jax.tree_util.tree_map(lambda x: x, template_params)  # deep copy
    expected = _tree_paths(params)
    filled = set()

    for src_key, tensor in state.items():
        path = translate(src_key)
        if path is None:
            continue
        if path not in expected:
            raise KeyError(f"{src_key} -> {path}: no such destination leaf")
        want = expected[path].shape
        if path.endswith("/w") and tensor.ndim == 4:
            tensor = tensor.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if tuple(tensor.shape) != tuple(want):
            raise ValueError(
                f"{src_key} -> {path}: shape {tensor.shape} != expected {want}")
        _tree_set(params, path, jnp.asarray(tensor, dtype=jnp.float32))
        filled.add(path)

    missing = sorted(set(expected) - filled)
    if missing:
        raise ValueError(f"{len(missing)} destination leaves not filled, "
                         f"e.g. {missing[:8]}")
    return params


def load_checkpoint_params(path: str, template_params, source_format: str | None = None):
    """One-call load: torch/npz file -> converted, fully-covered pytree."""
    return convert_state_dict(load_torch_state_dict(path), template_params,
                              source_format)


def load_partial(state: dict[str, np.ndarray], template_params,
                 source_format: str | None = None):
    """Shape-matched partial load for transfer learning (reference
    load_weight, utils/util.py:345-355 — e.g. COCO backbone under a new
    num_classes head). Unlike convert_state_dict this does NOT assert
    coverage; it returns (params, report) where report lists 'loaded',
    'skipped_shape' (name, src shape, dst shape) and 'missing' leaves, so
    partial loads are explicit rather than silent (the reference prints
    and moves on)."""
    source_format = source_format or _detect_format(state.keys())
    translate = (_translate_reference_key if source_format == "reference"
                 else _translate_ultralytics_key)

    import jax
    params = jax.tree_util.tree_map(lambda x: x, template_params)
    expected = _tree_paths(params)
    report = {"loaded": [], "skipped_shape": [], "unmapped": [], "missing": []}

    for src_key, tensor in state.items():
        try:
            path = translate(src_key)
        except KeyError:
            # foreign layer/leaf names (e.g. a yolov8 checkpoint) are a
            # report entry here, not an error — this is the lenient path
            report["unmapped"].append(src_key)
            continue
        if path is None or path not in expected:
            continue
        if path.endswith("/w") and tensor.ndim == 4:
            tensor = tensor.transpose(2, 3, 1, 0)
        if tuple(tensor.shape) != tuple(expected[path].shape):
            report["skipped_shape"].append(
                (src_key, tuple(tensor.shape), tuple(expected[path].shape)))
            continue
        _tree_set(params, path, jnp.asarray(tensor, dtype=jnp.float32))
        report["loaded"].append(path)

    report["missing"] = sorted(set(expected) - set(report["loaded"]))
    return params, report


# ---------------------------------------------------------------------------
# Inverse direction: our pytree -> torch-layout state dicts.
# ---------------------------------------------------------------------------

# our head cls stage index -> ultralytics cv3 submodule path
_ULTRA_CLS_STAGE = {"0": "0.0", "1": "0.1", "2": "1.0", "3": "1.1", "4": "2"}
_ULTRA_LAYER_OF = {v: k for k, v in _ULTRA_LAYERS.items() if v != "head"}


def _module_groups(params):
    """{module path tuple: {leaf name: np.float32 array}} over the tree."""
    out = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (str(k),))
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, prefix + (str(i),))
        else:
            out.setdefault(prefix[:-1], {})[prefix[-1]] = np.asarray(
                node, np.float32)

    walk(params, ())
    return out


def _emit_module(state, name, leaves, *, bn_prefix):
    """Write one module's leaves under torch naming (OIHW kernels)."""
    is_conv_bn = "gamma" in leaves
    for leaf, val in leaves.items():
        if leaf == "w":
            key = f"{name}.conv.weight" if is_conv_bn else f"{name}.weight"
            state[key] = val.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif leaf == "b":
            state[f"{name}.bias"] = val
        else:
            torch_leaf = {"gamma": "weight", "beta": "bias",
                          "mean": "running_mean", "var": "running_var"}[leaf]
            state[f"{name}.{bn_prefix}.{torch_leaf}"] = val
    if is_conv_bn:
        state[f"{name}.{bn_prefix}.num_batches_tracked"] = np.asarray(
            0, np.int64)


def export_reference_state_dict(params, cfg) -> dict[str, np.ndarray]:
    """Our (unfolded) pytree -> a reference-layout torch state dict.

    Exact inverse of _translate_reference_key (reference model naming,
    nets/nn.py: Conv = conv+norm, res lists as res_m, the C2PSA block's
    attn as conv1.{qkv,conv1,conv2} / ffn as conv2.N), including the
    non-trainable DFL expectation conv the importer skips. Round-trips
    bit-exactly through convert_state_dict(source_format="reference").
    """
    groups = _module_groups(params)
    _check_unfolded(groups)
    state = {}
    for mod_path, leaves in groups.items():
        stem = ".".join(mod_path)
        stem = stem.replace(".m.", ".res_m.")
        stem = re.sub(
            r"^(net\.p5\.3\.res_m\.\d+)\.(.*)$",
            lambda m: m.group(1) + "." + m.group(2)
            .replace("attn.qkv", "conv1.qkv")
            .replace("attn.pe", "conv1.conv1")
            .replace("attn.proj", "conv1.conv2")
            .replace("ffn.", "conv2."),
            stem)
        _emit_module(state, stem, leaves, bn_prefix="norm")
    state["head.dfl.conv.weight"] = np.arange(
        cfg.reg_max, dtype=np.float32).reshape(1, cfg.reg_max, 1, 1)
    return state


def export_ultralytics_state_dict(params, cfg) -> dict[str, np.ndarray]:
    """Our (unfolded) pytree -> an ultralytics YOLO11-layout state dict
    (model.N... keys, OIHW kernels) — the inverse of the import path, so
    TPU-trained weights can go back to the torch ecosystem
    (`YOLO("yolo11n.yaml").model.load_state_dict(...)`). Round-trips
    bit-exactly through convert_state_dict(source_format="ultralytics").
    """
    groups = _module_groups(params)
    _check_unfolded(groups)
    state = {}
    for mod_path, leaves in groups.items():
        if mod_path[0] == "head":
            branch, scale, stage = mod_path[1], mod_path[2], mod_path[3]
            if branch == "box":
                name = f"model.23.cv2.{scale}.{stage}"
            else:
                name = f"model.23.cv3.{scale}.{_ULTRA_CLS_STAGE[stage]}"
        else:
            key = "/".join(mod_path[:3] if mod_path[0] == "net"
                           else mod_path[:2])
            inner = mod_path[3:] if mod_path[0] == "net" else mod_path[2:]
            parts = []
            for seg in inner:
                if seg in ("conv1", "conv2", "conv3"):
                    parts.append("cv" + seg[-1])
                else:  # m/ffn indices, attn, qkv, pe, proj
                    parts.append(seg)
            name = ".".join(["model", _ULTRA_LAYER_OF[key]] + parts)
        _emit_module(state, name, leaves, bn_prefix="bn")
    state["model.23.dfl.conv.weight"] = np.arange(
        cfg.reg_max, dtype=np.float32).reshape(1, cfg.reg_max, 1, 1)
    return state


def _check_unfolded(groups):
    if not any("gamma" in leaves for leaves in groups.values()):
        raise ValueError("export needs unfolded (gamma/beta/mean/var) "
                         "params; folded checkpoints lost the BN stats")


def save_torch_checkpoint(path: str, params, cfg,
                          target_format: str = "ultralytics"):
    """Write a .pt loadable by torch.load (and by our own importer):
    {"state_dict": {...}} in the chosen layout."""
    import torch

    export = (export_ultralytics_state_dict if target_format == "ultralytics"
              else export_reference_state_dict)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export(params, cfg).items()}
    torch.save({"state_dict": sd, "format": target_format}, path)
