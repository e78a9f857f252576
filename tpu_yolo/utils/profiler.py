"""Model profiling: parameter count, FLOPs, and timeline traces.

TPU-native replacement for the reference's thop-based profile()
(main.py:307-321): FLOPs come from XLA's own cost model
(`jit(...).lower().compile().cost_analysis()`), so the number reflects
the graph the chip actually runs (post-fusion), and the timeline tracer
is `jax.profiler` (viewable in TensorBoard / Perfetto) — the reference
has no timeline tracer at all (SURVEY.md §5).
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.models import yolov11


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
               if hasattr(x, "shape"))


def profile_model(params, cfg: ModelConfig, input_size: int = 640,
                  batch: int = 1, compute_dtype=jnp.bfloat16):
    """Compile the eval forward and report {params, flops, bytes}.

    FLOPs are per-forward (batch folded out), from XLA cost analysis of
    the compiled executable.
    """
    x = jnp.zeros((batch, input_size, input_size, 3), jnp.uint8)

    def fwd(p, img):
        return yolov11.forward(p, img.astype(compute_dtype) / compute_dtype(255),
                               cfg, train=False)

    compiled = jax.jit(fwd).lower(params, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0)) / batch
    return {
        "params": count_params(params),
        "flops": flops,
        "gflops": flops / 1e9,
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)) / batch,
    }


def print_profile(params, cfg: ModelConfig, input_size: int = 640):
    """Startup banner (reference main.py:356 prints params + GFLOPs)."""
    r = profile_model(params, cfg, input_size)
    print(f"Number of parameters: {r['params']}")
    print(f"GFLOPs (XLA cost model, {input_size}px): {r['gflops']:.2f}")
    return r


@contextlib.contextmanager
def trace(log_dir: str):
    """Timeline trace context: `with trace('/tmp/tb'):` then open the
    trace in TensorBoard's profile tab or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
