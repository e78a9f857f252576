"""On-device letterbox: aspect-preserving resize + center pad, jitted.

The reference letterboxes on host with cv2 (utils/dataset.py:292-313
resize; INTER_LINEAR + copyMakeBorder). Here the host ships the RAW
decoded uint8 image (top-left anchored in a fixed staging buffer) and
the geometry runs on device — the declared design of SURVEY.md §7
step 3: host->HBM traffic is original-aspect uint8, and the
scale/pad/fill runs next to the model instead of on the one host core.

Geometry contract = data/image.py::letterbox (the frozen oracle):
  r = min(S/h, S/w)            (clamped to 1 when allow_upscale=False)
  new = round(dim * r);  pad = (S - new) / 2
  top/left = round(pad - 0.1)  (the reference's odd-pad split)
  bilinear sampling with half-pixel centers (cv2.INTER_LINEAR
  convention), replicate borders; constant fill elsewhere.

TPU-native formulation: a bilinear resize is separable, so it is two
matmuls with data-dependent (but static-shape) weight matrices —
  out = R_y @ img @ R_x^T,  R_y: (S, H_stage), R_x: (S, W_stage),
each row holding the two bilinear taps for that output coordinate. The
resize rides the MXU instead of a 4-tap gather per output pixel (XLA
gathers serialize; matmuls don't). Rows outside the placed region have
all-zero weights; the constant fill is applied by mask afterwards.

Shapes are static: the staging buffer (B, Hs, Ws, 3) and output
(B, S, S, 3) are fixed; only the *values* of the weight matrices depend
on each image's (h, w) — so one compiled program serves every aspect
ratio, per XLA's one-trace/static-shape model.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _tap_matrix(out_size: int, src_size: int, scale, offset, n_out,
                n_valid, valid_src):
    """(out_size, src_size) bilinear weight matrix.

    Row i samples src coordinate s = (i - offset + 0.5) * scale - 0.5,
    split over floor(s)/floor(s)+1 with replicate-border clamping to
    [0, n_valid-1]. Rows with i outside [offset, offset + n_out) are
    zero (they belong to the pad region). valid_src additionally zeroes
    columns beyond the image's true extent (staging garbage).
    """
    i = jnp.arange(out_size, dtype=jnp.float32)
    s = (i - offset + 0.5) * scale - 0.5
    s0 = jnp.floor(s)
    w1 = s - s0                                   # tap at s0+1
    w0 = 1.0 - w1                                 # tap at s0
    t0 = jnp.clip(s0, 0, n_valid - 1).astype(jnp.int32)
    t1 = jnp.clip(s0 + 1, 0, n_valid - 1).astype(jnp.int32)

    in_out = (i >= offset) & (i < offset + n_out)
    k = jnp.arange(src_size, dtype=jnp.int32)
    m = (w0[:, None] * (k[None, :] == t0[:, None])
         + w1[:, None] * (k[None, :] == t1[:, None]))
    m = jnp.where(in_out[:, None], m, 0.0)
    return jnp.where(valid_src[None, :], m, 0.0)


def _letterbox_one(img, h, w, *, out_size: int, fill: float,
                   allow_upscale: bool):
    """One image: (Hs, Ws, 3) uint8 staging + true (h, w) -> (S, S, 3)."""
    hs, ws, _ = img.shape
    s = jnp.float32(out_size)
    r = jnp.minimum(s / h, s / w)
    if not allow_upscale:
        r = jnp.minimum(r, 1.0)
    new_w = jnp.round(w * r)
    new_h = jnp.round(h * r)
    pad_w = (s - new_w) / 2
    pad_h = (s - new_h) / 2
    top = jnp.round(pad_h - 0.1)
    left = jnp.round(pad_w - 0.1)

    ky = jnp.arange(hs) < h.astype(jnp.int32)
    kx = jnp.arange(ws) < w.astype(jnp.int32)
    ry = _tap_matrix(out_size, hs, h / new_h, top, new_h, h, ky)  # (S, Hs)
    rx = _tap_matrix(out_size, ws, w / new_w, left, new_w, w, kx)  # (S, Ws)

    # bf16 taps, f32 accumulation: pixel values (<=255) are exact in
    # bf16 and tap-weight quantization is <=2^-9 -> error under 1 LSB;
    # halves the MXU cost of the two resize passes.
    x = img.astype(jnp.bfloat16)
    y = jnp.einsum("ik,kwc->iwc", ry.astype(jnp.bfloat16), x,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("jw,iwc->ijc", rx.astype(jnp.bfloat16),
                   y.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)

    oy = jnp.arange(out_size, dtype=jnp.float32)
    inside = ((oy[:, None] >= top) & (oy[:, None] < top + new_h)
              & (oy[None, :] >= left) & (oy[None, :] < left + new_w))
    out = jnp.where(inside[..., None], jnp.round(y), fill)
    out = jnp.clip(out, 0, 255).astype(jnp.uint8)
    meta = jnp.stack([r, pad_w, pad_h, w, h])
    return out, meta


@functools.partial(jax.jit,
                   static_argnames=("out_size", "fill", "allow_upscale"))
def letterbox_batch(images, hw, out_size: int = 640, fill: float = 0.0,
                    allow_upscale: bool = True):
    """Device letterbox over a staged batch.

    Args:
      images: (B, Hs, Ws, 3) uint8 — each image's raw pixels top-left
        anchored in the staging buffer (rows/cols beyond hw are ignored).
      hw: (B, 2) float32 true (height, width) per image.
      out_size: square output size S.
      fill: pad value (data/image.py letterbox pads 0; Ultralytics-style
        114 available by argument).
      allow_upscale: False reproduces eval's never-upscale rule on
        pre-scaled inputs; True is the serving geometry (single resize
        with unclamped r, = load_image + letterbox combined — see
        serve.py::_decode_batch).
    Returns:
      (B, S, S, 3) uint8, (B, 5) float32 metas [r, pad_w, pad_h, w, h]
      (the native loader's meta contract, native/image_pipeline.cc).
    """
    fn = functools.partial(_letterbox_one, out_size=out_size,
                           fill=float(fill), allow_upscale=allow_upscale)
    return jax.vmap(lambda im, s: fn(im, s[0], s[1]))(images, hw)
