"""Device-side train augmentation: mosaic + affine + HSV + flips.

The reference augments on host with cv2 (reference utils/dataset.py:
105-176 load_mosaic, 324-379 random_perspective, 274-289 HSV). On a
host with few cores that pipeline cannot feed a chip running the
gather-free train step (~900 img/s, BENCH.md); this module moves the
pixel work into one jitted program, the same way ops/letterbox.py moved
the serving geometry.

The enabling observation: with the default hyperparameters
(degrees = shear = 0, core/hyp.yaml — same as the reference's
args.yaml), the mosaic placement and the random affine are all
AXIS-ALIGNED maps (scale + translate), so the whole
4-source-images -> augmented-output transform is separable and lands on
the MXU as four masked (R_y^k · src_k · R_x^kᵀ) resamples summed:

  * each mosaic quadrant k is an axis-aligned rectangle of the 2S
    canvas, so its indicator factorizes per axis and the 2D bilinear
    weight of a canvas tap splits exactly across quadrants;
  * the canvas is never materialized — placement (integer shift + crop)
    and the affine compose into one scale/offset per axis per source.

Host keeps: RNG draws, label warp + survival filter (exact, tiny —
data/device_augment.py), decode + long-side prescale (native loader
`ip_load_batch_scaled`, the load_image contract). Device does all
pixels. Labels are bit-identical to the host path by construction;
pixels match the cv2 oracle to the same tolerance as the letterbox
kernel (tests/test_augment_device.py).

Known, documented divergences from the host path: the prescale always
uses bilinear (host draws a random cv2 interpolation per image in
augment mode, data/image.py:22); the rare photometric_jitter extras
(blur/CLAHE/gray/median at p=0.01) are not applied. Mixup IS supported
(mixup_augment_batch — two composed mosaics Beta-blended on device,
reference dataset.py:382-387), as is fractional mosaic probability
(the loader partitions samples into homogeneous per-mode batches,
data/device_augment.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _affine_taps(out_size: int, src_size: int, inv_scale, offset, lo, hi):
    """(out_size, src_size) bilinear tap matrix for the integer-grid map
    x_src = i * inv_scale + offset (cv2.warpAffine convention — no
    half-pixel shift, unlike cv2.resize), constant-0 border: taps whose
    source index falls outside [lo, hi) contribute nothing."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    s = i * inv_scale + offset
    s0 = jnp.floor(s)
    w1 = s - s0
    w0 = 1.0 - w1
    t0 = s0.astype(jnp.int32)
    k = jnp.arange(src_size, dtype=jnp.int32)
    m = (w0[:, None] * (k[None, :] == t0[:, None])
         + w1[:, None] * (k[None, :] == t0[:, None] + 1))
    valid = (k[None, :] >= lo) & (k[None, :] < hi)
    return jnp.where(valid, m, 0.0)


def _mosaic_affine_one(srcs, inv_scale, off_x, off_y, lo_x, hi_x, lo_y,
                       hi_y, *, out_size: int):
    """Compose one augmented image from its 4 staged sources.

    srcs: (4, St, St, 3) uint8; per-quadrant scalars in the (4,) args:
      x_src = x_out * inv_scale + off_x[k], valid cols [lo_x, hi_x)
    (host computes these by composing placement + affine,
    data/device_augment.py). Returns (S, S, 3) float32 in [0, 255].
    """
    st = srcs.shape[1]

    def one_quadrant(src, ox, oy, lx, hx, ly, hy):
        ry = _affine_taps(out_size, st, inv_scale, oy, ly, hy)  # (S, St)
        rx = _affine_taps(out_size, st, inv_scale, ox, lx, hx)  # (S, St)
        # bf16 taps / f32 accumulate: same argument as ops/letterbox.py
        # (pixels exact in bf16; tap quantization < 1 LSB)
        y = jnp.einsum("ik,kwc->iwc", ry.astype(jnp.bfloat16),
                       src.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.einsum("jw,iwc->ijc", rx.astype(jnp.bfloat16),
                          y.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    parts = jax.vmap(one_quadrant)(srcs, off_x, off_y, lo_x, hi_x,
                                   lo_y, hi_y)
    return jnp.clip(parts.sum(0), 0.0, 255.0)


def hsv_jitter_device(img, gains):
    """HSV color jitter with the host path's uint8-LUT semantics
    (data/augment.py::hsv_jitter; reference dataset.py:274-289).

    img: (..., 3) float32 RGB in [0, 255]; gains: (3,) the drawn
    (r_h, r_s, r_v) multipliers. Float re-derivation of cv2's 8-bit
    HSV round trip: channel values are rounded to the uint8 grid where
    cv2 rounds, and the LUT outputs truncate (`.astype(np.uint8)`).
    Matches the cv2 path to a few LSB (fixed-point hue differences);
    hue wraparound is benign because hue is circular in RGB.
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(diff > 0, jnp.where(h < 0, h + 360.0, h), 0.0)
    h_u8 = jnp.round(h / 2.0) % 180.0                  # cv2 uint8 hue
    s_u8 = jnp.round(jnp.where(v > 0, 255.0 * diff / jnp.maximum(v, 1.0),
                               0.0))
    v_u8 = v                                           # already uint8 grid

    h2 = jnp.floor((h_u8 * gains[0]) % 180.0)          # LUTs truncate
    s2 = jnp.floor(jnp.clip(s_u8 * gains[1], 0.0, 255.0))
    v2 = jnp.floor(jnp.clip(v_u8 * gains[2], 0.0, 255.0))

    # HSV (uint8 grid) -> RGB, cv2 semantics: H2*2 degrees, S in [0,1]
    hh = h2 * 2.0 / 60.0
    i = jnp.floor(hh)
    f = hh - i
    sf = s2 / 255.0
    p = v2 * (1.0 - sf)
    q = v2 * (1.0 - sf * f)
    t = v2 * (1.0 - sf * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [v2, q, p, p, t, v2])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [t, v2, v2, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [p, p, t, v2, v2, q])
    return jnp.round(jnp.stack([r2, g2, b2], axis=-1))


@functools.partial(jax.jit, static_argnames=("out_size",))
def plain_augment_batch(staged, hw, params, out_size: int = 640):
    """The no-mosaic augmentation program (the reference's final-10-
    epochs mode and the mosaic=0 hyperparameter): letterbox ->
    random affine (scale+translate) -> HSV -> flips, mirroring the host
    __getitem__ else-branch (data/dataset.py; reference
    dataset.py:292-313 + random_perspective) with the same two-resample
    structure (uint8 rounding between letterbox and affine).

    staged: (B, St, St, 3) uint8 long-side-prescaled sources; hw (B, 2)
    their true staged dims; params: inv_scale (B,), off_x/off_y (B,)
    (the composed affine offsets), hsv_gains (B, 3), flip_lr/ud (B,).
    """
    from tpu_yolo.ops.letterbox import letterbox_batch

    boxed, _ = letterbox_batch(staged, hw, out_size=out_size,
                               allow_upscale=True)

    def one(img, isc, ox, oy):
        z, f = jnp.zeros(1, jnp.float32), jnp.full((1,), out_size,
                                                   jnp.float32)
        return _mosaic_affine_one(img[None], isc, ox[None], oy[None],
                                  z, f, z, f, out_size=out_size)

    imgs = jax.vmap(one)(boxed, params["inv_scale"], params["off_x"],
                         params["off_y"])
    imgs = jnp.round(imgs)
    imgs = jax.vmap(hsv_jitter_device)(imgs, params["hsv_gains"])
    flip_ud = params["flip_ud"][:, None, None, None]
    flip_lr = params["flip_lr"][:, None, None, None]
    imgs = jnp.where(flip_ud, imgs[:, ::-1, :, :], imgs)
    imgs = jnp.where(flip_lr, imgs[:, :, ::-1, :], imgs)
    return jnp.clip(imgs, 0.0, 255.0).astype(jnp.uint8)


def _bilinear_gather(src, sx, sy, lo_x, hi_x, lo_y, hi_y):
    """Bilinear sample of src (St, St, 3) at float coords (S, S) with a
    validity window [lo, hi) per axis — the gather counterpart of the
    masked-tap resample, for NON-separable (rotation/shear) maps.
    Corner taps outside the window contribute 0 (cv2.warpAffine
    constant-0 border over the composited canvas)."""
    st = src.shape[0]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    flat = src.reshape(st * st, src.shape[-1])
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            valid = ((xi >= lo_x) & (xi < hi_x)
                     & (yi >= lo_y) & (yi < hi_y))
            w = ((wx if dx else 1.0 - wx) * (wy if dy else 1.0 - wy)
                 * valid)
            xc = jnp.clip(xi, 0, st - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, st - 1).astype(jnp.int32)
            vals = jnp.take(flat, yc * st + xc, axis=0)
            out = out + w[..., None] * vals.astype(jnp.float32)
    return out


def _mosaic_affine_general_one(srcs, minv, shift_x, shift_y, lo_x, hi_x,
                               lo_y, hi_y, *, out_size: int):
    """General-affine mosaic compose (degrees/shear != 0): the canvas
    coordinate of each output pixel is Minv @ (x_out, y_out, 1); each
    quadrant k samples its source at canvas - shift_k within its crop
    window. Gather-based (TPU has no vector gather, so this is the slow
    exact fallback — the separable MXU path handles the default
    axis-aligned hyperparameters)."""
    s = out_size
    j = jnp.arange(s, dtype=jnp.float32)[None, :]
    i = jnp.arange(s, dtype=jnp.float32)[:, None]
    xs = minv[0, 0] * j + minv[0, 1] * i + minv[0, 2]   # canvas coords
    ys = minv[1, 0] * j + minv[1, 1] * i + minv[1, 2]

    def one_quadrant(src, ox, oy, lx, hx, ly, hy):
        return _bilinear_gather(src, xs - ox, ys - oy, lx, hx, ly, hy)

    parts = jax.vmap(one_quadrant)(srcs, shift_x, shift_y, lo_x, hi_x,
                                   lo_y, hi_y)
    return jnp.clip(parts.sum(0), 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("out_size",))
def augment_batch_general(srcs, params, out_size: int = 640):
    """augment_batch for the general-affine (rotation/shear) mode.

    params: minv (B, 2, 3) canvas<-output inverse affines,
    shift_x/shift_y/lo_x/hi_x/lo_y/hi_y (B, 4) per-quadrant placement,
    hsv_gains (B, 3), flip_lr/flip_ud (B,)."""
    fn = functools.partial(_mosaic_affine_general_one, out_size=out_size)
    imgs = jax.vmap(fn)(srcs, params["minv"], params["shift_x"],
                        params["shift_y"], params["lo_x"], params["hi_x"],
                        params["lo_y"], params["hi_y"])
    imgs = jnp.round(imgs)
    imgs = jax.vmap(hsv_jitter_device)(imgs, params["hsv_gains"])
    flip_ud = params["flip_ud"][:, None, None, None]
    flip_lr = params["flip_lr"][:, None, None, None]
    imgs = jnp.where(flip_ud, imgs[:, ::-1, :, :], imgs)
    imgs = jnp.where(flip_lr, imgs[:, :, ::-1, :], imgs)
    return jnp.clip(imgs, 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_size",))
def mixup_augment_batch_general(srcs, params, out_size: int = 640):
    """mixup_augment_batch for the general-affine mode: params holds
    "a"/"b" general geometry dicts + alpha/hsv_gains/flips."""
    fn = functools.partial(_mosaic_affine_general_one, out_size=out_size)

    def compose(srcs4, p):
        return jax.vmap(fn)(srcs4, p["minv"], p["shift_x"], p["shift_y"],
                            p["lo_x"], p["hi_x"], p["lo_y"], p["hi_y"])

    c1 = jnp.round(compose(srcs[:, 0], params["a"]))
    c2 = jnp.round(compose(srcs[:, 1], params["b"]))
    a = params["alpha"][:, None, None, None]
    imgs = jnp.floor(c1 * a + c2 * (1.0 - a))
    imgs = jax.vmap(hsv_jitter_device)(imgs, params["hsv_gains"])
    flip_ud = params["flip_ud"][:, None, None, None]
    flip_lr = params["flip_lr"][:, None, None, None]
    imgs = jnp.where(flip_ud, imgs[:, ::-1, :, :], imgs)
    imgs = jnp.where(flip_lr, imgs[:, :, ::-1, :], imgs)
    return jnp.clip(imgs, 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_size",))
def plain_augment_batch_general(staged, hw, params, out_size: int = 640):
    """plain_augment_batch for the general-affine mode: letterbox (same
    two-resample structure as the host path), then the full affine via
    bilinear gathers over the single (S, S) letterboxed source."""
    from tpu_yolo.ops.letterbox import letterbox_batch

    boxed, _ = letterbox_batch(staged, hw, out_size=out_size,
                               allow_upscale=True)

    def one(img, minv):
        z = jnp.zeros((1,), jnp.float32)
        f = jnp.full((1,), out_size, jnp.float32)
        return _mosaic_affine_general_one(
            img[None].astype(jnp.float32), minv, z, z, z, f, z, f,
            out_size=out_size)

    imgs = jax.vmap(one)(boxed, params["minv"])
    imgs = jnp.round(imgs)
    imgs = jax.vmap(hsv_jitter_device)(imgs, params["hsv_gains"])
    flip_ud = params["flip_ud"][:, None, None, None]
    flip_lr = params["flip_lr"][:, None, None, None]
    imgs = jnp.where(flip_ud, imgs[:, ::-1, :, :], imgs)
    imgs = jnp.where(flip_lr, imgs[:, :, ::-1, :], imgs)
    return jnp.clip(imgs, 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_size",))
def mixup_augment_batch(srcs, params, out_size: int = 640):
    """Mosaic-mixup program: two mosaics composed and Beta-blended.

    Mirrors the host order (data/dataset.py:42-47 + augment.py mixup,
    reference dataset.py:382-387): each mosaic is composed and rounded
    to the uint8 grid (cv2.warpAffine emits uint8), blended
    img1*a + img2*(1-a) then truncated (.astype(np.uint8) floors), and
    HSV + flips run ONCE on the blend.

    Args:
      srcs: (B, 2, 4, St, St, 3) uint8 — two staged 4-source sets.
      params: {"a": geometry dict, "b": geometry dict (inv_scale (B,),
        off/lo/hi (B, 4) each), "alpha": (B,) Beta(32,32) draws,
        "hsv_gains": (B, 3), "flip_lr"/"flip_ud": (B,) bool}.
    Returns (B, S, S, 3) uint8 RGB.
    """
    fn = functools.partial(_mosaic_affine_one, out_size=out_size)

    def compose(srcs4, p):
        return jax.vmap(fn)(srcs4, p["inv_scale"], p["off_x"], p["off_y"],
                            p["lo_x"], p["hi_x"], p["lo_y"], p["hi_y"])

    c1 = jnp.round(compose(srcs[:, 0], params["a"]))
    c2 = jnp.round(compose(srcs[:, 1], params["b"]))
    a = params["alpha"][:, None, None, None]
    imgs = jnp.floor(c1 * a + c2 * (1.0 - a))
    imgs = jax.vmap(hsv_jitter_device)(imgs, params["hsv_gains"])
    flip_ud = params["flip_ud"][:, None, None, None]
    flip_lr = params["flip_lr"][:, None, None, None]
    imgs = jnp.where(flip_ud, imgs[:, ::-1, :, :], imgs)
    imgs = jnp.where(flip_lr, imgs[:, :, ::-1, :], imgs)
    return jnp.clip(imgs, 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_size",))
def augment_batch(srcs, params, out_size: int = 640):
    """The full device augmentation program.

    Args:
      srcs: (B, 4, St, St, 3) uint8 staged sources (native
        `load_batch_scaled`: long side == St, top-left anchored).
      params: dict of per-image draws (host sampler):
        inv_scale (B,), off_x/off_y/lo_x/hi_x/lo_y/hi_y (B, 4),
        hsv_gains (B, 3), flip_lr (B,) bool, flip_ud (B,) bool.
    Returns (B, S, S, 3) uint8 RGB — the __getitem__ image contract.
    """
    fn = functools.partial(_mosaic_affine_one, out_size=out_size)
    imgs = jax.vmap(fn)(srcs, params["inv_scale"], params["off_x"],
                        params["off_y"], params["lo_x"], params["hi_x"],
                        params["lo_y"], params["hi_y"])
    # the host path rounds to uint8 after the warp, before HSV — the
    # HSV LUT math assumes channel values on the uint8 grid
    imgs = jnp.round(imgs)
    imgs = jax.vmap(hsv_jitter_device)(imgs, params["hsv_gains"])
    flip_ud = params["flip_ud"][:, None, None, None]
    flip_lr = params["flip_lr"][:, None, None, None]
    imgs = jnp.where(flip_ud, imgs[:, ::-1, :, :], imgs)
    imgs = jnp.where(flip_lr, imgs[:, :, ::-1, :], imgs)
    return jnp.clip(imgs, 0.0, 255.0).astype(jnp.uint8)
