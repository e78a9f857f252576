"""Pallas fused-attention kernel vs the einsum formulation (interpret
mode on CPU; the compiled kernel runs on TPU in bench/serving)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_yolo.ops.attention_pallas import _pick_q_block, fused_attention


def _einsum_attention(q, k, v, scale):
    s = jnp.einsum("btd,bsd->bts", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bts,bsd->btd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@pytest.mark.parametrize("t,dk,dh", [(400, 32, 64), (100, 16, 32), (64, 64, 128)])
def test_fused_attention_matches_einsum(t, dk, dh):
    rng = np.random.default_rng(0)
    bh = 4
    q = jnp.asarray(rng.standard_normal((bh, t, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, t, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, t, dh)), jnp.float32)
    scale = dk ** -0.5

    got = fused_attention(q, k, v, scale, interpret=True)
    want = _einsum_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_q_block_divides():
    for t in (100, 400, 900, 1600, 2500, 16, 8, 24):
        bq = _pick_q_block(t)
        assert t % bq == 0 and bq <= t


class TestTopkMask:
    """ops/topk_pallas.py vs the XLA scan formulation (bit-identical
    selection is the contract — the TAL assigner is golden-pinned)."""

    def _scan_mask(self, x, k):
        from tpu_yolo.train.loss import _topk_mask_by_argmax
        return _topk_mask_by_argmax(x, k)

    @pytest.mark.parametrize("b,n,a", [(2, 5, 300), (3, 64, 840), (1, 8, 57)])
    def test_matches_scan_random(self, b, n, a):
        from tpu_yolo.ops.topk_pallas import topk_mask
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((b, n, a)), jnp.float32)
        got = topk_mask(x, 10, interpret=True)
        want = self._scan_mask(x, 10)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_matches_scan_with_ties(self):
        """Quantized values force many exact ties; the tie-break
        (lower index first) must match argmax exactly. Also covers the
        padded-GT-row shape: all-zero rows select anchors 0..k-1."""
        from tpu_yolo.ops.topk_pallas import topk_mask
        rng = np.random.default_rng(1)
        x = np.round(rng.random((2, 7, 120)) * 4) / 4
        x[:, -2:] = 0.0                      # padded-row analogue
        x = jnp.asarray(x, jnp.float32)
        got = topk_mask(x, 10, interpret=True)
        want = self._scan_mask(x, 10)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert np.asarray(got)[:, -1, :10].all()

    def test_row_block_bounds(self):
        from tpu_yolo.ops.topk_pallas import _row_block
        for n, a in [(64, 8400), (512, 8400), (3, 300), (64, 25200)]:
            bn = _row_block(n, a)
            assert 1 <= bn <= n


class TestGreedyKeepPallas:
    """ops/nms_pallas.py vs the XLA fixpoint (ops/nms.py::_greedy_keep).
    Bit-identical keep sets are the contract — NMS is box-exact
    golden-pinned against the reference."""

    def _xla_keep(self, boxes, cls_idx, valid, thr):
        from tpu_yolo.ops.nms import _greedy_keep
        return _greedy_keep(boxes, cls_idx, valid, iou_thres=thr)

    def _clustered(self, rng, b, k, nc=8, img=640.0):
        """Score-descending candidates with realistic redundant
        clusters (the emission pattern NMS exists to collapse) so
        suppression chains are exercised, not just pairwise kills."""
        n_obj = max(4, k // 24)
        centers = rng.uniform(40, img - 40, (b, n_obj, 2))
        sizes = rng.uniform(16, 160, (b, n_obj, 2))
        obj = rng.integers(0, n_obj, (b, k))
        jit_c = rng.normal(0, 6, (b, k, 2))
        jit_s = rng.uniform(0.85, 1.15, (b, k, 2))
        c = np.take_along_axis(centers, obj[..., None], 1) + jit_c
        s = np.take_along_axis(sizes, obj[..., None], 1) * jit_s
        boxes = np.concatenate([c - s / 2, c + s / 2], -1)
        cls = rng.integers(0, nc, (b, k))
        valid = rng.random((b, k)) > 0.1
        return (jnp.asarray(boxes, jnp.float32),
                jnp.asarray(cls, jnp.int32), jnp.asarray(valid))

    @pytest.mark.parametrize("b,k", [(2, 256), (1, 512), (3, 1024)])
    def test_matches_xla_clustered(self, b, k):
        from tpu_yolo.ops.nms_pallas import greedy_keep_pallas
        rng = np.random.default_rng(0)
        boxes, cls, valid = self._clustered(rng, b, k)
        got = greedy_keep_pallas(boxes, cls, valid, 0.65, interpret=True)
        want = self._xla_keep(boxes, cls, valid, 0.65)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_matches_xla_uniform_random(self):
        from tpu_yolo.ops.nms_pallas import greedy_keep_pallas
        rng = np.random.default_rng(1)
        b, k = 2, 512
        xy1 = rng.uniform(0, 600, (b, k, 2))
        wh = rng.uniform(4, 200, (b, k, 2))
        boxes = jnp.asarray(np.concatenate([xy1, xy1 + wh], -1),
                            jnp.float32)
        cls = jnp.asarray(rng.integers(0, 80, (b, k)), jnp.int32)
        valid = jnp.asarray(rng.random((b, k)) > 0.3)
        got = greedy_keep_pallas(boxes, cls, valid, 0.65, interpret=True)
        want = self._xla_keep(boxes, cls, valid, 0.65)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_gate(self):
        from tpu_yolo.ops.nms_pallas import use_pallas_nms
        # CPU backend in tests: never the compiled kernel
        assert not use_pallas_nms(1024)
