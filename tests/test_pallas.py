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
