"""Fused layer-tail decode kernel vs the XLA reference math (interpret
mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zonos_tpu.models.backbone import matmul_w, quantize_weight_int8
from zonos_tpu.ops.norms import layer_norm
from zonos_tpu.ops.pallas_decode import fused_layer_tail_pallas


def _reference_tail(attn_out, resid, wo, ln_s, ln_b, w1, w2, eps):
    """The exact tail of backbone._mix with int8-dict weights."""
    y = matmul_w(attn_out, wo)
    x = resid + y.astype(resid.dtype)
    h = layer_norm(x, ln_s, ln_b, eps)
    u, gate = jnp.split(matmul_w(h, w1), 2, axis=-1)
    return x + matmul_w(u * jax.nn.silu(gate), w2).astype(x.dtype)


import jax  # noqa: E402  (after jnp import for the reference fn)


@pytest.mark.parametrize("dims", [(256, 256, 1024), (256, 512, 512)])
def test_matches_xla_tail(dims):
    d, dk, inter = dims
    rng = np.random.default_rng(d + dk)
    B2 = 2
    attn_out = jnp.asarray(rng.normal(size=(B2, dk)) * 0.1, jnp.bfloat16)
    resid = jnp.asarray(rng.normal(size=(B2, d)), jnp.bfloat16)
    wo = quantize_weight_int8(jnp.asarray(rng.normal(size=(dk, d)) * 0.05, jnp.float32))
    w1 = quantize_weight_int8(jnp.asarray(rng.normal(size=(d, 2 * inter)) * 0.05, jnp.float32))
    w2 = quantize_weight_int8(jnp.asarray(rng.normal(size=(inter, d)) * 0.05, jnp.float32))
    ln_s = jnp.asarray(rng.normal(size=(d,)) * 0.2 + 1.0, jnp.bfloat16)
    ln_b = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.bfloat16)

    ref = _reference_tail(attn_out, resid, wo, ln_s, ln_b, w1, w2, 1e-5)
    got = fused_layer_tail_pallas(
        attn_out, resid, wo["q"], wo["s"], ln_s, ln_b,
        w1["q"], w1["s"], w2["q"], w2["s"],
        eps=1e-5, two=128, tu=128, interpret=True,
    )
    r, g = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    scale = np.abs(r).max()
    np.testing.assert_allclose(g, r, atol=0.02 * scale)


def test_rejects_nondividing_dims():
    B2, d, inter = 2, 200, 512
    z = jnp.zeros
    with pytest.raises(ValueError):
        fused_layer_tail_pallas(
            z((B2, d), jnp.bfloat16), z((B2, d), jnp.bfloat16),
            z((d, d), jnp.int8), z((d,), jnp.bfloat16),
            z((d,)), z((d,)),
            z((d, 2 * inter), jnp.int8), z((2 * inter,), jnp.bfloat16),
            z((inter, d), jnp.int8), z((d,), jnp.bfloat16),
            two=128, tu=128, interpret=True,
        )
