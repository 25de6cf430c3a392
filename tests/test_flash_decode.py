"""Flash-decode (length-aware blocked) attention vs the XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_tpu.ops.attention import decode_attention
from zonos_tpu.ops.pallas_kernels import flash_decode_attention_pallas


@pytest.mark.parametrize("length", [1, 17, 256, 300, 511, 512])
def test_matches_xla_for_lengths(length):
    rng = np.random.default_rng(length)
    B, H, Hkv, S, D = 2, 4, 2, 512, 128
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    ref = decode_attention(q, k, v, jnp.int32(length))
    got = flash_decode_attention_pallas(q, k, v, jnp.int32(length),
                                        block_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_beyond_length_garbage_ignored():
    rng = np.random.default_rng(0)
    B, H, Hkv, S, D = 1, 2, 1, 256, 128
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    a = flash_decode_attention_pallas(q, k, v, jnp.int32(40), block_s=64, interpret=True)
    # large finite garbage (NaN would poison 0*NaN products, as in any
    # masked-softmax attention including the XLA path)
    k2 = k.at[:, :, 40:].set(1e9)
    v2 = v.at[:, :, 40:].set(-1e9)
    b = flash_decode_attention_pallas(q, k2, v2, jnp.int32(40), block_s=64, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
