"""Pallas kernels vs their XLA twins (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.ops.attention import decode_attention
from zonos_tpu.ops.pallas_kernels import decode_attention_pallas, fused_sample_pallas


def test_decode_attention_matches_xla():
    rng = np.random.default_rng(0)
    B, H, Hkv, S, D = 2, 8, 2, 64, 128
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    length = jnp.int32(37)

    ref = decode_attention(q, k, v, length)
    got = decode_attention_pallas(q, k, v, length, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_decode_attention_respects_length_mask():
    rng = np.random.default_rng(1)
    B, H, Hkv, S, D = 1, 4, 2, 32, 128
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    out_a = decode_attention_pallas(q, k, v, jnp.int32(10), interpret=True)
    # garbage beyond the valid length must not matter
    k2 = k.at[:, :, 10:].set(1e9)
    v2 = v.at[:, :, 10:].set(-1e9)
    out_b = decode_attention_pallas(q, k2, v2, jnp.int32(10), interpret=True)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-5)


def test_fused_sampling_greedy_limit():
    """With a near-deterministic distribution the race must pick the mode."""
    B, K, V = 2, 9, 1152
    logits = jnp.full((B, K, V), -30.0)
    target = np.arange(B * K).reshape(B, K) % 1024
    logits = logits.at[
        np.arange(B)[:, None], np.arange(K)[None, :], target
    ].set(30.0)
    ids = fused_sample_pallas(jax.random.key(7), logits, linear=0.55, conf=0.4,
                              quad=0.0, min_p=0.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(ids), target)


def test_fused_sampling_distribution():
    V = 128
    base = np.full(V, -1e9, np.float32)
    base[:4] = np.log([0.6, 0.3, 0.08, 0.02])
    logits = jnp.asarray(np.tile(base, (1, 1, 1)))
    # batch the draws through one kernel call: each batch row gets its own
    # independent gumbel noise, so B rows = B draws
    n = 512
    logits_b = jnp.tile(logits, (n, 1, 1))
    ids = fused_sample_pallas(jax.random.key(0), logits_b, linear=0.0, conf=0.0,
                              quad=0.0, min_p=0.0, interpret=True)
    counts = np.bincount(np.asarray(ids)[:, 0], minlength=4)[:4]
    freq = counts / n
    np.testing.assert_allclose(freq, [0.6, 0.3, 0.08, 0.02], atol=0.08)


def test_fused_sampling_min_p():
    V = 128
    base = np.full(V, -1e9, np.float32)
    base[:3] = np.log([0.7, 0.25, 0.05])
    logits = jnp.asarray(np.tile(base, (64, 1, 1)))
    ids = fused_sample_pallas(jax.random.key(0), logits, linear=0.0, conf=0.0,
                              quad=0.0, min_p=0.2, interpret=True)
    assert np.isin(np.asarray(ids), [0, 1]).all()  # 0.05 < 0.2*0.7 filtered out
