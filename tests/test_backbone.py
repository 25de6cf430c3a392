"""Transformer backbone tests: RoPE oracle, prefill/decode consistency, GQA."""

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.config import BackboneConfig
from zonos_tpu.models.backbone import (
    KVCache,
    init_transformer_params,
    transformer_decode_step,
    transformer_prefill,
)
from zonos_tpu.ops.rope import apply_rope, rope_table

CFG = BackboneConfig(
    d_model=64,
    n_layer=2,
    attn_mlp_d_intermediate=128,
    attn_cfg={"num_heads": 4, "num_heads_kv": 2},
)


def test_rope_complex_oracle():
    """Interleaved rotation == complex multiplication by e^{i t w}."""
    D, S = 16, 5
    cos, sin = rope_table(D, max_pos=32)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, S, 2, D)).astype(np.float32)
    got = np.asarray(apply_rope(jnp.asarray(x), cos[:S], sin[:S]))

    inv_freq = 1.0 / (10000 ** (np.arange(0, D, 2) / D))
    ang = np.outer(np.arange(S), inv_freq)  # [S, D/2]
    z = x[..., 0::2] + 1j * x[..., 1::2]  # [1,S,2,D/2]
    rot = z * np.exp(1j * ang)[None, :, None, :]
    expect = np.empty_like(x)
    expect[..., 0::2] = rot.real
    expect[..., 1::2] = rot.imag
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_prefill_matches_stepwise_decode():
    """Prefill over S tokens == prefill over S-3 + 3 single-token steps."""
    key = jax.random.key(0)
    params = init_transformer_params(key, CFG, dtype=jnp.float32)
    B, S, S_max = 2, 9, 16
    x = jax.random.normal(jax.random.key(1), (B, S, CFG.d_model), jnp.float32)

    cache_a = KVCache.create(CFG, B, S_max, jnp.float32)
    h_full, _ = transformer_prefill(CFG, params, x, cache_a)

    cache_b = KVCache.create(CFG, B, S_max, jnp.float32)
    split = S - 3
    h_prefix, cache_b = transformer_prefill(CFG, params, x[:, :split], cache_b)
    steps = []
    for t in range(split, S):
        h_t, cache_b = transformer_decode_step(CFG, params, x[:, t : t + 1], cache_b, jnp.int32(t))
        steps.append(h_t)
    h_steps = jnp.concatenate(steps, axis=1)

    np.testing.assert_allclose(
        np.asarray(h_full[:, split:]), np.asarray(h_steps), rtol=2e-4, atol=2e-4
    )


def test_causality():
    """Changing a later token must not affect earlier hidden states."""
    params = init_transformer_params(jax.random.key(0), CFG, dtype=jnp.float32)
    B, S, S_max = 1, 8, 8
    x = jax.random.normal(jax.random.key(2), (B, S, CFG.d_model), jnp.float32)
    h1, _ = transformer_prefill(CFG, params, x, KVCache.create(CFG, B, S_max, jnp.float32))
    x2 = x.at[:, -1].set(0.0)
    h2, _ = transformer_prefill(CFG, params, x2, KVCache.create(CFG, B, S_max, jnp.float32))
    np.testing.assert_allclose(np.asarray(h1[:, :-1]), np.asarray(h2[:, :-1]), rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(h1[:, -1]), np.asarray(h2[:, -1]))


def test_gqa_head_sharing():
    """With num_heads_kv < num_heads the cache stays at kv-head width."""
    B, S_max = 1, 4
    cache = KVCache.create(CFG, B, S_max)
    assert cache.k.shape == (CFG.n_layer, B, 2, S_max, CFG.d_model // 4)


def test_decode_attention_split_matches_update_then_attend():
    """Split attention (cache read-only + held-out current row) is numerically
    identical to writing the row and attending with length=pos+1."""
    from zonos_tpu.ops.attention import (
        decode_attention,
        decode_attention_split,
        update_kv_cache,
    )

    rng = np.random.default_rng(0)
    B, H, Hkv, D, S_max = 2, 4, 2, 16, 12
    pos = 7
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    k_cache = jnp.asarray(rng.normal(size=(B, Hkv, S_max, D)), jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(B, Hkv, S_max, D)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, 1, Hkv, D)), jnp.float32)

    got = decode_attention_split(q, k_cache, v_cache, k_new, v_new, jnp.int32(pos))
    k_upd, v_upd = update_kv_cache(k_cache, v_cache, k_new, v_new, jnp.int32(pos))
    want = decode_attention(q, k_upd, v_upd, length=jnp.int32(pos + 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_prefill_writes_cache_rows():
    """After prefill, the cache holds exactly the prompt's k/v rows and
    decode continues consistently from them (covers the post-scan batched
    cache write)."""
    params = init_transformer_params(jax.random.key(0), CFG, dtype=jnp.float32)
    B, S, S_max = 2, 6, 16
    x = jax.random.normal(jax.random.key(1), (B, S, CFG.d_model), jnp.float32)
    cache = KVCache.create(CFG, B, S_max, jnp.float32)
    _, cache2 = transformer_prefill(CFG, params, x, cache)
    k = np.asarray(cache2.k)
    assert (k[:, :, :, S:, :] == 0).all(), "rows beyond the prompt must stay zero"
    assert np.abs(k[:, :, :, :S, :]).sum() > 0, "prompt rows must be written"


def test_int8_kv_cache_close(monkeypatch):
    """ZONOS_TPU_KV_INT8=1: int8 cache rows with per-row scales must track
    the bf16 cache closely (lossy serving mode; error ~0.4%/row)."""
    from zonos_tpu.models.backbone import transformer_decode_step, transformer_prefill

    params = init_transformer_params(jax.random.key(0), CFG, dtype=jnp.bfloat16)
    B, S, S_max = 2, 6, 16
    x = jax.random.normal(jax.random.key(1), (B, S, CFG.d_model), jnp.bfloat16)
    steps = [jax.random.normal(jax.random.key(2 + t), (B, 1, CFG.d_model), jnp.bfloat16)
             for t in range(4)]

    def run():
        cache = KVCache.create(CFG, B, S_max)
        h, cache = transformer_prefill(CFG, params, x, cache)
        outs = [np.asarray(h, np.float32)]
        for t, xt in enumerate(steps):
            h, cache = transformer_decode_step(CFG, params, xt, cache, jnp.int32(S + t))
            outs.append(np.asarray(h, np.float32))
        return np.concatenate([o.reshape(B, -1) for o in outs], axis=1), cache

    monkeypatch.setenv("ZONOS_TPU_KV_INT8", "0")
    ref, cache_ref = run()
    assert not cache_ref.quantized
    monkeypatch.setenv("ZONOS_TPU_KV_INT8", "1")
    got, cache_q = run()
    assert cache_q.quantized and cache_q.k.dtype == jnp.int8
    err = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-6)
    assert err < 0.05, f"int8 KV diverged: rel err {err:.4f}"


def test_int8_kv_cache_grow(monkeypatch):
    monkeypatch.setenv("ZONOS_TPU_KV_INT8", "1")
    cache = KVCache.create(CFG, 2, 64)
    grown = cache.grow(128)
    assert grown.k.shape[3] == 128 and grown.k_scale.shape[3] == 128
    assert grown.k.dtype == jnp.int8


def test_f8_kv_cache_close(monkeypatch):
    """ZONOS_TPU_KV_F8=1: scale-free float8_e4m3fn cache rows must track the
    bf16 cache (lossy serving mode; ~2.2% elementwise storage error averages
    out over the attention contractions)."""
    from zonos_tpu.models.backbone import transformer_decode_step, transformer_prefill

    params = init_transformer_params(jax.random.key(0), CFG, dtype=jnp.bfloat16)
    B, S, S_max = 2, 6, 16
    x = jax.random.normal(jax.random.key(1), (B, S, CFG.d_model), jnp.bfloat16)
    steps = [jax.random.normal(jax.random.key(2 + t), (B, 1, CFG.d_model), jnp.bfloat16)
             for t in range(4)]

    def run():
        cache = KVCache.create(CFG, B, S_max)
        h, cache = transformer_prefill(CFG, params, x, cache)
        outs = [np.asarray(h, np.float32)]
        for t, xt in enumerate(steps):
            h, cache = transformer_decode_step(CFG, params, xt, cache, jnp.int32(S + t))
            outs.append(np.asarray(h, np.float32))
        return np.concatenate([o.reshape(B, -1) for o in outs], axis=1), cache

    monkeypatch.setenv("ZONOS_TPU_KV_F8", "0")
    ref, cache_ref = run()
    assert cache_ref.k.dtype == jnp.bfloat16
    monkeypatch.setenv("ZONOS_TPU_KV_F8", "1")
    got, cache_q = run()
    assert not cache_q.quantized and cache_q.k.dtype == jnp.float8_e4m3fn
    err = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-6)
    assert err < 0.08, f"f8 KV diverged: rel err {err:.4f}"


def test_f8_kv_cache_grow(monkeypatch):
    monkeypatch.setenv("ZONOS_TPU_KV_F8", "1")
    cache = KVCache.create(CFG, 2, 64)
    grown = cache.grow(128)
    assert grown.k.shape[3] == 128 and grown.k.dtype == jnp.float8_e4m3fn
    assert grown.k_scale is None
