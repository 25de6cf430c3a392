"""Numerical parity of the transformer backbone against an independent torch
oracle implementing the reference semantics (zonos/backbone/_torch.py:9-152:
pre-LN LayerNorm blocks, fused QKV, interleaved base-10000 RoPE, GQA SDPA,
SwiGLU MLP, final LayerNorm).  The oracle is written from the documented
math (SURVEY.md §2.1), not ported code; agreement here means a real
reference checkpoint produces the same hidden states in both frameworks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_tpu.config import BackboneConfig
from zonos_tpu.models.backbone import init_transformer_params, transformer_forward

CFG = BackboneConfig(
    d_model=64,
    n_layer=3,
    attn_mlp_d_intermediate=128,
    attn_cfg={"num_heads": 4, "num_heads_kv": 2},
)


def _torch_oracle(torch, p, x, cfg: BackboneConfig):
    """Reference-semantics forward in torch fp32. p: numpy params (stacked)."""
    F = torch.nn.functional
    H, Hkv, hd = cfg.num_heads, cfg.num_heads_kv, cfg.head_dim
    B, S, d = x.shape
    x = torch.tensor(np.asarray(x, np.float32))

    # interleaved RoPE: pairs (0,1),(2,3),... rotated by base-10000 angles
    inv_freq = 1.0 / (10000.0 ** (torch.arange(0, hd, 2, dtype=torch.float32) / hd))
    angles = torch.outer(torch.arange(S, dtype=torch.float32), inv_freq)  # [S, hd/2]
    freqs_cis = torch.polar(torch.ones_like(angles), angles)  # complex [S, hd/2]

    def rope(t):  # [B, S, h, hd]
        tc = torch.view_as_complex(t.reshape(*t.shape[:-1], hd // 2, 2))
        out = torch.view_as_real(tc * freqs_cis[None, :, None, :])
        return out.reshape(t.shape)

    def ln(t, w, b):
        return F.layer_norm(t, (d,), torch.tensor(w), torch.tensor(b), cfg.norm_epsilon)

    for i in range(cfg.n_layer):
        h = ln(x, p["norm1_scale"][i], p["norm1_bias"][i])
        qkv = h @ torch.tensor(p["wqkv"][i])
        q, k, v = torch.split(qkv, [H * hd, Hkv * hd, Hkv * hd], dim=-1)
        q = rope(q.reshape(B, S, H, hd))
        k = rope(k.reshape(B, S, Hkv, hd))
        v = v.reshape(B, S, Hkv, hd)
        y = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            is_causal=True, enable_gqa=True,
        )
        y = y.transpose(1, 2).reshape(B, S, H * hd) @ torch.tensor(p["wo"][i])
        x = x + y
        h = ln(x, p["norm2_scale"][i], p["norm2_bias"][i])
        u, gate = torch.chunk(h @ torch.tensor(p["w1"][i]), 2, dim=-1)
        x = x + (u * F.silu(gate)) @ torch.tensor(p["w2"][i])
    return ln(x, p["normf_scale"], p["normf_bias"]).numpy()


def test_transformer_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    params = init_transformer_params(jax.random.key(0), CFG, dtype=jnp.float32)
    np_p = {**{k: np.asarray(v) for k, v in params["layers"].items()},
            "normf_scale": np.asarray(params["normf_scale"]),
            "normf_bias": np.asarray(params["normf_bias"])}
    x = np.asarray(jax.random.normal(jax.random.key(1), (2, 7, CFG.d_model), jnp.float32))

    got = np.asarray(transformer_forward(CFG, params, jnp.asarray(x)))
    want = _torch_oracle(torch, np_p, x, CFG)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_transformer_prefill_matches_torch_oracle():
    """The cached prefill path (the one generate() uses) matches too."""
    torch = pytest.importorskip("torch")
    from zonos_tpu.models.backbone import KVCache, transformer_prefill

    params = init_transformer_params(jax.random.key(0), CFG, dtype=jnp.float32)
    np_p = {**{k: np.asarray(v) for k, v in params["layers"].items()},
            "normf_scale": np.asarray(params["normf_scale"]),
            "normf_bias": np.asarray(params["normf_bias"])}
    x = np.asarray(jax.random.normal(jax.random.key(1), (2, 7, CFG.d_model), jnp.float32))

    cache = KVCache.create(CFG, 2, 16, jnp.float32)
    got, _ = transformer_prefill(CFG, params, jnp.asarray(x), cache)
    want = _torch_oracle(torch, np_p, x, CFG)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
