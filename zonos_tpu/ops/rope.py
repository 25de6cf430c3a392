"""Rotary position embeddings.

Equivalent math to the reference (zonos/backbone/_torch.py:9-30): interleaved
(real, imag) pairs along the head dim, base-10000 frequencies, fp32 rotation.
The cos/sin table is a small fp32 constant ([max_pos, head_dim/2] * 2) that
lives in HBM and is gathered per step by position — cheap, and keeps the
decode step free of trig.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_ROPE_POSITIONS = 16384  # matches the reference table (zonos/backbone/_torch.py:67)


def rope_table(head_dim: int, max_pos: int = MAX_ROPE_POSITIONS, base: float = 10000.0):
    """Return (cos, sin), each ``[max_pos, head_dim // 2]`` fp32."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / (base**exponents)  # [head_dim/2]
    t = jnp.arange(max_pos, dtype=jnp.float32)
    angles = jnp.outer(t, inv_freq)  # [max_pos, head_dim/2]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x`` ``[..., S, H, D]`` by per-position cos/sin ``[..., S, D/2]``.

    Pairs are interleaved: (x[..., 0], x[..., 1]) is the first complex pair,
    matching the reference layout (zonos/backbone/_torch.py:18-30).
    """
    xf = x.astype(jnp.float32)
    xr = xf[..., 0::2]
    xi = xf[..., 1::2]
    cos = cos[..., :, None, :]  # broadcast over heads: [..., S, 1, D/2]
    sin = sin[..., :, None, :]
    or_ = xr * cos - xi * sin
    oi = xi * cos + xr * sin
    out = jnp.stack([or_, oi], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def apply_rope_neox(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """GPT-NeoX-style rotation: pair dim ``i`` with dim ``i + D/2`` (rotate
    halves) instead of adjacent pairs.

    This is the convention of the hybrid backbone's attention layers: the
    reference builds them from mamba_ssm's MHA, whose RotaryEmbedding
    defaults to ``interleaved=False`` = NeoX halves (flash-attn rotary;
    ref surface zonos/backbone/_mamba_ssm.py:16-34 via create_block).
    The pure-torch transformer backbone uses the interleaved layout
    (:func:`apply_rope`); the two differ for any trained checkpoint.
    """
    D = x.shape[-1]
    xf = x.astype(jnp.float32)
    x1 = xf[..., : D // 2]
    x2 = xf[..., D // 2 :]
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)
