"""Normalization primitives (LayerNorm / RMSNorm), fp32 statistics.

The reference transformer uses torch ``nn.LayerNorm`` (zonos/backbone/_torch.py:62,88,90)
and the hybrid uses fused residual+RMSNorm from mamba_ssm triton kernels
(zonos/backbone/_mamba_ssm.py:44-57).  On TPU, XLA fuses these elementwise
chains into neighbors automatically, so a hand kernel is unnecessary; what
matters is doing the statistics in fp32 while keeping I/O bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5,
             bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """``bias`` (additive, applied after scaling) covers mamba_ssm's
    ``layer_norm_fn(..., bias, is_rms_norm=True)``: the hybrid reference's
    final norm is an ``nn.LayerNorm`` module run through the triton kernel
    in RMS mode, so its bias IS applied even though no mean is subtracted
    (zonos/backbone/_mamba_ssm.py:36,50-57)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(ms + eps) * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def add_norm(
    x: jnp.ndarray,
    residual: jnp.ndarray | None,
    scale: jnp.ndarray,
    bias: jnp.ndarray | None,
    eps: float,
    use_rms: bool,
    residual_in_fp32: bool = False,
):
    """Fused (residual add) + norm, the hybrid backbone's layer glue.

    Returns ``(normed, new_residual)`` matching the semantics of
    mamba_ssm's ``layer_norm_fn(..., prenorm=True)`` used at
    zonos/backbone/_mamba_ssm.py:44-57.
    """
    res = x if residual is None else x + residual
    if residual_in_fp32:
        res = res.astype(jnp.float32)
    if use_rms:
        y = rms_norm(res, scale, eps)
    else:
        y = layer_norm(res, scale, bias, eps)
    return y, res
