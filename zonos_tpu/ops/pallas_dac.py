"""Pallas TPU kernel: snake activation fused into a 1-D (dilated) convolution.

The DAC residual units are `snake -> conv(k=7, dilation d) -> snake ->
conv(k=1)` chains (transformers modeling_dac.DacResidualUnit); a naive
lowering runs the snake as a separate elementwise kernel that round-trips
activations through HBM.  Here the snake is computed in VMEM as the conv's
input prologue and the conv is expressed as k shifted [T_tile, C_in] x
[C_in, C_out_tile] MXU contractions.

The (snake'd, halo-padded) input stays VMEM-resident across the grid (its
block index map is constant in the time/channel grid axes, so Pallas loads
it once per batch row); time windows for each output tile are sliced inside
the kernel, which is how overlapping halo reads are expressed.

Scope: sized for the DAC *decoder* trunk (frame-rate and low-upsample
levels, C >= 128, T up to a few thousand).  The full-audio-rate tail and the
encoder keep XLA's conv emitter (measured already far above real time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _snake_conv_kernel(x_ref, a_ref, w_ref, b_ref, o_ref, *, k, dilation, t_tile):
    """x [1, Tp+halo, C_in] (resident); w [k, C_in, C_out_t]; o [1, T_tile, C_out_t]."""
    ti = pl.program_id(1)
    halo = (k - 1) * dilation
    win = x_ref[0, pl.ds(ti * t_tile, t_tile + halo), :].astype(jnp.float32)
    alpha = a_ref[0].astype(jnp.float32)  # [C_in]
    s = jnp.sin(alpha * win)
    win = win + s * s / (alpha + 1e-9)  # snake prologue
    acc = jnp.zeros((t_tile, o_ref.shape[2]), jnp.float32)
    for j in range(k):
        xs = win[j * dilation : j * dilation + t_tile]
        acc += jax.lax.dot_general(
            xs, w_ref[j], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    o_ref[0] = (acc + b_ref[0]).astype(o_ref.dtype)


def snake_conv1d_pallas(
    x: jnp.ndarray,  # [B, T, C_in]
    alpha: jnp.ndarray,  # [C_in]
    w: jnp.ndarray,  # [k, C_in, C_out]
    b: jnp.ndarray,  # [C_out]
    dilation: int = 1,
    t_tile: int = 128,
    c_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``conv1d(snake(x, alpha), w, b)`` with 'same' padding (odd k)."""
    B, T, C_in = x.shape
    k, _, C_out = w.shape
    assert k % 2 == 1
    halo = (k - 1) * dilation
    t_tile = min(t_tile, max(8, T))
    pad_t = (-T) % t_tile
    xp = jnp.pad(x, ((0, 0), (halo // 2, halo - halo // 2 + pad_t), (0, 0)))
    Tp = T + pad_t
    pad_c = (-C_out) % c_tile
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, pad_c)))
    bp = jnp.pad(b, (0, pad_c))
    n_t, n_c = Tp // t_tile, (C_out + pad_c) // c_tile

    kernel = functools.partial(_snake_conv_kernel, k=k, dilation=dilation, t_tile=t_tile)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_t, n_c),
        in_specs=[
            pl.BlockSpec((1, Tp + halo, C_in), lambda bi, ti, ci: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C_in), lambda bi, ti, ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, C_in, c_tile), lambda bi, ti, ci: (0, 0, ci), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_tile), lambda bi, ti, ci: (0, ci), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, c_tile), lambda bi, ti, ci: (bi, ti, ci), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C_out + pad_c), x.dtype),
        interpret=interpret,
    )(xp, alpha[None, :], wp, bp[None, :])
    return out[:, :T, :C_out]


def snake_residual_unit_pallas(
    p: dict, x: jnp.ndarray, dilation: int, interpret: bool = False
) -> jnp.ndarray:
    """Full DAC residual unit with both convs fused behind their snakes:
    ``x + conv1x1(snake2(conv_k7_dil(snake1(x))))``."""
    y = snake_conv1d_pallas(
        x, p["alpha1"], p["conv1"]["w"], p["conv1"]["b"], dilation=dilation,
        interpret=interpret,
    )
    y = snake_conv1d_pallas(
        y, p["alpha2"], p["conv2"]["w"], p["conv2"]["b"], dilation=1,
        interpret=interpret,
    )
    return x + y
