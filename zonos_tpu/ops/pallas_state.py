"""Pallas fused Mamba2 decode-state kernel (the r3 verdict's named escape
hatch, PERFORMANCE.md "fused VMEM state kernel").

One kernel call per mamba layer per decode step fuses the state's BOTH
consumers over a single VMEM-resident block:

    y  = Σ_n  state · C          (the output contraction)
    s' = state · dA + xdt ⊗ B    (the recurrence update)

so the [B·H, P, N] state is read from HBM exactly once and written exactly
once per step — the XLA schedule reads it for the contraction and again
for the update when its multi-output fusion splits (measured in
docs/PERFORMANCE.md r4).  The grid tiles the fused (batch·head) axis;
block sizes keep in+out blocks ≤ ~4 MB so Mosaic can double-buffer inside
~16 MB VMEM.

Storage dtype: the production f8 mode needs float8 loads/stores in Mosaic;
where unsupported, the caller falls back to the XLA path.  Opt-in via
``ZONOS_TPU_FUSED_STATE=1`` (models/hybrid.py wiring) — measured results
recorded in docs/PERFORMANCE.md either way, like every other kernel here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F8_MAX = 448.0


def _kernel(s_ref, c_ref, b_ref, da_ref, xdt_ref, y_ref, out_ref,
            *, store_f8: bool):
    s = s_ref[...].astype(jnp.float32)          # [TB, P, N]
    c = c_ref[...].astype(jnp.float32)          # [TB, N]
    y_ref[...] = jnp.sum(s * c[:, None, :], axis=-1)  # [TB, P]
    ns = (s * da_ref[...].astype(jnp.float32)[:, :, None]
          + xdt_ref[...].astype(jnp.float32)[..., None]
          * b_ref[...].astype(jnp.float32)[:, None, :])
    if store_f8:
        ns = jnp.clip(ns, -_F8_MAX, _F8_MAX)
    out_ref[...] = ns.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def fused_state_step(
    state: jnp.ndarray,  # [BH, P, N] storage dtype (f8 / bf16 / f32)
    Ch: jnp.ndarray,     # [BH, N] f32
    Bh: jnp.ndarray,     # [BH, N] f32
    dA: jnp.ndarray,     # [BH, 1] f32
    xdt: jnp.ndarray,    # [BH, P] f32
    block: int = 256,
    interpret: bool = False,
):
    """Returns (y [BH, P] f32, new_state [BH, P, N] same dtype as input).

    Measured (flagship batch 64, f8, tools/hybrid_breakdown.py
    state_fused): **1.83 ms/layer vs 0.699 for the XLA pipeline — a 2.6×
    LOSS.**  The single-read/single-write VMEM fusion cannot buy back the
    per-grid-step overhead (32 steps at block=256) plus Mosaic's software
    f8 conversion cost, and XLA's multi-output fusion already shares most
    of the state read.  The r3 verdict's named escape hatch is hereby
    measured and closed; kept as an opt-in correctness baseline like the
    other Pallas kernels (docs/PERFORMANCE.md).
    """
    BH, P, N = state.shape
    if state.dtype.itemsize > 1:
        block = min(block, 128)  # bf16/f32 blocks OOM scoped VMEM at 256
    while BH % block:
        block //= 2
    store_f8 = state.dtype == jnp.float8_e4m3fn
    grid = (BH // block,)
    y, out = pl.pallas_call(
        functools.partial(_kernel, store_f8=store_f8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, P, N), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, N), lambda i: (i, 0)),
            pl.BlockSpec((block, N), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, P), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, P), lambda i: (i, 0)),
            pl.BlockSpec((block, P, N), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, P), jnp.float32),
            jax.ShapeDtypeStruct((BH, P, N), state.dtype),
        ],
        interpret=interpret,
    )(state, Ch, Bh, dA, xdt)
    return y, out
