"""Pallas TPU kernel for the Mamba2 selective-scan (SSD) prefill.

North-star kernel (BASELINE.json): the hybrid backbone's selective scan.
Replaces the reference's mamba_ssm CUDA/Triton kernels
(zonos/backbone/_mamba_ssm.py:3-34).  The pure-XLA twin is
:func:`zonos_tpu.ops.ssm.ssd_chunked` — used as the CPU/test fallback and
the numerical reference.

Why a kernel: the XLA chunked formulation materializes the per-chunk
attention-like weights (``[B, nc, Q, Q, H]``) and the decay tensors in HBM
between fusions.  Here one grid step processes one (batch, chunk) tile
entirely in VMEM — intra-chunk contraction, chunk-summary state, and the
inter-chunk recurrence — with the running state ``[H, P, N]`` held in a VMEM
scratch that persists across the (sequential) chunk axis of the grid.  HBM
traffic drops to exactly one read of x/dt/B/C and one write of y.

Layouts are head-major (``[B, H, L, ...]``) so the per-head loop indexes the
leading axis of each tile; the time axis is pre-split into ``[nc, chunk]``
so every block dimension is either full or lane/sublane aligned.  With
``ngroups == 1`` (the Zonos hybrid config) the ``C·Bᵀ`` Gram matrix is
shared across heads and computed once per chunk.  The skip term ``x·D`` is
left to XLA (a trivially fused elementwise op).

Measured on v5e (B=2, L=1024, H=32, P=64, N=128): 126.7 ms vs 7.5 ms for
the XLA twin — the statically-unrolled per-head loop works on [1, 64] /
[64, 64] tiles that use a fraction of the 8x128 VPU lanes, while XLA's
batched einsums keep H in the minor dimension and vectorize across heads.
Like the decode-attention kernels (ops/attention.py:use_pallas), this stays
an opt-in (``ZONOS_TPU_PALLAS=1``) correctness baseline; the XLA chunked
formulation is the production path.  A faster kernel would need
head-batched dots ([H, Q, Q] x [H, Q, P]) instead of the unrolled loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ssd_kernel(x_ref, dt_ref, da_ref, b_ref, c_ref, init_ref,
                y_ref, fs_ref, h_ref, s_ref, *, n_heads: int,
                head_tile: int = 8):
    """One (batch, chunk) tile.

    x    [1, H, 1, Q, P]   dt/dA [1, 1, H, Q]   B/C [1, 1, Q, N]
    init [1, H, P, N]      y like x             fs [1, H, P, N]
    h    scratch [H, P, N] f32 — the running inter-chunk state.
    s    scratch [H, Q] f32 — within-chunk cumulative log-decay (staged in
         a ref because slices below may only *statically* index refs).

    HEAD-BATCHED (r4, the r3 verdict's #9): the original per-head loop
    worked on [1, Q] / [Q, Q]=[64, 64] tiles that use a fraction of the
    8x128 lanes and measured 17x slower than the XLA twin.  Now each inner
    iteration processes ``head_tile`` heads at once:

    - intra-chunk: ONE [T·Q, T·Q] x [T·Q, P] dot with a block-diagonal
      causal-masked weight (the cross-head quadrants are masked to -inf
      BEFORE the exp — cross-head s-differences overflow otherwise);
    - state update: B is shared across heads (G=1), so stacking heads in
      COLUMNS gives the per-head blocks exactly: [Q, T·P] x [Q, N] -> one
      dot, no cross terms;
    - inter-chunk: full-cross [T·Q, N] x [T·P, N]ᵀ dot (T× the FLOPs —
      noise), wanted diagonal blocks taken by static slices.
    """
    chunk_idx = pl.program_id(1)

    @pl.when(chunk_idx == 0)
    def _():
        h_ref[...] = init_ref[0]

    Bg = b_ref[0, 0]          # [Q, N]
    Cg = c_ref[0, 0]          # [Q, N]
    Q = Bg.shape[0]

    qi = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
    qj = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
    # within-chunk cumulative log-decay as a triangular matmul (Mosaic has
    # no cumsum lowering, and the MXU does this in one pass anyway)
    s_ref[...] = jnp.dot(da_ref[0, 0], (qi <= qj).astype(jnp.float32),
                         preferred_element_type=jnp.float32)  # [H, Q]
    cb = jax.lax.dot_general(  # [Q, Q] = C @ Bᵀ, shared across heads (G=1)
        Cg, Bg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    T = head_tile
    while n_heads % T:
        T //= 2
    TQ, neg = T * Q, jnp.float32(-1e30)
    # block-diagonal causal mask over the combined (head, time) index
    ui = jax.lax.broadcasted_iota(jnp.int32, (TQ, TQ), 0)
    vj = jax.lax.broadcasted_iota(jnp.int32, (TQ, TQ), 1)
    same_head = (ui // Q) == (vj // Q)
    causal2 = same_head & ((ui % Q) >= (vj % Q))
    cb2 = jnp.where(causal2, _tile2(cb, T), 0.0)

    for t in range(n_heads // T):
        hs = slice(t * T, (t + 1) * T)
        sh = s_ref[hs, :]                                       # [T, Q]
        dth = dt_ref[0, 0, hs, :]                               # [T, Q]
        xt = x_ref[0, hs, 0]                                    # [T, Q, P]
        s_last = sh[:, Q - 1 :]                                 # [T, 1]
        x2 = xt.reshape(TQ, xt.shape[-1])                       # [T·Q, P]
        s_flat_i = sh.reshape(TQ, 1)                            # [T·Q, 1]
        s_flat_j = sh.reshape(1, TQ)

        # intra-chunk: w[ui, vj] = (C_i·B_j) e^{s_i - s_j} dt_j on the
        # block diagonal; exp AFTER masking (s differs wildly across heads)
        logdecay = jnp.where(causal2, s_flat_i - s_flat_j, neg)
        w2 = cb2 * jnp.exp(logdecay) * dth.reshape(1, TQ)
        y2 = jnp.dot(w2, x2, preferred_element_type=jnp.float32)  # [T·Q, P]

        # inter-chunk: full-cross dot, diagonal blocks wanted
        Cs2 = (Cg[None, :, :] * jnp.exp(sh)[:, :, None]).reshape(TQ, -1)
        h2 = h_ref[hs].reshape(T * h_ref.shape[1], -1)          # [T·P, N]
        yc = jax.lax.dot_general(                               # [T·Q, T·P]
            Cs2, h2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        P = xt.shape[-1]
        for u in range(T):
            y_ref[0, t * T + u, 0] = (
                y2[u * Q : (u + 1) * Q]
                + yc[u * Q : (u + 1) * Q, u * P : (u + 1) * P]
            )

        # state update: B shared -> stack heads in columns, one dot
        tail = jnp.exp(s_last - sh) * dth                       # [T, Q]
        xtail = xt * tail[:, :, None]                           # [T, Q, P]
        xcols = xtail.transpose(1, 0, 2).reshape(Q, T * P)      # [Q, T·P]
        S2 = jax.lax.dot_general(                               # [T·P, N]
            xcols, Bg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h_ref[hs] = (h_ref[hs] * jnp.exp(s_last)[:, :, None]
                     + S2.reshape(T, P, -1))

    fs_ref[0] = h_ref[...]


def _tile2(m: jnp.ndarray, t: int) -> jnp.ndarray:
    """Tile a [Q, Q] matrix to [t·Q, t·Q] (block repetition)."""
    Q = m.shape[0]
    return jnp.broadcast_to(m[None, :, None, :], (t, Q, t, Q)).reshape(t * Q, t * Q)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def ssd_chunked_pallas(
    x: jnp.ndarray,   # [B, L, H, P] f32
    dt: jnp.ndarray,  # [B, L, H] f32 (already softplus'd)
    A: jnp.ndarray,   # [H]
    Bm: jnp.ndarray,  # [B, L, 1, N]
    Cm: jnp.ndarray,  # [B, L, 1, N]
    D: jnp.ndarray,   # [H]
    init_state: jnp.ndarray | None = None,  # [B, H, P, N]
    chunk: int = 64,
    interpret: bool = False,
):
    """Drop-in twin of :func:`zonos_tpu.ops.ssm.ssd_chunked` for ngroups=1."""
    Bsz, L, H, P = x.shape
    N = Bm.shape[-1]
    if Bm.shape[2] != 1:
        raise ValueError("pallas SSD kernel requires ngroups == 1")
    pad = (-L) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Lp = L + pad
    nc = Lp // chunk

    f32 = jnp.float32
    # head-major, time split into [nc, chunk] so blocks are full-dim aligned
    xt = jnp.transpose(x, (0, 2, 1, 3)).astype(f32).reshape(Bsz, H, nc, chunk, P)
    # dt/dA ordered [B, nc, H, chunk]: the last two block dims must be
    # sublane/lane aligned, so nc cannot sit second-minor
    dtt = jnp.transpose(dt.reshape(Bsz, nc, chunk, H), (0, 1, 3, 2)).astype(f32)
    dat = dtt * A.astype(f32)[None, None, :, None]
    Bg = Bm[:, :, 0].astype(f32).reshape(Bsz, nc, chunk, N)
    Cg = Cm[:, :, 0].astype(f32).reshape(Bsz, nc, chunk, N)
    h0 = (
        jnp.zeros((Bsz, H, P, N), f32)
        if init_state is None
        else init_state.astype(f32)
    )

    grid = (Bsz, nc)
    yt, fs = pl.pallas_call(
        functools.partial(_ssd_kernel, n_heads=H),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, 1, chunk, P), lambda b, c: (b, 0, c, 0, 0)),
            pl.BlockSpec((1, 1, H, chunk), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, 1, H, chunk), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, 1, chunk, N), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, 1, chunk, N), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, H, P, N), lambda b, c: (b, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, H, 1, chunk, P), lambda b, c: (b, 0, c, 0, 0)),
            pl.BlockSpec((1, H, P, N), lambda b, c: (b, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bsz, H, nc, chunk, P), f32),
            jax.ShapeDtypeStruct((Bsz, H, P, N), f32),
        ],
        scratch_shapes=[pltpu.VMEM((H, P, N), f32), pltpu.VMEM((H, chunk), f32)],
        interpret=interpret,
    )(xt, dtt, dat, Bg, Cg, h0)

    y = jnp.transpose(yt.reshape(Bsz, H, Lp, P), (0, 2, 1, 3))[:, :L]
    y = y + x[:, :L] * D.astype(f32)[None, None, :, None]
    return y, fs
