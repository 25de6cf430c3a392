"""Fused transformer-layer tail for the bandwidth-bound decode step.

Motivation (measured, tools/decode_breakdown.py): at batch 1 the whole
token latency is backbone weight streaming — 3.2 ms against a 1.9 ms int8
HBM roofline, with sampling/EOS/bookkeeping free.  The XLA path loses ~40%
to scheduling bubbles between the per-layer matvecs.

This kernel fuses everything in a layer *after* attention — the attention
output projection, the residual add, the second LayerNorm, and the SwiGLU
MLP (w1/w2) — into one pallas_call whose sequential grid streams the int8
weight tiles with Pallas' built-in double buffering:

    step j < nwo       : y_wo tile  = attn_out @ wo[:, jT:(j+1)T]
    step j == nwo      : x2 = resid + y_wo ; h = LayerNorm(x2)
    step j >= nwo      : u, g = h @ w1u_tile, h @ w1g_tile
                         out += (u * silu(g)) @ w2_tile
    last step          : write x2 + out

Covers wo + w1 + w2 = 55 of the 61 MB/layer (90%) of the flagship config's
weight bytes; wqkv + attention stay in XLA (attention needs the full qkv
before any MLP byte is useful).  The SwiGLU u/gate halves of w1 are passed
as two inputs so each grid step fetches matching u/gate column tiles and
the corresponding w2 row tile — no weight repacking, the canonical
``{"q": int8 [in, out], "s": bf16 [out]}`` layout is used as stored.

int8-serving only (the bf16 path has no scales and is already simpler for
XLA); dispatched from models/backbone.py when shapes divide the tiles.

MEASURED RESULT on the available v5e runtime: 6.97 ms per layer-tail in a
dependent chain — ~100x the DMA roofline.  Microbenchmarks isolate the
cause to per-grid-step overhead (~17-107 us/step; a bare tile-streaming
kernel tops out at ~60 GB/s vs ~500 GB/s effective for XLA's schedule), so
ANY many-step Pallas grid loses to XLA on this runtime regardless of kernel
body.  The kernel therefore stays an opt-in (ZONOS_TPU_FUSED_TAIL=1)
correctness artifact and a ready vehicle for runtimes with normal ~1 us
grid steps; the XLA decode path remains the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tail_kernel(attn_ref, resid_ref, ln_s_ref, ln_b_ref,
                 woq_ref, wos_ref, w1uq_ref, w1us_ref, w1gq_ref, w1gs_ref,
                 w2q_ref, w2s_ref, out_ref,
                 ywo_ref, x2_ref, h_ref, acc_ref,
                 *, nwo: int, nmlp: int, eps: float):
    j = pl.program_id(0)

    @pl.when(j < nwo)
    def _wo_tile():
        w = woq_ref[...].astype(jnp.bfloat16) * wos_ref[...]
        ywo_ref[j % nwo] = jnp.dot(
            attn_ref[...], w, preferred_element_type=jnp.float32
        )

    @pl.when(j == nwo)
    def _ln():
        B2 = resid_ref.shape[0]
        # ywo scratch is [nwo, B2, TWO] -> [B2, d]
        y = jnp.swapaxes(ywo_ref[...], 0, 1).reshape(B2, -1)
        x2 = resid_ref[...].astype(jnp.float32) + y
        mu = jnp.mean(x2, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x2 - mu), axis=-1, keepdims=True)
        hn = (x2 - mu) * jax.lax.rsqrt(var + eps)
        hn = hn * ln_s_ref[...].astype(jnp.float32) + ln_b_ref[...].astype(jnp.float32)
        x2_ref[...] = x2
        h_ref[...] = hn.astype(jnp.bfloat16)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j >= nwo)
    def _mlp_tile():
        h = h_ref[...]
        u = jnp.dot(h, w1uq_ref[...].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * w1us_ref[...].astype(jnp.float32)
        g = jnp.dot(h, w1gq_ref[...].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * w1gs_ref[...].astype(jnp.float32)
        gact = (u * jax.nn.sigmoid(g) * g).astype(jnp.bfloat16)
        w2 = w2q_ref[...].astype(jnp.bfloat16) * w2s_ref[...]
        acc_ref[...] += jnp.dot(gact, w2, preferred_element_type=jnp.float32)

    @pl.when(j == nwo + nmlp - 1)
    def _finish():
        out_ref[...] = (x2_ref[...] + acc_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "two", "tu", "interpret"))
def fused_layer_tail_pallas(
    attn_out: jnp.ndarray,   # [B2, d] bf16 (pre-wo attention output)
    resid: jnp.ndarray,      # [B2, d] bf16 (residual stream entering wo-add)
    woq: jnp.ndarray, wos: jnp.ndarray,    # int8 [d, d], bf16 [d]
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,  # [d]
    w1q: jnp.ndarray, w1s: jnp.ndarray,    # int8 [d, 2I] (u|gate), bf16 [2I]
    w2q: jnp.ndarray, w2s: jnp.ndarray,    # int8 [I, d], bf16 [d]
    eps: float = 1e-5,
    two: int = 512,
    tu: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns the new residual stream [B2, d] (resid + wo-out + mlp-out)."""
    B2, dk = attn_out.shape  # dk = H * head_dim (equals d in the flagship)
    d = resid.shape[-1]
    I = w2q.shape[0]
    if d % two or I % tu:
        raise ValueError(f"dims d={d}, I={I} must divide tiles ({two}, {tu})")
    nwo, nmlp = d // two, I // tu

    w1uq, w1gq = w1q[:, :I], w1q[:, I:]
    w1us, w1gs = w1s[None, :I], w1s[None, I:]

    kernel = functools.partial(_tail_kernel, nwo=nwo, nmlp=nmlp, eps=eps)
    const = lambda *_: tuple(0 for _ in range(2))
    mlp_j = lambda j: (0, jnp.clip(j - nwo, 0, nmlp - 1))

    out = pl.pallas_call(
        kernel,
        grid=(nwo + nmlp,),
        in_specs=[
            pl.BlockSpec((B2, dk), const),                                  # attn_out
            pl.BlockSpec((B2, d), const),                                   # resid
            pl.BlockSpec((1, d), const),                                    # ln scale
            pl.BlockSpec((1, d), const),                                    # ln bias
            pl.BlockSpec((dk, two), lambda j: (0, jnp.minimum(j, nwo - 1))),  # woq
            pl.BlockSpec((1, two), lambda j: (0, jnp.minimum(j, nwo - 1))),  # wos
            pl.BlockSpec((d, tu), mlp_j),                                   # w1u
            pl.BlockSpec((1, tu), mlp_j),                                   # w1u scale
            pl.BlockSpec((d, tu), mlp_j),                                   # w1g
            pl.BlockSpec((1, tu), mlp_j),                                   # w1g scale
            pl.BlockSpec((tu, d), lambda j: (jnp.clip(j - nwo, 0, nmlp - 1), 0)),  # w2
            pl.BlockSpec((1, d), const),                                    # w2 scale
        ],
        out_specs=pl.BlockSpec((B2, d), const),
        out_shape=jax.ShapeDtypeStruct((B2, d), attn_out.dtype),
        scratch_shapes=[
            pltpu.VMEM((nwo, B2, two), jnp.float32),   # y_wo tiles
            pltpu.VMEM((B2, d), jnp.float32),          # x2
            pltpu.VMEM((B2, d), jnp.bfloat16),         # h (post-ln)
            pltpu.VMEM((B2, d), jnp.float32),          # mlp accumulator
        ],
        interpret=interpret,
    )(attn_out, resid, ln_scale[None, :], ln_bias[None, :],
      woq, wos[None, :], w1uq, w1us, w1gq, w1gs, w2q, w2s[None, :])
    return out
