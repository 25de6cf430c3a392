"""Pallas TPU kernels for the decode hot path.

North-star kernels (BASELINE.json): fused attention/KV-cache decode step and
the fused sampling pipeline.  Each has a pure-XLA twin in ``ops/`` used as
the CPU/test fallback and the numerical reference; the dispatchers in
``ops/attention.py`` / ``ops/sampling.py`` stay the public surface.

Design notes:
- Decode attention: grid over (batch x kv-head); for one kv head, the G=H/Hkv
  query rows attend to the whole cache slice [S_max, D] resident in VMEM
  (S_max≈2.7k x 128 x bf16 ≈ 0.7 MB per operand — comfortably inside the
  16 MB budget), one fp32 masked softmax, two MXU contractions.  No online
  (tiled) softmax needed at this size — a single pass is both simpler and
  faster.
- Sampling: the Gumbel-race draw fused with the unified/min-p reshaping over
  the [K, V] logits of one sample, using the on-core PRNG
  (`pltpu.prng_random_bits`) so no random tensor round-trips through HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# Fused GQA decode attention
# ---------------------------------------------------------------------------


def _decode_attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref):
    """One (batch, kv-head) tile: q [G, D] vs cache k/v [S, D] -> o [G, D]."""
    S = k_ref.shape[2]
    D = q_ref.shape[3]
    q = q_ref[0, 0].astype(jnp.float32)  # [G, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [S, D]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [G, S]
    scores = scores * (1.0 / (D**0.5))
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) < len_ref[0]
    scores = jnp.where(valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        w, v_ref[0, 0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def decode_attention_pallas(
    q: jnp.ndarray,  # [B, 1, H, D]
    k_cache: jnp.ndarray,  # [B, H_kv, S, D]
    v_cache: jnp.ndarray,
    length: jnp.ndarray,  # scalar int32
    interpret: bool = False,
) -> jnp.ndarray:
    B, _, H, D = q.shape
    _, Hkv, S, _ = k_cache.shape
    G = H // Hkv
    qg = q[:, 0].reshape(B, Hkv, G, D)
    length_arr = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (1,))

    out = pl.pallas_call(
        _decode_attn_kernel,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )(length_arr, qg, k_cache, v_cache)
    return out.reshape(B, H, D)[:, None].reshape(B, 1, H, D)


# ---------------------------------------------------------------------------
# Fused sampling: softmax -> unified -> min-p -> Gumbel race
# ---------------------------------------------------------------------------


def _sampling_kernel(
    logits_ref, gumbel_ref, out_ref, *, linear, conf, quad, min_p, temperature
):
    """One sample's [K, V] logits -> [K, 1] token ids (int32).

    Gumbel noise arrives as an operand (tiny: K x V fp32) so the kernel is
    deterministic under JAX PRNG keys and bit-identical to the XLA fallback's
    race; everything else (softmax, unified reshaping, min-p, the argmax
    race) is fused into this single VMEM-resident pass.
    """
    logits = logits_ref[0].astype(jnp.float32)  # [K, V]
    K, V = logits.shape

    x = logits * (1.0 / temperature)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    if linear > 0:
        logp = jnp.log(jnp.maximum(probs, 1e-20))
        ent = -jnp.sum(probs * logp, axis=-1, keepdims=True)
        raw = logp * (linear + ent * conf) - logp * logp * quad
        m2 = jnp.max(raw, axis=-1, keepdims=True)
        e2 = jnp.exp(raw - m2)
        probs = e2 / jnp.sum(e2, axis=-1, keepdims=True)

    if min_p > 0:
        top = jnp.max(probs, axis=-1, keepdims=True)
        probs = jnp.where(probs < min_p * top, 0.0, probs)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    g = gumbel_ref[0]
    score = jnp.where(probs > 0, jnp.log(probs) + g, NEG_INF)
    out_ref[0] = jnp.argmax(score, axis=-1, keepdims=True).astype(jnp.int32)


def fused_sample_pallas(
    key: jax.Array,
    logits: jnp.ndarray,  # [B, K, V] fp32
    linear: float,
    conf: float,
    quad: float,
    min_p: float,
    temperature: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns sampled ids [B, K].  Covers the default Zonos pipeline
    (unified + min-p); top-p/top-k fall back to the XLA path."""
    B, K, V = logits.shape
    gumbel = jax.random.gumbel(key, logits.shape, jnp.float32)
    kernel = functools.partial(
        _sampling_kernel, linear=linear, conf=conf, quad=quad,
        min_p=min_p, temperature=temperature,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, V), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, V), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, 1), jnp.int32),
        interpret=interpret,
    )(logits, gumbel)
    return out[..., 0]
