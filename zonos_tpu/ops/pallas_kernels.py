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
# Flash-decode attention: length-aware blocked cache scan
# ---------------------------------------------------------------------------


def _scalar(ref):
    """Read a scalar-prefetch value whether it arrives 0-d or shape (1,)."""
    try:
        return ref[0]
    except IndexError:
        return ref[...]


def _flash_decode_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                         *, block_s):
    """Grid (B, H_kv, n_blocks): online-softmax over valid cache blocks only.

    The payoff vs the XLA path: HBM traffic proportional to the *valid*
    cache length instead of the full static S_max — out-of-range blocks are
    predicated off and their index_map is clamped, so a 30s-capacity cache
    costs only what has actually been generated.  This is the kernel that
    wins at large batch (cache reads dominate weights there).
    """
    i = pl.program_id(2)
    length = _scalar(len_ref)
    n_valid = (length + block_s - 1) // block_s

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i < n_valid)
    def _block():
        D = q_ref.shape[3]
        q = q_ref[0, 0].astype(jnp.float32)  # [G, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [BS, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (1.0 / (D**0.5))
        pos = i * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
        s = jnp.where(pos < length, s, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        scale_prev = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * scale_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * scale_prev + jax.lax.dot_general(
            p, v_ref[0, 0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(i == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def flash_decode_attention_pallas(
    q: jnp.ndarray,  # [B, 1, H, D]
    k_cache: jnp.ndarray,  # [B, H_kv, S, D]
    v_cache: jnp.ndarray,
    length: jnp.ndarray,  # scalar int32
    block_s: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    B, _, H, D = q.shape
    _, Hkv, S, _ = k_cache.shape
    G = H // Hkv
    block_s = min(block_s, S)
    n_blocks = pl.cdiv(S, block_s)
    qg = q[:, 0].reshape(B, Hkv, G, D)
    length_arr = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (1,))

    def kv_index(b, h, i, len_ref):
        n_valid = jax.lax.div(_scalar(len_ref) + block_s - 1, block_s)
        return (b, h, jnp.minimum(i, jnp.maximum(n_valid - 1, 0)), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, G, D), lambda b, h, i, len_ref: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_s, D), kv_index),
            pl.BlockSpec((1, 1, block_s, D), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, G, D), lambda b, h, i, len_ref: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_flash_decode_kernel, block_s=block_s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )(length_arr, qg, k_cache, v_cache)
    return out.reshape(B, 1, H, D)


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
    if key.ndim:  # [B] per-row keys: each row draws from its own stream
        gumbel = jax.vmap(lambda k: jax.random.gumbel(k, (K, V), jnp.float32))(key)
    else:
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


# ---------------------------------------------------------------------------
# int4 (nibble-packed) weight matmul for the bandwidth-bound decode step
# ---------------------------------------------------------------------------


def _int4_matmul_kernel(x_ref, q_ref, s_ref, o_ref, *, gs):
    """One dout tile: x [M, din] @ unpack(q [din/2, TN]) * s [G, TN].

    The packed weights stream from HBM at 0.5 bytes/weight and are expanded
    to bf16 only inside VMEM — XLA cannot fuse the nibble shifts into a dot
    operand, which is why the pure-XLA int4 path is *slower* than int8.
    Packing layout: rows [0, din/2) in the low nibble, [din/2, din) in the
    high (see quantize_weight_int4), so unpack is two shifts + one concat.
    """
    q = q_ref[...].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(q, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(q, 24), 28)
    w = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)  # [din, TN]
    din, tn = w.shape
    s = s_ref[...]  # [G, TN] bf16
    w = (w.reshape(din // gs, gs, tn) * s[:, None, :]).reshape(din, tn)
    o_ref[...] = jnp.dot(
        x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul_pallas(
    x: jnp.ndarray,   # [M, din] (M small: decode rows)
    q: jnp.ndarray,   # [din/2, dout] int8 nibble-packed
    s: jnp.ndarray,   # [G, dout] bf16 group scales
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns x @ dequant(q, s) as f32 [M, dout]."""
    M, din = x.shape
    dout = q.shape[-1]
    G = s.shape[-2]
    gs = din // G
    tn = 512 if dout % 512 == 0 else (256 if dout % 256 == 0 else 128)
    # keep the bf16 weight tile under ~4 MB of VMEM
    while din * tn * 2 > 4 * 1024 * 1024 and tn > 128:
        tn //= 2
    kernel = functools.partial(_int4_matmul_kernel, gs=gs)
    return pl.pallas_call(
        kernel,
        grid=(dout // tn,),
        in_specs=[
            pl.BlockSpec((M, din), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((din // 2, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, dout), jnp.float32),
        interpret=interpret,
    )(x, q, s)
