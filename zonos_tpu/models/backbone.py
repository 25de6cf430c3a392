"""Transformer decoder backbone (GQA + RoPE + SwiGLU, pre-LN).

Capability parity with the reference backbone (zonos/backbone/_torch.py:52-152)
— same math: pre-LayerNorm attention and MLP residual blocks, fused QKV
projection, rotary embeddings on q/k, grouped-query attention against a
static KV cache, SwiGLU MLP, final LayerNorm.

TPU-first design (not a port):

- Parameters are a pytree with all layers *stacked* on a leading axis and the
  layer loop expressed as ``lax.scan`` — one compiled layer body regardless
  of depth (fast compiles, and XLA pipelines the weight fetches).
- The KV cache is part of the carry, updated functionally via
  ``dynamic_update_slice``; nothing in the decode step depends on host state.
- All samples advance in lockstep (the reference's ``lengths_per_sample`` is
  always uniform across the batch, zonos/model.py:318-319,421), so position
  and cache length are scalars, not per-sample vectors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from zonos_tpu.config import BackboneConfig
from zonos_tpu.ops.attention import (
    decode_attention,
    decode_attention_split,
    fresh_prefill_attention,
    prefill_attention,
    update_kv_cache,
    use_pallas,
)
from zonos_tpu.ops.norms import layer_norm
from zonos_tpu.ops.rope import apply_rope, rope_table


def _on_tpu() -> bool:
    from zonos_tpu.utils.device import on_tpu

    return on_tpu()


def matmul_w(x: jnp.ndarray, w) -> jnp.ndarray:
    """Dense matmul that accepts a plain matrix, an int8-quantized
    ``{"q": int8 [in, out], "s": bf16 [out]}`` weight, or a group-wise
    int4-quantized ``{"q4": int4 [in, out], "s4": bf16 [G, out]}`` weight.
    Dequantization is a cast fused into the matmul operand read — the point
    is shrinking the HBM weight traffic of the (bandwidth-bound) decode step,
    not low-precision math.  XLA stores ``s4`` packed two nibbles per byte on
    TPU, so int4 reads a quarter of the bf16 bytes."""
    if isinstance(w, dict) and "q4" in w:
        q, s = w["q4"], w["s4"]  # q int8 [in/2, out] nibble-packed halves, s [G, out]
        dout = q.shape[-1]
        G = s.shape[-2]
        din = x.shape[-1]
        gs = din // G
        rows = 1
        for dim in x.shape[:-1]:
            rows *= dim
        if _on_tpu() and rows <= 64 and din % (2 * gs) == 0 and dout % 128 == 0:
            from zonos_tpu.ops.pallas_kernels import int4_matmul_pallas

            y = int4_matmul_pallas(x.reshape(rows, din), q, s)
            return y.reshape(*x.shape[:-1], dout).astype(x.dtype)
        # fallback: unpack in XLA (materializes the bf16 weights — fine on
        # CPU/tests and for large-M prefill where weights are re-used)
        q32 = q.astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(q32, 28), 28)  # rows [0, din/2)
        hi = jnp.right_shift(jnp.left_shift(q32, 24), 28)  # rows [din/2, din)
        qfull = jnp.concatenate([lo, hi], axis=-2).astype(x.dtype)
        xg = x.reshape(*x.shape[:-1], G, gs)
        y = jnp.einsum("...gi,gio->...go", xg, qfull.reshape(G, gs, dout))
        return (y * s.astype(x.dtype)).sum(axis=-2)
    if isinstance(w, dict) and "q" in w:
        return (x @ w["q"].astype(x.dtype)) * w["s"].astype(x.dtype)
    return x @ w


def quantize_weight_int8(w: jnp.ndarray) -> dict:
    """Symmetric per-output-channel int8 quantization of [.., in, out]."""
    wf = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale[..., 0, :].astype(jnp.bfloat16)}


def quantize_weight_int4(w: jnp.ndarray, group_size: int = 128) -> dict:
    """Symmetric group-wise int4 quantization of ``[.., in, out]``.

    Weights are grouped along the contraction (``in``) axis: each
    ``group_size``-row block of every output column gets its own bf16 scale,
    which keeps the quantization error local (AWQ/GPTQ-style layout) at ~3%
    metadata overhead.  Values use the symmetric range [-7, 7].

    Storage packs two 4-bit values per int8 byte by hand (even/odd ``in``
    rows in the low/high nibble) rather than using the ``int4`` dtype —
    sub-byte arrays cannot cross the jit boundary on every backend, while
    int8 works everywhere and reads the same 0.5 bytes/weight from HBM.
    ``matmul_w`` unpacks with two arithmetic shifts fused into the dot.

    Packing runs on-device under one jit per tensor: XLA fuses the f32
    convert into the reduction and the rounding into the int8 store, so no
    f32 copy of the weights ever materializes (eager quantization of a
    1.6B-param model OOMs the 16 GB chip; pulling the weights to host is
    minutes through the tunneled backend)."""
    *lead, din, dout = w.shape
    if din % group_size or group_size % 2:
        raise ValueError(f"in-dim {din} must divide into even group_size {group_size}")
    G = din // group_size

    if (din // 2) % group_size:
        raise ValueError("din/2 must be a multiple of group_size (even group count)")

    @jax.jit
    def pack(w):
        wg = w.astype(jnp.float32).reshape(*lead, G, group_size, dout)
        scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2, keepdims=True) / 7.0, 1e-8)
        q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
        q = q.reshape(*lead, din, dout)
        # halves layout: rows [0, din/2) in the low nibble, [din/2, din) in
        # the high — unpacking is two shifts + one concat, no interleave
        lo, hi = q[..., : din // 2, :], q[..., din // 2 :, :]
        packed = jnp.bitwise_or(jnp.left_shift(hi, 4), jnp.bitwise_and(lo, 0xF))
        return packed, scale[..., 0, :].astype(jnp.bfloat16)

    packed, scale = pack(w)
    return {"q4": packed, "s4": scale}


class KVCache(NamedTuple):
    """Stacked per-layer caches: k/v ``[L, B, H_kv, S_max, head_dim]``.

    Optional int8 mode (``ZONOS_TPU_KV_INT8=1``): k/v stored int8 with
    per-row (per token, per kv-head) fp32 scales ``[L, B, H_kv, S_max]``.

    Optional fp8 mode (``ZONOS_TPU_KV_F8=1``): k/v stored float8_e4m3fn with
    NO scales.  Same HBM bytes as int8, but scale-free: the per-step decode
    drops both the scale reads and — the big one — the two per-step scale
    ``dynamic_update_slice`` ops, whose seq-minor layout forces a
    read-modify-write of the whole scale buffer every token (profiled at
    ~2x330 us/step at batch 64 on v5e, ~11% of the step).  Elementwise
    storage error is ~2.2% (e4m3 mantissa) vs ~0.4% for int8-per-row; both
    are lossy opt-in serving modes.
    Decode reads the cache every step, so halving its bytes is a direct
    HBM-bandwidth lever at large batch / long sequence; dequantization
    folds into the attention einsums (scores × k_scale; weights × v_scale
    before the value contraction) — the int8 rows are never materialized
    as bf16.  Per-row symmetric quantization keeps the error ~0.4% — a
    lossy serving mode, off by default."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: jnp.ndarray | None = None
    v_scale: jnp.ndarray | None = None

    @classmethod
    def create(cls, cfg: BackboneConfig, batch: int, max_seqlen: int, dtype=jnp.bfloat16):
        import os

        shape = (cfg.n_layer, batch, cfg.num_heads_kv, max_seqlen, cfg.head_dim)
        if dtype == jnp.bfloat16 and os.environ.get("ZONOS_TPU_KV_F8") == "1":
            f8 = jnp.float8_e4m3fn
            return cls(jnp.zeros(shape, f8), jnp.zeros(shape, f8))
        if dtype == jnp.bfloat16 and os.environ.get("ZONOS_TPU_KV_INT8") == "1":
            return cls(
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape[:-1], jnp.float32),
                jnp.zeros(shape[:-1], jnp.float32),
            )
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    def grow(self, new_len: int) -> "KVCache":
        """Pad the sequence axis to ``new_len`` (cache-length bucketing).

        Attention masks validity by position, and masked (-inf) scores give
        exactly-zero weights, so growing is bit-transparent to the decode —
        but every step's cache HBM read scales with the allocated length,
        so starting small and growing beats allocating the 30-s maximum up
        front (see docs/PERFORMANCE.md)."""
        pad = new_len - self.k.shape[3]
        if pad <= 0:
            return self
        widths = [(0, 0), (0, 0), (0, 0), (0, pad), (0, 0)]
        scales = (None, None)
        if self.quantized:
            swidths = widths[:-1]
            scales = (jnp.pad(self.k_scale, swidths), jnp.pad(self.v_scale, swidths))
        return KVCache(jnp.pad(self.k, widths), jnp.pad(self.v, widths), *scales)


def quantize_kv_rows(rows: jnp.ndarray):
    """[..., S, D] -> (int8 rows, fp32 per-row scales [..., S])."""
    rf = rows.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(rf), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(rf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def init_transformer_params(key: jax.Array, cfg: BackboneConfig, dtype=jnp.bfloat16) -> dict:
    """Random-init parameter pytree, layers stacked on axis 0."""
    d, L = cfg.d_model, cfg.n_layer
    H, Hkv, hd = cfg.num_heads, cfg.num_heads_kv, cfg.head_dim
    inter = cfg.mlp_hidden
    keys = jax.random.split(key, 4)

    def dense(k, shape):
        fan_in = shape[-2]
        return (jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(dtype)

    return {
        "layers": {
            "norm1_scale": jnp.ones((L, d), dtype),
            "norm1_bias": jnp.zeros((L, d), dtype),
            "wqkv": dense(keys[0], (L, d, (H + 2 * Hkv) * hd)),
            "wo": dense(keys[1], (L, H * hd, d)),
            "norm2_scale": jnp.ones((L, d), dtype),
            "norm2_bias": jnp.zeros((L, d), dtype),
            "w1": dense(keys[2], (L, d, 2 * inter)),
            "w2": dense(keys[3], (L, inter, d)),
        },
        "normf_scale": jnp.ones((d,), dtype),
        "normf_bias": jnp.zeros((d,), dtype),
    }


def _use_fused_tail(cfg: BackboneConfig, lp: dict, S: int) -> bool:
    """Dispatch the fused layer-tail kernel (ops/pallas_decode.py) on the
    int8 decode step.  Opt-in via ZONOS_TPU_FUSED_TAIL=1 until measured
    faster than the XLA schedule on hardware."""
    import os

    if os.environ.get("ZONOS_TPU_FUSED_TAIL") != "1":
        return False
    if S != 1 or not _on_tpu():
        return False
    if not all(isinstance(lp.get(n), dict) and "q" in lp[n] for n in ("wo", "w1", "w2")):
        return False
    d, inter = cfg.d_model, cfg.mlp_hidden
    if d % 512 or inter % 256:
        return False
    return True


def _mix(cfg: BackboneConfig, lp: dict, x, cos, sin, k_cache, v_cache, offset, prefill: bool,
         k_scale=None, v_scale=None):
    """Shared attention block body: norm -> qkv -> rope -> attend -> out.

    The per-layer cache is READ-ONLY here; the new k/v rows are returned to
    the caller, which writes all layers into the carried cache with one
    batched update after the scan.  Mutating the scan-sliced cache in place
    is impossible for XLA (immutable operand), so the old
    update-inside-the-layer form cost two full cache copies per decode step
    — measured as ~8 of 9 ms/token at batch 64 on v5e."""
    import os

    B, S, d = x.shape
    H, Hkv, hd = cfg.num_heads, cfg.num_heads_kv, cfg.head_dim
    h = layer_norm(x, lp["norm1_scale"], lp["norm1_bias"], cfg.norm_epsilon)
    qkv = matmul_w(h, lp["wqkv"])
    q, k, v = jnp.split(qkv, [H * hd, (H + Hkv) * hd], axis=-1)
    q = apply_rope(q.reshape(B, S, H, hd), cos, sin)
    k = apply_rope(k.reshape(B, S, Hkv, hd), cos, sin)
    v = v.reshape(B, S, Hkv, hd)
    if prefill:
        y = fresh_prefill_attention(q, k, v)
    elif k_scale is None and (os.environ.get("ZONOS_TPU_FLASH") == "1" or use_pallas()):
        # opt-in Pallas kernels consume an updated bf16 cache, so this path
        # knowingly violates the "never update the cache inside the layer
        # scan" rule (CLAUDE.md): XLA copies the scan-sliced operand every
        # step, part of why these kernels measure slower than the default
        # split-attention path.  Kept as a correctness baseline only.
        k_upd, v_upd = update_kv_cache(k_cache, v_cache, k, v, offset)
        y = decode_attention(q, k_upd, v_upd, length=offset + 1)
    else:
        y = decode_attention_split(q, k_cache, v_cache, k, v, offset,
                                   k_scale=k_scale, v_scale=v_scale)
    k_rows = jnp.swapaxes(k, 1, 2)  # [B, Hkv, S, hd]
    v_rows = jnp.swapaxes(v, 1, 2)
    if k_cache.dtype != jnp.int8:  # int8 rows are quantized once, post-scan
        k_rows = k_rows.astype(k_cache.dtype)
        v_rows = v_rows.astype(v_cache.dtype)
    if _use_fused_tail(cfg, lp, S):
        from zonos_tpu.ops.pallas_decode import fused_layer_tail_pallas

        x = fused_layer_tail_pallas(
            y.reshape(B, H * hd), x[:, 0],
            lp["wo"]["q"], lp["wo"]["s"],
            lp["norm2_scale"], lp["norm2_bias"],
            lp["w1"]["q"], lp["w1"]["s"], lp["w2"]["q"], lp["w2"]["s"],
            eps=cfg.norm_epsilon,
        )[:, None]
        return x, k_rows, v_rows
    y = matmul_w(y.reshape(B, S, H * hd), lp["wo"])
    x = x + y
    h = layer_norm(x, lp["norm2_scale"], lp["norm2_bias"], cfg.norm_epsilon)
    u, gate = jnp.split(matmul_w(h, lp["w1"]), 2, axis=-1)
    x = x + matmul_w(u * jax.nn.silu(gate), lp["w2"])
    return x, k_rows, v_rows


def _scan_unroll() -> int:
    """Layer-scan unroll factor (ZONOS_TPU_SCAN_UNROLL, default 1).

    Unrolling lets XLA overlap the HBM weight fetch of layer i+1 with the
    compute of layer i at the cost of program size / compile time.
    Measured on v5e (flagship int8 decode, batch 1): unroll=2 *hurts*
    (RTF 2.61 vs 3.88) — XLA already pipelines the rolled scan well; keep
    the default of 1."""
    import os

    try:
        return max(1, int(os.environ.get("ZONOS_TPU_SCAN_UNROLL", "1")))
    except ValueError:
        return 1


def _run_layers(cfg: BackboneConfig, params: dict, x, cache: KVCache, cos, sin, offset, prefill):
    """Layer stack as one scanned body; the cache is read-only inside the
    scan (see :func:`_mix`) and all layers' new k/v rows are written with a
    single batched ``dynamic_update_slice`` on the carried cache — in-place
    under XLA's while-loop buffer aliasing, no full-cache copies."""

    def body(carry, layer_in):
        lp, k_c, v_c, k_s, v_s = layer_in
        y, k_rows, v_rows = _mix(cfg, lp, carry, cos, sin, k_c, v_c, offset, prefill,
                                 k_scale=k_s, v_scale=v_s)
        return y, (k_rows, v_rows)

    x, (k_rows, v_rows) = jax.lax.scan(
        body, x,
        (params["layers"], cache.k, cache.v, cache.k_scale, cache.v_scale),
        unroll=_scan_unroll(),
    )
    zero = jnp.zeros((), jnp.int32)
    idx = (zero, zero, zero, jnp.asarray(offset, jnp.int32), zero)
    scales = (None, None)
    if cache.quantized:
        k_rows, k_row_scale = quantize_kv_rows(k_rows)
        v_rows, v_row_scale = quantize_kv_rows(v_rows)
        scales = (
            jax.lax.dynamic_update_slice(cache.k_scale, k_row_scale, idx[:-1]),
            jax.lax.dynamic_update_slice(cache.v_scale, v_row_scale, idx[:-1]),
        )
    k = jax.lax.dynamic_update_slice(cache.k, k_rows, idx)
    v = jax.lax.dynamic_update_slice(cache.v, v_rows, idx)
    x = layer_norm(x, params["normf_scale"], params["normf_bias"], cfg.norm_epsilon)
    return x, KVCache(k, v, *scales)


def transformer_forward(
    cfg: BackboneConfig, params: dict, x: jnp.ndarray, remat: bool = False
) -> jnp.ndarray:
    """Cache-free full-sequence forward (training / scoring path).

    Same math as :func:`transformer_prefill` without materializing a KV cache
    — k/v come straight from the projections.

    ``remat=True`` rematerializes each layer on the backward pass
    (``jax.checkpoint`` around the scan body): activation memory drops from
    O(L·S·d·k) to O(S·d·k + L·weights) at ~33% extra forward FLOPs — the
    standard TPU trade when HBM, not MXU, is the training constraint.
    """
    B, S, _ = x.shape
    cos_t, sin_t = rope_table(cfg.head_dim, base=cfg.rope_base)
    cos, sin = cos_t[:S], sin_t[:S]
    H, Hkv, hd = cfg.num_heads, cfg.num_heads_kv, cfg.head_dim

    def body(carry, lp):
        h = layer_norm(carry, lp["norm1_scale"], lp["norm1_bias"], cfg.norm_epsilon)
        qkv = matmul_w(h, lp["wqkv"])
        q, k, v = jnp.split(qkv, [H * hd, (H + Hkv) * hd], axis=-1)
        q = apply_rope(q.reshape(B, S, H, hd), cos, sin)
        k = apply_rope(k.reshape(B, S, Hkv, hd), cos, sin)
        v = v.reshape(B, S, Hkv, hd)
        y = prefill_attention(q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), seq_len=S)
        x2 = carry + matmul_w(y.reshape(B, S, H * hd), lp["wo"])
        h = layer_norm(x2, lp["norm2_scale"], lp["norm2_bias"], cfg.norm_epsilon)
        u, gate = jnp.split(matmul_w(h, lp["w1"]), 2, axis=-1)
        return x2 + matmul_w(u * jax.nn.silu(gate), lp["w2"]), None

    x, _ = jax.lax.scan(jax.checkpoint(body) if remat else body, x, params["layers"])
    return layer_norm(x, params["normf_scale"], params["normf_bias"], cfg.norm_epsilon)


def transformer_prefill(
    cfg: BackboneConfig, params: dict, x: jnp.ndarray, cache: KVCache
) -> tuple[jnp.ndarray, KVCache]:
    """Run the full prompt ``x [B, S, d]`` from position 0, filling the cache.

    Returns the final-norm hidden states ``[B, S, d]`` and the updated cache.
    """
    S = x.shape[1]
    cos_t, sin_t = rope_table(cfg.head_dim, base=cfg.rope_base)
    cos, sin = cos_t[:S], sin_t[:S]
    return _run_layers(cfg, params, x, cache, cos, sin, jnp.int32(0), prefill=True)


def transformer_decode_step(
    cfg: BackboneConfig, params: dict, x: jnp.ndarray, cache: KVCache, pos: jnp.ndarray
) -> tuple[jnp.ndarray, KVCache]:
    """One decode step: ``x [B, 1, d]`` at scalar position ``pos`` (0-based)."""
    cos_t, sin_t = rope_table(cfg.head_dim, base=cfg.rope_base)
    cos = jax.lax.dynamic_slice_in_dim(cos_t, pos, 1, 0)
    sin = jax.lax.dynamic_slice_in_dim(sin_t, pos, 1, 0)
    return _run_layers(cfg, params, x, cache, cos, sin, pos, prefill=False)
