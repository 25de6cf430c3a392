"""Attention for prefill and cached single-token decode (GQA, RoPE'd inputs).

Replaces torch SDPA / flash-attn in the reference (zonos/backbone/_torch.py:136).
Two entry points:

- :func:`prefill_attention` — full causal self-attention over the prompt.
  XLA already emits a tiled flash-style fusion for this matmul-softmax-matmul
  chain on TPU; sequence lengths here are ~100s-2700, well inside VMEM tiling.
- :func:`decode_attention` — one query timestep against a static KV cache
  with per-sample valid lengths.  This is the per-token hot op (~2 matvecs
  per head per layer); it is deliberately written as two batched contractions
  with an fp32 masked softmax between them so XLA maps it onto the MXU with
  a single fused kernel.

KV cache layout: ``[B, H_kv, S_max, head_dim]`` — sequence on the sublane
axis and head_dim (=128 for the flagship config) on the lane axis, the native
TPU tile orientation; appending a token is one ``dynamic_update_slice``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def use_pallas() -> bool:
    """Opt-in switch for the Pallas kernel variants (ZONOS_TPU_PALLAS=1).

    Measured on v5e (decode, flagship config): the XLA paths are at parity at
    batch 1 (5.0 vs 5.1 ms/step) and faster at batch 8 (6.3 vs 7.3 ms/step) —
    XLA's own attention fusion is already excellent for these matvec shapes,
    so the hand kernels are kept as an option and a baseline, not the default.
    """
    if os.environ.get("ZONOS_TPU_PALLAS") != "1":
        return False
    from zonos_tpu.utils.device import on_tpu

    return on_tpu()


def update_kv_cache(
    k_cache: jnp.ndarray,  # [B, H_kv, S_max, D]
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,  # [B, S_new, H_kv, D]
    v_new: jnp.ndarray,
    offset: jnp.ndarray,  # scalar int32: write position (same for all samples)
):
    """Append ``S_new`` timesteps at ``offset`` (ref: zonos/backbone/_torch.py:33-49)."""
    k_new = jnp.swapaxes(k_new, 1, 2).astype(k_cache.dtype)  # [B, H_kv, S_new, D]
    v_new = jnp.swapaxes(v_new, 1, 2).astype(v_cache.dtype)
    zero = jnp.zeros((), dtype=jnp.int32)
    idx = (zero, zero, jnp.asarray(offset, jnp.int32), zero)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new, idx)
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new, idx)
    return k_cache, v_cache


def _gqa_scores(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """q [B, Sq, H, D] x k [B, H_kv, Sk, D] -> scores [B, H_kv, G, Sq, Sk]."""
    B, Sq, H, D = q.shape
    H_kv = k.shape[1]
    G = H // H_kv
    qh = jnp.swapaxes(q, 1, 2).reshape(B, H_kv, G, Sq, D)
    return jnp.einsum("bhgqd,bhkd->bhgqk", qh, k, preferred_element_type=jnp.float32)


def _gqa_output(weights: jnp.ndarray, v: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """weights [B, H_kv, G, Sq, Sk] x v [B, H_kv, Sk, D] -> [B, Sq, H, D]."""
    B, H_kv, G, Sq, _ = weights.shape
    D = v.shape[-1]
    if v.dtype.itemsize < 2:  # f8 cache: up-cast v into the contraction, never
        v = v.astype(jnp.bfloat16)  # down-cast the softmax weights to 1 byte
    out = jnp.einsum("bhgqk,bhkd->bhgqd", weights.astype(v.dtype), v)
    return jnp.swapaxes(out.reshape(B, H_kv * G, Sq, D), 1, 2).astype(out_dtype)


def prefill_attention(
    q: jnp.ndarray,  # [B, S, H, D] (RoPE already applied)
    k: jnp.ndarray,  # [B, H_kv, S_max, D] — the cache, already updated
    v: jnp.ndarray,
    seq_len: int,  # static: number of live prompt positions
) -> jnp.ndarray:
    """Causal attention of the S prompt queries against cache positions [0, S)."""
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    k_live = k[:, :, :seq_len]
    v_live = v[:, :, :seq_len]
    scores = _gqa_scores(q, k_live) * scale  # [B,H_kv,G,S,S] fp32
    S = q.shape[1]
    qpos = jnp.arange(S)[:, None]
    kpos = jnp.arange(seq_len)[None, :]
    causal = kpos <= qpos  # [S, S]
    scores = jnp.where(causal[None, None, None], scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    return _gqa_output(weights, v_live, q.dtype)


def fresh_prefill_attention(
    q: jnp.ndarray,  # [B, S, H, D] (RoPE already applied)
    k: jnp.ndarray,  # [B, S, H_kv, D] — this prompt's keys, no cache involved
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Causal attention among the prompt tokens themselves.

    Prefill always starts from position 0 (zonos/model.py:298-301 runs the
    whole prefix once), so the cache holds nothing the prompt must attend to
    — reading it back would be wasted HBM traffic.  The caller writes the
    returned k/v rows into the cache *after* the layer stack (one batched
    in-place update) instead of round-tripping the cache through the scan."""
    return prefill_attention(
        q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), seq_len=q.shape[1]
    )


def decode_attention_split(
    q: jnp.ndarray,  # [B, 1, H, D] (RoPE already applied)
    k_cache: jnp.ndarray,  # [B, H_kv, S_max, D] — rows [0, pos) valid; pos NOT yet written
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,  # [B, 1, H_kv, D] — this step's key/value
    v_new: jnp.ndarray,
    pos: jnp.ndarray,  # scalar int32: #valid cache rows (current token excluded)
    k_scale: jnp.ndarray | None = None,  # [B, H_kv, S_max] — int8-cache row scales
    v_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One query step against cache + the current token's k/v held out.

    Numerically identical to writing (k_new, v_new) at ``pos`` and calling
    :func:`decode_attention` with ``length=pos+1`` — but the cache stays
    read-only inside the layer scan.  Why that matters: updating a scan-
    carried cache slice forces XLA to copy the whole per-layer cache (the
    sliced operand is immutable) and then copy the stacked result back into
    the while-loop carry.  Profiled on v5e at batch 64, those copies were
    ~8 of the 9 ms/token.  With the split form the scan emits only the new
    rows ([L, B, H_kv, 1, D]) and the caller does ONE batched
    dynamic-update-slice on the carried cache, which XLA performs in place.
    """
    D = q.shape[-1]
    B, _, H, _ = q.shape
    H_kv = k_cache.shape[1]
    G = H // H_kv
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    k_read = k_cache if k_cache.dtype == q.dtype else k_cache.astype(q.dtype)
    scores = _gqa_scores(q, k_read) * scale  # [B,H_kv,G,1,S_max] fp32
    if k_scale is not None:  # int8 rows: fold the per-row scale into scores
        scores = scores * k_scale[:, :, None, None, :]
    S_max = k_cache.shape[2]
    valid = jnp.arange(S_max) < pos
    scores = jnp.where(valid[None, None, None, None], scores, NEG_INF)
    # current token: q · k_new -> [B,H_kv,G,1,1]
    qh = jnp.swapaxes(q, 1, 2).reshape(B, H_kv, G, 1, D)
    k_n = jnp.swapaxes(k_new, 1, 2)  # [B, H_kv, 1, D]
    s_new = jnp.einsum("bhgqd,bhkd->bhgqk", qh, k_n, preferred_element_type=jnp.float32) * scale
    all_scores = jnp.concatenate([scores, s_new], axis=-1)
    weights = jax.nn.softmax(all_scores, axis=-1)
    w_cache, w_new = weights[..., :S_max], weights[..., S_max:]
    if v_scale is not None:  # fold the row scale into the weights, read int8
        w_cache = w_cache * v_scale[:, :, None, None, :]
        out = jnp.einsum(
            "bhgqk,bhkd->bhgqd", w_cache.astype(q.dtype), v_cache.astype(q.dtype)
        )
        out = jnp.swapaxes(out.reshape(B, H_kv * G, 1, D), 1, 2).astype(q.dtype)
    else:
        out = _gqa_output(w_cache, v_cache, q.dtype)
    v_n = jnp.swapaxes(v_new, 1, 2)  # [B, H_kv, 1, D]
    out_new = _gqa_output(w_new, v_n, q.dtype)
    return out + out_new


def decode_attention(
    q: jnp.ndarray,  # [B, 1, H, D] (RoPE already applied)
    k_cache: jnp.ndarray,  # [B, H_kv, S_max, D]
    v_cache: jnp.ndarray,
    length: jnp.ndarray,  # scalar int32: #valid cache positions (incl. this token)
) -> jnp.ndarray:
    """One query step against the cache, masked to the first ``length`` slots.

    Pallas variants (both opt-in; measured at parity at batch 1 and behind
    XLA's fusion at batch 8-64 on v5e, because GQA decode blocks are only
    G=4 query rows — too thin to win on the MXU):
    - ZONOS_TPU_FLASH=1: length-aware blocked flash-decode (scalar-prefetch
      length, HBM traffic proportional to valid cache length);
    - ZONOS_TPU_PALLAS=1: simple fused single-pass kernel.
    The XLA path below is the default and the numerical oracle.
    """
    aligned = q.shape[-1] % 128 == 0 and q.shape[2] % k_cache.shape[1] == 0
    if aligned and os.environ.get("ZONOS_TPU_FLASH") == "1":
        from zonos_tpu.utils.device import on_tpu

        if on_tpu():
            from zonos_tpu.ops.pallas_kernels import flash_decode_attention_pallas

            return flash_decode_attention_pallas(q, k_cache, v_cache, length)
    if use_pallas() and aligned:
        from zonos_tpu.ops.pallas_kernels import decode_attention_pallas

        return decode_attention_pallas(q, k_cache, v_cache, length)
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    if k_cache.dtype != q.dtype:
        k_cache = k_cache.astype(q.dtype)
    scores = _gqa_scores(q, k_cache) * scale  # [B,H_kv,G,1,S_max] fp32
    S_max = k_cache.shape[2]
    valid = jnp.arange(S_max) < length  # [S_max]
    scores = jnp.where(valid[None, None, None, None], scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    return _gqa_output(weights, v_cache, q.dtype)
