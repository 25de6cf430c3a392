"""Hybrid backbone: Mamba2 (SSD) layers with interleaved GQA attention.

Capability parity with the reference's mamba_ssm-based backbone
(zonos/backbone/_mamba_ssm.py:9-57): pre-norm residual blocks where layer i
is an attention mixer iff ``i in attn_layer_idx``, otherwise a Mamba2 mixer;
optional gated MLP after either mixer; RMSNorm with fp32 residuals.

TPU-first: the selective scan is the chunked SSD contraction in
``ops/ssm.py`` (MXU matmuls instead of the CUDA serial scan kernel), the
causal conv is a depthwise XLA conv with an explicit streaming state, and the
whole decode step is functional state-in/state-out so it lives inside the
same ``lax.while_loop`` decode program as the transformer.

Per-layer decode state (a tuple, one entry per layer):
- mamba layer: {"conv": [B, K-1, C_conv], "ssm": [B, H, P, N]}
- attn layer:  {"k": [B, H_kv, S_max, Dh], "v": ...}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.config import BackboneConfig
from zonos_tpu.models.backbone import matmul_w
from zonos_tpu.ops.attention import decode_attention, prefill_attention, update_kv_cache
from zonos_tpu.ops.norms import layer_norm, rms_norm
from zonos_tpu.ops.rope import apply_rope_neox, rope_table
from zonos_tpu.ops.ssm import (
    causal_conv1d_prefill,
    causal_conv1d_step,
    ssd_chunked,
    ssd_decode_step,
)


def _dims(cfg: BackboneConfig):
    d = cfg.d_model
    d_inner = cfg.ssm_expand * d
    H = d_inner // cfg.ssm_headdim
    G, N, K = cfg.ssm_ngroups, cfg.ssm_d_state, cfg.ssm_d_conv
    conv_dim = d_inner + 2 * G * N
    return d, d_inner, H, G, N, K, conv_dim


def _attn_dims(cfg: BackboneConfig):
    H = cfg.num_heads
    Hkv = cfg.num_heads_kv
    hd = int(cfg.attn_cfg.get("head_dim", cfg.d_model // H))
    rot = int(cfg.attn_cfg.get("rotary_emb_dim", hd // 2))
    return H, Hkv, hd, rot


def is_attn_layer(cfg: BackboneConfig, i: int) -> bool:
    return i in set(cfg.attn_layer_idx)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _dense(key, shape, dtype):
    return (jax.random.normal(key, shape, jnp.float32) / np.sqrt(shape[-2])).astype(dtype)


def init_hybrid_params(key: jax.Array, cfg: BackboneConfig, dtype=jnp.bfloat16) -> dict:
    d, d_inner, H, G, N, K, conv_dim = _dims(cfg)
    aH, aHkv, ahd, _ = _attn_dims(cfg)
    layers = []
    keys = jax.random.split(key, cfg.n_layer * 8 + 1)
    ki = iter(keys)
    for i in range(cfg.n_layer):
        lp: dict = {"norm_scale": jnp.ones((d,), dtype)}
        if not cfg.rms_norm:
            lp["norm_bias"] = jnp.zeros((d,), dtype)
        if is_attn_layer(cfg, i):
            lp["wqkv"] = _dense(next(ki), (d, (aH + 2 * aHkv) * ahd), dtype)
            lp["wo"] = _dense(next(ki), (aH * ahd, d), dtype)
            mlp_dim = cfg.attn_mlp_d_intermediate
        else:
            lp["in_proj"] = _dense(next(ki), (d, 2 * d_inner + 2 * G * N + H), dtype)
            lp["conv_w"] = (jax.random.normal(next(ki), (K, conv_dim), jnp.float32) * 0.2).astype(dtype)
            lp["conv_b"] = jnp.zeros((conv_dim,), dtype)
            lp["A_log"] = jnp.zeros((H,), jnp.float32)
            lp["D"] = jnp.ones((H,), jnp.float32)
            lp["dt_bias"] = jnp.zeros((H,), jnp.float32)
            lp["mixer_norm"] = jnp.ones((d_inner,), dtype)
            lp["out_proj"] = _dense(next(ki), (d_inner, d), dtype)
            mlp_dim = cfg.d_intermediate
        if mlp_dim:
            lp["norm2_scale"] = jnp.ones((d,), dtype)
            if not cfg.rms_norm:
                lp["norm2_bias"] = jnp.zeros((d,), dtype)
            lp["w1"] = _dense(next(ki), (d, 2 * mlp_dim), dtype)
            lp["w2"] = _dense(next(ki), (mlp_dim, d), dtype)
        layers.append(lp)
    p = {
        "layers_list": layers,
        "normf_scale": jnp.ones((d,), dtype),
    }
    if not cfg.rms_norm:
        p["normf_bias"] = jnp.zeros((d,), dtype)
    return p


def ssm_state_mode(batch: int | None = None) -> str:
    """SSM decode-state storage mode:
    ``fp32`` | ``bf16`` | ``f8`` | ``int8`` | ``int4``.

    At large batch the [B, H, P, N] states are the dominant HBM traffic of
    hybrid decode (11.8 GB fp32 at batch 64 on the flagship, read+written
    every step), so shrinking state bytes is THE serving lever for the mamba
    layers.  The decay dA<1 keeps the recurrence contractive, so storage
    rounding does not compound unboundedly (tests/test_hybrid.py measures
    the drift of each mode).

    - ``fp32``: exact; default at small batch where decode is weight-bound.
    - ``bf16`` (``ZONOS_TPU_SSM_BF16=1`` legacy knob): half traffic.
    - ``f8``: float8_e4m3fn rows, no scales — quarter traffic.
    - ``int8``: int8 rows + per-(batch, head) fp32 scales recomputed at every
      write from the new state's absmax — quarter traffic plus a negligible
      [B, H] scale array, finer-grained than f8 when head states are
      well-ranged.
    - ``int4``: two nibbles per byte along N (±7 grid, per-(batch, head)
      scales) — EIGHTH traffic.  The aggressive end of the ladder for
      state-bound large-batch serving; accuracy ceiling tested like the
      others (tests/test_hybrid.py).

    ``ZONOS_TPU_SSM_STATE`` overrides; otherwise the default is batch-aware:
    fp32 below 16 CFG-doubled rows (state traffic is minor next to weights
    there), else the measured large-batch winner (docs/PERFORMANCE.md)."""
    import os

    mode = os.environ.get("ZONOS_TPU_SSM_STATE")
    if mode is None and os.environ.get("ZONOS_TPU_SSM_BF16") == "1":
        mode = "bf16"
    if mode is None:
        mode = "f8" if (batch is not None and batch >= 16) else "fp32"
    if mode not in ("fp32", "bf16", "f8", "int8", "int4"):
        raise ValueError(f"ZONOS_TPU_SSM_STATE={mode!r}: want fp32|bf16|f8|int8|int4")
    return mode


_SSM_STATE_DTYPES = {
    "fp32": jnp.float32,
    "bf16": jnp.bfloat16,
    "f8": jnp.float8_e4m3fn,
    "int8": jnp.int8,
    "int4": jnp.int8,  # two nibbles packed per byte along N
}
_F8_MAX = 448.0  # float8_e4m3fn has no inf: out-of-range converts poison to NaN


def _load_ssm(state: dict) -> jnp.ndarray:
    """Stored state -> fp32 [B, H, P, N] (dequantized)."""
    if "ssm_q4" in state:
        packed = state["ssm_q4"]
        lo = jnp.left_shift(packed, 4)
        lo = jnp.right_shift(lo, 4)  # arithmetic shift: sign-extended nibble
        hi = jnp.right_shift(packed, 4)
        q = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1],
                                                 2 * packed.shape[-1])
        return q.astype(jnp.float32) * state["ssm_scale"]
    s = state["ssm"].astype(jnp.float32)
    if "ssm_scale" in state:
        s = s * state["ssm_scale"]
    return s


def _store_ssm(ssm_state: jnp.ndarray, state: dict) -> dict:
    """fp32 new state -> storage entries matching the cache's mode."""
    if "ssm_q4" in state:
        amax = jnp.max(jnp.abs(ssm_state), axis=(2, 3), keepdims=True)
        scale = jnp.maximum(amax, 1e-20) / 7.0
        q = jnp.clip(jnp.round(ssm_state / scale), -7, 7).astype(jnp.int8)
        pairs = q.reshape(*q.shape[:-1], q.shape[-1] // 2, 2)
        packed = jnp.bitwise_or(
            jnp.bitwise_and(pairs[..., 0], 0x0F),
            jnp.left_shift(pairs[..., 1], 4),
        )
        return {"ssm_q4": packed, "ssm_scale": scale}
    dt = state["ssm"].dtype
    if "ssm_scale" in state:
        amax = jnp.max(jnp.abs(ssm_state), axis=(2, 3), keepdims=True)
        scale = jnp.maximum(amax, 1e-20) / 127.0
        q = jnp.clip(jnp.round(ssm_state / scale), -127, 127).astype(jnp.int8)
        return {"ssm": q, "ssm_scale": scale}
    if dt == jnp.float8_e4m3fn:
        ssm_state = jnp.clip(ssm_state, -_F8_MAX, _F8_MAX)
    return {"ssm": ssm_state.astype(dt)}


def create_hybrid_cache(cfg: BackboneConfig, batch: int, max_seqlen: int, dtype=jnp.bfloat16):
    d, d_inner, H, G, N, K, conv_dim = _dims(cfg)
    aH, aHkv, ahd, _ = _attn_dims(cfg)
    if dtype == jnp.bfloat16:
        mode = ssm_state_mode(batch)
    else:  # explicit (test/fp32) dtype: store the state in that dtype exactly
        mode = {jnp.dtype(jnp.float32): "fp32", jnp.dtype(jnp.bfloat16): "bf16"}.get(
            jnp.dtype(dtype), "fp32"
        )
    ssm_dtype = _SSM_STATE_DTYPES[mode]
    cache = []
    for i in range(cfg.n_layer):
        if is_attn_layer(cfg, i):
            shape = (batch, aHkv, max_seqlen, ahd)
            cache.append({"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)})
        else:
            st = {"conv": jnp.zeros((batch, K - 1, conv_dim), dtype)}
            if mode == "int4":
                st["ssm_q4"] = jnp.zeros((batch, H, cfg.ssm_headdim, N // 2),
                                         jnp.int8)
            else:
                st["ssm"] = jnp.zeros((batch, H, cfg.ssm_headdim, N), ssm_dtype)
            if mode in ("int8", "int4"):
                st["ssm_scale"] = jnp.ones((batch, H, 1, 1), jnp.float32)
            cache.append(st)
    return tuple(cache)


def grow_hybrid_cache(cache, new_len: int):
    """Pad the attention layers' k/v sequence axis to ``new_len`` (mamba
    conv/ssm states are length-independent) — see KVCache.grow."""
    grown = []
    for st in cache:
        if "k" in st:
            pad = new_len - st["k"].shape[2]
            if pad > 0:
                widths = [(0, 0), (0, 0), (0, pad), (0, 0)]
                st = {"k": jnp.pad(st["k"], widths), "v": jnp.pad(st["v"], widths)}
        grown.append(st)
    return tuple(grown)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _norm(cfg, x, scale, bias):
    if cfg.rms_norm:
        # bias is non-None only for the final norm: the reference's norm_f is
        # an nn.LayerNorm run through layer_norm_fn in RMS mode, which still
        # adds the bias (zonos/backbone/_mamba_ssm.py:36,50-57); per-block
        # norms are bias-free RMSNorm modules.
        return rms_norm(x, scale, cfg.norm_epsilon, bias=bias)
    return layer_norm(x, scale, bias, cfg.norm_epsilon)


def _mamba_mixer(cfg, lp, x, state, prefill: bool):
    """x [B, S, d] -> (y [B, S, d], new_state)."""
    d, d_inner, H, G, N, K, conv_dim = _dims(cfg)
    P = cfg.ssm_headdim
    B_, S, _ = x.shape
    zxbcdt = matmul_w(x, lp["in_proj"])
    # split: z [d_inner] | xBC [conv_dim] | dt [H]
    z, xBC, dt_raw = (
        zxbcdt[..., :d_inner],
        zxbcdt[..., d_inner : d_inner + conv_dim],
        zxbcdt[..., d_inner + conv_dim :],
    )

    if prefill:
        xBC, conv_state = causal_conv1d_prefill(xBC, lp["conv_w"].astype(xBC.dtype), lp["conv_b"].astype(xBC.dtype))
    else:
        y1, conv_state = causal_conv1d_step(
            xBC[:, 0], state["conv"].astype(xBC.dtype), lp["conv_w"].astype(xBC.dtype), lp["conv_b"].astype(xBC.dtype)
        )
        xBC = y1[:, None, :]
    xBC = jax.nn.silu(xBC)

    xs = xBC[..., :d_inner].reshape(B_, S, H, P).astype(jnp.float32)
    Bm = xBC[..., d_inner : d_inner + G * N].reshape(B_, S, G, N).astype(jnp.float32)
    Cm = xBC[..., d_inner + G * N :].reshape(B_, S, G, N).astype(jnp.float32)
    dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + lp["dt_bias"])  # [B, S, H]
    A = -jnp.exp(lp["A_log"])  # [H]

    has_state = ("ssm" in state) or ("ssm_q4" in state)
    ssm_in = _load_ssm(state) if has_state else None
    if prefill:
        y, ssm_state = ssd_chunked(xs, dt, A, Bm, Cm, lp["D"], init_state=ssm_in)
    else:
        y, ssm_state = ssd_decode_step(
            xs[:, 0], dt[:, 0], A, Bm[:, 0], Cm[:, 0], lp["D"], ssm_in
        )
        y = y[:, None]

    y = y.reshape(B_, S, d_inner).astype(x.dtype)
    gated = y * jax.nn.silu(z)
    gated = rms_norm(gated, lp["mixer_norm"], cfg.norm_epsilon)
    out = matmul_w(gated, lp["out_proj"])
    return out, {
        "conv": conv_state.astype(state["conv"].dtype),
        **_store_ssm(ssm_state.astype(jnp.float32), state),
    }


def _attn_mixer(cfg, lp, x, state, pos, prefill: bool):
    H, Hkv, hd, rot = _attn_dims(cfg)
    B_, S, _ = x.shape
    qkv = matmul_w(x, lp["wqkv"])
    q, k, v = jnp.split(qkv, [H * hd, (H + Hkv) * hd], axis=-1)
    q = q.reshape(B_, S, H, hd)
    k = k.reshape(B_, S, Hkv, hd)
    v = v.reshape(B_, S, Hkv, hd)
    if rot > 0:
        cos_t, sin_t = rope_table(rot, base=cfg.rope_base)
        if prefill:
            cos, sin = cos_t[:S], sin_t[:S]
        else:
            cos = jax.lax.dynamic_slice_in_dim(cos_t, pos, 1, 0)
            sin = jax.lax.dynamic_slice_in_dim(sin_t, pos, 1, 0)
        # NeoX-style rotate-halves: mamba_ssm MHA's rotary convention
        # (interleaved=False default) — NOT the transformer backbone's
        # interleaved pairs.  See ops/rope.py:apply_rope_neox.
        q = jnp.concatenate([apply_rope_neox(q[..., :rot], cos, sin), q[..., rot:]], axis=-1)
        k = jnp.concatenate([apply_rope_neox(k[..., :rot], cos, sin), k[..., rot:]], axis=-1)
    offset = jnp.int32(0) if prefill else pos
    k_c, v_c = update_kv_cache(state["k"], state["v"], k, v, offset)
    if prefill:
        y = prefill_attention(q, k_c, v_c, seq_len=S)
    else:
        y = decode_attention(q, k_c, v_c, length=pos + 1)
    y = matmul_w(y.reshape(B_, S, H * hd), lp["wo"])
    return y, {"k": k_c, "v": v_c}


def _block(cfg, i, lp, x, state, pos, prefill, compute_dtype):
    h = _norm(cfg, x, lp["norm_scale"], lp.get("norm_bias")).astype(compute_dtype)
    if is_attn_layer(cfg, i):
        y, new_state = _attn_mixer(cfg, lp, h, state, pos, prefill)
    else:
        y, new_state = _mamba_mixer(cfg, lp, h, state, prefill)
    x = x + y.astype(x.dtype)
    if "w1" in lp:
        h = _norm(cfg, x, lp["norm2_scale"], lp.get("norm2_bias")).astype(compute_dtype)
        u, gate = jnp.split(matmul_w(h, lp["w1"]), 2, axis=-1)
        x = x + matmul_w(u * jax.nn.silu(gate), lp["w2"]).astype(x.dtype)
    return x, new_state


def _run(cfg, params, x, cache, pos, prefill):
    # residual_in_fp32 (true for the hybrid checkpoint): the residual stream
    # accumulates in fp32 while every matmul still runs in the param dtype —
    # mamba_ssm's fused add-norm contract (create_block residual_in_fp32).
    # Activations are [B,S,d] — negligible traffic next to the weights.
    compute_dtype = x.dtype
    if cfg.residual_in_fp32:
        x = x.astype(jnp.float32)
    new_cache = []
    for i, (lp, st) in enumerate(zip(params["layers_list"], cache)):
        x, st2 = _block(cfg, i, lp, x, st, pos, prefill, compute_dtype)
        new_cache.append(st2)
    x = _norm(cfg, x, params["normf_scale"], params.get("normf_bias"))
    return x.astype(compute_dtype), tuple(new_cache)


def hybrid_prefill(cfg: BackboneConfig, params: dict, x: jnp.ndarray, cache):
    return _run(cfg, params, x, cache, jnp.int32(0), prefill=True)


def hybrid_decode_step(cfg: BackboneConfig, params: dict, x: jnp.ndarray, cache, pos):
    return _run(cfg, params, x, cache, pos, prefill=False)


# ---------------------------------------------------------------------------
# Checkpoint conversion (mamba_ssm state-dict naming)
# ---------------------------------------------------------------------------


def convert_hybrid_backbone(sd: dict, zcfg) -> dict:
    cfg: BackboneConfig = zcfg.backbone

    def t(name):
        return np.asarray(sd[name], np.float32)

    layers = []
    for i in range(cfg.n_layer):
        pre = f"backbone.layers.{i}."
        lp: dict = {"norm_scale": t(pre + "norm.weight")}
        if pre + "norm.bias" in sd:
            lp["norm_bias"] = t(pre + "norm.bias")
        if is_attn_layer(cfg, i):
            lp["wqkv"] = t(pre + "mixer.Wqkv.weight").T if pre + "mixer.Wqkv.weight" in sd else t(pre + "mixer.in_proj.weight").T
            lp["wo"] = t(pre + "mixer.out_proj.weight").T
        else:
            lp["in_proj"] = t(pre + "mixer.in_proj.weight").T
            lp["conv_w"] = t(pre + "mixer.conv1d.weight")[:, 0, :].T  # [C,1,K] -> [K,C]
            lp["conv_b"] = t(pre + "mixer.conv1d.bias")
            lp["A_log"] = t(pre + "mixer.A_log")
            lp["D"] = t(pre + "mixer.D")
            lp["dt_bias"] = t(pre + "mixer.dt_bias")
            lp["mixer_norm"] = t(pre + "mixer.norm.weight")
            lp["out_proj"] = t(pre + "mixer.out_proj.weight").T
        if pre + "mlp.fc1.weight" in sd:
            lp["norm2_scale"] = t(pre + "norm2.weight")
            if pre + "norm2.bias" in sd:
                lp["norm2_bias"] = t(pre + "norm2.bias")
            lp["w1"] = t(pre + "mlp.fc1.weight").T
            lp["w2"] = t(pre + "mlp.fc2.weight").T
        layers.append(lp)
    out = {"layers_list": layers, "normf_scale": t("backbone.norm_f.weight")}
    if "backbone.norm_f.bias" in sd:
        out["normf_bias"] = t("backbone.norm_f.bias")
    return out
