"""Mamba2/SSD and hybrid backbone tests: chunked scan vs serial oracle,
prefill/decode consistency, end-to-end hybrid generation."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.config import HYBRID_CONFIG_DICT, ZonosConfig
from zonos_tpu.models.hybrid import (
    create_hybrid_cache,
    hybrid_decode_step,
    hybrid_prefill,
    init_hybrid_params,
)
from zonos_tpu.ops.ssm import (
    causal_conv1d_prefill,
    causal_conv1d_step,
    ssd_chunked,
    ssd_decode_step,
)


def _serial_ssd_oracle(x, dt, A, Bm, Cm, D):
    """Naive per-step recurrence in numpy (ground truth)."""
    B_, L, H, P = x.shape
    G, N = Bm.shape[2], Bm.shape[3]
    h = np.zeros((B_, H, P, N))
    ys = np.zeros_like(x)
    rep = H // G
    for t in range(L):
        for b in range(B_):
            for hh in range(H):
                g = hh // rep
                dA = np.exp(dt[b, t, hh] * A[hh])
                h[b, hh] = dA * h[b, hh] + dt[b, t, hh] * np.outer(x[b, t, hh], Bm[b, t, g])
                ys[b, t, hh] = h[b, hh] @ Cm[b, t, g] + D[hh] * x[b, t, hh]
    return ys, h


def test_ssd_chunked_matches_serial_oracle():
    rng = np.random.default_rng(0)
    B_, L, H, P, G, N = 2, 37, 4, 8, 2, 16  # L deliberately not a chunk multiple
    x = rng.normal(size=(B_, L, H, P)).astype(np.float32)
    dt = rng.uniform(0.01, 0.5, size=(B_, L, H)).astype(np.float32)
    A = -rng.uniform(0.5, 2.0, size=(H,)).astype(np.float32)
    Bm = rng.normal(size=(B_, L, G, N)).astype(np.float32)
    Cm = rng.normal(size=(B_, L, G, N)).astype(np.float32)
    D = rng.normal(size=(H,)).astype(np.float32)

    y_ref, h_ref = _serial_ssd_oracle(x, dt, A, Bm, Cm, D)
    y, h = ssd_chunked(jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A),
                       jnp.asarray(Bm), jnp.asarray(Cm), jnp.asarray(D), chunk=16)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h), h_ref, rtol=2e-4, atol=2e-4)


def test_ssd_decode_continues_prefill():
    rng = np.random.default_rng(1)
    B_, L, H, P, G, N = 1, 20, 2, 4, 1, 8
    mk = lambda *s: rng.normal(size=s).astype(np.float32)
    x, Bm, Cm = mk(B_, L, H, P), mk(B_, L, G, N), mk(B_, L, G, N)
    dt = rng.uniform(0.01, 0.5, size=(B_, L, H)).astype(np.float32)
    A = -rng.uniform(0.5, 2.0, size=(H,)).astype(np.float32)
    D = mk(H)

    y_full, h_full = ssd_chunked(*map(jnp.asarray, (x, dt, A, Bm, Cm, D)), chunk=8)
    split = L - 4
    y_a, h = ssd_chunked(*map(jnp.asarray, (x[:, :split], dt[:, :split], A,
                                            Bm[:, :split], Cm[:, :split], D)), chunk=8)
    ys = [np.asarray(y_a)]
    for t in range(split, L):
        y_t, h = ssd_decode_step(
            jnp.asarray(x[:, t]), jnp.asarray(dt[:, t]), jnp.asarray(A),
            jnp.asarray(Bm[:, t]), jnp.asarray(Cm[:, t]), jnp.asarray(D), h
        )
        ys.append(np.asarray(y_t)[:, None])
    y_steps = np.concatenate(ys, axis=1)
    np.testing.assert_allclose(y_steps, np.asarray(y_full), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_full), rtol=2e-4, atol=2e-4)


def test_causal_conv_streaming():
    rng = np.random.default_rng(2)
    B_, L, C, K = 2, 11, 6, 4
    x = rng.normal(size=(B_, L, C)).astype(np.float32)
    w = rng.normal(size=(K, C)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    y_full, state = causal_conv1d_prefill(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    # continue streaming 3 more steps and compare against a longer prefill
    x2 = rng.normal(size=(B_, 3, C)).astype(np.float32)
    y_ext, _ = causal_conv1d_prefill(jnp.asarray(np.concatenate([x, x2], 1)),
                                     jnp.asarray(w), jnp.asarray(b))
    st = state
    for t in range(3):
        y_t, st = causal_conv1d_step(jnp.asarray(x2[:, t]), st, jnp.asarray(w), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(y_t), np.asarray(y_ext)[:, L + t], rtol=1e-5, atol=1e-5)


def _tiny_hybrid_cfg():
    d = copy.deepcopy(HYBRID_CONFIG_DICT)
    d["backbone"].update(
        {
            "d_model": 64,
            "n_layer": 4,
            "attn_layer_idx": [1, 3],
            "attn_mlp_d_intermediate": 128,
            "ssm_cfg": {"layer": "Mamba2", "d_state": 16, "expand": 2, "headdim": 16},
            "attn_cfg": {"num_heads": 4, "num_heads_kv": 2, "head_dim": 16, "rotary_emb_dim": 8},
        }
    )
    return ZonosConfig.from_dict(d)


def test_hybrid_prefill_matches_stepwise():
    cfg = _tiny_hybrid_cfg().backbone
    params = init_hybrid_params(jax.random.key(0), cfg, dtype=jnp.float32)
    B_, S, S_max = 2, 9, 16
    x = jax.random.normal(jax.random.key(1), (B_, S, cfg.d_model), jnp.float32)

    cache = create_hybrid_cache(cfg, B_, S_max, jnp.float32)
    h_full, _ = hybrid_prefill(cfg, params, x, cache)

    cache = create_hybrid_cache(cfg, B_, S_max, jnp.float32)
    split = S - 3
    h_pre, cache = hybrid_prefill(cfg, params, x[:, :split], cache)
    outs = []
    for t in range(split, S):
        h_t, cache = hybrid_decode_step(cfg, params, x[:, t : t + 1], cache, jnp.int32(t))
        outs.append(h_t)
    h_steps = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(h_full[:, split:]), np.asarray(h_steps),
                               rtol=5e-4, atol=5e-4)


def test_hybrid_generate_end_to_end():
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.sampling import SamplingParams

    model = Zonos(_tiny_hybrid_cfg(), seed=0)
    prefix = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 7, 64)), jnp.bfloat16
    )
    out = model.generate(prefix, max_new_tokens=8, seed=3,
                         sampling_params=SamplingParams.greedy())
    assert out[0].shape[0] == 9 and out[0].shape[1] <= 8
    assert ((out[0] >= 0) & (out[0] < 1024)).all()


def test_bf16_ssm_state_stays_close(monkeypatch):
    """ZONOS_TPU_SSM_BF16=1 halves decode-state HBM traffic; outputs must
    stay distribution-close to the fp32-state run (contractive recurrence)."""
    monkeypatch.setenv("ZONOS_TPU_SSM_BF16", "0")
    cfg = _tiny_hybrid_cfg().backbone
    params = init_hybrid_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    B_, S_max = 2, 64
    x = jax.random.normal(jax.random.key(1), (B_, 1, cfg.d_model), jnp.bfloat16)

    def run():
        cache = create_hybrid_cache(cfg, B_, S_max)
        outs = []
        h = x
        for t in range(32):
            h_out, cache = hybrid_decode_step(cfg, params, h, cache, jnp.int32(t))
            outs.append(np.asarray(h_out, np.float32))
            h = h_out.astype(jnp.bfloat16)
        return np.concatenate(outs, axis=1)

    ref = run()
    monkeypatch.setenv("ZONOS_TPU_SSM_BF16", "1")
    got = run()
    err = np.abs(got - ref).mean()
    scale = np.abs(ref).mean() + 1e-6
    # measured ~0.21 mean rel err on random weights after 32 steps x 48 layers
    # of feedback (was ~0.11 before residual_in_fp32: the more-precise fp32
    # residual stream makes the bf16-state divergence more visible) -- a lossy
    # serving mode (documented), not a parity mode
    assert err / scale < 0.35, f"bf16 ssm state diverged: rel err {err/scale:.3f}"


def test_ssm_state_mode_selection(monkeypatch):
    from zonos_tpu.models.hybrid import ssm_state_mode

    monkeypatch.delenv("ZONOS_TPU_SSM_STATE", raising=False)
    monkeypatch.delenv("ZONOS_TPU_SSM_BF16", raising=False)
    assert ssm_state_mode(1) == "fp32"  # weight-bound: exactness is free
    assert ssm_state_mode(15) == "fp32"
    assert ssm_state_mode(16) == "f8"  # state-bound: measured large-batch winner
    assert ssm_state_mode(None) == "fp32"
    monkeypatch.setenv("ZONOS_TPU_SSM_BF16", "1")  # legacy knob still honored
    assert ssm_state_mode(64) == "bf16"
    monkeypatch.setenv("ZONOS_TPU_SSM_STATE", "int8")  # new knob wins
    assert ssm_state_mode(1) == "int8"
    monkeypatch.setenv("ZONOS_TPU_SSM_STATE", "fp16")
    import pytest

    with pytest.raises(ValueError):
        ssm_state_mode(1)


def test_ssm_state_store_load_roundtrip():
    """int8 mode must round-trip on-grid states exactly (q/127*absmax grid);
    f8 must clip instead of overflowing to NaN (e4m3fn has no inf)."""
    from zonos_tpu.models.hybrid import _load_ssm, _store_ssm

    rng = np.random.default_rng(7)
    B_, H, P, N = 2, 3, 4, 8
    # on-grid: integers in [-127, 127] scaled per-(b, h)
    q = rng.integers(-127, 128, size=(B_, H, P, N)).astype(np.float32)
    scale = rng.uniform(0.01, 2.0, size=(B_, H, 1, 1)).astype(np.float32)
    # force absmax row so the stored scale reproduces `scale` exactly
    q[:, :, 0, 0] = 127.0
    st = jnp.asarray(q * scale)

    cache = {"ssm": jnp.zeros((B_, H, P, N), jnp.int8),
             "ssm_scale": jnp.ones((B_, H, 1, 1), jnp.float32)}
    back = _load_ssm(_store_ssm(st, cache))
    np.testing.assert_allclose(np.asarray(back), np.asarray(st), rtol=1e-6, atol=1e-6)

    # int4: on the +-7 grid, nibble packing round-trips exactly
    q4 = np.clip(np.round(q / 18.15), -7, 7).astype(np.float32)
    q4[:, :, 0, 0] = 7.0
    st4 = jnp.asarray(q4 * scale)
    c4 = {"ssm_q4": jnp.zeros((B_, H, P, N // 2), jnp.int8),
          "ssm_scale": jnp.ones((B_, H, 1, 1), jnp.float32)}
    back4 = _load_ssm(_store_ssm(st4, c4))
    np.testing.assert_allclose(np.asarray(back4), np.asarray(st4), rtol=1e-5, atol=1e-5)

    f8cache = {"ssm": jnp.zeros((B_, H, P, N), jnp.float8_e4m3fn)}
    big = jnp.full((B_, H, P, N), 1e6, jnp.float32)
    clipped = _load_ssm(_store_ssm(big, f8cache))
    assert np.isfinite(np.asarray(clipped)).all()
    assert float(np.asarray(clipped).max()) == 448.0


def test_quantized_ssm_state_stays_close(monkeypatch):
    """f8 and int8 state modes quarter decode-state HBM traffic; the
    contractive recurrence (dA<1) bounds the storage-rounding feedback.
    Same protocol as the bf16 test above; both modes must stay closer than
    the documented bf16 drift would suggest relative to their precision."""
    cfg = _tiny_hybrid_cfg().backbone
    params = init_hybrid_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    B_, S_max = 2, 64
    x = jax.random.normal(jax.random.key(1), (B_, 1, cfg.d_model), jnp.bfloat16)

    def run():
        cache = create_hybrid_cache(cfg, B_, S_max)
        outs = []
        h = x
        for t in range(32):
            h_out, cache = hybrid_decode_step(cfg, params, h, cache, jnp.int32(t))
            outs.append(np.asarray(h_out, np.float32))
            h = h_out.astype(jnp.bfloat16)
        return np.concatenate(outs, axis=1)

    monkeypatch.setenv("ZONOS_TPU_SSM_STATE", "fp32")
    ref = run()
    scale = np.abs(ref).mean() + 1e-6
    for mode, ceiling in [("f8", 0.45), ("int8", 0.35), ("int4", 0.80)]:
        monkeypatch.setenv("ZONOS_TPU_SSM_STATE", mode)
        got = run()
        err = np.abs(got - ref).mean() / scale
        assert err < ceiling, f"{mode} ssm state diverged: rel err {err:.3f}"
        assert np.isfinite(got).all()


def test_state_contract_mxu_matches_matvec(monkeypatch):
    """The block-diagonal MXU formulation of the per-step state contraction
    (ops/ssm.py:_state_contract) must equal the plain per-(b,h) matvec up to
    bf16 operand rounding (the MXU path casts operands to bf16 with fp32
    accumulation — the same precision class as every serving matmul; for
    f8/bf16-stored states the cast is lossless).  Covers TB-divisibility
    fallbacks too."""
    from zonos_tpu.ops.ssm import _state_contract

    rng = np.random.default_rng(0)
    for B_, H, P, N in [(16, 64, 8, 32), (4, 6, 8, 16), (1, 3, 4, 8)]:
        state = jnp.asarray(rng.normal(size=(B_, H, P, N)), jnp.float32)
        Ch = jnp.asarray(rng.normal(size=(B_, H, N)), jnp.float32)
        monkeypatch.setenv("ZONOS_TPU_SSM_CONTRACT", "mxu")
        y_mxu = np.asarray(_state_contract(state, Ch))
        monkeypatch.setenv("ZONOS_TPU_SSM_CONTRACT", "vpu")
        y_vpu = np.asarray(_state_contract(state, Ch))
        scale = np.abs(y_vpu).max()
        np.testing.assert_allclose(y_mxu, y_vpu, atol=2e-2 * scale)
        # with bf16-exact inputs (the f8/bf16 stored-state case) the two
        # formulations agree to float tolerance
        sb = jnp.asarray(np.asarray(state, np.float32)).astype(jnp.bfloat16).astype(jnp.float32)
        cb = jnp.asarray(np.asarray(Ch, np.float32)).astype(jnp.bfloat16).astype(jnp.float32)
        monkeypatch.setenv("ZONOS_TPU_SSM_CONTRACT", "mxu")
        y_mxu = np.asarray(_state_contract(sb, cb))
        monkeypatch.setenv("ZONOS_TPU_SSM_CONTRACT", "vpu")
        y_vpu = np.asarray(_state_contract(sb, cb))
        np.testing.assert_allclose(y_mxu, y_vpu, rtol=1e-5, atol=1e-5)


def test_quantized_state_drift_plateaus(monkeypatch):
    """Long-horizon no-growth envelope (VERDICT r3 #4): under teacher
    forcing (same inputs, independent caches) the f8-state drift vs the
    fp32-state run must PLATEAU — the contractive recurrence (dA < 1)
    forgets rounding as fast as it forgets inputs — not compound.  Measured
    flat at flagship scale over 2688 steps on the chip
    (docs/PERFORMANCE.md r4); this pins the same envelope at test scale:
    late-horizon drift must not exceed 1.6x the early plateau."""
    cfg = _tiny_hybrid_cfg().backbone
    params = init_hybrid_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    B_, S_max, T = 2, 420, 400
    xs = np.asarray(
        jax.random.normal(jax.random.key(2), (T, B_, 1, cfg.d_model), jnp.bfloat16)
    ) * 0.1

    def run(mode):
        monkeypatch.setenv("ZONOS_TPU_SSM_STATE", mode)
        cache = create_hybrid_cache(cfg, B_, S_max)
        outs = []
        for t in range(T):
            y, cache = hybrid_decode_step(cfg, params, jnp.asarray(xs[t]), cache,
                                          jnp.int32(t))
            outs.append(np.asarray(y, np.float32))
        return outs

    ref = run("fp32")
    got = run("f8")
    scale = np.mean([np.abs(r).mean() for r in ref]) + 1e-6

    def window_err(lo, hi):
        return np.mean([np.abs(g - r).mean() for g, r in
                        zip(got[lo:hi], ref[lo:hi])]) / scale

    early = window_err(32, 96)    # plateau reached within ~one state lifetime
    late = window_err(T - 64, T)  # 6x further out
    assert late < 1.6 * early + 1e-3, (
        f"f8 state drift grew over the horizon: early {early:.3f} late {late:.3f}"
    )
    assert np.isfinite(late) and late < 1.0
