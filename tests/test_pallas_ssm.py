"""Pallas SSD (Mamba2 selective-scan) kernel vs the XLA oracle (interpret
mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zonos_tpu.ops.pallas_ssm import ssd_chunked_pallas
from zonos_tpu.ops.ssm import ssd_chunked


def _random_case(rng, B, L, H, P, N, with_init=True):
    x = jnp.asarray(rng.normal(size=(B, L, H, P)), jnp.float32)
    dt = jnp.asarray(np.abs(rng.normal(size=(B, L, H))) * 0.5, jnp.float32)
    A = jnp.asarray(-np.abs(rng.normal(size=(H,))), jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(B, L, 1, N)), jnp.float32)
    Cm = jnp.asarray(rng.normal(size=(B, L, 1, N)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(H,)), jnp.float32)
    init = jnp.asarray(rng.normal(size=(B, H, P, N)), jnp.float32) if with_init else None
    return x, dt, A, Bm, Cm, D, init


@pytest.mark.parametrize("L", [64, 150, 37])  # aligned, padded, sub-chunk
def test_matches_xla_oracle(L):
    rng = np.random.default_rng(L)
    x, dt, A, Bm, Cm, D, init = _random_case(rng, 2, L, 4, 64, 128)
    ref_y, ref_s = ssd_chunked(x, dt, A, Bm, Cm, D, init_state=init)
    got_y, got_s = ssd_chunked_pallas(x, dt, A, Bm, Cm, D, init_state=init, interpret=True)
    scale = float(jnp.max(jnp.abs(ref_y)))
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y), atol=1e-4 * scale)
    s_scale = float(jnp.max(jnp.abs(ref_s)))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), atol=1e-4 * s_scale)


def test_no_init_state():
    rng = np.random.default_rng(9)
    x, dt, A, Bm, Cm, D, _ = _random_case(rng, 1, 128, 2, 64, 128, with_init=False)
    ref_y, ref_s = ssd_chunked(x, dt, A, Bm, Cm, D)
    got_y, got_s = ssd_chunked_pallas(x, dt, A, Bm, Cm, D, interpret=True)
    scale = float(jnp.max(jnp.abs(ref_y)))
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y), atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               atol=1e-4 * float(jnp.max(jnp.abs(ref_s))))


def test_state_feeds_decode_step():
    """The kernel's final state must continue exactly like the oracle's when
    handed to the streaming decode step."""
    from zonos_tpu.ops.ssm import ssd_decode_step

    rng = np.random.default_rng(3)
    x, dt, A, Bm, Cm, D, init = _random_case(rng, 1, 70, 2, 64, 128)
    _, s_ref = ssd_chunked(x, dt, A, Bm, Cm, D, init_state=init)
    _, s_got = ssd_chunked_pallas(x, dt, A, Bm, Cm, D, init_state=init, interpret=True)
    xs = jnp.asarray(rng.normal(size=(1, 2, 64)), jnp.float32)
    dts = jnp.asarray(np.abs(rng.normal(size=(1, 2))), jnp.float32)
    Bs = jnp.asarray(rng.normal(size=(1, 1, 128)), jnp.float32)
    Cs = jnp.asarray(rng.normal(size=(1, 1, 128)), jnp.float32)
    y_ref, _ = ssd_decode_step(xs, dts, A, Bs, Cs, D, s_ref)
    y_got, _ = ssd_decode_step(xs, dts, A, Bs, Cs, D, s_got)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref), rtol=1e-4, atol=1e-4)


def test_fused_state_step_matches_xla():
    """The fused decode-state kernel (ops/pallas_state.py) must reproduce
    the contraction and update halves of ssd_decode_step exactly (fp32) and
    up to storage rounding (f8/bf16)."""
    import jax
    import jax.numpy as jnp

    from zonos_tpu.ops.pallas_state import fused_state_step

    rng = np.random.default_rng(0)
    BH, P, N = 12, 8, 16
    state = jnp.asarray(rng.normal(size=(BH, P, N)), jnp.float32)
    Ch = jnp.asarray(rng.normal(size=(BH, N)), jnp.float32)
    Bh = jnp.asarray(rng.normal(size=(BH, N)), jnp.float32)
    dA = jnp.asarray(rng.uniform(0.5, 1.0, size=(BH, 1)), jnp.float32)
    xdt = jnp.asarray(rng.normal(size=(BH, P)), jnp.float32)

    y, ns = fused_state_step(state, Ch, Bh, dA, xdt, interpret=True)
    y_ref = jnp.einsum("bpn,bn->bp", state, Ch)
    ns_ref = state * dA[..., None] + xdt[..., None] * Bh[:, None, :]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ns), np.asarray(ns_ref), rtol=1e-5, atol=1e-5)

    for dt in (jnp.bfloat16, jnp.float8_e4m3fn):
        y2, ns2 = fused_state_step(state.astype(dt), Ch, Bh, dA, xdt,
                                   interpret=True)
        assert ns2.dtype == dt
        scale = float(np.abs(np.asarray(y_ref)).max())
        tol = 0.05 if dt == jnp.bfloat16 else 0.4
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y_ref),
                                   atol=tol * scale)
