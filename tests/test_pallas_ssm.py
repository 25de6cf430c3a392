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
