"""Fused snake-conv Pallas kernel vs the XLA DAC ops (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.models.dac.codec import _res_unit, _res_unit_init
from zonos_tpu.models.dac.layers import conv1d, snake
from zonos_tpu.ops.pallas_dac import snake_conv1d_pallas, snake_residual_unit_pallas


def test_snake_conv_matches_xla():
    rng = np.random.default_rng(0)
    B, T, C_in, C_out, k, dil = 2, 40, 16, 24, 7, 3
    x = jnp.asarray(rng.normal(size=(B, T, C_in)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.5, 1.5, C_in).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, C_in, C_out)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(C_out,)).astype(np.float32))

    pad = (k - 1) * dil // 2
    ref = conv1d(snake(x, alpha), w, b, padding=pad, dilation=dil)
    got = snake_conv1d_pallas(x, alpha, w, b, dilation=dil, t_tile=16, c_tile=8,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_snake_conv_nondivisible_shapes():
    rng = np.random.default_rng(1)
    B, T, C_in, C_out = 1, 37, 8, 10  # neither T nor C_out tile-divisible
    x = jnp.asarray(rng.normal(size=(B, T, C_in)).astype(np.float32))
    alpha = jnp.ones((C_in,), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, C_in, C_out)).astype(np.float32))
    b = jnp.zeros((C_out,), jnp.float32)
    ref = conv1d(snake(x, alpha), w, b)
    got = snake_conv1d_pallas(x, alpha, w, b, t_tile=16, c_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_residual_unit_matches_codec():
    rng = np.random.default_rng(2)
    dim, dil = 16, 9
    params = _res_unit_init(jax.random.key(0), dim, dil)
    x = jnp.asarray(rng.normal(size=(1, 50, dim)).astype(np.float32))
    ref = _res_unit(params, x, dil)
    got = snake_residual_unit_pallas(params, x, dil, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
