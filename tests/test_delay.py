"""Delay-pattern unit tests against the reference oracle semantics
(zonos/codebook_pattern.py:5-12)."""

import jax.numpy as jnp
import numpy as np

from zonos_tpu.ops.delay import apply_delay_pattern, revert_delay_pattern

MASK = 1025


def test_round_trip():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 1024, size=(3, 9, 17)), jnp.int32)
    delayed = apply_delay_pattern(codes, MASK)
    assert delayed.shape == (3, 9, 17 + 9)
    restored = revert_delay_pattern(delayed)
    np.testing.assert_array_equal(np.asarray(restored), np.asarray(codes))


def test_delay_structure():
    B, K, T = 1, 9, 12
    codes = jnp.arange(T, dtype=jnp.int32)[None, None, :].repeat(K, axis=1)
    delayed = np.asarray(apply_delay_pattern(codes, MASK))
    for k in range(K):
        # first k+1 positions of codebook k are mask tokens
        assert (delayed[0, k, : k + 1] == MASK).all()
        # then the original sequence follows
        np.testing.assert_array_equal(delayed[0, k, k + 1 : k + 1 + T], np.arange(T))
        # tail after the data is mask (wrapped padding)
        assert (delayed[0, k, k + 1 + T :] == MASK).all()


def test_matches_roll_oracle():
    """Independent oracle: roll each padded codebook row circularly by k+1."""
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 1024, size=(2, 9, 23)).astype(np.int32)
    padded = np.pad(codes, ((0, 0), (0, 0), (0, 9)), constant_values=MASK)
    expect = np.stack([np.roll(padded[:, k], k + 1, axis=-1) for k in range(9)], axis=1)
    got = np.asarray(apply_delay_pattern(jnp.asarray(codes), MASK))
    np.testing.assert_array_equal(got, expect)
