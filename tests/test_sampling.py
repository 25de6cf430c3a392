"""Sampling-pipeline unit tests: each stage vs independent numpy oracles of
the reference math (zonos/sampling.py:54-169)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_tpu.ops.sampling import (
    SamplingParams,
    apply_min_p,
    apply_repetition_penalty,
    apply_top_k,
    apply_top_p,
    apply_unified,
    sample_from_logits,
)


def _rand_probs(shape, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.random(shape) + 1e-3
    return p / p.sum(-1, keepdims=True)


def test_unified_oracle():
    probs = _rand_probs((2, 3, 50))
    linear, conf, quad = 0.55, 0.4, 0.1
    lp = np.log(np.clip(probs, 1e-20, None))
    H = -(probs * lp).sum(-1, keepdims=True)
    raw = lp * (linear + H * conf) - lp**2 * quad
    e = np.exp(raw - raw.max(-1, keepdims=True))
    expect = e / e.sum(-1, keepdims=True)
    got = np.asarray(apply_unified(jnp.asarray(probs), linear, conf, quad))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-7)


def test_top_p_oracle():
    probs = _rand_probs((2, 2, 40), seed=1)
    p = 0.7
    got = np.asarray(apply_top_p(jnp.asarray(probs), p))
    # oracle: sort desc, keep while cumulative-mass-above <= p
    for idx in np.ndindex(2, 2):
        row = probs[idx]
        order = np.argsort(-row)
        keep = np.zeros_like(row, bool)
        cum = 0.0
        for j in order:
            if cum <= p:
                keep[j] = True
            cum += row[j]
        expect = np.where(keep, row, 0.0)
        expect /= expect.sum()
        np.testing.assert_allclose(got[idx], expect, rtol=1e-5, atol=1e-7)


def test_top_k():
    probs = _rand_probs((1, 1, 20), seed=2)
    got = np.asarray(apply_top_k(jnp.asarray(probs), 5))
    assert (got > 0).sum() == 5
    top5 = np.sort(probs[0, 0])[-5:]
    np.testing.assert_allclose(np.sort(got[0, 0])[-5:], top5 / top5.sum(), rtol=1e-5)


def test_min_p():
    probs = np.array([[[0.5, 0.3, 0.15, 0.05]]])
    got = np.asarray(apply_min_p(jnp.asarray(probs), 0.4))
    # tokens below 0.4*0.5=0.2 dropped
    expect = np.array([0.5, 0.3, 0.0, 0.0])
    expect /= expect.sum()
    np.testing.assert_allclose(got[0, 0], expect, rtol=1e-6)


def test_repetition_penalty_oracle():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 3, 30)).astype(np.float32)
    window_tokens = rng.integers(0, 30, size=(2, 3, 4))
    penalty = 2.5
    got = np.asarray(
        apply_repetition_penalty(
            jnp.asarray(logits), jnp.asarray(window_tokens), jnp.float32(penalty), 4
        )
    )
    factors = np.ones_like(logits)
    for b in range(2):
        for k in range(3):
            for t in window_tokens[b, k]:
                factors[b, k, t] *= penalty
    expect = np.where(logits <= 0, logits * factors, logits / factors)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_repetition_penalty_per_sample():
    logits = jnp.ones((2, 1, 8))
    toks = jnp.zeros((2, 1, 2), jnp.int32)
    rp = jnp.asarray([2.0, 1.0])
    got = np.asarray(apply_repetition_penalty(logits, toks, rp, 2))
    assert got[0, 0, 0] == pytest.approx(1.0 / 4.0)  # penalized twice
    assert got[1, 0, 0] == pytest.approx(1.0)  # penalty 1 = no-op


def test_greedy():
    logits = jnp.asarray(np.random.default_rng(4).normal(size=(2, 9, 100)).astype(np.float32))
    tok = sample_from_logits(jax.random.key(0), logits, SamplingParams.greedy())
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(jnp.argmax(logits, -1)))


def test_categorical_distribution():
    """The Gumbel race must reproduce the target distribution."""
    probs = jnp.asarray([[[0.6, 0.3, 0.1, 0.0]]])
    logits = jnp.log(jnp.clip(probs, 1e-9))
    params = SamplingParams(temperature=1.0, linear=0.0, repetition_penalty=1.0)
    keys = jax.random.split(jax.random.key(0), 4000)
    draws = jax.vmap(lambda k: sample_from_logits(k, logits, params))(keys)
    counts = np.bincount(np.asarray(draws).ravel(), minlength=4) / 4000
    np.testing.assert_allclose(counts, [0.6, 0.3, 0.1, 0.0], atol=0.03)


def test_zero_prob_never_sampled():
    probs = jnp.asarray([[[0.0, 1.0, 0.0]]])
    logits = jnp.where(probs > 0, 0.0, -jnp.inf)
    params = SamplingParams(temperature=1.0, linear=0.0, repetition_penalty=1.0)
    for s in range(20):
        tok = sample_from_logits(jax.random.key(s), logits, params)
        assert int(tok[0, 0]) == 1


def test_sampling_trace_stats(caplog):
    """--verbose_sampling path: the trace callback emits distribution stats."""
    import logging

    from zonos_tpu.ops.sampling import set_sampling_trace

    logits = jnp.zeros((1, 2, 8))
    params = SamplingParams(temperature=1.0, linear=0.0, repetition_penalty=1.0)
    set_sampling_trace(True)
    try:
        with caplog.at_level(logging.DEBUG, logger="zonos_tpu.sampling.trace"):
            jax.jit(lambda k: sample_from_logits(k, logits, params))(
                jax.random.key(0)
            ).block_until_ready()
    finally:
        set_sampling_trace(False)
    assert any("entropy" in r.message for r in caplog.records)
