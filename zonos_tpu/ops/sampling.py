"""Token sampling pipeline.

Functionally equivalent to the reference sampler (`zonos/sampling.py:232-328`):
repetition penalty -> temperature softmax -> NovelAI "unified" reshaping ->
top-p -> top-k -> min-p -> categorical draw (temperature=0 => greedy argmax).

TPU-first design differences from the reference:

- Pure function of an explicit PRNG key — every sample in a batch gets an
  independent, reproducible stream; no global generator state.
- All gating on hyperparameters happens at *trace* time (the params are
  static Python numbers), so the compiled program contains only the stages
  that are enabled — the same effect as the reference's Python ``if``s but
  inside one fused XLA computation.
- The categorical draw uses the Gumbel-race argmax (equivalent to the
  reference's exponential race, `zonos/sampling.py:26-28`): a single
  reduction, no cumsum/searchsorted — the shape the VPU likes.
- The repetition penalty builds occurrence counts with a one-hot matmul over
  the short penalty window instead of ``scatter_reduce(prod)``
  (`zonos/sampling.py:149`), because scatter is serial on TPU while the
  window one-hot contraction is a tiny MXU op.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")

logger = logging.getLogger("zonos_tpu.sampling")
trace_logger = logging.getLogger("zonos_tpu.sampling.trace")

_TRACE_STATS = False


def set_sampling_trace(on: bool) -> None:
    """Enable per-step sampling-distribution stats (the reference's debug
    instrumentation, zonos/sampling.py:206-230).  Trace-time switch: set it
    BEFORE the first ``generate`` call so the compiled program includes the
    host callback; enabling it later has no effect on cached programs."""
    global _TRACE_STATS
    _TRACE_STATS = bool(on)


def _emit_prob_stats(probs) -> None:
    """Host-side callback: entropy / top-prob / support-size per codebook."""
    import numpy as np

    p = np.asarray(probs, np.float32)  # [B, K, V]
    with np.errstate(divide="ignore", invalid="ignore"):
        ent = -np.nansum(np.where(p > 0, p * np.log(p), 0.0), axis=-1)
    trace_logger.debug(
        "probs: top=%s entropy=%s support=%s",
        np.round(p.max(axis=-1), 4).tolist(),
        np.round(ent, 3).tolist(),
        (p > 1e-6).sum(axis=-1).tolist(),
    )


@dataclass(frozen=True)
class SamplingParams:
    """Static sampling hyperparameters (defaults match zonos/model.py:232-241)."""

    temperature: float = 1.0
    top_p: float = 0.0
    top_k: int = 0
    min_p: float = 0.0
    linear: float = 0.55
    conf: float = 0.4
    quad: float = 0.0
    repetition_penalty: float = 3.0
    repetition_penalty_window: int = 2
    # Statically ban the EOS token so every sample generates exactly its
    # step budget (trace-time gate in models/tts.py).  Benchmarks use this
    # to pin generated lengths — RTF then measures the program, not the
    # run's sampled EOS luck.  Not part of the reference sampler surface.
    ban_eos: bool = False

    @classmethod
    def greedy(cls) -> "SamplingParams":
        return cls(temperature=0.0, linear=0.0, conf=0.0, quad=0.0, repetition_penalty=1.0)


def apply_unified(probs: jnp.ndarray, linear: float, conf: float, quad: float) -> jnp.ndarray:
    """NovelAI unified sampler: reshape log-probs by entropy-adaptive scaling.

    ``raw = logp * (linear + H * conf) - logp^2 * quad`` then softmax
    (ref oracle: zonos/sampling.py:54-75).
    """
    logprobs = jnp.log(jnp.clip(probs, min=1e-20))
    entropy = -jnp.sum(probs * logprobs, axis=-1, keepdims=True)
    raw = logprobs * (linear + entropy * conf) - jnp.square(logprobs) * quad
    return jax.nn.softmax(raw, axis=-1)


def apply_top_p(probs: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filter: keep the smallest prefix of sorted probs with mass > p.

    Matches zonos/sampling.py:96-111: a sorted token survives while the
    cumulative mass *above* it is <= p.
    """
    order = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = (cum - sorted_probs) <= p
    kept = jnp.where(keep_sorted, sorted_probs, 0.0)
    inv = jnp.argsort(order, axis=-1)
    out = jnp.take_along_axis(kept, inv, axis=-1)
    return out / jnp.sum(out, axis=-1, keepdims=True)


def apply_top_k(probs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k largest probs (ties included, matching the pivot rule of
    zonos/sampling.py:77-93), renormalize."""
    k = min(int(k), probs.shape[-1])
    pivot = jax.lax.top_k(probs, k)[0][..., -1:]
    out = jnp.where(probs < pivot, 0.0, probs)
    return out / jnp.sum(out, axis=-1, keepdims=True)


def apply_min_p(probs: jnp.ndarray, min_p: float) -> jnp.ndarray:
    """Drop tokens below ``min_p * max_prob`` (ref: zonos/sampling.py:114-128)."""
    top = jnp.max(probs, axis=-1, keepdims=True)
    out = jnp.where(probs < min_p * top, 0.0, probs)
    return out / jnp.sum(out, axis=-1, keepdims=True)


def apply_repetition_penalty(
    logits: jnp.ndarray,
    generated_tokens: jnp.ndarray,
    penalty: jnp.ndarray,
    window: int,
) -> jnp.ndarray:
    """CTRL-style repetition penalty over the trailing ``window`` tokens.

    ``logits``: [B, K, V]; ``generated_tokens``: [B, K, W] (already the
    window slice, int); ``penalty``: scalar or [B] per-sample factors.
    A token seen n times in the window is scaled by ``penalty**n``
    (divide for positive logits, multiply for negative), matching
    zonos/sampling.py:131-169.
    """
    V = logits.shape[-1]
    window_tokens = generated_tokens[..., -window:]
    toks = jnp.clip(window_tokens, 0, V - 1).astype(jnp.int32)
    counts = jnp.sum(jax.nn.one_hot(toks, V, dtype=logits.dtype), axis=-2)  # [B,K,V]
    penalty = jnp.asarray(penalty, dtype=logits.dtype)
    if penalty.ndim == 1:
        penalty = penalty[:, None, None]
    factors = jnp.power(penalty, counts)
    return jnp.where(logits <= 0, logits * factors, logits / factors)


def categorical_race(key: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """Draw one index per distribution via the Gumbel-race argmax.

    Identical in distribution to the reference's exponential race
    (zonos/sampling.py:26-28): argmax(p/q), q ~ Exp(1)  ==  argmax(log p + G).

    ``key`` may be one key (one stream covers the whole batch) or a [B]
    batch of keys matching ``probs``'s leading axis — then each row draws
    from its OWN stream, so a row's tokens are independent of which peers
    share its device batch (batch-composition-independent serving PRNG)."""
    if key.ndim:
        g = jax.vmap(
            lambda k, p: jax.random.gumbel(k, p.shape, dtype=jnp.float32)
        )(key, probs)
    else:
        g = jax.random.gumbel(key, probs.shape, dtype=jnp.float32)
    scores = jnp.where(probs > 0, jnp.log(probs) + g, NEG_INF)
    return jnp.argmax(scores, axis=-1)


def sample_from_logits(
    key: jax.Array,
    logits: jnp.ndarray,
    params: SamplingParams,
    generated_tokens: jnp.ndarray | None = None,
    repetition_penalty: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sample next tokens ``[B, K]`` from logits ``[B, K, V]``.

    ``repetition_penalty`` optionally overrides the static penalty with a
    traced per-sample ``[B]`` array (the decode loop sets it to 1.0 for
    samples in EOS mode, ref: zonos/model.py:356).
    """
    p = params
    if generated_tokens is not None and p.repetition_penalty_window > 0:
        rp = repetition_penalty
        if rp is None:
            rp = jnp.asarray(p.repetition_penalty, dtype=logits.dtype)
        apply = p.repetition_penalty != 1.0 or repetition_penalty is not None
        if apply:
            logits = apply_repetition_penalty(
                logits, generated_tokens, rp, p.repetition_penalty_window
            )

    if p.temperature <= 0:
        return jnp.argmax(logits, axis=-1)

    from zonos_tpu.ops.attention import use_pallas

    if use_pallas() and p.top_p == 0 and p.top_k == 0:
        from zonos_tpu.ops.pallas_kernels import fused_sample_pallas

        return fused_sample_pallas(
            key, logits.astype(jnp.float32), linear=p.linear, conf=p.conf,
            quad=p.quad, min_p=p.min_p, temperature=p.temperature,
        )

    probs = jax.nn.softmax(logits / p.temperature, axis=-1)
    if p.linear > 0:
        probs = apply_unified(probs, p.linear, p.conf, p.quad)
    if p.top_p > 0:
        probs = apply_top_p(probs, p.top_p)
    if p.top_k > 0:
        probs = apply_top_k(probs, p.top_k)
    if p.min_p > 0:
        probs = apply_min_p(probs, p.min_p)
    if _TRACE_STATS:
        jax.debug.callback(_emit_prob_stats, probs)
    return categorical_race(key, probs)
