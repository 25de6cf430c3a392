"""Delay codebook pattern.

Multi-codebook AR decoding staggers codebook ``k`` by ``k+1`` steps so the
model predicts one token per codebook per frame while respecting the
intra-frame dependency order.  Behavior matches the reference oracle
(`zonos/codebook_pattern.py:5-12`) exactly; the implementation is a static
gather composed at trace time (no per-codebook Python in the jitted graph),
which XLA lowers to a single fused copy — there is nothing for a custom
kernel to win here.

Layout note: codes are ``[batch, n_codebooks, time]`` int32.  n_codebooks is
9 and static, so the roll/slice offsets are compile-time constants.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def apply_delay_pattern(codes: jnp.ndarray, mask_token: int) -> jnp.ndarray:
    """Stagger codebooks: output[:, k, t] = codes[:, k, t-(k+1)], mask before.

    Input  ``[B, K, T]`` -> output ``[B, K, T+K]``; position ``t`` of codebook
    ``k`` holds the frame generated at step ``t-(k+1)`` (mask token for
    ``t < k+1`` and for the tail beyond the source length).
    """
    B, K, T = codes.shape
    padded = jnp.pad(codes, ((0, 0), (0, 0), (0, K)), constant_values=mask_token)
    rows = [jnp.roll(padded[:, k], k + 1, axis=-1) for k in range(K)]
    return jnp.stack(rows, axis=1)


def revert_delay_pattern(codes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`apply_delay_pattern` (drops the mask padding).

    Input ``[B, K, S]`` -> output ``[B, K, S-K]`` with
    ``out[:, k, t] = codes[:, k, t+k+1]``.

    Accepts numpy or jax arrays and stays in the caller's namespace: the
    post-generate trim runs on host-resident codes, and eager jnp slicing
    there would dispatch ~10 tiny device ops (each a round-trip on a
    tunneled TPU) for work numpy does in microseconds.
    """
    xp = np if isinstance(codes, np.ndarray) else jnp
    B, K, S = codes.shape
    rows = [codes[:, k, k + 1 : S - K + k + 1] for k in range(K)]
    return xp.stack(rows, axis=1)
