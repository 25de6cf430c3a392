"""EOS choreography: vectorized per-sample end-of-stream state machine.

This is the trickiest parity logic in the decoder — the reference implements
it imperatively with host syncs (zonos/model.py:336-414):

1. when codebook 0 first samples EOS, the sample enters *EOS mode*, the
   frame is resampled once with EOS banned, and a ~70 ms silence window
   (6 steps) begins during which EOS stays banned;
2. while in EOS mode the repetition penalty is disabled for that sample;
3. once EOS fires (after the window), the sample has 9 steps left and the
   EOS token "walks" down the codebook staircase as the delay drains:
   codebooks below the staircase index emit the mask token, the staircase
   codebook emits EOS.

Here it is a pure function over the batch state so it runs inside the
jitted ``lax.while_loop`` and can be unit-tested against a host-side
simulation of the reference semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class EosState(NamedTuple):
    remaining: jnp.ndarray  # [B] int32 steps left
    stopping: jnp.ndarray  # [B] bool: EOS fired, staircase active
    eos_mode: jnp.ndarray  # [B] bool: first EOS seen
    steps_after_eos: jnp.ndarray  # [B] int32 silence-window countdown

    @classmethod
    def init(cls, batch: int, max_steps: int, window: int):
        return cls(
            remaining=jnp.full((batch,), max_steps, jnp.int32),
            stopping=jnp.zeros((batch,), bool),
            eos_mode=jnp.zeros((batch,), bool),
            steps_after_eos=jnp.full((batch,), window, jnp.int32),
        )


def eos_logit_mask(state: EosState, logits: jnp.ndarray, eos_id: int) -> tuple[jnp.ndarray, EosState]:
    """Pre-sampling: ban EOS in codebook 0 while the silence window runs."""
    eos_active = state.eos_mode & (state.steps_after_eos > 0)
    logits = logits.at[:, 0, eos_id].set(
        jnp.where(eos_active, -jnp.inf, logits[:, 0, eos_id])
    )
    return logits, state._replace(
        steps_after_eos=state.steps_after_eos - eos_active.astype(jnp.int32)
    )


def eos_update(
    state: EosState,
    token: jnp.ndarray,  # [B, K] sampled frame
    resampled: jnp.ndarray,  # [B, K] frame sampled with EOS banned
    eos_id: int,
    mask_id: int,
    n_codebooks: int,
    silence_window: int,
) -> tuple[jnp.ndarray, EosState]:
    """Post-sampling: first-EOS resample substitution, remaining-step
    clamping, and staircase token placement.  Returns the final frame."""
    new_eos = (token[:, 0] == eos_id) & (~state.eos_mode)
    token = jnp.where(new_eos[:, None], resampled, token)
    eos_mode = state.eos_mode | new_eos
    steps_after_eos = jnp.where(new_eos, silence_window, state.steps_after_eos)

    eos_in_cb0 = token[:, 0] == eos_id  # false for freshly-resampled samples
    remaining = jnp.where(
        eos_in_cb0, jnp.minimum(state.remaining, n_codebooks), state.remaining
    )
    stopping = state.stopping | eos_in_cb0

    idx = jnp.clip(n_codebooks - remaining, 0, n_codebooks - 1)  # [B]
    cb = jnp.arange(n_codebooks)[None, :]
    token = jnp.where(stopping[:, None] & (cb < idx[:, None]), mask_id, token)
    token = jnp.where(stopping[:, None] & (cb == idx[:, None]), eos_id, token)

    return token, EosState(
        remaining=remaining - 1,
        stopping=stopping,
        eos_mode=eos_mode,
        steps_after_eos=steps_after_eos,
    )
