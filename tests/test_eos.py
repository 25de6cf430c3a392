"""EOS choreography vs an imperative host-side simulation of the reference
semantics (zonos/model.py:336-414)."""

import numpy as np
import pytest

from zonos_tpu.ops.eos import EosState, eos_logit_mask, eos_update

EOS, MASK, K, WINDOW = 1024, 1025, 9, 6


def _reference_sim(token_seq, resample_seq, max_steps):
    """Imperative per-sample simulation mirroring the reference's loop:
    given what sampling WOULD return each step (and its EOS-banned
    resample), produce the frames written and the step count."""
    remaining = max_steps
    eos_mode = False
    steps_after = WINDOW
    stopping = False
    frames = []
    for step in range(len(token_seq)):
        if remaining <= 0:
            break
        tok = token_seq[step].copy()
        # silence window: EOS banned => sampling returns the resample value
        if eos_mode and steps_after > 0:
            if tok[0] == EOS:
                tok = resample_seq[step].copy()
            steps_after -= 1
        new_eos = tok[0] == EOS and not eos_mode
        if new_eos:
            eos_mode = True
            steps_after = WINDOW
            tok = resample_seq[step].copy()
        eos_in_cb0 = tok[0] == EOS
        if eos_in_cb0:
            remaining = min(remaining, K)
            stopping = True
        if stopping:
            idx = min(K - remaining, K - 1)
            tok[:idx] = MASK
            tok[idx] = EOS
        frames.append(tok)
        remaining -= 1
    return np.array(frames)


def _vector_sim(token_seq, resample_seq, max_steps):
    """Drive the jitted-state functions the way the decode loop does."""
    state = EosState.init(1, max_steps, WINDOW)
    frames = []
    import jax.numpy as jnp

    for step in range(len(token_seq)):
        if int(np.max(np.asarray(state.remaining))) <= 0:
            break
        logits = jnp.zeros((1, K, 1100))
        # encode "what sampling would return": if EOS banned in cb0, the
        # sampler returns the resample value instead
        logits2, state = eos_logit_mask(state, logits, EOS)
        banned = bool(np.isneginf(np.asarray(logits2)[0, 0, EOS]))
        tok = resample_seq[step] if (banned and token_seq[step][0] == EOS) else token_seq[step]
        tok = jnp.asarray(tok[None, :])
        res = jnp.asarray(resample_seq[step][None, :])
        frame, state = eos_update(state, tok, res, EOS, MASK, K, WINDOW)
        frames.append(np.asarray(frame)[0])
    return np.array(frames)


@pytest.mark.parametrize("eos_step", [3, 0, 10])
def test_matches_reference_sim(eos_step):
    rng = np.random.default_rng(eos_step)
    T, max_steps = 30, 24
    tokens = rng.integers(0, 1000, size=(T, K))
    resamples = rng.integers(0, 1000, size=(T, K))
    tokens[eos_step:, 0] = EOS  # sampler insists on EOS from eos_step on
    ref = _reference_sim(tokens, resamples, max_steps)
    got = _vector_sim(tokens, resamples, max_steps)
    np.testing.assert_array_equal(got, ref)


def test_staircase_structure():
    """After EOS fires, EOS walks down the codebooks with masks above."""
    T, max_steps = 26, 24
    tokens = np.full((T, K), 7)
    tokens[4:, 0] = EOS
    resamples = np.full((T, K), 11)
    frames = _vector_sim(tokens, resamples, max_steps)
    # find first frame with EOS in cb0
    fire = next(i for i in range(len(frames)) if frames[i][0] == EOS)
    for j in range(1, K):
        if fire + j < len(frames):
            f = frames[fire + j]
            assert f[j] == EOS
            assert (f[:j] == MASK).all()
    # generation stops 9 steps after the staircase starts
    assert len(frames) == fire + K


def test_no_eos_runs_to_max():
    T, max_steps = 12, 10
    tokens = np.full((T, K), 5)
    resamples = np.full((T, K), 6)
    frames = _vector_sim(tokens, resamples, max_steps)
    assert len(frames) == max_steps
    assert (frames == 5).all()
