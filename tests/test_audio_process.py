"""Waveform post-chain unit tests (trim_silence / fade_in_out) pinned to the
reference's exact edge semantics (zonos/autoencoder.py:49-90, 233-241)."""

import numpy as np

from zonos_tpu.audio.process import fade_in_out, trim_silence


def _wav(frames):
    """Build [1, n*512] from per-512-frame amplitudes."""
    return np.concatenate([np.full((1, 512), a, np.float32) for a in frames], axis=1)


def test_trim_leading_silence_keeps_first_loud_frame():
    w = _wav([0, 0, 0.5] + [0.5] * 29)
    out = trim_silence(w)
    # 2 leading silent frames cut; tail: i=0 never tested (empty reference
    # slice), i=1 is loud and is itself cut -> 2 tail frames also go
    assert out.shape[1] == w.shape[1] - 2 * 512 - 2 * 512


def test_trim_loud_tail_loses_exactly_two_frames():
    """Reference tail quirks, pinned: the i=0 slice wav[:, -512:0] is empty
    (NaN energy, never matches) so the final frame is never *tested*; the
    first tested frame (i=1) is loud and the loop cuts from its start —
    a loud-to-the-end clip always loses its last 1024 samples (~23 ms),
    masked in practice by the log fade-out."""
    w = _wav([0.5] * 32)  # loud everywhere incl. the last frame
    out = trim_silence(w)
    assert out.shape[1] == w.shape[1] - 2 * 512


def test_trim_trailing_cuts_the_loud_boundary_frame():
    """A loud frame found at tail position i>=1 is itself cut (end = its
    start) — the reference's asymmetric contract."""
    w = _wav([0.5] * 29 + [0.5, 0, 0])  # loud speech, 2 silent tail frames
    out = trim_silence(w)
    # scan: i=1 (silent), i=2 (silent)... wait i=1 is [-1024:-512]=silent,
    # i=2 is [-1536:-1024]=loud -> end = T - 1536 (loud boundary frame cut)
    assert out.shape[1] == w.shape[1] - 3 * 512


def test_trim_all_silent_returns_input():
    w = _wav([0.0] * 8)
    out = trim_silence(w)
    assert out.shape[1] == w.shape[1]  # no frame exceeds threshold => no trim


def test_fade_shapes_and_endpoints():
    w = np.ones((1, 512 * 32), np.float32)
    out = fade_in_out(w)
    assert out.shape == w.shape
    assert out[0, 0] == 0.0  # linear fade-in starts at zero
    assert out[0, 511] == 1.0
    assert out[0, -1] < 1e-9  # log fade-out ends ~1e-10
