"""Native C++ resampler vs scipy's resample_poly (same filter design)."""

import numpy as np
import pytest
from scipy.signal import resample_poly

from zonos_tpu.audio.native import get_lib, resample_native


@pytest.mark.parametrize("rates", [(16000, 44100), (44100, 16000), (22050, 44100), (48000, 44100)])
def test_matches_scipy(rates):
    import math

    sr_from, sr_to = rates
    g = math.gcd(sr_from, sr_to)
    up, down = sr_to // g, sr_from // g
    if get_lib() is None:
        pytest.skip("native audio engine unavailable (no toolchain)")
    rng = np.random.default_rng(sr_from)
    wav = rng.normal(size=(2, 5000)).astype(np.float32)
    got = resample_native(wav, up, down)
    ref = resample_poly(wav.astype(np.float64), up, down, axis=-1).astype(np.float32)
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


def test_io_resample_dispatch():
    from zonos_tpu.audio.io import resample

    wav = np.sin(np.linspace(0, 100, 16000, dtype=np.float32))[None, :]
    out = resample(wav, 16000, 44100)
    assert out.shape[0] == 1
    assert abs(out.shape[1] - 44100) <= 2
    # energy preserved (unit-gain passband)
    assert 0.5 < np.sqrt((out**2).mean()) / np.sqrt((wav**2).mean()) < 1.5


def test_odd_lengths_and_mono():
    if get_lib() is None:
        pytest.skip("native audio engine unavailable")
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(1, 4097)).astype(np.float32)
    got = resample_native(wav, 441, 160)
    ref = resample_poly(wav.astype(np.float64), 441, 160, axis=-1).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-5 * np.abs(ref).max())
