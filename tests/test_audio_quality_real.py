"""Real audiobox-aesthetics integration (gated) + real-package code-path
plumbing (always runs, via a stand-in predictor).

The reference scores candidate audio with the audiobox-aesthetics package
(zonos/autoencoder.py:102-149) and consumes CE/CU/PQ (+derived AQ) floats.
`DACAutoencoder.audio_quality` keeps that contract; the offline spectral
proxy only kicks in when the package is missing.
"""

import numpy as np
import pytest

from zonos_tpu.models.dac import DACAutoencoder


@pytest.fixture(autouse=True)
def _reset_predictor():
    # the predictor is cached on the class; isolate tests from each other
    old = DACAutoencoder._predictor
    DACAutoencoder._predictor = None
    yield
    DACAutoencoder._predictor = old


def _tone(sr=44100, secs=0.25, hz=440.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.3 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_real_audiobox_package_scores():
    """Runs only where audiobox-aesthetics is installed: the real path must
    return the CE/CU/PQ/AQ dict shape the reference consumes."""
    pytest.importorskip("audiobox_aesthetics")
    ae = DACAutoencoder()
    scores = ae.audio_quality([_tone()], 44100)
    assert set(scores) == {"CU", "CE", "PQ", "AQ"}
    for v in scores.values():
        assert np.isfinite(v)


class _FakePredictor:
    """Stands in for audiobox_aesthetics.infer's predictor: same forward
    contract (list of {path, sample_rate} -> list of per-axis dicts)."""

    def __init__(self):
        self.calls = []

    def forward(self, items):
        self.calls.append(items)
        return [{"CE": 5.0 + i, "CU": 6.0 + i, "PQ": 7.0 + i} for i in range(len(items))]


def test_real_package_code_path_with_stub_predictor():
    """Exercises the real-predictor branch of audio_quality (score extraction,
    AQ averaging, per-item mode) without the package installed."""
    ae = DACAutoencoder()
    DACAutoencoder._predictor = fake = _FakePredictor()

    wavs = [_tone(), _tone(hz=880.0)]
    per = ae.audio_quality(wavs, 44100, average_overall=False)
    assert len(per) == 2 and set(per[0]) == {"CU", "CE", "PQ", "AQ"}
    assert per[0]["AQ"] == pytest.approx((5.0 + 6.0 + 7.0) / 3)
    assert per[1]["AQ"] == pytest.approx((6.0 + 7.0 + 8.0) / 3)
    # forward received one item per wav with the sample rate attached
    assert len(fake.calls) == 1 and len(fake.calls[0]) == 2
    assert all(it["sample_rate"] == 44100 for it in fake.calls[0])

    avg = ae.audio_quality(wavs, 44100)
    assert avg["AQ"] == pytest.approx((per[0]["AQ"] + per[1]["AQ"]) / 2)

    # best_per_chunk rides the same path: the higher-scoring second wav wins
    best = ae.best_per_chunk(wavs, 44100, n=2)
    assert len(best) == 1 and best[0] is wavs[1]


def test_quality_subset_request():
    """qualities=['AQ'] alone must still derive AQ from the base axes
    (the srt/batch best-of-N flows request exactly this)."""
    ae = DACAutoencoder()
    DACAutoencoder._predictor = _FakePredictor()
    per = ae.audio_quality([_tone()], 44100, qualities=["AQ"], average_overall=False)
    assert list(per[0].keys()) == ["CE", "CU", "PQ", "AQ"] or set(per[0]) >= {"AQ"}
