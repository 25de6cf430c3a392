"""Speaker embedding subsystem (voice cloning tower).

API parity with the reference (zonos/speaker_cloning.py:355-411):
``SpeakerEmbedding`` (clip -> 256-d verification embedding) and
``SpeakerEmbeddingLDA`` (adds the 256->128 LDA head the TTS model consumes).
Weights load from the reference's torch checkpoints when present under the
models dir; random init otherwise (air-gapped dev).
"""

from __future__ import annotations

import logging

import jax
import numpy as np

from zonos_tpu.audio.io import resample, to_mono
from zonos_tpu.models.speaker.mel import log_mel_features
from zonos_tpu.models.speaker.resnet import init_speaker_params, speaker_embed_forward

logger = logging.getLogger("zonos_tpu.speaker")


class SpeakerEmbedding:
    """Reference clip -> 256-d speaker embedding (fp32 tower)."""

    def __init__(self, params: dict | None = None):
        if params is None:
            params = self._load_params()
        self.params = params
        self._fwd = jax.jit(speaker_embed_forward)

    @staticmethod
    def _load_params() -> dict:
        try:
            import torch

            from zonos_tpu.models.speaker.convert import convert_speaker_state_dict
            from zonos_tpu.utils.hub import hub_download

            path = hub_download("Zyphra/Zonos-v0.1-speaker-embedding", "ResNet293_SimAM_ASP_base.pt")
            sd = torch.load(path, weights_only=True, map_location="cpu")
            return convert_speaker_state_dict(sd)
        except (FileNotFoundError, ImportError):
            # ImportError: torch is a dev-only dependency; conversion needs
            # it but the random-weights fallback must not
            logger.warning("speaker checkpoint not found; using random tower weights")
            return init_speaker_params(jax.random.key(0))

    def prepare_input(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        assert wav.ndim < 3
        wav = to_mono(wav)
        return resample(wav, sample_rate, 16000)

    def __call__(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        wav = self.prepare_input(wav, sample_rate)
        mel = log_mel_features(wav)
        return np.asarray(self._fwd(self.params, mel))


class SpeakerEmbeddingLDA:
    """256-d tower embedding + 128-d LDA projection (what the TTS consumes,
    ref: zonos/speaker_cloning.py:387-411 and zonos/model.py:90-95)."""

    def __init__(self, params: dict | None = None, lda: dict | None = None):
        self.model = SpeakerEmbedding(params)
        if lda is None:
            lda = self._load_lda()
        self.lda = lda

    @staticmethod
    def _load_lda() -> dict:
        try:
            import torch

            from zonos_tpu.models.speaker.convert import convert_lda_state_dict
            from zonos_tpu.utils.hub import hub_download

            path = hub_download(
                "Zyphra/Zonos-v0.1-speaker-embedding", "ResNet293_SimAM_ASP_base_LDA-128.pt"
            )
            return convert_lda_state_dict(torch.load(path, weights_only=True, map_location="cpu"))
        except (FileNotFoundError, ImportError):
            logger.warning("LDA checkpoint not found; using random projection")
            rng = np.random.default_rng(0)
            return {
                "w": (rng.standard_normal((256, 128)) / 16).astype(np.float32),
                "b": np.zeros(128, np.float32),
            }

    def __call__(self, wav: np.ndarray, sample_rate: int) -> tuple[np.ndarray, np.ndarray]:
        emb = self.model(wav, sample_rate).astype(np.float32)
        return emb, emb @ self.lda["w"] + self.lda["b"]
