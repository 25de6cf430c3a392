"""DAC autoencoder subsystem: JAX codec + host audio pipeline.

API parity with the reference wrapper (zonos/autoencoder.py:12-268):
preprocess / encode / decode / load_prefix_audio / trim_silence /
normalize_loudness / codes_to_wavs / save_codes / audio_quality /
best_per_chunk / quality_string.
"""

from __future__ import annotations

import logging
import math

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.audio import (
    fade_in_out,
    load_audio,
    normalize_loudness,
    resample,
    save_audio,
    trim_silence,
)
from zonos_tpu.audio.io import to_mono
from zonos_tpu.models.dac.codec import (
    DACConfig,
    dac_decode,
    dac_encode,
    decoder_receptive_field_frames,
    init_dac_params,
)

logger = logging.getLogger("zonos_tpu.dac")


class DACAutoencoder:
    """44.1 kHz DAC codec wrapper (frozen; fp32 — ref: zonos/model.py:79-80).

    Weights: tries the converted checkpoint under the models dir
    (``descript/dac_44khz``); falls back to random init (air-gapped dev)
    with a warning — structure and shapes are identical either way.
    """

    def __init__(self, params: dict | None = None, cfg: DACConfig | None = None):
        self.cfg = cfg or DACConfig()
        self.codebook_size = self.cfg.codebook_size
        self.num_codebooks = self.cfg.n_codebooks
        self.sampling_rate = self.cfg.sampling_rate
        self.hop = self.cfg.hop_length
        # minimum sound streaming margin (frames); see codec.py derivation
        self.receptive_field_frames = decoder_receptive_field_frames(self.cfg)
        if params is None:
            params = self._load_params()
        self.params = params
        self._decode_jit = jax.jit(lambda p, c: dac_decode(p, self.cfg, c))
        self._encode_jit = jax.jit(lambda p, a: dac_encode(p, self.cfg, a))

    def _load_params(self) -> dict:
        try:
            from zonos_tpu.models.dac.convert import convert_dac_state_dict
            from zonos_tpu.utils.checkpoint import load_safetensors_numpy
            from zonos_tpu.utils.hub import hub_download

            path = hub_download("descript/dac_44khz", "model.safetensors")
            return convert_dac_state_dict(load_safetensors_numpy(path), self.cfg)
        except FileNotFoundError:
            logger.warning(
                "DAC checkpoint not found locally; using random codec weights "
                "(decoded audio will be noise until a checkpoint is provided)."
            )
            return init_dac_params(jax.random.key(0), self.cfg)

    # -- core codec ------------------------------------------------------
    def preprocess(self, wav: np.ndarray, sr: int) -> np.ndarray:
        """Resample to 44.1 kHz and left-pad to a hop multiple
        (ref: zonos/autoencoder.py:21-25)."""
        wav = resample(np.asarray(wav, np.float32), sr, self.sampling_rate)
        left_pad = math.ceil(wav.shape[-1] / self.hop) * self.hop - wav.shape[-1]
        pad = [(0, 0)] * (wav.ndim - 1) + [(left_pad, 0)]
        return np.pad(wav, pad)

    def encode(self, wav: np.ndarray) -> np.ndarray:
        """wav [B, 1, T] float32 -> codes [B, K, T/512] int32."""
        x = jnp.asarray(wav, jnp.float32).swapaxes(1, 2)  # NWC
        return np.asarray(self._encode_jit(self.params, x))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes [B, K, T] -> wav [B, 1, samples] float32."""
        assert codes.shape[1] == self.num_codebooks, (
            f"expected {self.num_codebooks} codebooks, got {codes.shape[1]}"
        )
        wav = self._decode_jit(self.params, jnp.asarray(codes, jnp.int32))
        return np.asarray(wav).swapaxes(1, 2)  # [B, 1, samples]

    def load_prefix_audio(self, audio_path: str, device=None) -> np.ndarray:
        """Load + mono + preprocess + encode a prefix clip
        (ref: zonos/autoencoder.py:30-42)."""
        wav, sr = load_audio(audio_path)
        wav = to_mono(wav)
        wav = self.preprocess(wav, sr)
        return self.encode(wav[None, ...])

    # -- post-processing -------------------------------------------------
    def trim_silence(self, wav: np.ndarray, threshold: float = 1e-5, frame_size: int = 512) -> np.ndarray:
        return trim_silence(wav, threshold, frame_size)

    def normalize_loudness(self, audio: np.ndarray, sr: int, target_lufs: float = -19.0) -> np.ndarray:
        return normalize_loudness(audio, sr, target_lufs)

    def codes_to_wavs(self, codes) -> list[np.ndarray]:
        """Decode + normalize to -23 LUFS + trim + fade per sample
        (ref: zonos/autoencoder.py:188-245)."""
        if isinstance(codes, (list, tuple)):
            code_list = [np.asarray(c)[None] if np.asarray(c).ndim == 2 else np.asarray(c) for c in codes]
        else:
            codes = np.asarray(codes)
            if codes.ndim == 2:
                code_list = [codes[None]]
            else:
                code_list = [codes[i : i + 1] for i in range(codes.shape[0])]

        results = []
        for c in code_list:
            if c.shape[2] == 0:
                logger.warning("empty code sequence, skipping decode")
                continue
            wav = self.decode(c)[0]  # [1, samples]
            wav = self.normalize_loudness(wav, self.sampling_rate, -23.0)
            wav = self.trim_silence(wav)
            wav = fade_in_out(wav)
            results.append(wav)
        return results

    def save_codes(self, paths, codes) -> None:
        if isinstance(paths, str):
            paths = [paths]
        wavs = self.codes_to_wavs(codes)
        assert len(paths) == len(wavs), f"{len(paths)} paths != {len(wavs)} wavs"
        for p, w in zip(paths, wavs):
            save_audio(p, w, self.sampling_rate)
            logger.debug("saved %s", p)

    # -- quality scoring -------------------------------------------------
    _predictor = None

    def quality_string(self, aesthetics: dict[str, float]) -> str:
        return " ".join(f"{k}={v:.1f}" for k, v in aesthetics.items())

    def audio_quality(self, wavs, sr, qualities=("CU", "CE", "PQ", "AQ"), average_overall=True):
        """Audiobox-aesthetics scores when the package is installed
        (ref: zonos/autoencoder.py:102-149); otherwise a self-contained
        spectral proxy so best-of-N selection still functions offline."""
        if not isinstance(wavs, list):
            wavs = [wavs]
        qualities = list(qualities)
        base = [q for q in qualities if q != "AQ"] or ["CU", "CE", "PQ"]

        scores = None
        if DACAutoencoder._predictor is None:
            try:
                from audiobox_aesthetics.infer import initialize_predictor  # type: ignore

                DACAutoencoder._predictor = initialize_predictor()
            except Exception:
                DACAutoencoder._predictor = False
        if DACAutoencoder._predictor:
            raw = DACAutoencoder._predictor.forward(
                [{"path": w, "sample_rate": sr} for w in wavs]
            )
            scores = [{q: r[q] for q in base} for r in raw]
        else:
            scores = [{q: _spectral_quality_proxy(np.asarray(w), sr) for q in base} for w in wavs]

        for s in scores:
            if "AQ" in qualities:
                s["AQ"] = sum(s[q] for q in base) / len(base)
        if average_overall:
            keys = scores[0].keys()
            return {k: sum(s[k] for s in scores) / len(scores) for k in keys}
        return scores

    def best_per_chunk(self, wavs: list, sr, n: int = -1) -> list:
        """Pick the best wav (by AQ) within each chunk of n
        (ref: zonos/autoencoder.py:151-167)."""
        n = len(wavs) if n == -1 or n > len(wavs) else n
        per = self.audio_quality(wavs, sr, qualities=["AQ"], average_overall=False)
        best = []
        for i in range(0, len(wavs), n):
            group = per[i : i + n]
            j = max(range(len(group)), key=lambda j: group[j]["AQ"])
            best.append(wavs[i + j])
        return best


def _spectral_quality_proxy(wav: np.ndarray, sr: int) -> float:
    """Cheap 1-10 quality proxy: penalizes clipping, DC offset, very low
    energy, and spectral flatness typical of noise.  NOT a perceptual model —
    a deterministic stand-in so offline best-of-N ranking is stable."""
    x = wav.reshape(-1).astype(np.float64)
    if x.size == 0:
        return 0.0
    rms = np.sqrt((x**2).mean())
    clip_frac = (np.abs(x) > 0.985).mean()
    dc = abs(x.mean())
    spec = np.abs(np.fft.rfft(x[: min(x.size, sr)]))[1:]
    spec = spec / max(spec.sum(), 1e-12)
    ent = -(spec * np.log(spec + 1e-12)).sum() / np.log(spec.size)  # 1 = flat/noise
    score = 8.0
    score -= 6.0 * ent
    score -= 20.0 * clip_frac
    score -= 10.0 * dc
    score += 2.0 * min(rms * 10, 1.0)
    return float(np.clip(score, 0.0, 10.0))
