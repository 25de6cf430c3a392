"""Host-side audio: WAV I/O, resampling, loudness, silence trimming, fades."""

from zonos_tpu.audio.io import load_audio, resample, save_audio
from zonos_tpu.audio.loudness import integrated_loudness, normalize_loudness
from zonos_tpu.audio.process import fade_in_out, trim_silence

__all__ = [
    "load_audio",
    "save_audio",
    "resample",
    "integrated_loudness",
    "normalize_loudness",
    "trim_silence",
    "fade_in_out",
]
