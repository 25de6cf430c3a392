"""Minimal smoke sample (parity surface: reference sample.py).

Loads the flagship model, clones a speaker from a reference clip if given,
and writes sample.wav.
"""

import sys
from pathlib import Path

# runnable straight from a checkout: python examples/<name>.py
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))



import numpy as np

from zonos_tpu import Zonos, make_cond_dict


def main() -> None:
    try:
        model = Zonos.from_pretrained("Zyphra/Zonos-v0.1-transformer")
    except FileNotFoundError:
        from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig

        print("checkpoint unavailable; using random weights")
        model = Zonos(ZonosConfig.from_dict(TRANSFORMER_CONFIG_DICT))

    speaker = None
    if len(sys.argv) > 1:
        from zonos_tpu.audio.io import load_audio, to_mono

        wav, sr = load_audio(sys.argv[1])
        speaker = model.make_speaker_embedding(to_mono(wav), sr)

    cond = make_cond_dict(text="Hello, world!", speaker=speaker, language="en-us")
    codes = model.generate(model.prepare_conditioning(cond), seed=421)
    model.autoencoder.save_codes(["sample.wav"], codes)
    print("wrote sample.wav")


if __name__ == "__main__":
    main()
