"""Advanced sample (parity surface: reference sample_advanced.py): silence
audio prefix, explicit full conditioning dict, explicit sampling params."""

import sys
from pathlib import Path

# runnable straight from a checkout: python examples/<name>.py
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import numpy as np

from zonos_tpu import Zonos, make_cond_dict
from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig


def main() -> None:
    try:
        model = Zonos.from_pretrained("Zyphra/Zonos-v0.1-transformer")
    except FileNotFoundError:
        print("checkpoint unavailable; using random weights")
        model = Zonos(ZonosConfig.from_dict(TRANSFORMER_CONFIG_DICT))

    # 100 ms silence prefix (recommended to stabilize the first frames)
    silence = np.zeros((1, 1, 4410), np.float32)
    prefix_codes = model.autoencoder.encode(model.autoencoder.preprocess(silence, 44100))

    cond = make_cond_dict(
        text="This advanced sample sets every conditioning knob explicitly.",
        language="en-us",
        speaker=None,
        emotion=[0.6, 0.05, 0.05, 0.05, 0.05, 0.05, 0.05, 0.5],
        fmax=22050.0,
        pitch_std=45.0,
        speaking_rate=14.0,
        unconditional_keys={"vqscore_8", "dnsmos_ovrl"},
    )
    codes = model.generate(
        model.prepare_conditioning(cond),
        audio_prefix_codes=prefix_codes,
        sampling_params=dict(linear=0.8, conf=0.2, quad=0.0, min_p=0.001,
                             repetition_penalty=2.0, repetition_penalty_window=8),
        seed=432,
    )
    model.autoencoder.save_codes(["sample_advanced.wav"], codes)
    print("wrote sample_advanced.wav")


if __name__ == "__main__":
    main()
