"""Voice-cloning playground (parity surface: reference sample_voice_cloning.py):
tag-filtered average voices from the DB, embedding arithmetic/mixing, and a
batch of random sentences in the mixed voice."""

import sys
from pathlib import Path

# runnable straight from a checkout: python examples/<name>.py
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import numpy as np

from zonos_tpu import Zonos, make_cond_dict
from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
from zonos_tpu.speaker_db import SpeakerUtils


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    a, b = a.ravel(), b.ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def main() -> None:
    try:
        model = Zonos.from_pretrained("Zyphra/Zonos-v0.1-transformer")
    except FileNotFoundError:
        print("checkpoint unavailable; using random weights")
        model = Zonos(ZonosConfig.from_dict(TRANSFORMER_CONFIG_DICT))

    su = SpeakerUtils(model)
    try:
        # voice mixing: walk from voice A toward voice B past it (x3)
        a = su.load_average({"gender": "female", "reading_style": "regular"})
        b = su.load_average({"gender": "female", "reading_style": "whisper"})
        mixed = a + (b - a) * 3.0
        print(f"cos(A,B)={cosine(a, b):.3f}  cos(A,mixed)={cosine(a, mixed):.3f}")
    except (FileNotFoundError, ValueError) as e:
        print(f"no voice DB ({e}); using a random embedding")
        mixed = np.random.default_rng(0).normal(size=(1, 1, 128)).astype(np.float32) * 0.1

    texts = [SpeakerUtils.random_sentence("en") for _ in range(4)]
    cond = make_cond_dict(text=texts, speaker=mixed, language="en-us")
    codes = model.generate(model.prepare_conditioning(cond), batch_size=4, seed=7)
    model.autoencoder.save_codes([f"clone_{i}.wav" for i in range(4)], codes)
    print("wrote clone_0..3.wav")


if __name__ == "__main__":
    main()
