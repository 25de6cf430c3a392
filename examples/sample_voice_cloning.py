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


def compare_speaker_embeddings(vec1, vec2, name: str = "speaker_embedding") -> dict:
    """Compare two speaker embeddings and render the reference's comparison
    figures (ref: sample_voice_cloning.py:33-93): overlaid vectors with
    cosine/Euclidean stats in the title, absolute difference per dimension,
    and normalized relative difference — saved as ``{name}-vec.png``,
    ``{name}-absolute-diff.png``, ``{name}-relative-diff.png``."""
    import matplotlib

    matplotlib.use("Agg")  # headless: save figures, no GUI loop
    import matplotlib.pyplot as plt

    v1 = np.asarray(vec1, np.float32).ravel()
    v2 = np.asarray(vec2, np.float32).ravel()
    assert v1.shape == v2.shape, "Vectors must have the same shape"
    cos_sim = cosine(v1, v2)
    euclidean = float(np.linalg.norm(v1 - v2))
    diff = np.abs(v1 - v2)
    rel_diff = (v1 - v2) / max(diff.max(), 1e-12)

    fig = plt.figure(figsize=(12, 4))
    plt.plot(v1, label="vec1")
    plt.plot(v2, label="vec2")
    plt.title(f"Speaker Embedding Comparison\n"
              f"Cosine Similarity: {cos_sim:.4f} | Euclidean Distance: {euclidean:.4f}")
    plt.xlabel("Dimension")
    plt.ylabel("Value")
    plt.legend()
    plt.grid(True)
    plt.tight_layout()
    fig.savefig(f"{name}-vec.png")
    plt.close(fig)

    for values, title, fname in (
        (diff, "Absolute Difference per Dimension", f"{name}-absolute-diff.png"),
        (rel_diff, "Relative Difference per Dimension", f"{name}-relative-diff.png"),
    ):
        fig = plt.figure(figsize=(12, 3))
        plt.bar(np.arange(len(values)), values)
        plt.title(title)
        plt.xlabel("Dimension")
        plt.ylabel("Difference")
        plt.tight_layout()
        fig.savefig(fname)
        plt.close(fig)

    return {"cosine_similarity": cos_sim, "euclidean_distance": euclidean,
            "abs_difference": diff}


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
        compare_speaker_embeddings(a, b, name="speaker_embedding")
        print("wrote speaker_embedding-{vec,absolute-diff,relative-diff}.png")
    except (FileNotFoundError, ValueError) as e:
        print(f"no voice DB ({e}); using a random embedding")
        rng = np.random.default_rng(0)
        mixed = rng.normal(size=(1, 1, 128)).astype(np.float32) * 0.1
        compare_speaker_embeddings(
            mixed, rng.normal(size=(1, 1, 128)).astype(np.float32) * 0.1)
        print("wrote speaker_embedding-{vec,absolute-diff,relative-diff}.png")

    texts = [SpeakerUtils.random_sentence("en") for _ in range(4)]
    cond = make_cond_dict(text=texts, speaker=mixed, language="en-us")
    codes = model.generate(model.prepare_conditioning(cond), batch_size=4, seed=7)
    model.autoencoder.save_codes([f"clone_{i}.wav" for i in range(4)], codes)
    print("wrote clone_0..3.wav")


if __name__ == "__main__":
    main()
