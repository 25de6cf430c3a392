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


def plot_embedding_comparison(a, b, path: str = "speaker_embeddings.png") -> dict:
    """Render a single three-panel comparison of two speaker embeddings —
    overlaid values, per-dimension delta, and the sorted |delta| profile —
    and return the similarity metrics.  Covers the reference example's
    embedding-inspection capability (its script renders separate figures;
    see sample_voice_cloning.py:33-93) with one composite PNG instead.
    """
    import matplotlib

    matplotlib.use("Agg")  # headless
    import matplotlib.pyplot as plt

    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    if a.shape != b.shape:
        raise ValueError(f"embedding shapes differ: {a.shape} vs {b.shape}")
    metrics = {
        "cosine": cosine(a, b),
        "l2": float(np.linalg.norm(a - b)),
        "max_abs_delta": float(np.abs(a - b).max()),
    }

    fig, axes = plt.subplots(3, 1, figsize=(10, 8), constrained_layout=True)
    dims = np.arange(a.size)
    axes[0].plot(dims, a, lw=0.8, label="voice A")
    axes[0].plot(dims, b, lw=0.8, label="voice B")
    axes[0].set_title(
        f"speaker embeddings — cos {metrics['cosine']:.4f}, "
        f"L2 {metrics['l2']:.4f}"
    )
    axes[0].legend(loc="upper right")

    delta = b - a
    axes[1].fill_between(dims, delta, step="mid", alpha=0.7)
    axes[1].set_title("per-dimension delta (B − A)")

    axes[2].plot(np.sort(np.abs(delta))[::-1], lw=1.0)
    axes[2].set_title("|delta| sorted — how many dimensions carry the difference")
    axes[2].set_xlabel("rank")

    for ax in axes:
        ax.grid(True, alpha=0.3)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return metrics


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
        m = plot_embedding_comparison(a, b)
        print(f"wrote speaker_embeddings.png ({m})")
    except (FileNotFoundError, ValueError) as e:
        print(f"no voice DB ({e}); using a random embedding")
        rng = np.random.default_rng(0)
        mixed = rng.normal(size=(1, 1, 128)).astype(np.float32) * 0.1
        m = plot_embedding_comparison(
            mixed, rng.normal(size=(1, 1, 128)).astype(np.float32) * 0.1)
        print(f"wrote speaker_embeddings.png ({m})")

    texts = [SpeakerUtils.random_sentence("en") for _ in range(4)]
    cond = make_cond_dict(text=texts, speaker=mixed, language="en-us")
    codes = model.generate(model.prepare_conditioning(cond), batch_size=4, seed=7)
    model.autoencoder.save_codes([f"clone_{i}.wav" for i in range(4)], codes)
    print("wrote clone_0..3.wav")


if __name__ == "__main__":
    main()
