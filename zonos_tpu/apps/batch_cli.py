"""Batch synthesis CLI — the flagship throughput workload
(parity surface: zonos_batch_cli.py).

Features: multi-text batches from flags/file/random corpus, per-batch
repeats with seed increment, HBM-derived automatic batch sizing with
chunking, prefix-audio continuation with transcript prepending, per-sample
quality scoring and best-of-N selection, and phase timing.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np

from zonos_tpu.apps.common import (
    add_conditioning_args,
    add_model_args,
    add_sampling_args,
    cond_dict_from_args,
    load_model,
    make_speaker,
    prefix_codes,
    sampling_params_from_args,
)
from zonos_tpu.speaker_db import SpeakerUtils


def estimate_max_batch(max_new_tokens: int) -> int:
    """HBM-based batch-size heuristic, the TPU analogue of the reference's
    VRAM model (~4 GB base + ~0.4 GB/sample, zonos_batch_cli.py:308-325).

    Memory per sample here is dominated by the KV cache:
    2 (k+v) * 2 (CFG) * n_layer * H_kv * head_dim * seq * 2 bytes.
    """
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        hbm = stats.get("bytes_limit", 16 * 2**30)
    except Exception:
        hbm = 16 * 2**30
    base = 6 * 2**30  # weights (bf16) + compiled programs + workspace
    seq = max_new_tokens + 256
    per_sample = 2 * 2 * 26 * 4 * 128 * seq * 2  # bytes, flagship dims
    return max(1, int((hbm - base) // per_sample))


def chunks(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i : i + n]


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Batch speech generation with zonos-tpu.")
    ap.add_argument("--text", nargs="*", default=None, help="One or more texts.")
    ap.add_argument("--text_file", default=None, help="File with one text per line.")
    ap.add_argument("--text_random", type=int, default=0,
                    help="Generate N random corpus sentences.")
    ap.add_argument("--text_repeat", type=int, default=1, help="Repeat each text K times.")
    ap.add_argument("--batch_repeat", type=int, default=1,
                    help="Re-run the whole batch K times, seed incremented per run.")
    ap.add_argument("--max_per_batch", type=int, default=0,
                    help="Chunk size; 0 = auto from device memory.")
    ap.add_argument("--output_dir", default="batch_out")
    ap.add_argument("--score", action="store_true", help="Score outputs and report best-of-N.")
    ap.add_argument("--transcripts", default=None,
                    help="transcripts.json mapping prefix-audio stems to text to prepend.")
    add_conditioning_args(ap)
    add_sampling_args(ap)
    add_model_args(ap)
    return ap


def collect_texts(args) -> list[str]:
    texts: list[str] = []
    if args.text:
        texts += list(args.text)
    if args.text_file:
        texts += [l.strip() for l in Path(args.text_file).read_text().splitlines() if l.strip()]
    if args.text_random:
        texts += [SpeakerUtils.random_sentence(args.language) for _ in range(args.text_random)]
    if not texts:
        texts = [SpeakerUtils.random_sentence(args.language)]
    return [t for t in texts for _ in range(args.text_repeat)]


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    from zonos_tpu.utils.profiling import PhaseTimer, device_trace

    timer = PhaseTimer()
    with timer.phase("model load"):
        model = load_model(args)
    with timer.phase("speaker embed"):
        speaker = make_speaker(args, model)

    texts = collect_texts(args)
    # prepend the prefix-audio transcript so continuation text flows naturally
    # (ref: zonos_batch_cli.py:100-102, 356-368)
    if args.transcripts and args.prefix_audio:
        tr = json.loads(Path(args.transcripts).read_text())
        stem = Path(args.prefix_audio).stem
        if stem in tr:
            texts = [tr[stem] + " " + t for t in texts]

    max_per_batch = args.max_per_batch or estimate_max_batch(args.max_new_tokens)
    print(f"texts: {len(texts)}, max_per_batch: {max_per_batch}")

    all_wav_paths: list[str] = []
    t2 = time.perf_counter()
    idx = 0
    with device_trace(getattr(args, "profile", None)):
        for rep in range(args.batch_repeat):
            seed = args.seed + rep
            for chunk in chunks(texts, max_per_batch):
                bsz = len(chunk)
                prefix = prefix_codes(args, model, bsz) if args.prefix_audio else None
                cond = cond_dict_from_args(args, list(chunk), speaker)
                conditioning = model.prepare_conditioning(cond)
                codes = model.generate(
                    conditioning,
                    audio_prefix_codes=prefix,
                    max_new_tokens=args.max_new_tokens,
                    cfg_scale=args.cfg_scale,
                    batch_size=bsz,
                    sampling_params=sampling_params_from_args(args),
                    seed=seed,
                )
                paths = [os.path.join(args.output_dir, f"gen_{idx + i:04d}_s{seed}.wav") for i in range(bsz)]
                model.autoencoder.save_codes(paths, codes)
                all_wav_paths += paths
                idx += bsz
    gen_s = time.perf_counter() - t2
    total_audio = 0.0
    for p in all_wav_paths:
        from zonos_tpu.audio.io import load_audio

        w, sr = load_audio(p)
        total_audio += w.shape[1] / sr
    print(f"[t] generate+decode: {gen_s:.1f}s for {total_audio:.1f}s audio "
          f"({total_audio / max(gen_s, 1e-9):.2f}x realtime)")

    if args.score:
        from zonos_tpu.audio.io import load_audio

        wavs = [load_audio(p)[0] for p in all_wav_paths]
        per = model.autoencoder.audio_quality(wavs, 44100, qualities=["AQ"], average_overall=False)
        ranked = sorted(zip(all_wav_paths, per), key=lambda kv: -kv[1]["AQ"])
        print("quality ranking (best first):")
        for p, q in ranked:
            print(f"  {q['AQ']:.2f}  {p}")


if __name__ == "__main__":
    main()
