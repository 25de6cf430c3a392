"""Benchmark: audio-seconds generated per wall second per chip (RTF).

Runs the flagship Zonos-v0.1-transformer architecture (random weights — the
checkpoint is not distributable with the repo) through the real public
``Zonos.generate`` path — the same program users run, including the default
cache-growth bucketing — and measures steady-state throughput over 10-s
utterances (prefill amortized as in real use).

Prints ONE JSON line:
  {"metric": "rtf_batch1", "value": N, "unit": "audio_sec/sec/chip",
   "vs_baseline": N}
vs_baseline is relative to the reference's headline ~2x real-time factor on
an RTX 4090 (BASELINE.md: README.md:102).
"""

from __future__ import annotations

import json
import os
import sys
import time

FRAME_RATE = 86.0  # DAC frames/sec (hop 512 @ 44.1 kHz)
BASELINE_RTF = 2.0  # reference headline number (BASELINE.md)


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    # 10 s of audio: representative utterance length; short windows
    # over-weight the one-time prefill (258 steps = 3 s measures ~3% lower)
    steps = int(os.environ.get("BENCH_STEPS", "860"))
    cond_len = int(os.environ.get("BENCH_COND_LEN", "64"))
    quant = os.environ.get("BENCH_QUANT", "int8")  # serving mode; "none" = bf16
    cfg_scale = float(os.environ.get("BENCH_CFG", "2.0"))  # 1.0 = CFG-free fast path

    arch = os.environ.get("BENCH_MODEL", "transformer")  # or "hybrid"

    import jax
    import jax.numpy as jnp

    from zonos_tpu.config import HYBRID_CONFIG_DICT, TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos

    cfg_dict = HYBRID_CONFIG_DICT if arch == "hybrid" else TRANSFORMER_CONFIG_DICT
    cfg = ZonosConfig.from_dict(cfg_dict)
    model = Zonos(cfg, seed=0)
    if quant == "int8":
        model.quantize_int8()
    elif quant == "int4":
        model.quantize_int4()

    d = cfg.backbone.d_model
    prefix = jax.device_put(
        jax.random.normal(jax.random.key(1), (2 * batch, cond_len, d), jnp.bfloat16)
    )

    def run(seed: int) -> float:
        """One full generate; returns audio-seconds produced."""
        out = model.generate(
            prefix, max_new_tokens=steps, batch_size=batch, seed=seed,
            progress_bar=False, cfg_scale=cfg_scale,
        )
        return sum(o.shape[1] for o in out) / FRAME_RATE

    # Warmup/compile (covers every cache-growth bucket's loop program).
    run(seed=0)
    profile = os.environ.get("BENCH_PROFILE") == "1"
    if profile:
        jax.profiler.start_trace("/tmp/zonos_tpu_trace")
    t0 = time.perf_counter()
    audio_sec = run(seed=1)
    dt = time.perf_counter() - t0
    if profile:
        jax.profiler.stop_trace()

    rtf = audio_sec / dt
    suffix = "" if arch == "transformer" else f"_{arch}"
    if cfg_scale == 1.0:
        suffix += "_nocfg"
    result = {
        "metric": f"rtf_batch{batch}{suffix}",
        "value": round(rtf, 3),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
