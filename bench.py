"""Benchmark: audio-seconds generated per wall second per chip (RTF).

Runs the flagship Zonos-v0.1 architectures (random weights — the checkpoint
is not distributable with the repo) through the real public
``Zonos.generate`` path — the same program users run, including the default
cache-growth bucketing — and measures steady-state throughput over 10-s
utterances (prefill amortized as in real use).

Default (no BENCH_* env): the FULL HEADLINE SUITE — one JSON line per row,
covering every README/docs/PERFORMANCE.md flagship claim so the
driver-captured artifact certifies them all:

  rtf_batch1                 transformer int8, batch 1      (headline)
  rtf_batch64                transformer int8 + f8 KV, batch 64
  rtf_batch64_nocfg          ... with cfg_scale=1.0 (CFG-free fast path)
  rtf_batch1_hybrid          hybrid int8, batch 1
  rtf_batch64_hybrid         hybrid int8 + f8 KV + f8 SSM state, batch 64
  rtf_batch64_hybrid_nocfg   ... with cfg_scale=1.0

The LAST line re-emits the headline row (batch-1 transformer int8) so a
single-line consumer still reads the canonical metric:
  {"metric": "rtf_batch1", "value": N, "unit": "audio_sec/sec/chip",
   "vs_baseline": N}
vs_baseline is relative to the reference's headline ~2x real-time factor on
an RTX 4090 (BASELINE.md: README.md:102).

Setting any of BENCH_BATCH / BENCH_QUANT / BENCH_MODEL / BENCH_CFG /
BENCH_PROFILE selects the single-row mode with those knobs; BENCH_STEPS
and BENCH_COND_LEN apply to whichever mode runs (a shortened suite is
still a suite).  BENCH_ROWS=name,name subsets the suite.
"""

from __future__ import annotations

import json
import os
import sys
import time

FRAME_RATE = 86.0  # DAC frames/sec (hop 512 @ 44.1 kHz)
BASELINE_RTF = 2.0  # reference headline number (BASELINE.md)

# name -> (arch, batch, quant, kv_mode, ssm_state, cfg_scale)
SUITE: dict[str, tuple] = {
    "rtf_batch1": ("transformer", 1, "int8", None, None, 2.0),
    "rtf_batch64": ("transformer", 64, "int8", "f8", None, 2.0),
    "rtf_batch64_nocfg": ("transformer", 64, "int8", "f8", None, 1.0),
    "rtf_batch1_hybrid": ("hybrid", 1, "int8", None, "fp32", 2.0),
    "rtf_batch64_hybrid": ("hybrid", 64, "int8", "f8", "f8", 2.0),
    "rtf_batch64_hybrid_nocfg": ("hybrid", 64, "int8", "f8", "f8", 1.0),
}


def _bench_one(model, cfg, batch: int, steps: int, cond_len: int,
               cfg_scale: float, profile: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    d = cfg.backbone.d_model
    prefix = jax.device_put(
        jax.random.normal(jax.random.key(1), (2 * batch, cond_len, d), jnp.bfloat16)
    )

    def run(seed: int) -> float:
        out = model.generate(
            prefix, max_new_tokens=steps, batch_size=batch, seed=seed,
            progress_bar=False, cfg_scale=cfg_scale,
        )
        return sum(o.shape[1] for o in out) / FRAME_RATE

    # Warmup/compile (covers every cache-growth bucket's loop program).
    run(seed=0)
    if profile:
        import jax

        jax.profiler.start_trace("/tmp/zonos_tpu_trace")
    t0 = time.perf_counter()
    audio_sec = run(seed=1)
    dt = time.perf_counter() - t0
    if profile:
        jax.profiler.stop_trace()
    return audio_sec / dt


def _row(metric: str, rtf: float) -> dict:
    return {
        "metric": metric,
        "value": round(rtf, 3),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
    }


def _build(arch: str, quant: str):
    from zonos_tpu.config import HYBRID_CONFIG_DICT, TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos

    cfg_dict = HYBRID_CONFIG_DICT if arch == "hybrid" else TRANSFORMER_CONFIG_DICT
    cfg = ZonosConfig.from_dict(cfg_dict)
    model = Zonos(cfg, seed=0)
    if quant == "int8":
        model.quantize_int8()
    elif quant == "int4":
        model.quantize_int4()
    return model, cfg


def run_suite(steps: int, cond_len: int) -> None:
    names = os.environ.get("BENCH_ROWS")
    names = list(SUITE) if not names else [n.strip() for n in names.split(",")]
    headline = None
    # group by (arch, quant) so each model is built & quantized once
    by_model: dict[tuple, list[str]] = {}
    for n in names:
        arch, _, quant, *_ = SUITE[n]
        by_model.setdefault((arch, quant), []).append(n)
    for (arch, quant), rows in by_model.items():
        model, cfg = _build(arch, quant)
        for n in rows:
            from zonos_tpu.utils.quant_env import set_storage_env

            _, batch, _, kv_mode, ssm_state, cfg_scale = SUITE[n]
            set_storage_env(kv_mode, ssm_state)
            # modes are baked in at TRACE time: force a fresh trace so two
            # rows differing only in storage mode never share a program
            model._generate_cache.clear()
            rtf = _bench_one(model, cfg, batch, steps, cond_len, cfg_scale)
            row = _row(n, rtf)
            if n == "rtf_batch1":
                headline = row
            print(json.dumps(row), flush=True)
        del model  # free HBM before the next architecture
    if headline is not None:
        print(json.dumps(headline), flush=True)


def run_single(steps: int, cond_len: int) -> None:
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    quant = os.environ.get("BENCH_QUANT", "int8")  # serving mode; "none" = bf16
    cfg_scale = float(os.environ.get("BENCH_CFG", "2.0"))  # 1.0 = CFG-free
    arch = os.environ.get("BENCH_MODEL", "transformer")  # or "hybrid"
    profile = os.environ.get("BENCH_PROFILE") == "1"

    model, cfg = _build(arch, quant)
    rtf = _bench_one(model, cfg, batch, steps, cond_len, cfg_scale, profile)
    suffix = "" if arch == "transformer" else f"_{arch}"
    if cfg_scale == 1.0:
        suffix += "_nocfg"
    print(json.dumps(_row(f"rtf_batch{batch}{suffix}", rtf)), flush=True)


def main() -> None:
    # Persistent XLA compilation cache (same mechanism as the server's
    # --compile_cache): the suite is compile-dominated on a cold run
    # (~35 min of XLA for ~1 min of measurement); warm, each program is a
    # disk read and the full suite finishes in minutes.  Cache hits do not
    # affect the measured numbers — timing starts after the warmup run.
    from zonos_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(os.environ.get("BENCH_CACHE_DIR"))

    # 10 s of audio: representative utterance length; short windows
    # over-weight the one-time prefill (258 steps = 3 s measures ~3% lower)
    steps = int(os.environ.get("BENCH_STEPS", "860"))
    cond_len = int(os.environ.get("BENCH_COND_LEN", "64"))
    single = any(
        os.environ.get(v)
        for v in ("BENCH_BATCH", "BENCH_QUANT", "BENCH_MODEL", "BENCH_CFG",
                  "BENCH_PROFILE")
    )
    if single:
        run_single(steps, cond_len)
    else:
        run_suite(steps, cond_len)


if __name__ == "__main__":
    main()
