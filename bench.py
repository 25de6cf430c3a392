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
  train_flagship_fps         full 1.6B training frames/s (adafactor+remat,
                             bf16 params, batch 2, 896-frame buckets)
  train_lora_fps             LoRA r=8 adaptation frames/s (frozen bf16 base)

RTF rows are DETERMINISTIC: generated lengths are pinned by statically
banning the EOS token (SamplingParams.ban_eos — every sample runs exactly
the step budget), so a row's value no longer depends on the run's sampled
EOS luck (r4 measured +-20% row variance from that alone).  Set
BENCH_FIXED_LEN=0 for the old sampled-EOS behavior.

Training rows: ``value`` is frames/s through the jitted donated-params train
step (the chip-exclusive, chained-dependency protocol of
docs/PERFORMANCE.md "Measurement methodology"); ``vs_baseline`` for those
rows is the realtime-audio multiple (frames/s / 86 / batch-independent) —
the reference has no trainer to compare against (SURVEY.md §1).

The LAST line re-emits the headline row (batch-1 transformer int8) so a
single-line consumer still reads the canonical metric:
  {"metric": "rtf_batch1", "value": N, "unit": "audio_sec/sec/chip",
   "vs_baseline": N}
vs_baseline is relative to the reference's headline ~2x real-time factor on
an RTX 4090 (BASELINE.md: README.md:102).

Setting any of BENCH_BATCH / BENCH_QUANT / BENCH_MODEL / BENCH_CFG /
BENCH_PROFILE selects the single-row mode with those knobs; BENCH_STEPS
and BENCH_COND_LEN apply to whichever mode runs (a shortened suite is
still a suite).  BENCH_ROWS=name,name subsets the suite (train rows too).
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
TRAIN_ROWS = ("train_flagship_fps", "train_lora_fps")


def _sampling():
    from zonos_tpu.ops.sampling import SamplingParams

    if os.environ.get("BENCH_FIXED_LEN", "1") == "0":
        return None  # default sampling: EOS luck decides lengths (pre-r5)
    return SamplingParams(ban_eos=True)


def _bench_one(model, cfg, batch: int, steps: int, cond_len: int,
               cfg_scale: float, profile: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    d = cfg.backbone.d_model
    prefix = jax.device_put(
        jax.random.normal(jax.random.key(1), (2 * batch, cond_len, d), jnp.bfloat16)
    )
    sampling = _sampling()

    def run(seed: int) -> float:
        out = model.generate(
            prefix, max_new_tokens=steps, batch_size=batch, seed=seed,
            progress_bar=False, cfg_scale=cfg_scale, sampling_params=sampling,
        )
        return sum(o.shape[1] for o in out) / FRAME_RATE

    # Warmup/compile (covers every cache-growth bucket's loop program).
    run(seed=0)
    if profile:
        jax.profiler.start_trace("/tmp/zonos_tpu_trace")
    t0 = time.perf_counter()
    audio_sec = run(seed=1)
    dt = time.perf_counter() - t0
    if profile:
        jax.profiler.stop_trace()
    if sampling is not None and abs(audio_sec - batch * steps / FRAME_RATE) > 1e-6:
        raise AssertionError(
            f"fixed-length mode produced {audio_sec:.3f}s, expected "
            f"{batch * steps / FRAME_RATE:.3f}s — ban_eos regressed")
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
    if os.environ.get("BENCH_TINY") == "1":  # CPU smoke of the whole suite
        import copy

        cfg_dict = copy.deepcopy(cfg_dict)
        if arch == "hybrid":
            cfg_dict["backbone"].update(
                d_model=64, n_layer=4, attn_layer_idx=[1, 3],
                attn_mlp_d_intermediate=128,
                ssm_cfg={"layer": "Mamba2", "d_state": 16, "expand": 2, "headdim": 16},
                attn_cfg={"num_heads": 4, "num_heads_kv": 2, "head_dim": 16,
                          "rotary_emb_dim": 8})
        else:
            cfg_dict["backbone"].update(
                d_model=128, n_layer=2, attn_mlp_d_intermediate=256,
                attn_cfg={"num_heads": 4, "num_heads_kv": 2})
    cfg = ZonosConfig.from_dict(cfg_dict)
    model = Zonos(cfg, seed=0)
    if quant == "int8":
        model.quantize_int8()
    elif quant == "int4":
        model.quantize_int4()
    return model, cfg


# ---------------------------------------------------------------------------
# Training throughput rows (driver-certified TRAINING.md claims)
# ---------------------------------------------------------------------------


def _bench_train(lora: bool, batch: int = 2, frames: int = 896,
                 warmup_steps: int = 3, timed_steps: int = 10) -> float:
    """Frames/s through the real jitted train step on the flagship 1.6B
    transformer, random weights + synthetic batches (loader-shaped:
    left-padded phoneme ids, 9-codebook frame targets).

    Protocol (docs/PERFORMANCE.md "Measurement methodology"): params and
    opt_state are DONATED and chained step-to-step, so the timed region is
    one data-dependent chain the tunnel cannot overlap-inflate; the final
    ``float(loss)`` is the sync.  Matches docs/TRAINING.md:94-117's measured
    setup — full: adafactor + remat + bf16 params; LoRA: r=8 over a frozen
    bf16 base (base passed as a jit ARGUMENT, never closed over)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zonos_tpu.parallel.train import make_conditioned_train_step, make_optimizer
    from zonos_tpu.text.symbols import PAD_ID

    model, cfg = _build("transformer", "none")
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, model.params)

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 1024, (batch, cfg.num_codebooks, frames)), jnp.int32)
    T_ph = 48
    phonemes = np.full((batch, T_ph), PAD_ID, np.int32)
    phonemes[:, 8:] = rng.integers(4, 100, (batch, T_ph - 8))
    cond_inputs = {s.name: None for s in model.specs}
    cond_inputs["espeak"] = jnp.asarray(phonemes)

    if lora:
        from zonos_tpu.parallel.lora import init_lora, make_lora_train_step

        optimizer = make_optimizer(lr=1e-3, kind="adamw")
        trainable = init_lora(jax.random.key(7), params, rank=8)
        raw_step = jax.jit(
            make_lora_train_step(cfg, model.specs, optimizer, alpha=16.0, remat=True),
            donate_argnums=(0, 1),
        )
        step_fn = lambda t, o, k: raw_step(t, o, params, cond_inputs, codes, k)  # noqa: E731
    else:
        optimizer = make_optimizer(lr=3e-4, kind="adafactor")
        trainable = params
        raw_step = jax.jit(
            make_conditioned_train_step(cfg, model.specs, optimizer, remat=True),
            donate_argnums=(0, 1),
        )
        step_fn = lambda t, o, k: raw_step(t, o, cond_inputs, codes, k)  # noqa: E731
    opt_state = jax.jit(optimizer.init)(trainable)

    key = jax.random.key(1)
    for i in range(warmup_steps):
        trainable, opt_state, loss = step_fn(trainable, opt_state, jax.random.fold_in(key, i))
    float(loss)  # finish warmup before the clock starts
    t0 = time.perf_counter()
    for i in range(timed_steps):
        trainable, opt_state, loss = step_fn(
            trainable, opt_state, jax.random.fold_in(key, warmup_steps + i))
    final = float(loss)  # sync
    dt = time.perf_counter() - t0
    if not np.isfinite(final):
        raise AssertionError(f"non-finite training loss {final}")
    del trainable, opt_state, params, model  # free HBM for later rows
    return batch * frames * timed_steps / dt


def _train_row(metric: str, fps: float) -> dict:
    return {
        "metric": metric,
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        # realtime-audio multiple; the reference has no trainer to baseline
        "vs_baseline": round(fps / FRAME_RATE, 2),
    }


def run_suite(steps: int, cond_len: int) -> None:
    names = os.environ.get("BENCH_ROWS")
    names = (list(SUITE) + list(TRAIN_ROWS)) if not names else [
        n.strip() for n in names.split(",")]
    headline = None
    # group by (arch, quant) so each model is built & quantized once
    by_model: dict[tuple, list[str]] = {}
    for n in names:
        if n in TRAIN_ROWS:
            continue
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
    for n in names:
        if n in TRAIN_ROWS:
            fps = _bench_train(lora=(n == "train_lora_fps"))
            print(json.dumps(_train_row(n, fps)), flush=True)
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
