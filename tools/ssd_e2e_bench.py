"""End-to-end effect of the Pallas SSD prefill kernel (r4 verdict #5).

The kernel-level win is known (3.64 vs 4.17 ms at flagship width, L=1024 —
tools/ssd_kernel_bench.py); this measures whether it is VISIBLE end-to-end
through the public hybrid paths the kernel actually serves, flipping ONLY
the SSD dispatch (ZONOS_TPU_PALLAS_SSM) so the attention/sampling kernels
stay on their defaults:

  prefill_long   init program wall with a 960-frame audio prefix (the
                 L~1024 regime: long-form carry / voice-clone continuation)
  prefill_short  init program wall at cond_len 64 (ordinary request)
  ttfa           stream_generate time-to-first-audio (chunk 43)

Run on the real chip (nothing else may use it):
  python tools/ssd_e2e_bench.py
Prints one JSON line per (scenario, ssm_mode) plus a delta summary.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def build():
    from zonos_tpu.config import HYBRID_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos

    cfg = ZonosConfig.from_dict(HYBRID_CONFIG_DICT)
    model = Zonos(cfg, seed=0)
    model.quantize_int8()
    return model, cfg


def measure_prefill(model, cfg, prefix_frames: int, reps: int = 20) -> float:
    """Median wall of the jitted init (prefill + first sample) program."""
    from zonos_tpu.models.tts import GenerateStatics
    from zonos_tpu.ops.sampling import SamplingParams

    d = cfg.backbone.d_model
    cond = jax.device_put(
        jax.random.normal(jax.random.key(1), (2, 64, d), jnp.bfloat16))
    statics = GenerateStatics(
        batch_size=1, cond_len=64, prefix_audio_len=prefix_frames,
        max_new_tokens=256, sampling=SamplingParams())
    init, _ = model._get_generate_parts(statics)
    pcodes = jnp.asarray(
        np.random.default_rng(0).integers(0, 1024, (1, 9, prefix_frames)), jnp.int32)
    keys = model._row_keys(3, 1)
    args = (model.params, cond, pcodes, jnp.float32(2.0), keys)
    jax.block_until_ready(init(*args))  # compile + warm
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(init(*args))
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls))


def measure_ttfa(model, cfg, reps: int = 5) -> float:
    d = cfg.backbone.d_model
    cond = jax.device_put(
        jax.random.normal(jax.random.key(1), (2, 64, d), jnp.bfloat16))

    def first_chunk(seed):
        t0 = time.perf_counter()
        for _ in model.stream_generate(cond, max_new_tokens=256, seed=seed,
                                       chunk_frames=43):
            return time.perf_counter() - t0
        return float("nan")

    first_chunk(1)  # warm
    return float(np.median([first_chunk(2 + i) for i in range(reps)]))


def main() -> None:
    from zonos_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    model, cfg = build()
    out = {}
    for mode in ("0", "1"):
        os.environ["ZONOS_TPU_PALLAS_SSM"] = mode
        model._generate_cache.clear()  # dispatch is baked in at trace time
        tag = "xla" if mode == "0" else "pallas"
        out[f"prefill_long_{tag}"] = measure_prefill(model, cfg, 960)
        out[f"prefill_short_{tag}"] = measure_prefill(model, cfg, 0)
        out[f"ttfa_{tag}"] = measure_ttfa(model, cfg)
        for k in (f"prefill_long_{tag}", f"prefill_short_{tag}", f"ttfa_{tag}"):
            print(json.dumps({"metric": k, "value": round(out[k] * 1e3, 2),
                              "unit": "ms"}), flush=True)
    for sc in ("prefill_long", "prefill_short", "ttfa"):
        x, p = out[f"{sc}_xla"], out[f"{sc}_pallas"]
        print(json.dumps({"metric": f"{sc}_delta_pct",
                          "value": round((x - p) / x * 100, 2),
                          "unit": "% faster with pallas"}), flush=True)


if __name__ == "__main__":
    main()
