"""Time-to-first-audio (TTFA) for streaming synthesis on the real chip.

Measures `Zonos.stream_generate` at batch 1: wall time from the request
(conditioning prefix ready) to each yielded *final* waveform chunk, plus
steady-state chunk cadence.  The serving latency number the RTF tables
don't show: how long a caller waits before playback can start.

Warm path measured (jit cache warm after one throwaway utterance), which is
the serving regime — the REST server warms at startup.

Usage:  python tools/ttfa_bench.py  [env: TTFA_QUANT={int8,none},
        TTFA_CHUNK_FRAMES=43, TTFA_STEPS=430, TTFA_MODEL={transformer,hybrid}]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main() -> None:
    from zonos_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # shared persistent XLA cache (chip tools)
    quant = os.environ.get("TTFA_QUANT", "int8")
    chunk = int(os.environ.get("TTFA_CHUNK_FRAMES", "43"))
    steps = int(os.environ.get("TTFA_STEPS", "430"))
    arch = os.environ.get("TTFA_MODEL", "transformer")

    from zonos_tpu.config import HYBRID_CONFIG_DICT, TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos

    cfg = ZonosConfig.from_dict(
        HYBRID_CONFIG_DICT if arch == "hybrid" else TRANSFORMER_CONFIG_DICT)
    model = Zonos(cfg, seed=0)
    if quant == "int8":
        model.quantize_int8()

    d = cfg.backbone.d_model
    prefix = jax.device_put(
        jax.random.normal(jax.random.key(1), (2, 64, d), jnp.bfloat16))

    def run(seed):
        t0 = time.perf_counter()
        arrivals, samples = [], 0
        for wav in model.stream_generate(prefix, max_new_tokens=steps,
                                         chunk_frames=chunk, seed=seed):
            arrivals.append(time.perf_counter() - t0)
            samples += wav.shape[-1]
        return arrivals, samples

    run(1)  # warm every chunk-shape compile
    arrivals, samples = run(2)
    if not arrivals:
        print(json.dumps({"metric": f"ttfa_{arch}_{quant}_chunk{chunk}",
                          "error": "no chunks emitted (instant EOS)"}))
        return
    audio_s = samples / 44100.0
    gaps = [b - a for a, b in zip(arrivals, arrivals[1:])]
    result = {
        "metric": f"ttfa_{arch}_{quant}_chunk{chunk}",
        "ttfa_ms": round(arrivals[0] * 1e3, 1),
        "chunk_audio_ms": round(chunk / (44100 / 512) * 1e3, 1),
        "steady_gap_ms": round(sorted(gaps)[len(gaps) // 2] * 1e3, 1) if gaps else None,
        "total_audio_s": round(audio_s, 2),
        "total_wall_s": round(arrivals[-1], 2),
        "chunks": len(arrivals),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
