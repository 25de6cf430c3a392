"""TTFA under concurrent load: streaming through the continuous batcher
while other streams / whole-utterance traffic share the chip.

Measures, on the real chip with the flagship model:

1. **co-batched streams** — N stream requests submitted together (one batch
   window): per-stream TTFA and chunk cadence when they ride ONE batched
   decode program (`Zonos.stream_generate_batch`).
2. **late joiner** — one stream mid-flight, a second arrives: TTFA of the
   late stream (chunk-level device-lock interleaving; the r1/r2 design held
   the lock for the whole first stream, so this number used to be ~the full
   first-stream duration).

Usage: python tools/ttfa_load_bench.py  [env: LOAD_QUANT={int8,none},
       LOAD_STREAMS=4, LOAD_STEPS=430, LOAD_CHUNK=43]
Prints one JSON line per scenario.
"""

import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    from zonos_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # shared persistent XLA cache (chip tools)
    quant = os.environ.get("LOAD_QUANT", "int8")
    n_streams = int(os.environ.get("LOAD_STREAMS", "4"))
    steps = int(os.environ.get("LOAD_STEPS", "430"))
    chunk = int(os.environ.get("LOAD_CHUNK", "43"))

    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.conditioning import make_cond_dict
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.sampling import SamplingParams
    from zonos_tpu.serving import ContinuousBatcher, StreamRequest

    model = Zonos(ZonosConfig.from_dict(TRANSFORMER_CONFIG_DICT), seed=0)
    if quant == "int8":
        model.quantize_int8()

    rng = np.random.default_rng(0)

    def req(i: int, frames: int) -> StreamRequest:
        return StreamRequest(
            cond_dict=make_cond_dict(
                text=f"Measuring streaming latency under load, request {i}.",
                speaker=rng.normal(size=(1, 1, 128)).astype(np.float32)),
            sampling=SamplingParams(),
            seed=100 + i,
            max_new_tokens=frames,
            chunk_frames=chunk)

    batcher = ContinuousBatcher(model, max_batch=max(4, n_streams),
                                max_wait_ms=200.0)
    try:
        # -- warm every program (co-batch shape + single-stream shape) ------
        for warm_n in (1, n_streams):
            hs = [batcher.submit_stream(req(i, 2 * chunk)) for i in range(warm_n)]
            for h in hs:
                for _ in h.chunks(timeout=1800):
                    pass

        # -- scenario 1: N co-batched streams -------------------------------
        t0 = time.monotonic()
        handles = [batcher.submit_stream(req(i, steps)) for i in range(n_streams)]
        firsts = [None] * n_streams
        cadences: list[list[float]] = [[] for _ in range(n_streams)]

        def drain(i):
            last = None
            for _ in handles[i].chunks(timeout=1800):
                now = time.monotonic()
                if firsts[i] is None:
                    firsts[i] = now - t0
                if last is not None:
                    cadences[i].append(now - last)
                last = now

        threads = [threading.Thread(target=drain, args=(i,)) for i in range(n_streams)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        gaps = sorted(g for c in cadences for g in c)
        print(json.dumps({
            "metric": f"ttfa_cobatch{n_streams}_{quant}",
            "ttfa_s": [round(f, 3) for f in firsts],
            "ttfa_max_s": round(max(firsts), 3),
            "cadence_p50_s": round(gaps[len(gaps) // 2], 3) if gaps else None,
            "cadence_p95_s": round(gaps[int(len(gaps) * 0.95)], 3) if gaps else None,
        }))

        # -- scenario 2: late joiner ----------------------------------------
        h_long = batcher.submit_stream(req(0, steps))
        long_first = threading.Event()
        long_end = [None]

        def drain_long():
            for _ in h_long.chunks(timeout=1800):
                long_first.set()
            long_end[0] = time.monotonic()

        t = threading.Thread(target=drain_long)
        t.start()
        long_first.wait(timeout=1800)
        t1 = time.monotonic()
        h_late = batcher.submit_stream(req(1, steps))
        late_first = None
        for _ in h_late.chunks(timeout=1800):
            if late_first is None:
                late_first = time.monotonic() - t1
        t.join()
        print(json.dumps({
            "metric": f"ttfa_late_joiner_{quant}",
            "ttfa_late_s": round(late_first, 3),
            "joined_before_first_stream_ended": bool(
                long_end[0] is None or (t1 + late_first) < long_end[0]),
        }))
    finally:
        batcher.close()


if __name__ == "__main__":
    main()
