"""Streaming synthesis example: play audio while the model is still
decoding (no reference analogue — the reference synthesizes whole
utterances only; its closest feature is the per-step progress callback,
zonos/model.py:430-432).

Two levels shown:

1. ``Zonos.stream_generate`` — one utterance, waveform chunks yielded
   every ~0.5 s of audio; each chunk is FINAL (receptive-field-safe
   incremental vocoding), so it can go straight to a sound device or
   socket.  Time-to-first-audio is ~200 ms on a warmed v5e (int8).
2. ``ContinuousBatcher.submit_stream`` — N concurrent streams riding ONE
   batched decode program with per-stream delivery queues; this is what
   the REST server's ``/v1/tts/stream`` uses (docs/SERVING.md).

Writes stream_out.wav (chunks concatenated) so the example runs headless.
"""

import sys
import time
import wave
from pathlib import Path

# runnable straight from a checkout: python examples/sample_streaming.py
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import numpy as np

from zonos_tpu import Zonos, make_cond_dict


def main() -> None:
    try:
        model = Zonos.from_pretrained("Zyphra/Zonos-v0.1-transformer")
    except FileNotFoundError:
        from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig

        print("checkpoint unavailable; using random weights")
        model = Zonos(ZonosConfig.from_dict(TRANSFORMER_CONFIG_DICT))
    model.quantize_int8()  # the serving configuration (docs/PERFORMANCE.md)

    cond = make_cond_dict(
        text="Streaming synthesis delivers audio while the model is still "
             "thinking about the rest of the sentence.",
        language="en-us",
    )
    prefix = model.prepare_conditioning(cond)

    # -- level 1: single stream -------------------------------------------
    t0 = time.perf_counter()
    chunks = []
    for i, chunk in enumerate(model.stream_generate(prefix, max_new_tokens=86 * 8)):
        dt = time.perf_counter() - t0
        print(f"chunk {i}: {chunk.shape[-1] / 44100:.2f} s of audio at t={dt:.2f} s"
              + ("  <- time to first audio" if i == 0 else ""))
        chunks.append(chunk)  # a real client plays/forwards it here

    wav = np.concatenate(chunks) if chunks else np.zeros(1, np.float32)
    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2")
    with wave.open("stream_out.wav", "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(pcm.tobytes())
    print(f"wrote stream_out.wav ({wav.shape[-1] / 44100:.2f} s)")

    # -- level 2: concurrent streams through the batcher -------------------
    import threading

    from zonos_tpu.ops.sampling import SamplingParams
    from zonos_tpu.serving import ContinuousBatcher, StreamRequest

    batcher = ContinuousBatcher(model, max_batch=4, max_wait_ms=200.0)
    try:
        handles = [
            batcher.submit_stream(StreamRequest(
                cond_dict=make_cond_dict(
                    text=f"This is concurrent stream number {i + 1}.",
                    language="en-us"),
                sampling=SamplingParams(),
                seed=100 + i,
                max_new_tokens=86 * 4,
            ))
            for i in range(2)
        ]

        def drain(i):
            total = 0
            for chunk in handles[i].chunks(timeout=600):
                total += chunk.shape[-1]
            print(f"stream {i}: {total / 44100:.2f} s delivered "
                  f"(TTFA {handles[i].first_chunk_s:.2f} s)")

        threads = [threading.Thread(target=drain, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        batcher.close()


if __name__ == "__main__":
    main()
