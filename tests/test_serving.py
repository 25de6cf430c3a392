"""Serving layer tests: batched prefix conditioning parity, the continuous
batcher, and the REST server end-to-end (tiny model, CPU)."""

import copy
import io
import json
import threading
import urllib.request
import wave

import jax.numpy as jnp
import numpy as np
import pytest

from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
from zonos_tpu.conditioning import make_cond_dict
from zonos_tpu.models.tts import Zonos
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.serving import ContinuousBatcher, TTSRequest, build_batch_prefix


@pytest.fixture(scope="module")
def tiny_model():
    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    return Zonos(ZonosConfig.from_dict(d), seed=0)


def _spk(seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(1, 1, 128)).astype(np.float32)


def test_batch_prefix_matches_single_requests(tiny_model):
    """Each row of the merged prefix == prepare_conditioning of that request
    alone (same text length so no padding difference; pad_multiple=1)."""
    cd_a = make_cond_dict(text="Hello there", speaker=_spk(0), pitch_std=30.0)
    cd_b = make_cond_dict(text="Hello there", speaker=_spk(1), pitch_std=90.0)
    merged = build_batch_prefix(tiny_model, [cd_a, cd_b], pad_multiple=1)
    ref_a = tiny_model.prepare_conditioning(make_cond_dict(text="Hello there", speaker=_spk(0), pitch_std=30.0))
    ref_b = tiny_model.prepare_conditioning(make_cond_dict(text="Hello there", speaker=_spk(1), pitch_std=90.0))
    assert merged.shape == (4, ref_a.shape[1], ref_a.shape[2])
    # rows: [cond_a, cond_b, uncond_a, uncond_b]
    np.testing.assert_allclose(np.asarray(merged[0], np.float32), np.asarray(ref_a[0], np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(merged[1], np.float32), np.asarray(ref_b[0], np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(merged[2], np.float32), np.asarray(ref_a[1], np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(merged[3], np.float32), np.asarray(ref_b[1], np.float32), atol=1e-2)


def test_batch_prefix_per_row_uncond(tiny_model):
    """A request leaving a conditioner unconditional gets its learned uncond
    vector for its row only; the conditioned row is unaffected."""
    cd_a = make_cond_dict(text="Mixed rows", speaker=_spk(0), pitch_std=55.0)
    cd_b = make_cond_dict(text="Mixed rows", speaker=_spk(1),
                          unconditional_keys=frozenset({"emotion", "vqscore_8", "dnsmos_ovrl", "pitch_std"}))
    merged = build_batch_prefix(tiny_model, [cd_a, cd_b], pad_multiple=1)
    ref_b = tiny_model.prepare_conditioning(
        make_cond_dict(text="Mixed rows", speaker=_spk(1),
                       unconditional_keys=frozenset({"emotion", "vqscore_8", "dnsmos_ovrl", "pitch_std"}))
    )
    np.testing.assert_allclose(np.asarray(merged[1], np.float32), np.asarray(ref_b[0], np.float32), atol=1e-2)


def test_batch_prefix_pads_to_multiple(tiny_model):
    cd = make_cond_dict(text="Pad me", speaker=_spk(0))
    merged = build_batch_prefix(tiny_model, [cd], pad_multiple=32)
    # cond_len = padded phoneme length + one slot per non-espeak conditioner
    n_other = len(tiny_model.specs) - 1
    assert (merged.shape[1] - n_other) % 32 == 0


def test_batch_prefix_missing_required_raises(tiny_model):
    cd = make_cond_dict(text="x", speaker=_spk(0))
    cd.pop("speaker", None)
    from zonos_tpu.conditioning import required_keys

    if "speaker" not in required_keys(tiny_model.specs):
        pytest.skip("speaker not required in this config")
    with pytest.raises(ValueError, match="required"):
        build_batch_prefix(tiny_model, [cd])


def test_continuous_batcher_merges_requests(tiny_model):
    batcher = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=500.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2, 4))
    try:
        reqs = [
            TTSRequest(
                cond_dict=make_cond_dict(text=f"request number {i}", speaker=_spk(i)),
                sampling=SamplingParams.greedy(),
                max_new_tokens=18,
            )
            for i in range(4)
        ]
        pendings = [batcher.submit(r) for r in reqs]
        wavs = [p.wait(timeout=900) for p in pendings]
        for w in wavs:
            assert w.ndim == 2 and w.shape[-1] > 0
        s = batcher.snapshot()
        assert s["completed"] == 4
        assert s["max_batch_seen"] >= 2, f"no batching happened: {s}"
        assert s["batches"] < 4
    finally:
        batcher.close()


def test_bad_request_does_not_poison_batch(tiny_model):
    """One malformed request sharing the batch window must fail alone; the
    co-batched valid request still synthesizes."""
    batcher = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=500.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2, 4))
    try:
        good = batcher.submit(TTSRequest(
            cond_dict=make_cond_dict(text="fine request", speaker=_spk(0)),
            sampling=SamplingParams.greedy(), max_new_tokens=18))
        bad_cd = make_cond_dict(text="broken", speaker=_spk(1))
        bad_cd["espeak"] = (["two", "texts"], ["en-us", "en-us"])  # invalid
        bad = batcher.submit(TTSRequest(
            cond_dict=bad_cd, sampling=SamplingParams.greedy(), max_new_tokens=18))
        w = good.wait(timeout=900)
        assert w.ndim == 2 and w.shape[-1] > 0
        try:
            bad.wait(timeout=900)
            raise AssertionError("bad request should have raised")
        except ValueError as e:
            assert "one text per request" in str(e)
        s = batcher.snapshot()
        assert s["completed"] >= 1 and s["failed"] == 1
    finally:
        batcher.close()


def test_concurrent_streams_share_batch_and_interleave(tiny_model):
    """Two stream requests arriving in one batch window ride ONE batched
    decode; their chunk arrivals interleave in wall-clock instead of one
    stream waiting for the other to finish (the round-2 failure mode)."""
    import time

    from zonos_tpu.serving import StreamRequest

    batcher = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=500.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2, 4))
    try:
        reqs = [
            StreamRequest(
                cond_dict=make_cond_dict(text=f"stream number {i}", speaker=_spk(i)),
                sampling=SamplingParams.greedy(),
                max_new_tokens=36, chunk_frames=8, margin_frames=12,
            )
            for i in range(2)
        ]
        handles = [batcher.submit_stream(r) for r in reqs]
        arrivals: dict[int, list[tuple[float, int]]] = {0: [], 1: []}

        def drain(i):
            for chunk in handles[i].chunks(timeout=900):
                arrivals[i].append((time.monotonic(), len(chunk)))

        threads = [threading.Thread(target=drain, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=900)
        assert all(arrivals[i] for i in range(2))
        assert all(n > 0 for a in arrivals.values() for _, n in a)
        # interleaved: each stream got audio before the other finished
        first = {i: arrivals[i][0][0] for i in range(2)}
        last = {i: arrivals[i][-1][0] for i in range(2)}
        assert first[0] < last[1] and first[1] < last[0]
        s = batcher.snapshot()
        assert s["streams"] == 2
        assert s["batches"] == 1, f"streams did not share a batch: {s}"
        assert "ttfa_p50_s" in s
    finally:
        batcher.close()


def test_late_stream_interleaves_chunkwise(tiny_model):
    """A stream arriving AFTER another stream group started must get its
    first chunk before the earlier stream ends: the device lock is held per
    decode chunk, not per stream."""
    import time

    from zonos_tpu.serving import StreamRequest

    batcher = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=50.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2, 4))
    try:
        # 256 tokens = ~32 decode chunks: even on a heavily loaded host the
        # long stream is still mid-flight while the late stream's first
        # chunk (prep + one 8-frame decode) is produced (the 64-token
        # version flaked when host contention stretched the late prep past
        # the long stream's remaining ~7 chunks)
        long_req = StreamRequest(
            cond_dict=make_cond_dict(text="a long running stream", speaker=_spk(0)),
            sampling=SamplingParams.greedy(),
            max_new_tokens=256, chunk_frames=8, margin_frames=12)
        h_long = batcher.submit_stream(long_req)
        long_times: list[float] = []
        late_first: list[float] = []

        def drain_long():
            for _ in h_long.chunks(timeout=900):
                long_times.append(time.monotonic())

        t = threading.Thread(target=drain_long)
        t.start()
        # wait until the long stream is demonstrably mid-flight
        while not long_times:
            time.sleep(0.02)
        late_req = StreamRequest(
            cond_dict=make_cond_dict(text="late arrival", speaker=_spk(1)),
            sampling=SamplingParams.greedy(),
            max_new_tokens=16, chunk_frames=8, margin_frames=12)
        h_late = batcher.submit_stream(late_req)
        for _ in h_late.chunks(timeout=900):
            late_first.append(time.monotonic())
            break
        t.join(timeout=900)
        assert late_first and long_times
        assert late_first[0] < long_times[-1], (
            "late stream's first chunk only arrived after the earlier "
            "stream fully finished — chunk-level interleaving is broken")
        s = batcher.snapshot()
        assert s["streams"] == 2 and s["batches"] == 2
    finally:
        batcher.close()


def test_stream_cancel_frees_batcher(tiny_model):
    """Cancelling the only stream in a group stops the decode; subsequent
    requests are served normally."""
    from zonos_tpu.serving import StreamRequest

    batcher = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=50.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2, 4))
    try:
        h = batcher.submit_stream(StreamRequest(
            cond_dict=make_cond_dict(text="cancel me midway", speaker=_spk(0)),
            sampling=SamplingParams.greedy(),
            max_new_tokens=64, chunk_frames=8, margin_frames=12))
        it = h.chunks(timeout=900)
        first = next(it)
        assert first.shape[-1] > 0
        h.cancel()
        for _ in it:  # drains to the DONE sentinel without hanging
            pass
        w = batcher.synthesize(TTSRequest(
            cond_dict=make_cond_dict(text="after the cancel", speaker=_spk(1)),
            sampling=SamplingParams.greedy(), max_new_tokens=18), timeout=900)
        assert w.ndim == 2 and w.shape[-1] > 0
    finally:
        batcher.close()


def test_continuous_batcher_groups_by_key(tiny_model):
    """Different sampling params must not share a device batch."""
    batcher = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=300.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2, 4))
    try:
        p1 = batcher.submit(TTSRequest(
            cond_dict=make_cond_dict(text="greedy one", speaker=_spk(0)),
            sampling=SamplingParams.greedy(), max_new_tokens=18))
        p2 = batcher.submit(TTSRequest(
            cond_dict=make_cond_dict(text="sampled one", speaker=_spk(1)),
            sampling=SamplingParams(min_p=0.1), max_new_tokens=18))
        p1.wait(timeout=900)
        p2.wait(timeout=900)
        s = batcher.snapshot()
        assert s["batches"] == 2 and s["max_batch_seen"] == 1
    finally:
        batcher.close()


# ---------------------------------------------------------------------------
# REST server
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def server(tiny_model):
    from zonos_tpu.serving import ServerState, serve

    tiny_model.make_speaker_embedding = lambda wav, sr: _spk(99)  # avoid the heavy tower
    state = ServerState(tiny_model, model_name="tiny", max_batch=4, max_wait_ms=100.0,
                        cond_pad_multiple=16)
    httpd = serve(state, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", state
    httpd.shutdown()
    state.close()


def _post_json(url, obj, timeout=900):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def test_server_health_and_stats(server):
    base, _ = server
    with urllib.request.urlopen(base + "/v1/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(base + "/v1/stats", timeout=30) as r:
        assert "batches" in json.loads(r.read())


def test_server_tts_roundtrip(server):
    base, _ = server
    body = {"text": "Server test.", "max_seconds": 0.25,
            "sampling": {"temperature": 0.0, "linear": 0.0, "conf": 0.0,
                         "repetition_penalty": 1.0},
            "speaker_id": None}
    body.pop("speaker_id")
    # register a speaker first (tiny model requires one)
    sr = 16000
    pcm = (np.sin(np.linspace(0, 440 * 2 * np.pi, sr)) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    req = urllib.request.Request(base + "/v1/speakers", data=buf.getvalue(),
                                 headers={"Content-Type": "audio/wav"})
    with urllib.request.urlopen(req, timeout=120) as r:
        sid = json.loads(r.read())["speaker_id"]
    body["speaker_id"] = sid
    with _post_json(base + "/v1/tts", body) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    with wave.open(io.BytesIO(data), "rb") as w:
        assert w.getframerate() == 44100
        assert w.getnframes() > 0


def test_server_errors(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_json(base + "/v1/tts", {"max_seconds": 0.1}, timeout=60)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_json(base + "/v1/tts", {"text": "x", "speaker_id": "nope"}, timeout=60)
    assert e.value.code == 400


def test_warmup_precompiles_serving_programs(tiny_model):
    """warmup() lowers+compiles every bucket combination without executing;
    a following generate with matching statics hits the jit cache."""
    batcher = ContinuousBatcher(tiny_model, max_batch=2, batch_buckets=(1, 2))
    try:
        n = batcher.warmup(cond_lens=(32,), max_new_tokens=1200)
        # 2 batch buckets x 1 cond_len x (1 init + >=2 growth-bucket loops)
        assert n >= 6
        # prefix buckets (long-form carry): each length adds its own
        # program family
        n2 = batcher.warmup(cond_lens=(32,), max_new_tokens=512,
                            prefix_audio_lens=(0, 8))
        assert n2 >= 2 * n // 3  # two prefix lengths x buckets
    finally:
        batcher.close()


def test_mixed_durations_share_a_batch(tiny_model):
    """Requests with different max_seconds batch together (duration is a
    traced per-sample cap, not part of the batch key)."""
    batcher = ContinuousBatcher(tiny_model, max_batch=2, max_wait_ms=500.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2))
    try:
        p1 = batcher.submit(TTSRequest(
            cond_dict=make_cond_dict(text="short request", speaker=_spk(0)),
            sampling=SamplingParams.greedy(), max_new_tokens=10))
        p2 = batcher.submit(TTSRequest(
            cond_dict=make_cond_dict(text="longer request", speaker=_spk(1)),
            sampling=SamplingParams.greedy(), max_new_tokens=30))
        w1 = p1.wait(timeout=900)
        w2 = p2.wait(timeout=900)
        assert w1.shape[-1] > 0 and w2.shape[-1] > 0
        s = batcher.snapshot()
        assert s["batches"] == 1 and s["max_batch_seen"] == 2, s
    finally:
        batcher.close()


def test_server_streaming_endpoint(server):
    base, _ = server
    body = {"text": "Stream me.", "max_seconds": 0.5,
            "sampling": {"temperature": 0.0, "linear": 0.0, "conf": 0.0,
                         "repetition_penalty": 1.0}}
    req = urllib.request.Request(base + "/v1/tts/stream", data=json.dumps(body).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers["X-Sample-Rate"] == "44100"
        pcm = r.read()
    assert len(pcm) > 1000 and len(pcm) % 2 == 0


def test_stats_latency_percentiles(server):
    base, _ = server
    with urllib.request.urlopen(base + "/v1/stats", timeout=30) as r:
        s = json.loads(r.read())
    if s["completed"]:
        assert "latency_p50_s" in s


def test_server_longform(server):
    base, _ = server
    body = {"text": "A first sentence for the server. Now a second sentence. "
                    "And here is the third one.",
            "long": True, "max_segment_seconds": 1.0, "max_seconds": 0.5,
            "sampling": {"temperature": 0.0, "linear": 0.0, "conf": 0.0,
                         "repetition_penalty": 1.0}}
    with _post_json(base + "/v1/tts", body) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    with wave.open(io.BytesIO(data), "rb") as w:
        assert w.getframerate() == 44100
        # several segments crossfaded: clearly longer than one 0.5 s cap
        assert w.getnframes() > int(0.5 * 44100)


def test_crossfade_concat():
    from zonos_tpu.serving.server import _crossfade_concat

    a = np.ones(1000, np.float32)
    b = np.full(1000, -1.0, np.float32)
    out = _crossfade_concat([a, b], sr=44100, fade_ms=10.0)
    n = int(0.010 * 44100)
    assert out.shape[0] == 2000 - n
    # seam ramps monotonically from +1 to -1, endpoints intact
    seam = out[1000 - n : 1000]
    assert seam[0] <= 1.0 and seam[-1] >= -1.0
    assert (np.diff(seam) <= 1e-6).all()
    assert out[0] == 1.0 and out[-1] == -1.0
    # degenerate: short pieces just concatenate
    out2 = _crossfade_concat([np.ones(1, np.float32)] * 3, sr=44100)
    assert out2.shape[0] == 3


def test_warmup_streaming_precompiles(tiny_model):
    """Streaming warmup compiles the no-growth decode programs and the
    bucketed vocode windows a live stream hits (the 20-s first-stream
    cadence stall measured in tools/ttfa_load_bench.py)."""
    batcher = ContinuousBatcher(tiny_model, max_batch=2, max_wait_ms=10.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2))
    try:
        n = batcher.warmup_streaming(cond_lens=(16,), max_new_tokens=32,
                                     chunk_frames=8, margin_frames=12)
        # 2 buckets x (init+loop) + 2 buckets x 1 width x {B,1} rows
        assert n >= 6, n
    finally:
        batcher.close()


def test_cfg_free_requests_through_batcher(tiny_model):
    """cfg_scale=1.0 requests group separately (different batch key) and run
    the statically-halved CFG-free program end-to-end; warmup covers it via
    use_cfg=False."""
    batcher = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=300.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2, 4))
    try:
        assert batcher.warmup(cond_lens=(32,), max_new_tokens=512,
                              sampling=SamplingParams.greedy(),
                              use_cfg=False) > 0
        p1 = batcher.submit(TTSRequest(
            cond_dict=make_cond_dict(text="no guidance", speaker=_spk(0)),
            sampling=SamplingParams.greedy(), cfg_scale=1.0, max_new_tokens=18))
        p2 = batcher.submit(TTSRequest(
            cond_dict=make_cond_dict(text="with guidance", speaker=_spk(1)),
            sampling=SamplingParams.greedy(), cfg_scale=2.0, max_new_tokens=18))
        w1 = p1.wait(timeout=900)
        w2 = p2.wait(timeout=900)
        assert w1.shape[-1] > 0 and w2.shape[-1] > 0
        s = batcher.snapshot()
        assert s["batches"] == 2, f"cfg=1 and cfg=2 must not share a batch: {s}"
    finally:
        batcher.close()


# ---------------------------------------------------------------------------
# Backpressure / admission control
# ---------------------------------------------------------------------------


def test_admission_rejects_when_full(tiny_model):
    """Past max_queue in-flight requests, submit() sheds load immediately
    with ServerOverloaded (the server's 503) instead of queueing unboundedly;
    once the admitted requests drain, admission reopens."""
    import time

    from zonos_tpu.serving.batching import ServerOverloaded

    b = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=5.0,
                          batch_buckets=(1, 2, 4), max_queue=3)
    try:
        cd = make_cond_dict(text="Shed me", speaker=_spk(0))
        admitted = [b.submit(TTSRequest(cond_dict=cd, max_new_tokens=12,
                                        sampling=SamplingParams.greedy()))
                    for _ in range(3)]
        t0 = time.monotonic()
        with pytest.raises(ServerOverloaded) as exc:
            b.submit(TTSRequest(cond_dict=cd, max_new_tokens=12,
                                sampling=SamplingParams.greedy()))
        assert time.monotonic() - t0 < 0.5  # rejection is immediate
        assert exc.value.retry_after >= 1.0
        for p in admitted:
            p.wait(timeout=300)  # admitted requests all complete
        assert b.snapshot()["rejected"] == 1
        # queue drained -> inflight back to 0 -> admission reopens
        p = b.submit(TTSRequest(cond_dict=cd, max_new_tokens=12,
                                sampling=SamplingParams.greedy()))
        p.wait(timeout=300)
    finally:
        b.close()


def test_burst_sheds_fast_no_stuck_clients(tiny_model):
    """A 12-request burst against max_queue=4: rejects resolve in
    milliseconds, every admitted request completes, and nobody hangs."""
    import time

    from zonos_tpu.serving.batching import ServerOverloaded

    b = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=10.0,
                          batch_buckets=(1, 2, 4), max_queue=4)
    try:
        cd = make_cond_dict(text="Burst", speaker=_spk(0))
        outcomes = [None] * 12

        def client(i):
            t0 = time.monotonic()
            try:
                p = b.submit(TTSRequest(cond_dict=cd, max_new_tokens=12,
                                        sampling=SamplingParams.greedy()))
                p.wait(timeout=300)
                outcomes[i] = ("ok", time.monotonic() - t0)
            except ServerOverloaded:
                outcomes[i] = ("shed", time.monotonic() - t0)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(not t.is_alive() for t in threads)  # no stuck clients
        kinds = [o[0] for o in outcomes]
        assert kinds.count("shed") >= 1 and kinds.count("ok") >= 4
        assert all(o[1] < 0.5 for o in outcomes if o[0] == "shed")
        snap = b.snapshot()
        assert snap["completed"] == kinds.count("ok")
        assert snap["rejected"] == kinds.count("shed")
    finally:
        b.close()


def test_deadline_expired_in_queue(tiny_model):
    """A request whose deadline passes while queued fails with TimeoutError
    and never occupies a device batch."""
    b = ContinuousBatcher(tiny_model, max_batch=2, max_wait_ms=5.0,
                          batch_buckets=(1, 2), max_queue=8)
    try:
        cd = make_cond_dict(text="Too late", speaker=_spk(0))
        # one long request occupies the device; the expired one sits queued
        slow = b.submit(TTSRequest(cond_dict=cd, max_new_tokens=24,
                                   sampling=SamplingParams.greedy()))
        doomed = b.submit(TTSRequest(cond_dict=cd, max_new_tokens=12,
                                     deadline_s=0.0,
                                     sampling=SamplingParams.greedy()))
        with pytest.raises(TimeoutError):
            doomed.wait(timeout=300)
        slow.wait(timeout=300)
        assert b.snapshot()["expired"] >= 1
    finally:
        b.close()


def test_stream_deadline_cancels_mid_flight(tiny_model):
    """A streaming request whose deadline passes mid-stream is cancelled:
    the client's chunk iterator raises TimeoutError promptly instead of
    draining the rest of the generation."""
    import time

    from zonos_tpu.serving import StreamRequest

    b = ContinuousBatcher(tiny_model, max_batch=2, max_wait_ms=5.0,
                          cond_pad_multiple=16, batch_buckets=(1, 2))
    try:
        h = b.submit_stream(StreamRequest(
            cond_dict=make_cond_dict(text="deadline mid stream", speaker=_spk(0)),
            sampling=SamplingParams.greedy(),
            max_new_tokens=1024, chunk_frames=8, margin_frames=12,
            deadline_s=2.0))
        got, err = 0, None
        t0 = time.monotonic()
        try:
            for _ in h.chunks(timeout=300):
                got += 1
        except TimeoutError as e:
            err = e
        assert err is not None, f"stream finished {got} chunks without deadline"
        assert h.cancelled
    finally:
        b.close()


def test_request_audio_independent_of_cobatched_peers(tiny_model):
    """Batch-composition-independent PRNG (r4 verdict #7): the same request
    (same text/conditioning/seed) yields BIT-IDENTICAL audio whether it runs
    alone or co-batched with arbitrary peers — each row's sampling stream is
    keyed by its own request seed (Zonos._row_keys), never by the batch."""

    def req(i, seed):
        return TTSRequest(
            cond_dict=make_cond_dict(text="identical either way", speaker=_spk(3)),
            sampling=SamplingParams(),  # SAMPLED path (greedy would hide PRNG)
            seed=seed,
            max_new_tokens=18,
        )

    # solo: a quiet batcher window, one request
    batcher = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=10.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2, 4))
    try:
        solo = batcher.submit(req(0, seed=1234)).wait(timeout=900)
    finally:
        batcher.close()

    # co-batched: same request + two different peers in one window
    batcher = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=1000.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2, 4))
    try:
        # peer texts chosen to share the target's 32-token cond bucket so
        # they genuinely co-batch (the scheduler groups by padded length)
        peers = [
            TTSRequest(cond_dict=make_cond_dict(text=t, speaker=_spk(i)),
                       sampling=SamplingParams(), seed=777 + i, max_new_tokens=18)
            for i, t in enumerate(["a different peer sentence",
                                   "another peer utterance yes"])
        ]
        pendings = [batcher.submit(req(0, seed=1234))] + [batcher.submit(p) for p in peers]
        outs = [p.wait(timeout=900) for p in pendings]
        s = batcher.snapshot()
        assert s["max_batch_seen"] >= 3, f"peers did not co-batch: {s}"
    finally:
        batcher.close()

    np.testing.assert_array_equal(solo, outs[0])

    # a peer whose text crosses into a LONGER cond-pad bucket must not
    # change the request's audio either: the scheduler groups by each
    # request's own padded length (a longer co-batched peer would widen
    # the prefix padding, and left PAD rows are attended)
    batcher = ContinuousBatcher(tiny_model, max_batch=4, max_wait_ms=1000.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2, 4))
    try:
        long_peer = TTSRequest(
            cond_dict=make_cond_dict(
                text="this peer has a very much longer text that certainly "
                     "lands in a larger conditioning pad bucket than ours",
                speaker=_spk(7)),
            sampling=SamplingParams(), seed=888, max_new_tokens=18)
        pendings = [batcher.submit(req(0, seed=1234)), batcher.submit(long_peer)]
        outs2 = [p.wait(timeout=900) for p in pendings]
    finally:
        batcher.close()
    np.testing.assert_array_equal(solo, outs2[0])


def _clone(model):
    return Zonos(model.config, params=model.params)


def _run_batcher(model, texts, seeds, stream=False, buckets=(1, 2, 4)):
    """Submit a sync batch (or a streaming group) and return per-request
    waveforms + the stats snapshot."""
    from zonos_tpu.serving import StreamRequest

    batcher = ContinuousBatcher(model, max_batch=4, max_wait_ms=1000.0,
                                cond_pad_multiple=16, batch_buckets=buckets)
    try:
        if stream:
            handles = [batcher.submit_stream(StreamRequest(
                cond_dict=make_cond_dict(text=t, speaker=_spk(i)),
                sampling=SamplingParams(), seed=s, max_new_tokens=24,
                chunk_frames=8, margin_frames=12))
                for i, (t, s) in enumerate(zip(texts, seeds))]
            outs = [np.concatenate(list(h.chunks(timeout=900)) or [np.zeros(1, np.float32)])
                    for h in handles]
        else:
            pendings = [batcher.submit(TTSRequest(
                cond_dict=make_cond_dict(text=t, speaker=_spk(i)),
                sampling=SamplingParams(), seed=s, max_new_tokens=18))
                for i, (t, s) in enumerate(zip(texts, seeds))]
            outs = [p.wait(timeout=900) for p in pendings]
        snap = batcher.snapshot()
    finally:
        batcher.close()
    return outs, snap


def test_batcher_over_sharded_model_data_parallel(tiny_model):
    """The continuous batcher drives a Zonos.shard(mesh) model (r4 verdict
    #3: the 'layout-agnostic' SERVING.md claim, previously never tested).
    On a pure data-parallel mesh the per-row numerics are unchanged, so the
    sharded batcher's outputs must be BIT-IDENTICAL to the unsharded one —
    sync batch and a streaming group both."""
    import jax

    from zonos_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    texts = ["sharded serving one", "sharded serving two", "sharded serving three"]
    seeds = [101, 202, 303]

    ref, _ = _run_batcher(tiny_model, texts, seeds, buckets=(4,))
    sharded = _clone(tiny_model).shard(make_mesh(4, 1, jax.devices()[:4]))
    got, snap = _run_batcher(sharded, texts, seeds, buckets=(4,))
    assert snap["max_batch_seen"] >= 3, f"requests did not co-batch: {snap}"
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)

    ref_s, _ = _run_batcher(tiny_model, texts[:2], seeds[:2], stream=True, buckets=(2,))
    got_s, snap_s = _run_batcher(sharded, texts[:2], seeds[:2], stream=True, buckets=(2,))
    assert snap_s["streams"] == 2
    for a, b in zip(ref_s, got_s):
        np.testing.assert_array_equal(a, b)


def test_batcher_over_tensor_parallel_model(tiny_model):
    """Full {data:4, model:2} serving mesh: the batcher's sync, streaming,
    and warmup paths all run against TP-sharded params.  Outputs are checked
    for contract (shape/finiteness/completion), not bit-equality — the TP
    all-reduce reorders bf16 sums, and one near-tie flip rewrites every
    later sampled token (see test_sharded_generate_matches_single_device)."""
    import jax

    from zonos_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sharded = _clone(tiny_model).shard(make_mesh(4, 2))

    outs, snap = _run_batcher(sharded, ["tensor parallel serving", "second row"],
                              [7, 8], buckets=(2,))
    assert snap["completed"] == 2 and snap["failed"] == 0
    for w in outs:
        w = np.asarray(w)
        assert w.size > 0 and np.isfinite(w).all()

    outs_s, snap_s = _run_batcher(sharded, ["streaming on tp"], [9],
                                  stream=True, buckets=(1,))
    assert snap_s["streams"] == 1 and np.isfinite(outs_s[0]).all()

    # warmup compiles the serving programs against the sharded layout
    batcher = ContinuousBatcher(sharded, max_batch=2, max_wait_ms=10.0,
                                cond_pad_multiple=16, batch_buckets=(1, 2))
    try:
        n = batcher.warmup(cond_lens=(32,), max_new_tokens=(512,))
        assert n > 0
    finally:
        batcher.close()


def test_server_longform_carry_matches_offline(server):
    """r4 verdict #6: '/v1/tts long:true' now carries audio-prefix voice
    continuity through the batcher (codes_only segments + prefix-attached
    vocode), reusing longform.synthesize_long's own orchestration — so the
    server's long-form audio is BIT-IDENTICAL to the offline path under the
    same seed/budget/carry."""
    from zonos_tpu import longform
    from zonos_tpu.audio import normalize_loudness
    from zonos_tpu.serving import ServerState
    from zonos_tpu.serving.batching import program_frames_bucket

    _, shared = server
    text = ("The first sentence runs here. Then a second one follows. "
            "Finally a third sentence ends it.")
    budget, carry, seed = 1.0, 8, 55

    body = {"text": text, "long": True, "max_segment_seconds": budget,
            "carry_frames": carry, "seed": seed}
    # identity holds at the DEFAULT cond_pad_multiple=32 (the offline path
    # buckets phoneme lengths to 32); the shared fixture's batcher pads to
    # 16, so build a default-configured state over the same model
    state = ServerState(shared.model, max_batch=4, max_wait_ms=20.0)
    try:
        server_wav = state.synthesize_long(body)
    finally:
        state.close()

    frames = max(9, min(86 * 30, int(min(budget * 1.2 + 1.0, 30.0) * 86)))
    offline_wav, seg_codes = longform.synthesize_long(
        state.model, text, language="en-us",
        sampling_params=SamplingParams(), cfg_scale=2.0, seed=seed,
        max_segment_seconds=budget, carry_frames=carry,
        max_new_tokens=program_frames_bucket(frames))
    assert len(seg_codes) >= 2, "text should split into multiple segments"
    np.testing.assert_array_equal(
        np.asarray(server_wav, np.float32).reshape(-1),
        np.asarray(normalize_loudness(offline_wav, 44100, target_lufs=-23.0),
                   np.float32).reshape(-1))


def test_server_longform_parallel_mode(server):
    """carry:false keeps the r4 parallel crossfade mode."""
    base, _ = server
    body = {"text": "One sentence here. Another sentence there.",
            "long": True, "carry": False, "max_segment_seconds": 1.0,
            "sampling": {"temperature": 0.0, "linear": 0.0, "conf": 0.0,
                         "repetition_penalty": 1.0}}
    with _post_json(base + "/v1/tts", body) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    with wave.open(io.BytesIO(data), "rb") as w:
        assert w.getframerate() == 44100 and w.getnframes() > 0
