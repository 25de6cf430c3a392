"""Continuous batching for TTS serving.

The reference has no serving layer at all — its only concurrency is batching
inside one ``generate()`` call driven by a CLI (SURVEY.md §1 "no serving
layer", zonos/zonos_batch_cli.py).  This module is the production-serving
equivalent designed for how a jitted TPU program wants to be fed:

- **Requests are merged into device batches** by a scheduler thread: the
  first request opens a batch window (``max_wait_ms``); whatever compatible
  requests arrive inside it ride along, up to ``max_batch``.
- **Compiled-program reuse is explicit.** ``Zonos.generate`` compiles one
  program per (batch, cond_len, max_new_tokens, sampling) signature, so the
  batcher snaps every axis to a bucket: phoneme prefixes are left-padded
  (PAD symbol — the reference's own intra-batch padding semantics,
  zonos/conditioning.py:186-191) to a multiple of ``cond_pad_multiple``, and
  the batch is padded up to the next size in ``batch_buckets`` by repeating
  the last row (surplus outputs are dropped on the host).  Steady-state
  serving therefore runs entirely from the jit cache.
- **Heterogeneous conditioning in one batch**: each request keeps its own
  speaker embedding / emotion / rates; a request that leaves a conditioner
  unconditional gets the learned uncond vector substituted *for its row
  only* — per-row semantics identical to running it alone.

Requests with different sampling params / cfg_scale / max_new_tokens are
incompatible (sampling is compiled in; cfg_scale is a single scalar per
program invocation) — the scheduler groups by that key and never mixes.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time

import jax.numpy as jnp
import numpy as np

from zonos_tpu.conditioning import _project, conditioner_forward, required_keys
from zonos_tpu.ops.norms import layer_norm
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.text import phonemize, tokenize_phonemes
from zonos_tpu.text.symbols import PAD_ID

FRAME_RATE = 86.0


# ---------------------------------------------------------------------------
# Batched prefix conditioning
# ---------------------------------------------------------------------------


def build_batch_prefix(model, cond_dicts: list[dict], pad_multiple: int = 32) -> jnp.ndarray:
    """Merge per-request cond dicts (``make_cond_dict`` outputs) into one
    ``[2B, cond_len, d_model]`` prefix (cond rows stacked over uncond rows).

    Equivalent to ``model.prepare_conditioning`` per request, except rows
    share one padded phoneme length (rounded up to ``pad_multiple`` to bound
    the number of compiled generate programs)."""
    specs = model.specs
    pc_cfg = model.config.prefix_conditioner
    pp = model.params["prefix_conditioner"]
    eps = model.config.backbone.norm_epsilon
    B = len(cond_dicts)
    req_keys = required_keys(specs)

    # phonemize every text in one call; left-pad ids to the bucketed length
    texts: list[str] = []
    langs: list[str] = []
    for cd in cond_dicts:
        t, l = cd["espeak"]
        if len(t) != 1:
            raise ValueError("one text per request (batching is across requests)")
        texts.extend(t)
        langs.extend(l)
    ids, _ = tokenize_phonemes(phonemize(texts, langs))
    L = ids.shape[1]
    Lp = -(-L // pad_multiple) * pad_multiple
    ids_padded = np.full((B, Lp), PAD_ID, np.int32)
    ids_padded[:, Lp - L :] = ids

    def rows(spec, uncond: bool) -> jnp.ndarray:
        """[B, seq, d] output of one conditioner with per-row uncond fill."""
        p = pp[spec.name]
        if spec.name == "espeak":
            return conditioner_forward(p, spec, jnp.asarray(ids_padded))
        vals = []
        for cd in cond_dicts:
            v = cd.get(spec.name) if (not uncond or spec.name in req_keys) else None
            vals.append(v)
        missing = [v is None for v in vals]
        if spec.name in req_keys and any(missing):
            raise ValueError(f"Missing required conditioning key: {spec.name}")
        if all(missing):
            return conditioner_forward(p, spec, None)  # [1, 1, d], broadcast below
        dim = int(np.asarray(next(v for v in vals if v is not None)).reshape(1, -1).shape[-1])
        dtype = np.int32 if spec.type == "Integer" else np.float32
        arr = np.zeros((B, 1, dim), dtype)
        for i, v in enumerate(vals):
            if v is not None:
                arr[i, 0] = np.asarray(v, dtype).reshape(-1)[:dim]
        out = conditioner_forward(p, spec, jnp.asarray(arr))
        if any(missing):
            unc = p["uncond_vector"][None, None, :]
            out = jnp.where(jnp.asarray(missing)[:, None, None], unc, out)
        return out

    def prefix(uncond: bool) -> jnp.ndarray:
        conds = [rows(s, uncond) for s in specs]
        conds = [jnp.broadcast_to(c, (B, *c.shape[1:])) if c.shape[0] == 1 else c for c in conds]
        x = jnp.concatenate(conds, axis=-2)
        x = _project(pp["_project"], pc_cfg.projection, x)
        return layer_norm(x, pp["_norm"]["scale"], pp["_norm"]["bias"], eps)

    return jnp.concatenate([prefix(False), prefix(True)], axis=0)


# ---------------------------------------------------------------------------
# Scheduler
# ---------------------------------------------------------------------------


def _row_inputs(batch: list, Bp: int):
    """Per-request seeds and (optional) stacked audio-prefix codes [Bp,K,P],
    padded to the batch bucket by repeating the last row (padding rows are
    muted/dropped on the host).  Shared by the sync and streaming paths."""
    seeds = [int(r.seed) for r, _ in batch]
    seeds += [seeds[-1]] * (Bp - len(batch))
    apc = None
    if batch[0][0].audio_prefix_codes is not None:
        rows = [np.asarray(r.audio_prefix_codes, np.int32) for r, _ in batch]
        apc = np.stack(rows + [rows[-1]] * (Bp - len(batch)))
    return seeds, apc


@dataclasses.dataclass(frozen=True)
class BatchKey:
    """Requests sharing a key may run in one device batch — the scheduler
    additionally groups by each request's own padded conditioning length
    (``ContinuousBatcher._cond_bucket``), so co-batching never changes a
    request's prefix padding and its audio stays independent of its peers.

    Duration is NOT part of the key: per-sample frame caps are a traced
    input of the decode program (``Zonos.generate(step_limits=...)``), so a
    5-second and a 25-second request share a batch — the program is sized
    by a bucketed maximum and each sample is trimmed to its own cap.

    ``stream`` is ``None`` for whole-utterance requests; streaming requests
    carry their (chunk_frames, margin_frames) so co-batched streams share
    one emission cadence — streaming and non-streaming never mix (their
    device programs are driven differently).

    ``prefix_len`` is the audio-prefix length in frames: the decode program
    is compiled per prefix_audio_len and the batched prefix tensor has one
    length, so requests with different prefix lengths never share a batch
    (long-form carry uses one fixed ``carry_frames``, so its segments all
    land in the same bucket)."""

    sampling: SamplingParams
    cfg_scale: float
    stream: tuple | None = None
    prefix_len: int = 0


class ServerOverloaded(RuntimeError):
    """Admission rejected: the request queue is at capacity.  The server
    maps this to HTTP 503 with a Retry-After header — shedding load fast
    instead of stalling every client behind an unbounded queue."""

    def __init__(self, depth: int, limit: int, retry_after: float):
        super().__init__(
            f"server overloaded: {depth} requests in flight (limit {limit})"
        )
        self.retry_after = retry_after


@dataclasses.dataclass
class TTSRequest:
    cond_dict: dict  # make_cond_dict output (one text)
    sampling: SamplingParams = dataclasses.field(default_factory=SamplingParams)
    cfg_scale: float = 2.0
    seed: int = 423
    max_new_tokens: int = 86 * 30
    # Skip per-utterance post-processing (loudness / trim_silence /
    # fade_in_out) and return the raw decoded waveform.  Long-form segment
    # requests need this: a per-segment ~232 ms log fade-out and silence
    # trim would land at every seam, and per-segment loudness would step.
    raw_decode: bool = False
    # Per-request deadline, seconds from submit.  A request still queued at
    # its deadline is failed with TimeoutError instead of occupying a device
    # batch; a streaming request past it is cancelled mid-flight.  None =
    # no deadline.
    deadline_s: float | None = None
    # Audio-prefix codes [K, P] this request's generation continues from
    # (voice/prosody continuity — the model's audio-prefix mechanism, ref
    # model.py:288-292).  Requests sharing a prefix LENGTH co-batch; the
    # long-form carry path uses a fixed carry_frames so its segments bucket
    # together.  The prefix frames are not part of the output.
    audio_prefix_codes: np.ndarray | None = None
    # Return the generated DAC codes [K, T] instead of a vocoded waveform
    # (PendingResult.wait then yields int codes).  The long-form carry
    # orchestrator needs codes to thread the seam prefix and vocodes each
    # segment WITH its carried context attached (longform.py's discipline).
    codes_only: bool = False

    @property
    def key(self) -> BatchKey:
        p = 0 if self.audio_prefix_codes is None else int(self.audio_prefix_codes.shape[-1])
        return BatchKey(self.sampling, float(self.cfg_scale), prefix_len=p)


@dataclasses.dataclass
class StreamRequest(TTSRequest):
    """A request whose audio is delivered incrementally (``StreamHandle``)
    instead of as one waveform.  Co-submitted streams with the same key ride
    ONE batched decode program; independently-arriving stream groups
    interleave at chunk granularity (the batcher takes the device lock per
    decode chunk, not per stream)."""

    chunk_frames: int = 43  # ~0.5 s of audio per emitted chunk
    margin_frames: int = 32  # vocoder context on each side of a window

    @property
    def key(self) -> BatchKey:
        p = 0 if self.audio_prefix_codes is None else int(self.audio_prefix_codes.shape[-1])
        return BatchKey(self.sampling, float(self.cfg_scale),
                        (int(self.chunk_frames), int(self.margin_frames)),
                        prefix_len=p)


class StreamHandle:
    """Consumer side of one streaming request: an iterator of float32
    waveform chunks (44.1 kHz) plus a cancel signal.

    ``cancel()`` stops delivery immediately; the device batch the stream
    rides keeps decoding for its co-batched peers (a row cannot leave a
    compiled batch), but when EVERY stream in the group is cancelled the
    batcher closes the generator and frees the chip."""

    _DONE = object()

    def __init__(self):
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        self._cancelled = threading.Event()
        self._submitted = time.monotonic()
        self.first_chunk_s: float | None = None  # TTFA, set by the batcher
        self._deadline: float | None = None  # absolute monotonic, from submit
        self._on_done = None  # batcher inflight accounting (called once)

    def cancel(self):
        self._cancelled.set()

    def _set(self, wav=None, error=None):
        """Failure-reporting surface shared with PendingResult (used by the
        scheduler's per-request validation)."""
        if error is not None:
            self._put(error)
        self._put(self._DONE)

    @property
    def cancelled(self) -> bool:
        return self._cancelled.is_set()

    def _put(self, item):
        if item is self._DONE and self._on_done is not None:
            cb, self._on_done = self._on_done, None
            cb()
        self._q.put(item)

    def chunks(self, timeout: float | None = 600.0):
        """Yield waveform chunks until the stream ends.  Raises the
        producer's error, if any; raises ``TimeoutError`` when no chunk
        arrives in ``timeout`` seconds (chip wedged / server shutdown)."""
        while True:
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                raise TimeoutError("no stream chunk arrived in time") from None
            if item is self._DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


MAX_FRAMES = 86 * 30  # model hard cap (zonos/model.py:229)


def program_frames_bucket(n: int) -> int:
    """Snap a requested frame count to the program-size bucket: the decode
    program is compiled per max_new_tokens, so arbitrary durations must not
    each pay an XLA compile (512-frame steps, capped at the 30-s maximum)."""
    from zonos_tpu.config import find_multiple

    n = min(max(int(n), 1), MAX_FRAMES)
    return MAX_FRAMES if n > 2048 else find_multiple(n, 512)


def _startup_widths(chunk_frames: int, margin_frames: int, K: int) -> set[int]:
    """Replay stream_generate_batch's steady-emission arithmetic (no EOS)
    to enumerate the UNBUCKETED vocode widths of a stream's first chunks:
    while available frames < one 32-bucket past the window start, bucket_w0
    clamps the start to 0 and the width is the raw available length.
    Deterministic in (chunk_frames, margin_frames, num_codebooks):
    avail after n chunks = 1 + n*chunk_frames - K."""
    widths: set[int] = set()
    emitted = 0
    for n in range(1, 256):
        avail = 1 + n * chunk_frames - K
        if avail - margin_frames <= emitted:
            continue
        w0_raw = max(0, emitted - margin_frames)
        bucket = -(-(avail - w0_raw) // 32) * 32
        w0 = max(0, avail - bucket)
        width = avail - w0
        # no early break: a width can be a 32-multiple by coincidence while
        # the window start still clamps to 0, with unbucketed widths after
        # (e.g. chunk 20 / margin 16: 32 at n=2, then 52 at n=3)
        if width % 32:
            widths.add(width)
        emitted = avail - margin_frames
    return widths


class PendingResult:
    """Future for one submitted request."""

    def __init__(self):
        self._event = threading.Event()
        self._wav: np.ndarray | None = None
        self._error: BaseException | None = None
        self._deadline: float | None = None  # absolute monotonic
        self._on_done = None  # batcher inflight accounting (called once)

    def _set(self, wav=None, error=None):
        self._wav, self._error = wav, error
        if self._on_done is not None:
            cb, self._on_done = self._on_done, None
            cb()
        self._event.set()

    def wait(self, timeout: float | None = None) -> np.ndarray:
        """Block until done; returns the waveform ``[1, samples]`` float32
        at 44.1 kHz (loudness-normalized, trimmed, faded)."""
        if not self._event.wait(timeout):
            raise TimeoutError("synthesis did not complete in time")
        if self._error is not None:
            raise self._error
        return self._wav


class ContinuousBatcher:
    """Background scheduler merging requests into bucketed device batches."""

    def __init__(
        self,
        model,
        max_batch: int = 8,
        max_wait_ms: float = 30.0,
        cond_pad_multiple: int = 32,
        batch_buckets: tuple[int, ...] = (1, 2, 4, 8, 16, 32),
        device_lock: threading.Lock | None = None,
        max_queue: int = 64,
    ):
        self.model = model
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.cond_pad_multiple = cond_pad_multiple
        # admission bound: requests in flight (queued + generating) beyond
        # which submit()/submit_stream() raise ServerOverloaded (HTTP 503)
        # instead of stalling every later client behind an unbounded queue
        self.max_queue = max_queue
        self._inflight = 0
        # serializes device programs against other chip users (the server's
        # streaming endpoint shares its lock through this parameter)
        self.device_lock = device_lock or threading.Lock()
        self.batch_buckets = tuple(sorted(b for b in batch_buckets if b <= max_batch)) or (max_batch,)
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        self._stop = threading.Event()
        self._stats_lock = threading.Lock()
        self._latencies: list[float] = []  # submit -> result, seconds (ring)
        self.stats = {
            "requests": 0,
            "completed": 0,
            "failed": 0,
            "batches": 0,
            "max_batch_seen": 0,
            "audio_seconds": 0.0,
            "generate_seconds": 0.0,
            "streams": 0,
            "rejected": 0,  # admission-control 503s
            "expired": 0,  # deadline_s elapsed before device work started
        }
        self._ttfa: list[float] = []  # stream submit -> first chunk, s (ring)
        self._stream_threads: list[threading.Thread] = []
        self._thread = threading.Thread(target=self._run, name="tts-batcher", daemon=True)
        self._thread.start()

    # -- public api --------------------------------------------------------
    def warmup(
        self,
        cond_lens: tuple[int, ...] = (32, 64),
        # every value program_frames_bucket can produce — a bucket missing
        # here is a multi-second XLA compile on live traffic
        max_new_tokens: int | tuple[int, ...] = (512, 1024, 1536, 2048, 86 * 30),
        sampling: SamplingParams | None = None,
        use_cfg: bool = True,
        prefix_audio_lens: tuple[int, ...] = (0,),
    ) -> int:
        """Precompile the decode programs steady-state serving will hit:
        every batch bucket × padded cond_len × cache-growth bucket.
        ``prefix_audio_lens``: audio-prefix lengths to warm as well — the
        decode program is compiled per prefix length, so a deployment
        serving long-form carry traffic warms ``(0, carry_frames)``.

        Uses ``jit.lower(...).compile()`` on shape structs — no device
        execution, just compilation — so a server can warm in a background
        thread (or ahead of traffic) without occupying the chip.  Call once
        more with ``use_cfg=False`` if the deployment serves ``cfg_scale=1``
        traffic (the statically-halved CFG-free programs compile
        separately).  Combined
        with the persistent XLA compilation cache (server ``--compile_cache``)
        warmup after a restart is a disk read.  Returns #programs compiled."""
        import jax

        from zonos_tpu.config import find_multiple
        from zonos_tpu.models.tts import GenerateStatics

        sampling = sampling or SamplingParams()
        model = self.model
        K = model.config.num_codebooks
        d = model.config.backbone.d_model
        frame_buckets = (max_new_tokens,) if isinstance(max_new_tokens, int) else max_new_tokens
        count = 0
        for B in self.batch_buckets:
            for cond_len, frames, plen in [
                (c, f, p) for c in cond_lens for f in frame_buckets
                for p in prefix_audio_lens
            ]:
                statics = GenerateStatics(
                    batch_size=B, cond_len=cond_len, prefix_audio_len=plen,
                    max_new_tokens=frames, sampling=sampling, use_cfg=use_cfg,
                )
                total_seq = find_multiple(cond_len + plen + frames + K, 64)
                # MUST mirror Zonos.generate's default exactly, or serving
                # compiles the real programs at request time anyway
                from zonos_tpu.models.tts import default_cache_growth

                use_growth = default_cache_growth(
                    total_seq, B, model.config.backbone.is_transformer
                )
                first = (
                    find_multiple(min(total_seq, cond_len + plen + 1 + 256), 64)
                    if use_growth else None
                )
                init, loop = model._get_generate_parts(statics, first)
                rows = (2 if use_cfg else 1) * B
                prefix_s = jax.ShapeDtypeStruct((rows, cond_len, d), jnp.bfloat16)
                pcodes_s = jax.ShapeDtypeStruct((B, K, plen), jnp.int32)
                scale_s = jax.ShapeDtypeStruct((), jnp.float32)
                key_s = jax.ShapeDtypeStruct((B,), jax.random.key(0).dtype)  # per-row keys
                limit_s = jax.ShapeDtypeStruct((B,), jnp.int32)  # per-sample caps
                state_s = jax.eval_shape(
                    init, model.params, prefix_s, pcodes_s, scale_s, key_s, step_limit=limit_s
                )
                init.lower(
                    model.params, prefix_s, pcodes_s, scale_s, key_s, step_limit=limit_s
                ).compile()
                count += 1
                cache_len = first if use_growth else total_seq
                while True:
                    loop.lower(model.params, state_s, scale_s,
                               jax.ShapeDtypeStruct((), jnp.int32)).compile()
                    count += 1
                    if cache_len >= total_seq:
                        break
                    cache_len = min(total_seq, find_multiple(cache_len * 2, 64))
                    grown = jax.eval_shape(
                        lambda c: model._grow_cache(c, cache_len), state_s["cache"]
                    )
                    state_s = {**state_s, "cache": grown}
        return count

    def warmup_streaming(
        self,
        cond_lens: tuple[int, ...] = (32, 64),
        max_new_tokens: int | tuple[int, ...] = (512, 2048),
        chunk_frames: int = 43,
        margin_frames: int = 32,
        sampling: SamplingParams | None = None,
        use_cfg: bool = True,
    ) -> int:
        """Precompile what a live stream would otherwise compile mid-flight
        (measured as a 20+-second cadence stall on the first unwarmed
        stream, tools/ttfa_load_bench.py): the no-cache-growth decode
        programs streaming uses, and the DAC vocode windows — stream window
        starts are bucketed so widths land on 32-frame multiples
        (models/tts.py bucket_w0), giving a small finite shape set."""
        import jax

        from zonos_tpu.models.tts import GenerateStatics

        sampling = sampling or SamplingParams()
        model = self.model
        K = model.config.num_codebooks
        d = model.config.backbone.d_model
        frame_buckets = (max_new_tokens,) if isinstance(max_new_tokens, int) else max_new_tokens
        count = 0
        for B in self.batch_buckets:
            for cond_len in cond_lens:
                for frames in frame_buckets:
                    statics = GenerateStatics(
                        batch_size=B, cond_len=cond_len, prefix_audio_len=0,
                        max_new_tokens=frames, sampling=sampling, use_cfg=use_cfg,
                    )
                    init, loop = model._get_generate_parts(statics)  # no growth
                    rows = (2 if use_cfg else 1) * B
                    prefix_s = jax.ShapeDtypeStruct((rows, cond_len, d), jnp.bfloat16)
                    pcodes_s = jax.ShapeDtypeStruct((B, K, 0), jnp.int32)
                    scale_s = jax.ShapeDtypeStruct((), jnp.float32)
                    key_s = jax.ShapeDtypeStruct((B,), jax.random.key(0).dtype)  # per-row keys
                    limit_s = jax.ShapeDtypeStruct((B,), jnp.int32)
                    state_s = jax.eval_shape(init, model.params, prefix_s, pcodes_s,
                                             scale_s, key_s, step_limit=limit_s)
                    init.lower(model.params, prefix_s, pcodes_s, scale_s, key_s,
                               step_limit=limit_s).compile()
                    loop.lower(model.params, state_s, scale_s,
                               jax.ShapeDtypeStruct((), jnp.int32)).compile()
                    count += 2
            # vocode windows: every 32-frame width up to the steady window,
            # at the batched (B rows) and per-row-final (1 row) batch dims —
            # PLUS the deterministic unbucketed start-up widths: until
            # enough frames exist, bucket_w0's window start clamps to 0 and
            # the width is the full available length (35, 78, 121 at the
            # defaults), each of which would otherwise be a live compile
            steady = -(-(chunk_frames + 2 * margin_frames) // 32) * 32
            widths = set(range(32, steady + 32, 32))
            widths |= _startup_widths(chunk_frames, margin_frames, K)
            ae = model.autoencoder
            for width in sorted(widths):
                for rows in {B, 1}:
                    ae._decode_jit.lower(
                        ae.params,
                        jax.ShapeDtypeStruct((rows, K, width), jnp.int32),
                    ).compile()
                    count += 1
        return count

    def _admit(self, request, result) -> None:
        """Admission control: count the request in flight or raise
        ServerOverloaded (done state decrements via the result's _on_done,
        which fires exactly once on every completion path)."""
        with self._stats_lock:
            if self._inflight >= self.max_queue:
                self.stats["rejected"] += 1
                lat = sorted(self._latencies)
                retry = lat[len(lat) // 2] if lat else 1.0
                raise ServerOverloaded(self._inflight, self.max_queue,
                                       retry_after=max(1.0, retry))
            self._inflight += 1
            self.stats["requests"] += 1
        result._on_done = self._request_done
        if request.deadline_s is not None:
            result._deadline = result._submitted + float(request.deadline_s)

    def _request_done(self) -> None:
        with self._stats_lock:
            self._inflight -= 1

    def submit(self, request: TTSRequest) -> PendingResult:
        pending = PendingResult()
        pending._submitted = time.monotonic()
        self._admit(request, pending)
        self._q.put((request, pending))
        return pending

    def synthesize(self, request: TTSRequest, timeout: float | None = None) -> np.ndarray:
        return self.submit(request).wait(timeout)

    def submit_stream(self, request: StreamRequest) -> StreamHandle:
        """Submit a streaming request; returns immediately.  Iterate
        ``handle.chunks()`` for the audio.  Streams arriving inside one
        batch window share a device batch; separate stream groups (and
        non-streaming batches) interleave between decode chunks."""
        handle = StreamHandle()
        self._admit(request, handle)
        self._q.put((request, handle))
        return handle

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)
        for t in self._stream_threads:
            t.join(timeout=5)

    def snapshot(self) -> dict:
        with self._stats_lock:
            s = dict(self.stats)
            lat = sorted(self._latencies)
            ttfa = sorted(self._ttfa)
        s["queue_depth"] = self._q.qsize()
        with self._stats_lock:
            s["inflight"] = self._inflight
        s["max_queue"] = self.max_queue
        if lat:
            s["latency_p50_s"] = round(lat[len(lat) // 2], 3)
            s["latency_p95_s"] = round(lat[min(len(lat) - 1, int(len(lat) * 0.95))], 3)
        if ttfa:
            s["ttfa_p50_s"] = round(ttfa[len(ttfa) // 2], 3)
            s["ttfa_p95_s"] = round(ttfa[min(len(ttfa) - 1, int(len(ttfa) * 0.95))], 3)
        return s

    def _cond_bucket(self, request) -> int:
        """The request's OWN padded conditioning length (phoneme tokens
        rounded up to cond_pad_multiple).  Part of the grouping key: rows
        in one device batch share one padded length, so if requests with
        different buckets co-batched, a longer peer would change a
        request's prefix (left PAD rows are attended) and therefore its
        audio — grouping by bucket keeps every request's output
        batch-composition-independent (the per-row PRNG's contract).
        Cached on the request; phonemize is a pure host computation."""
        cached = getattr(request, "_cond_bucket", None)
        if cached is not None:
            return cached
        try:
            texts, langs = request.cond_dict["espeak"]
            ids, _ = tokenize_phonemes(phonemize(list(texts), list(langs)))
            m = self.cond_pad_multiple
            bucket = -(-ids.shape[1] // m) * m
        except Exception:  # malformed request: grouped; validation fails it
            bucket = -1
        request._cond_bucket = bucket
        return bucket

    # -- scheduler loop ------------------------------------------------------
    def _run(self):
        holdback: list = []  # key-mismatched items awaiting the next window
        while not self._stop.is_set():
            if holdback:
                first, first_pending = holdback.pop(0)
            else:
                try:
                    first, first_pending = self._q.get(timeout=0.1)
                except queue.Empty:
                    continue
            batch = [(first, first_pending)]
            key = first.key
            gkey = (key, self._cond_bucket(first))
            deadline = time.monotonic() + self.max_wait_ms / 1e3
            while len(batch) < self.max_batch:
                # drain compatible holdbacks first
                taken = [i for i, (r, _) in enumerate(holdback)
                         if (r.key, self._cond_bucket(r)) == gkey]
                for i in reversed(taken):
                    if len(batch) < self.max_batch:
                        batch.append(holdback.pop(i))
                remain = deadline - time.monotonic()
                if remain <= 0 or len(batch) >= self.max_batch:
                    break
                try:
                    item = self._q.get(timeout=remain)
                except queue.Empty:
                    break
                if (item[0].key, self._cond_bucket(item[0])) == gkey:
                    batch.append(item)
                else:
                    holdback.append(item)
            self._process(batch, key)

    def _bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if b >= n:
                return b
        return self.batch_buckets[-1]

    def _drop_expired(self, batch: list) -> list:
        """Fail queued items whose deadline already passed instead of
        spending a device batch on results nobody is waiting for."""
        now = time.monotonic()
        keep = []
        for item in batch:
            _, pending = item
            dl = pending._deadline
            if dl is not None and now > dl:
                pending._set(error=TimeoutError(
                    "deadline_s exceeded before generation started"))
                with self._stats_lock:
                    self.stats["expired"] += 1
                    self.stats["failed"] += 1
            else:
                keep.append(item)
        return keep

    def _validate(self, batch: list) -> list:
        # per-request validation first, so one malformed request (bad
        # emotion length, missing required key, multi-text cond) fails only
        # its own submitter instead of poisoning every co-batched request
        from zonos_tpu.conditioning import prepare_cond_inputs

        good = []
        for item in batch:
            r, pending = item
            try:
                texts, _ = r.cond_dict["espeak"]
                if len(texts) != 1:
                    raise ValueError("one text per request (batching is across requests)")
                prepare_cond_inputs(self.model.specs, r.cond_dict, self.cond_pad_multiple)
                good.append(item)
            except Exception as e:  # noqa: BLE001
                pending._set(error=e)
                with self._stats_lock:
                    self.stats["failed"] += 1
        return good

    def _process(self, batch: list, key: BatchKey):
        if key.stream is not None:
            # a stream group lives as long as its longest stream — running it
            # on the scheduler thread would queue every later request behind
            # it.  Each group gets a worker thread; the per-chunk device_lock
            # is the only serialization, so groups interleave on the chip.
            self._stream_threads = [t for t in self._stream_threads if t.is_alive()]
            t = threading.Thread(target=self._process_stream, args=(batch, key),
                                 name="tts-stream-group", daemon=True)
            self._stream_threads.append(t)
            t.start()
            return
        batch = self._validate(self._drop_expired(batch))
        if not batch:
            return
        try:
            B = len(batch)
            Bp = self._bucket(B)
            cond_dicts = [r.cond_dict for r, _ in batch]
            cond_dicts += [cond_dicts[-1]] * (Bp - B)  # pad rows, dropped below
            limits = [int(r.max_new_tokens) for r, _ in batch]
            limits += [1] * (Bp - B)  # padding rows stop immediately
            t0 = time.monotonic()
            with self.device_lock:  # whole device section: conditioner
                # forward + decode loop + vocoder (streaming must not
                # interleave)
                prefix = build_batch_prefix(self.model, cond_dicts, self.cond_pad_multiple)
                # per-request seeds: each row's stream is keyed by its own
                # request seed, so a request's audio is bit-identical solo
                # or co-batched (padding rows reuse the last seed; dropped)
                seeds, apc = _row_inputs(batch, Bp)
                codes = self.model.generate(
                    prefix,
                    audio_prefix_codes=apc,
                    batch_size=Bp,
                    max_new_tokens=program_frames_bucket(max(limits)),
                    cfg_scale=key.cfg_scale,
                    sampling_params=key.sampling,
                    seed=seeds,
                    progress_bar=False,
                    step_limits=limits,
                )
                # instant-EOS rows produce zero-length code sequences;
                # decode(0 frames) returns transposed-conv edge garbage, so
                # drop them here the same way codes_to_wavs does
                results = []
                for (r, _), c in zip(batch, codes[:B]):
                    if r.codes_only:
                        results.append(np.asarray(c))  # [K, T] int codes
                    elif r.raw_decode:
                        results.append(
                            np.asarray(self.model.autoencoder.decode(
                                np.asarray(c)[None, ...])[0])
                            if c.shape[-1] > 0 else np.zeros((1, 512), np.float32))
                    else:
                        wavs = self.model.autoencoder.codes_to_wavs([c])
                        results.append(wavs[0] if wavs
                                       else np.zeros((1, 512), np.float32))
            gen_s = time.monotonic() - t0
            audio_s = 0.0
            lat = []
            outs = []
            for (r, pending), out in zip(batch, results):
                audio_s += (out.shape[-1] / FRAME_RATE if r.codes_only
                            else out.shape[-1] / 44100.0)
                outs.append((pending, out))
                if hasattr(pending, "_submitted"):
                    lat.append(time.monotonic() - pending._submitted)
            # update stats BEFORE releasing results: a client that wakes on
            # its result and snapshots immediately must see this batch's
            # counters and latency percentiles
            with self._stats_lock:
                self.stats["completed"] += B
                self.stats["batches"] += 1
                self.stats["max_batch_seen"] = max(self.stats["max_batch_seen"], B)
                self.stats["audio_seconds"] += audio_s
                self.stats["generate_seconds"] += gen_s
                self._latencies = (self._latencies + lat)[-1024:]
            for pending, wav in outs:
                pending._set(wav=wav)
        except BaseException as e:  # noqa: BLE001 — report to all waiters
            for _, pending in batch:
                pending._set(error=e)
            with self._stats_lock:
                self.stats["failed"] += len(batch)

    def _process_stream(self, batch: list, key: BatchKey):
        """Run one group of streaming requests as ONE batched decode.

        The device lock is taken per decode CHUNK (inside the loop), never
        for the whole stream: a second stream group, or a non-streaming
        batch, runs its own device work between this group's chunks instead
        of waiting seconds for the stream to finish — the round-1/round-2
        whole-stream ``device_lock`` hold is gone.  The cadence cost is
        bounded by the co-tenant's own chunk size."""
        batch = self._validate(self._drop_expired(batch))
        if not batch:
            return
        handles: list[StreamHandle] = [h for _, h in batch]
        try:
            B = len(batch)
            Bp = self._bucket(B)
            cond_dicts = [r.cond_dict for r, _ in batch]
            cond_dicts += [cond_dicts[-1]] * (Bp - B)  # pad rows, muted below
            limits = [int(r.max_new_tokens) for r, _ in batch]
            limits += [1] * (Bp - B)  # padding rows stop immediately
            chunk_frames, margin_frames = key.stream
            t0 = time.monotonic()
            with self.device_lock:
                prefix = build_batch_prefix(self.model, cond_dicts, self.cond_pad_multiple)
            seeds, apc = _row_inputs(batch, Bp)
            gen = self.model.stream_generate_batch(
                prefix,
                audio_prefix_codes=apc,
                batch_size=Bp,
                max_new_tokens=program_frames_bucket(max(limits)),
                cfg_scale=key.cfg_scale,
                sampling_params=key.sampling,
                seed=seeds,  # per-request streams (batch-composition-free)
                step_limits=limits,
                chunk_frames=chunk_frames,
                margin_frames=margin_frames,
                active_rows=[True] * B + [False] * (Bp - B),
            )
            audio_s = 0.0
            expired: set[int] = set()
            try:
                while True:
                    now = time.monotonic()
                    for i, h in enumerate(handles):
                        # mid-flight deadline: unblock the client and stop
                        # delivering; the row cannot leave the compiled
                        # batch, but once EVERY row is cancelled/expired the
                        # group closes and frees the chip
                        if (i not in expired and h._deadline is not None
                                and now > h._deadline and not h.cancelled):
                            expired.add(i)
                            h.cancel()
                            h._put(TimeoutError("deadline_s exceeded mid-stream"))
                    if self._stop.is_set() or all(h.cancelled for h in handles):
                        break  # shutdown / nobody listening: free the chip
                    with self.device_lock:  # ONE decode chunk + vocode
                        events = next(gen, None)
                    if events is None:
                        break
                    now = time.monotonic()
                    for row, wav in events:
                        if row >= B or handles[row].cancelled:
                            continue  # padding row / abandoned stream
                        h = handles[row]
                        if h.first_chunk_s is None:
                            h.first_chunk_s = now - h._submitted
                        audio_s += wav.shape[-1] / 44100.0
                        h._put(np.asarray(wav, np.float32))
            finally:
                gen.close()
            gen_s = time.monotonic() - t0
            for h in handles:
                h._put(StreamHandle._DONE)
            ttfa = [h.first_chunk_s for h in handles if h.first_chunk_s is not None]
            with self._stats_lock:
                self.stats["completed"] += B - len(expired)
                self.stats["expired"] += len(expired)
                self.stats["failed"] += len(expired)
                self.stats["streams"] += B
                self.stats["batches"] += 1
                self.stats["max_batch_seen"] = max(self.stats["max_batch_seen"], B)
                self.stats["audio_seconds"] += audio_s
                self.stats["generate_seconds"] += gen_s
                self._ttfa = (self._ttfa + ttfa)[-1024:]
        except BaseException as e:  # noqa: BLE001 — report to all listeners
            for h in handles:
                h._put(e)
                h._put(StreamHandle._DONE)
            with self._stats_lock:
                self.stats["failed"] += len(handles)
