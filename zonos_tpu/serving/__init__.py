"""Production serving: continuous batching + REST front-end.

Not present in the reference (SURVEY.md §1 — it has no serving layer); this
package is the scale-out serving story for the TPU framework: a scheduler
that merges concurrent requests into bucketed device batches so the jitted
generate program is reused, and a dependency-free HTTP API over it.
"""

from zonos_tpu.serving.batching import (
    BatchKey,
    ContinuousBatcher,
    PendingResult,
    StreamHandle,
    StreamRequest,
    TTSRequest,
    build_batch_prefix,
)
from zonos_tpu.serving.server import ServerState, serve, wav_bytes

__all__ = [
    "BatchKey",
    "ContinuousBatcher",
    "PendingResult",
    "StreamHandle",
    "StreamRequest",
    "TTSRequest",
    "build_batch_prefix",
    "ServerState",
    "serve",
    "wav_bytes",
]
