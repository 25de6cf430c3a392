"""Training data pipeline (datasets, DAC-code cache, prefetching loader).

New-capability subsystem: the reference is inference-only (SURVEY.md §1) and
has no dataset/loader code; this feeds `zonos_tpu/parallel/train.py`.
"""

from zonos_tpu.data.dataset import (
    CodesCache,
    PreparedExample,
    TrainExample,
    prepare_examples,
    read_manifest,
    scan_dir,
    scan_ljspeech,
    total_audio_seconds,
)
from zonos_tpu.data.loader import (
    BatchSpec,
    PrefetchLoader,
    assemble_batch,
    iter_epoch_batches,
)

__all__ = [
    "BatchSpec",
    "CodesCache",
    "PrefetchLoader",
    "PreparedExample",
    "TrainExample",
    "assemble_batch",
    "iter_epoch_batches",
    "prepare_examples",
    "read_manifest",
    "scan_dir",
    "scan_ljspeech",
    "total_audio_seconds",
]
