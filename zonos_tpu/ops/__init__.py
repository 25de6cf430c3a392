"""Device-side compute ops: pure-XLA reference paths and Pallas TPU kernels.

Every op has a pure-`jax.numpy` implementation (runs anywhere, used for CPU
tests and as the XLA-fusion baseline) and, where profitable, a Pallas TPU
kernel selected automatically on TPU backends.
"""

from zonos_tpu.ops.delay import apply_delay_pattern, revert_delay_pattern
from zonos_tpu.ops.sampling import SamplingParams, sample_from_logits

__all__ = [
    "apply_delay_pattern",
    "revert_delay_pattern",
    "SamplingParams",
    "sample_from_logits",
]
