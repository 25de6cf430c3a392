"""Multi-chip scale-out: device meshes, sharding rules, the sharded training
step, and the multi-host launch helpers.

The reference has no distributed execution (SURVEY.md §2.4); this subsystem
is new design per BASELINE.json's north star: utterance batches data-parallel
over DCN, backbone weights tensor-sharded over ICI, collectives inserted by
XLA from `NamedSharding` annotations (GSPMD), not hand-written transport.
"""

from zonos_tpu.parallel.mesh import make_mesh
from zonos_tpu.parallel.sharding import (
    batch_sharding,
    kv_cache_sharding,
    param_shardings,
    replicated,
)

__all__ = [
    "make_mesh",
    "param_shardings",
    "kv_cache_sharding",
    "batch_sharding",
    "replicated",
]
