"""Storage-mode env knobs (KV cache / SSM state), one toggling helper.

The modes are read at TRACE time inside the jitted decode programs
(models/backbone.py KVCache, models/hybrid.py create_hybrid_cache), so a
program compiled under one setting keeps it until re-traced — callers that
toggle per run (bench.py suite rows, tools/quant_drift.py) must also clear
the model's generate-parts cache.
"""

from __future__ import annotations

import os

_VARS = ("ZONOS_TPU_KV_F8", "ZONOS_TPU_KV_INT8", "ZONOS_TPU_SSM_STATE")


def set_storage_env(kv: str | None = None, ssm: str | None = None) -> None:
    """Set the KV-cache mode (``f8``/``int8``/None=bf16) and SSM-state mode
    (``fp32``/``bf16``/``f8``/``int8``/``int4``/None=auto), clearing the
    other knobs first."""
    for var in _VARS:
        os.environ.pop(var, None)
    if kv == "f8":
        os.environ["ZONOS_TPU_KV_F8"] = "1"
    elif kv == "int8":
        os.environ["ZONOS_TPU_KV_INT8"] = "1"
    if ssm:
        os.environ["ZONOS_TPU_SSM_STATE"] = ssm
