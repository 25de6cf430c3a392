"""Device mesh construction.

Axis convention (scaling-book style):
- ``"data"``  — utterance-batch data parallelism; maps to DCN across hosts
  (each host feeds its local batch shard) and/or ICI within a slice.
- ``"model"`` — tensor parallelism for backbone weights; must stay inside a
  slice so the per-layer collectives (psum of row-parallel matmuls) ride ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    With multi-host JAX (after ``jax.distributed.initialize``), devices are
    globally visible and the data axis naturally spans hosts while the model
    axis should divide the per-host (per-slice) device count.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, f"{n_data}x{n_model} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op on a single host).  Thin wrapper so apps
    can call one function regardless of deployment shape."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
