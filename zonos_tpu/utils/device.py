"""Device selection (parity surface: zonos/utils.py:42-151).

The reference picks the best CUDA GPU by free memory / estimated speed with
a compute-capability floor and exposes a lazy ``DEFAULT_DEVICE`` plus
``set_device``.  Under JAX the runtime owns placement, so the equivalent is
platform selection + an explicit best-device picker:

- ``set_device("cpu" | "tpu" | "gpu")`` — force the platform before any
  computation (the JAX analog of calling set_device before model import).
- ``default_device()`` — best available accelerator, preferring TPU.
- ``device_summary()`` — human-readable inventory with memory stats where
  the backend reports them (the reference prints a similar table).
"""

from __future__ import annotations

import logging

logger = logging.getLogger("zonos_tpu.device")

_PREFERENCE = ("tpu", "axon", "gpu", "cuda", "cpu")


def on_tpu() -> bool:
    """Whether the default JAX backend is a TPU ("axon" is the tunneled
    single-chip platform in the dev environment).  The single source of
    truth for kernel-dispatch decisions (backbone int4 matmul, Pallas
    attention paths)."""
    import jax

    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def set_device(platform: str) -> None:
    """Force the JAX platform (call before any jitted computation)."""
    import jax

    jax.config.update("jax_platforms", platform)
    logger.info("platform forced to %s", platform)


def default_device():
    """Best available device, preferring TPU > GPU > CPU."""
    import jax

    for p in _PREFERENCE:
        try:
            devs = jax.devices(p)
        except RuntimeError:
            continue
        if devs:
            return devs[0]
    return jax.devices()[0]


def device_summary() -> str:
    """One line per device: platform, id, and memory stats if reported."""
    import jax

    lines = []
    for d in jax.devices():
        mem = ""
        try:
            stats = d.memory_stats()
            if stats:
                lim = stats.get("bytes_limit")
                used = stats.get("bytes_in_use")
                if lim:
                    mem = f"  {used / 1e9:.1f}/{lim / 1e9:.1f} GB"
        except Exception:
            pass
        lines.append(f"{d.platform}:{d.id} {getattr(d, 'device_kind', '')}{mem}")
    return "\n".join(lines)
