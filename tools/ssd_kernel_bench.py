"""Benchmark the Pallas SSD prefill kernel vs its XLA twin on the chip.

Measurement rule (docs/PERFORMANCE.md): data-dependent chain inside one
jitted loop — each iteration's x is fed from the previous y so nothing can
be deduplicated or overlapped.

History: the original per-head-loop kernel measured 126.7 ms vs 7.5 ms for
XLA at (B=2, L=1024, H=32, P=64, N=128).  The r4 head-batched rewrite
(ops/pallas_ssm.py) replaces the [64, 64]-tile per-head dots with
block-diagonal [T·Q, T·Q] dots.

Usage: python tools/ssd_kernel_bench.py [which] [B] [L] [H]
  which in {pallas, xla}; defaults pallas 2 1024 32
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp




def main() -> None:
    from zonos_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    H = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    T = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    P, N, iters = 64, 128, 8

    from zonos_tpu.ops.pallas_ssm import ssd_chunked_pallas
    from zonos_tpu.ops.ssm import ssd_chunked

    key = jax.random.key(0)
    ks = jax.random.split(key, 5)
    x0 = jax.random.normal(ks[0], (B, L, H, P), jnp.float32) * 0.1
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, L, H), jnp.float32))
    A = -jnp.exp(jax.random.normal(ks[2], (H,), jnp.float32) * 0.3)
    Bm = jax.random.normal(ks[3], (B, L, 1, N), jnp.float32) * 0.3
    Cm = jax.random.normal(ks[4], (B, L, 1, N), jnp.float32) * 0.3
    D = jnp.ones((H,), jnp.float32)

    if which == "pallas":
        import functools as ft

        fn = ft.partial(ssd_chunked_pallas, head_tile=T)
    else:
        fn = ssd_chunked

    @jax.jit
    def chained(x):
        def body(i, x):
            y, _ = fn(x, dt, A, Bm, Cm, D)
            # O(1)-magnitude carry: tanh keeps the chain from overflowing
            return jnp.tanh(y) * 0.1
        return jax.lax.fori_loop(0, iters, body, x)

    jax.block_until_ready(chained(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x0))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"which": which, "B": B, "L": L, "H": H,
                      "head_tile": T if which == "pallas" else None,
                      "ms_per_call": round(ms, 2)}))


if __name__ == "__main__":
    main()
