"""Probe achievable HBM bandwidth for the decode-step matvec on this chip.

The flagship int8 decode step is bound by streaming ~1.6 GB of int8 weights
through skinny matmuls (M = 2*batch).  bench.py measures ~60% of the 819 GB/s
roofline; this probe times ISOLATED weight-streaming formulations with the
same chained-loop methodology (data-dependent steps inside one jitted
fori_loop — see docs/PERFORMANCE.md "Measurement methodology"):

  a) bf16 weights, plain dot                      (2 bytes/weight)
  b) int8 weights, convert fused into dot         (1 byte/weight)  <- serving
  c) int8 weights, W8A8 int8 dot, int32 accum     (1 byte/weight)
  d) int8 weights, [out, in] layout, dot on x@W.T (1 byte/weight)

MEASURED on v5e (M=2, 48-step chains, best of 3):
  b) cast-into-dot   2.84 ms/step  556 GB/s   <- current serving path, best
  c) W8A8 int8 dot   2.90 ms/step  545 GB/s
  d) [out,in] layout 3.08 ms/step  514 GB/s
Conclusion: every formulation converges at ~68% of the HBM roofline; the
matvec formulation is NOT the lever — ~556 GB/s is the achievable sustained
weight-stream rate for XLA matmuls on this runtime.  (The remaining gap to
roofline would need a hand-pipelined kernel, and Pallas grid steps cost
17–107 us here — see docs/PERFORMANCE.md "What we tried".)

CAUTION — carry magnitude: the chain mix MUST keep the carry O(1).  An
earlier version let the carry grow ~2000x per layer; 26 layers overflowed
bf16 to inf, the mix went NaN, and every timing after the first call read
~90 TB/s (physically impossible).  Always check `isfinite` on the output and
that total time scales with the step count before believing a number.

Usage: PYTHONPATH=. python tools/matvec_probe.py [M] [n_steps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

# one transformer layer's worth of weights, flagship dims (d=2048, I=8192):
# wqkv [2048, 3072], wo [2048, 2048], w1 [2048, 16384], w2 [8192, 2048]
SHAPES = [(2048, 3072), (2048, 2048), (2048, 16384), (8192, 2048)]
N_LAYERS = 26
INV = [jnp.bfloat16(1.0 / (40.0 * (din ** 0.5))) for din, _ in SHAPES]


def _norm_mix(y0, y1, y3):
    """Data-dependent mix of the four matmul outputs, renormalized to unit
    RMS so the carry stays O(1) across layers and loop steps (see CAUTION)."""
    mix = y0[:, :2048] + y1[:, :2048] + y3[:, :2048]
    ms = jnp.mean(jnp.square(mix.astype(jnp.float32)), axis=-1, keepdims=True)
    return (mix.astype(jnp.float32) * jax.lax.rsqrt(ms + 1e-6)).astype(jnp.bfloat16)


def _mk_run(f, slice_in=8192):
    @jax.jit
    def run(carry, steps, ws):
        def step(i, x):
            def body(c, layer):
                w_qkv, w_o, w_1, w_2 = layer
                y0 = f(c, w_qkv) * INV[0]
                y1 = f(c, w_o) * INV[1]
                y2 = f(c, w_1) * INV[2]
                y3 = f(y2[:, :slice_in].astype(jnp.bfloat16), w_2) * INV[3]
                return _norm_mix(y0, y1, y3), None

            c, _ = jax.lax.scan(body, x, tuple(ws))
            return c

        return jax.lax.fori_loop(0, steps, step, carry)

    return run


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    key = jax.random.key(0)
    Ws8, Ws16, WsT8 = [], [], []
    for i, (din, dout) in enumerate(SHAPES):
        k = jax.random.fold_in(key, i)
        w = jax.random.normal(k, (N_LAYERS, din, dout), jnp.float32)
        Ws16.append((w / jnp.sqrt(din)).astype(jnp.bfloat16))
        Ws8.append(jnp.clip(jnp.round(w * 40), -127, 127).astype(jnp.int8))
        WsT8.append(jnp.swapaxes(Ws8[-1], 1, 2).copy())
    bytes_bf16 = sum(N_LAYERS * a * b * 2 for a, b in SHAPES)
    bytes_int8 = bytes_bf16 // 2
    print(f"M={M}  weights: {bytes_bf16/2**30:.2f} GiB bf16, {bytes_int8/2**30:.2f} GiB int8")

    x0 = jax.random.normal(jax.random.fold_in(key, 99), (M, 2048), jnp.bfloat16)

    def timed(f, ws, tag, nbytes, slice_in=8192):
        run = _mk_run(f, slice_in)
        jax.block_until_ready(run(x0, jnp.int32(3), ws))
        best, out = float("inf"), None
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x0 * 1.0009, jnp.int32(n), ws)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / n)
        ok = bool(jnp.isfinite(out).all())
        gbs = nbytes / best / 1e9
        print(f"{tag:34s}: {best*1e3:7.3f} ms/step  {gbs:7.1f} GB/s  finite={ok}")
        if not ok:
            print(f"  !! {tag}: non-finite output — timings above are unreliable")

    # a) bf16 dot (weights pre-scaled by 1/sqrt(fan_in); INV re-scales are
    #    harmless constants — the stream bytes are what matters)
    timed(lambda x, w: x @ w, Ws16, "a) bf16 dot", bytes_bf16)
    # b) int8 convert-fused dot (current serving path)
    timed(lambda x, w: x @ w.astype(x.dtype), Ws8,
          "b) int8 cast-into-dot (serving)", bytes_int8)

    # c) W8A8: quantize activation per-row, int8 dot, int32 accum
    def f_w8a8(x, w):
        s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-6)
        q = jnp.clip(jnp.round(x / s * 127.0), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(q, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (s.astype(jnp.float32) / 127.0)).astype(jnp.bfloat16)

    timed(f_w8a8, Ws8, "c) W8A8 int8 dot", bytes_int8)

    # d) transposed [out, in] layout
    def f_t(x, w):
        return jax.lax.dot_general(x, w.astype(x.dtype), (((1,), (1,)), ((), ())))

    timed(f_t, WsT8, "d) int8 [out,in] layout", bytes_int8)


if __name__ == "__main__":
    main()
