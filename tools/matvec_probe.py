"""Probe achievable HBM bandwidth for the decode-step matvec on this chip.

The flagship int8 decode step is bound by streaming ~1.6 GB of int8 weights
through skinny matmuls (M = 2*batch).  bench.py measures ~60% of the 819 GB/s
roofline; this probe times ISOLATED weight-streaming formulations with the
same chained-loop methodology (data-dependent steps inside one jitted
fori_loop — see docs/PERFORMANCE.md "Measurement methodology") to find which
matvec formulation XLA schedules best:

  a) bf16 weights, plain dot                      (2 bytes/weight)
  b) int8 weights, convert fused into dot         (1 byte/weight)  <- serving
  c) int8 weights, W8A8 int8 dot, int32 accum     (1 byte/weight)
  d) int8 weights, explicit mul+reduce (VPU)      (1 byte/weight)
  e) int8 weights, [out, in] layout, dot on x@W.T (1 byte/weight)

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


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    key = jax.random.key(0)
    Ws8 = []
    Ws16 = []
    WsT8 = []
    for i, (din, dout) in enumerate(SHAPES):
        k = jax.random.fold_in(key, i)
        w = jax.random.normal(k, (N_LAYERS, din, dout), jnp.float32)
        Ws16.append(w.astype(jnp.bfloat16))
        Ws8.append(jnp.clip(jnp.round(w * 40), -127, 127).astype(jnp.int8))
        WsT8.append(jnp.swapaxes(Ws8[-1], 1, 2))
    bytes_bf16 = sum(N_LAYERS * a * b * 2 for a, b in SHAPES)
    bytes_int8 = bytes_bf16 // 2
    print(f"M={M}  weights: {bytes_bf16/2**30:.2f} GiB bf16, {bytes_int8/2**30:.2f} GiB int8")

    def timed(mk, ws, init, tag, nbytes):
        @jax.jit
        def run(carry, steps, ws):
            step = mk(ws)
            return jax.lax.fori_loop(0, steps, step, carry)

        jax.block_until_ready(run(init, jnp.int32(3), ws))
        t0 = time.perf_counter()
        out = run(init * 1.0009, jnp.int32(n), ws)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        gbs = nbytes / (ms * 1e-3) / 1e9
        print(f"{tag:34s}: {ms:7.3f} ms/step  {gbs:7.1f} GB/s")
        return ms

    x0 = jax.random.normal(jax.random.fold_in(key, 99), (M, 2048), jnp.bfloat16)

    def chain(y, x):
        # mix the outputs back into a [M, 2048] carry, data-dependent
        return (x + jnp.tanh(y[:, :2048]) * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)

    # a) bf16 dot
    def f_bf16(x, w):
        return x @ w

    def mk_step(f, w2_first_dim_in):
        def mk(ws_list):
            def step(i, x):
                def body(c, layer):
                    w_qkv, w_o, w_1, w_2 = layer
                    y0 = f(c, w_qkv)
                    y1 = f(c, w_o)
                    y2 = f(c, w_1)
                    y3 = f(y2[:, :w2_first_dim_in].astype(jnp.bfloat16), w_2)
                    return chain(chain(chain(y0, c), y1), y3), None
                c, _ = jax.lax.scan(body, x, tuple(ws_list))
                return c
            return step
        return mk

    timed(mk_step(f_bf16, 8192), Ws16, x0, "a) bf16 dot", bytes_bf16)

    # b) int8 convert-fused dot (current serving path)
    def f_i8cast(x, w):
        return x @ w.astype(x.dtype)

    timed(mk_step(f_i8cast, 8192), Ws8, x0, "b) int8 cast-into-dot (serving)", bytes_int8)

    # c) W8A8: quantize activation per-row, int8 dot, int32 accum
    def f_w8a8(x, w):
        s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-6)
        q = jnp.clip(jnp.round(x / s * 127.0), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(q, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (s.astype(jnp.float32) / 127.0)).astype(jnp.bfloat16)

    timed(mk_step(f_w8a8, 8192), Ws8, x0, "c) W8A8 int8 dot", bytes_int8)

    # d) explicit broadcast-mul + reduce (VPU formulation)
    def f_reduce(x, w):
        return jnp.sum(x[:, :, None].astype(jnp.float32) * w[None].astype(jnp.float32), axis=1).astype(jnp.bfloat16)

    if M <= 2:
        timed(mk_step(f_reduce, 8192), Ws8, x0, "d) int8 mul+reduce (VPU)", bytes_int8)

    # e) transposed [out, in] layout
    def f_t(x, w):
        return jax.lax.dot_general(x, w.astype(x.dtype), (((1,), (1,)), ((), ())))

    timed(mk_step(f_t, 8192), WsT8, x0, "e) int8 [out,in] layout", bytes_int8)


if __name__ == "__main__":
    main()
