"""Attribute the per-token decode latency of the flagship transformer.

IMPORTANT measurement rule for the tunneled (axon) chip: independent
repeated executions are NOT trustworthy (the runtime overlaps/dedups them —
a 20-call loop measured the 1.6 GB-weight backbone step at an impossible
0.53 ms).  Every timing below therefore chains N *data-dependent* steps
inside one jitted fori_loop and divides the wall time by N.

Findings on v5e (batch 1, int8, 2026-08-17):
  backbone chained step   ~3.7 ms   (int8 weight-read roofline ≈ 1.9 ms)
  bench.py full loop      ~3.2 ms/token
  => the backbone weight streaming IS the decode cost; sampling, EOS state,
     delay-buffer updates and while_loop carry add ~nothing.  Efficiency vs
     the HBM roofline is ~60% — the remaining gap is matvec (M=2) HBM
     utilization, not loop bookkeeping.

Usage: PYTHONPATH=. python tools/decode_breakdown.py [batch] [quant] [n]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def main():
    from zonos_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # shared persistent XLA cache (chip tools)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    quant = sys.argv[2] if len(sys.argv) > 2 else "int8"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.backbone import KVCache, transformer_decode_step
    from zonos_tpu.models.tts import Zonos, apply_heads, cfg_blend
    from zonos_tpu.ops.sampling import SamplingParams, sample_from_logits

    cfg = ZonosConfig.from_dict(TRANSFORMER_CONFIG_DICT)
    model = Zonos(cfg, seed=0)
    if quant == "int8":
        model.quantize_int8()
    elif quant == "int4":
        model.quantize_int4()
    params = jax.device_put(model.params)
    bb = cfg.backbone

    B2 = 2 * batch
    cache = KVCache.create(bb, B2, 384)
    K, Vp = cfg.num_codebooks, cfg.padded_vocab_size
    d = bb.d_model
    sampling = SamplingParams()

    def timed_chain(f, init, tag):
        """f: (i, carry) -> carry, data-dependent.  Returns ms/step."""

        @jax.jit
        def run(carry, n):
            return jax.lax.fori_loop(0, n, f, carry)

        jax.block_until_ready(run(init, jnp.int32(4)))
        t0 = time.perf_counter()
        out = run(jax.tree.map(lambda t: t * 1.001 if t.dtype.kind == "f" else t, init),
                  jnp.int32(n))
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{tag:22s}: {ms:8.3f} ms/step")
        return ms

    x0 = jax.random.normal(jax.random.key(0), (B2, 1, d), jnp.bfloat16)

    def bb_body(i, carry):
        x, c = carry
        h, c = transformer_decode_step(bb, params["backbone"], x, c, jnp.int32(10) + i)
        return (h * jnp.bfloat16(1e-2), c)

    t_bb = timed_chain(bb_body, (x0, cache), "backbone step")

    h0 = jax.random.normal(jax.random.key(1), (B2, d), jnp.bfloat16)

    def hd_body(i, h):
        logits = cfg_blend(apply_heads(params, cfg, h), jnp.float32(2.0))
        # feed a reduction of the logits back so steps stay dependent
        return h + (jnp.sum(logits, axis=(1, 2)) * 1e-9).astype(h.dtype)[:, None]

    t_hd = timed_chain(hd_body, h0, "heads+cfg")

    l0 = jax.random.normal(jax.random.key(2), (batch, K, Vp), jnp.float32)
    win0 = jnp.zeros((batch, K, 8), jnp.int32)

    def sm_body(i, carry):
        logits, win = carry
        tok = sample_from_logits(jax.random.fold_in(jax.random.key(3), i),
                                 logits, sampling, generated_tokens=win)
        win = jnp.concatenate([win[..., 1:], tok[..., None]], axis=-1)
        return (logits + tok[..., None].astype(jnp.float32) * 1e-9, win)

    t_sm = timed_chain(sm_body, (l0, win0), "sampling")

    print(f"{'sum':22s}: {t_bb + t_hd + t_sm:8.3f} ms/step")
    print("compare with bench.py full-loop ms/token (delay/EOS/carry included there)")


if __name__ == "__main__":
    main()
