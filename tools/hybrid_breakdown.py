"""Attribute the per-token decode latency of the flagship HYBRID backbone.

Same measurement rule as decode_breakdown.py: on the tunneled chip only
data-dependent chains inside ONE jitted fori_loop are trustworthy — the
carry feeds each step's input so nothing can be overlapped or deduped.

To keep XLA compiles tractable (44 unrolled layers x several variants broke
a 25-minute budget), each variant measures ONE mamba layer chained n times;
multiply by the layer count for the per-step figure.  Variants:

  state  — state load -> ssd_decode_step -> state store: the recurrent-state
           pipeline the SSM-state storage modes target
  proj   — in_proj/out_proj matmuls: the weight-streaming share
  mixer  — the full _mamba_mixer (projections + conv + SSD + gating)

Usage: python tools/hybrid_breakdown.py [part] [rows] [quant] [n]
       part in {state, proj, mixer}; env ZONOS_TPU_SSM_STATE picks the mode
(rows = CFG-doubled batch, i.e. 128 for a user batch of 64)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp




def main():
    from zonos_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    part = sys.argv[1] if len(sys.argv) > 1 else "state"
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    quant = sys.argv[3] if len(sys.argv) > 3 else "int8"
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    from zonos_tpu.config import HYBRID_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.hybrid import (
        _dims,
        _load_ssm,
        _mamba_mixer,
        _store_ssm,
        create_hybrid_cache,
        is_attn_layer,
        ssm_state_mode,
    )
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.ssm import ssd_decode_step

    cfg = ZonosConfig.from_dict(HYBRID_CONFIG_DICT)
    bb = cfg.backbone
    model = Zonos(cfg, seed=0)
    if quant == "int8":
        model.quantize_int8()
    params = model.params["backbone"]
    mode = ssm_state_mode(rows)
    li = next(i for i in range(bb.n_layer) if not is_attn_layer(bb, i))
    lp = params["layers_list"][li]
    n_mamba = sum(not is_attn_layer(bb, i) for i in range(bb.n_layer))
    d, d_inner, H, G, N, K, conv_dim = _dims(bb)
    P = bb.ssm_headdim

    cache = create_hybrid_cache(bb, rows, 64)
    st0 = cache[li]
    x0 = jax.random.normal(jax.random.key(0), (rows, 1, d), jnp.bfloat16)

    if part in ("state_update", "state_contract"):
        # split the state pipeline: update-only (h' = dA*h + dt*x⊗B, store)
        # vs contract-only (y = Σ_n h·C) — which half owns the
        # storage-independent floor?
        def chained(x, st):
            def body(i, carry):
                x, st = carry
                xs = jnp.broadcast_to(x[:, 0, :1, None], (rows, H, P)).astype(jnp.float32)
                dtv = jnp.broadcast_to(jnp.abs(x[:, 0, :1]), (rows, H)).astype(jnp.float32) * 1e-2 + 0.1
                Bm = jnp.broadcast_to(x[:, 0, :1, None], (rows, H, N)).astype(jnp.float32)
                h_in = _load_ssm(st)
                if part == "state_update":
                    dA = jnp.exp(dtv * -jnp.exp(lp["A_log"])[None, :])
                    h_new = h_in * dA[..., None, None] + jnp.einsum(
                        "bhp,bhn->bhpn", xs * dtv[..., None], Bm)
                    st = {"conv": st["conv"], **_store_ssm(h_new, st)}
                    y = h_new[..., 0]
                else:
                    from zonos_tpu.ops.ssm import _state_contract
                    # ZONOS_TPU_SSM_CONTRACT=vpu|mxu picks the formulation
                    y = _state_contract(h_in, Bm)
                x = (x + y.reshape(rows, 1, d_inner)[..., :d] * 1e-3).astype(jnp.bfloat16)
                return (x, st)
            return jax.lax.fori_loop(0, n, body, (x, st))
        args = (x0, st0)
    elif part == "state_bf16c":
        # EXPERIMENT: run the whole state pipeline in bf16 compute — halves
        # VMEM traffic between fused loops (TPU VPU ALUs are fp32 either
        # way); measures how much of the storage-independent floor is
        # bandwidth vs raw ALU
        def chained(x, st):
            def body(i, carry):
                x, st = carry
                xs = jnp.broadcast_to(x[:, 0, :1, None], (rows, H, P)).astype(jnp.bfloat16)
                dtv = jnp.broadcast_to(jnp.abs(x[:, 0, :1]), (rows, H)).astype(jnp.bfloat16) * 1e-2 + 0.1
                Bm = jnp.broadcast_to(x[:, 0, :1, None], (rows, G, N)).astype(jnp.bfloat16)
                h_in = st["ssm"].astype(jnp.bfloat16)
                dA = jnp.exp(dtv * -jnp.exp(lp["A_log"]).astype(jnp.bfloat16)[None, :])
                xdt = xs * dtv[..., None]
                y_state = jnp.einsum("bhpn,bhn->bhp", h_in, Bm,
                                     preferred_element_type=jnp.bfloat16)
                h_new = h_in * dA[..., None, None] + jnp.einsum(
                    "bhp,bhn->bhpn", xdt, Bm, preferred_element_type=jnp.bfloat16)
                st = {"conv": st["conv"], "ssm": h_new.astype(st["ssm"].dtype)}
                x = (x + y_state.reshape(rows, 1, d_inner)[..., :d] * 1e-3).astype(jnp.bfloat16)
                return (x, st)
            return jax.lax.fori_loop(0, n, body, (x, st))
        args = (x0, st0)
    elif part == "state_fused":
        # the r3 verdict's named escape hatch: ONE Pallas call fusing the
        # contraction + update over a single VMEM-resident read/write of
        # the raw stored state (ops/pallas_state.py).  Only no-scale modes
        # (fp32/bf16/f8) — int8/int4 carry scale arrays the kernel skips.
        from zonos_tpu.ops.pallas_state import fused_state_step

        def chained(x, st):
            def body(i, carry):
                x, st = carry
                xs = jnp.broadcast_to(x[:, 0, :1, None], (rows, H, P)).astype(jnp.float32)
                dtv = jnp.broadcast_to(jnp.abs(x[:, 0, :1]), (rows, H)).astype(jnp.float32) * 1e-2 + 0.1
                Bm = jnp.broadcast_to(x[:, 0, :1, None], (rows, H, N)).astype(jnp.float32)
                dA = jnp.exp(dtv * -jnp.exp(lp["A_log"])[None, :])
                BH = rows * H
                y2, ns = fused_state_step(
                    st["ssm"].reshape(BH, P, N), Bm.reshape(BH, N),
                    Bm.reshape(BH, N), dA.reshape(BH, 1),
                    (xs * dtv[..., None]).reshape(BH, P),
                )
                st = {"conv": st["conv"], "ssm": ns.reshape(rows, H, P, N)}
                y = y2.reshape(rows, H, P)
                x = (x + y.reshape(rows, 1, d_inner)[..., :d] * 1e-3).astype(jnp.bfloat16)
                return (x, st)
            return jax.lax.fori_loop(0, n, body, (x, st))
        args = (x0, st0)
    elif part == "state":
        def chained(x, st):
            def body(i, carry):
                x, st = carry
                xs = jnp.broadcast_to(x[:, 0, :1, None], (rows, H, P)).astype(jnp.float32)
                dtv = jnp.broadcast_to(jnp.abs(x[:, 0, :1]), (rows, H)).astype(jnp.float32) * 1e-2 + 0.1
                Bm = jnp.broadcast_to(x[:, 0, :1, None], (rows, G, N)).astype(jnp.float32)
                h_in = _load_ssm(st)
                y, h_new = ssd_decode_step(xs, dtv, -jnp.exp(lp["A_log"]), Bm, Bm,
                                           lp["D"], h_in)
                st = {"conv": st["conv"], **_store_ssm(h_new, st)}
                x = (x + y.reshape(rows, 1, d_inner)[..., :d] * 1e-3).astype(jnp.bfloat16)
                return (x, st)
            return jax.lax.fori_loop(0, n, body, (x, st))
        args = (x0, st0)
    elif part == "proj":
        def chained(x, st):
            def body(i, carry):
                x, st = carry
                from zonos_tpu.models.backbone import matmul_w
                z = matmul_w(x, lp["in_proj"])
                x = (x + matmul_w(z[..., :d_inner], lp["out_proj"]) * 1e-3).astype(jnp.bfloat16)
                return (x, st)
            return jax.lax.fori_loop(0, n, body, (x, st))
        args = (x0, st0)
    elif part == "mixer":
        def chained(x, st):
            def body(i, carry):
                x, st = carry
                y, st = _mamba_mixer(bb, lp, x, st, prefill=False)
                return ((x + y * 1e-3).astype(jnp.bfloat16), st)
            return jax.lax.fori_loop(0, n, body, (x, st))
        args = (x0, st0)
    else:
        raise SystemExit(f"unknown part {part!r}")

    fn = jax.jit(chained)
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    per_layer_ms = (time.perf_counter() - t0) / n * 1e3
    print(json.dumps({
        "part": part, "rows": rows, "ssm_state": mode,
        "ms_per_layer": round(per_layer_ms, 3),
        "ms_per_step_x44": round(per_layer_ms * n_mamba, 2),
    }))


if __name__ == "__main__":
    main()
