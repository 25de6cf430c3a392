"""Long-horizon quantized-state drift on the real chip (VERDICT r3 #4).

The f8-KV / f8-SSM serving defaults were justified by a 32-step feedback
drift; real generations run 860-2580 steps.  This tool runs FULL-LENGTH
greedy feedback decodes of the flagship hybrid (which exercises both the
attention KV cache and the Mamba2 SSM states) under each storage mode, in
lockstep with an fp32-state/bf16-KV reference, and reports:

- per-checkpoint mean relative error of the dequantized SSM states vs the
  reference run's states (feedback drift: each run feeds back its OWN
  sampled codes, so this is the real closed-loop error, not open-loop
  requantization noise), and
- the first step at which the greedy code sequences diverge (codes are
  append-only, so one final buffer comparison finds it exactly).

Each run is the same one-loop decode program streaming uses
(_get_generate_parts: no cache growth), stepped in chunks so state can be
compared on-device between chunks; only scalars are fetched per
checkpoint.

Usage: python tools/quant_drift.py [steps] [batch] [mode ...]
  steps  default 2580 (the 30-s hard cap); 860 = the 10-s bench length
  batch  user batch (CFG doubles rows), default 8
  modes  e.g. f8:f8 f8:bf16 (kv_mode:ssm_mode); default both
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def set_modes(kv: str, ssm: str) -> None:
    for var in ("ZONOS_TPU_KV_F8", "ZONOS_TPU_KV_INT8", "ZONOS_TPU_SSM_STATE"):
        os.environ.pop(var, None)
    if kv == "f8":
        os.environ["ZONOS_TPU_KV_F8"] = "1"
    elif kv == "int8":
        os.environ["ZONOS_TPU_KV_INT8"] = "1"
    os.environ["ZONOS_TPU_SSM_STATE"] = ssm


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2580
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    modes = [tuple(m.split(":")) for m in sys.argv[3:]] or [("f8", "f8"), ("f8", "bf16")]

    import jax
    import jax.numpy as jnp

    from zonos_tpu.config import HYBRID_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.hybrid import _load_ssm, is_attn_layer
    from zonos_tpu.models.tts import GenerateStatics, Zonos
    from zonos_tpu.ops.sampling import SamplingParams

    cfg = ZonosConfig.from_dict(HYBRID_CONFIG_DICT)
    model = Zonos(cfg, seed=0)
    model.quantize_int8()  # serving config — the regime the defaults target
    d = cfg.backbone.d_model
    cond_len = 32
    prefix = jax.device_put(
        jax.random.normal(jax.random.key(1), (2 * batch, cond_len, d), jnp.bfloat16)
    )
    statics = GenerateStatics(
        batch_size=batch, cond_len=cond_len, prefix_audio_len=0,
        max_new_tokens=steps, sampling=SamplingParams.greedy(), use_cfg=True,
    )
    pcodes = jnp.zeros((batch, cfg.num_codebooks, 0), jnp.int32)
    scale = jnp.float32(2.0)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        key = jax.random.key(7)

    mamba_layers = [i for i in range(cfg.backbone.n_layer)
                    if not is_attn_layer(cfg.backbone, i)]

    @jax.jit
    def ssm_drift(cache_test, cache_ref):
        """Mean relative error of dequantized SSM states, avg over layers."""
        errs = []
        for i in mamba_layers:
            t = _load_ssm(cache_test[i])
            r = _load_ssm(cache_ref[i])
            errs.append(jnp.mean(jnp.abs(t - r) / (jnp.abs(r) + 1e-6)))
        return jnp.mean(jnp.stack(errs))

    def start(kv: str, ssm: str):
        set_modes(kv, ssm)
        init, loop = model._get_generate_parts(statics)
        st = init(model.params, prefix, pcodes, scale, key)
        return st, loop

    chunk = 128
    ref_st, ref_loop = start("bf16", "fp32")
    runs = []
    for kv, ssm in modes:
        st, loop = start(kv, ssm)
        runs.append({"kv": kv, "ssm": ssm, "st": st, "loop": loop,
                     "curve": []})

    t0 = time.perf_counter()
    done = 0
    while done < steps:
        n = min(chunk, steps - done)
        ref_st = ref_loop(model.params, ref_st, scale, jnp.int32(n))
        for r in runs:
            r["st"] = r["loop"](model.params, r["st"], scale, jnp.int32(n))
            r["curve"].append(
                (done + n, round(float(ssm_drift(r["st"]["cache"],
                                                 ref_st["cache"])), 4))
            )
        done += n
    wall = time.perf_counter() - t0

    import numpy as np

    ref_codes = np.asarray(ref_st["delayed"])
    for r in runs:
        codes = np.asarray(r["st"]["delayed"])
        mism = np.nonzero((codes != ref_codes).any(axis=(0, 1)))[0]
        # delayed-buffer column index ~ decode step (no audio prefix here)
        div = int(mism.min()) if mism.size else None
        print(json.dumps({
            "kv": r["kv"], "ssm": r["ssm"], "steps": steps, "batch": batch,
            "greedy_divergence_step": div,
            "ssm_mean_rel_err": {str(s): e for s, e in r["curve"][::4] + r["curve"][-1:]},
            "wall_s": round(wall, 1),
        }))


if __name__ == "__main__":
    main()
