"""Batch-throughput scaling benchmark over a ("data", "model") mesh.

BASELINE.json north star: utterance batches data-parallel across hosts with
>=85% batch-throughput scaling efficiency at 2 hosts.  This harness measures
that number wherever devices exist:

  single host, N chips:   python tools/scaling_bench.py --data 4
  two hosts (run on each): python tools/scaling_bench.py --data 8 \
      --coordinator host0:1234 --num_processes 2 --process_id $RANK
  CPU functional check:    JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py --data 4 --tiny

Method: the same jitted sharded generate program runs with the per-device
batch held constant while the data axis grows (weak scaling — the serving
regime).  Efficiency(N) = throughput(N) / (N * throughput(1)).  Timing uses
the data-dependent decode chain (see docs/PERFORMANCE.md on why naive
timing lies on tunneled runtimes).  Prints one JSON line per mesh size.

Only the one-device row is meaningful on this repo's single-chip dev
environment; the multi-chip rows are the command the production fleet runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=int, default=None, help="max data-axis size (default: all devices)")
    ap.add_argument("--model", type=int, default=1, help="model (TP) axis size")
    ap.add_argument("--per_device_batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=258)
    ap.add_argument("--quant", default="int8", choices=["none", "int8", "int4"])
    ap.add_argument("--tiny", action="store_true", help="tiny config (CPU functional check)")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    args = ap.parse_args()

    from zonos_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(args.coordinator, args.num_processes, args.process_id)

    import jax

    # the axon sitecustomize pins JAX_PLATFORMS at startup; honor an explicit
    # cpu request (the virtual-device functional check) via jax.config
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp

    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import GenerateStatics, Zonos, build_generate_fn
    from zonos_tpu.ops.sampling import SamplingParams
    from zonos_tpu.parallel.mesh import make_mesh
    from zonos_tpu.parallel.sharding import shard_params

    import copy

    cfg_dict = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    if args.tiny:
        cfg_dict["backbone"].update(
            {"d_model": 128, "n_layer": 2, "attn_mlp_d_intermediate": 256,
             "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
        )
    cfg = ZonosConfig.from_dict(cfg_dict)

    devices = jax.devices()
    max_data = args.data or (len(devices) // args.model)
    sizes = []
    n = 1
    while n <= max_data:
        sizes.append(n)
        n *= 2
    if sizes[-1] != max_data:
        sizes.append(max_data)

    base_tp = None
    for n_data in sizes:
        n_dev = n_data * args.model
        if n_dev > len(devices):
            break
        mesh = make_mesh(n_data, args.model, devices[:n_dev])
        model = Zonos(cfg, seed=0)
        if args.quant == "int8":
            model.quantize_int8()
        elif args.quant == "int4":
            model.quantize_int4()
        params = shard_params(mesh, model.params)

        B = args.per_device_batch * n_data
        d = cfg.backbone.d_model
        cond_len = 64
        statics = GenerateStatics(
            batch_size=B, cond_len=cond_len, prefix_audio_len=0,
            max_new_tokens=args.steps, sampling=SamplingParams(),
        )
        gen = jax.jit(build_generate_fn(cfg, statics))
        from jax.sharding import NamedSharding, PartitionSpec as P

        prefix = jax.device_put(
            jax.random.normal(jax.random.key(0), (2 * B, cond_len, d), jnp.bfloat16),
            NamedSharding(mesh, P("data")),
        )
        pcodes = jnp.zeros((B, cfg.num_codebooks, 0), jnp.int32)

        def run(seed):
            delayed, offset = gen(params, prefix, pcodes, jnp.float32(2.0), jax.random.key(seed))
            jax.block_until_ready(delayed)
            return int(offset)

        run(0)  # compile + warm
        t0 = time.perf_counter()
        offset = run(1)
        dt = time.perf_counter() - t0
        frames = (offset - 1) * B
        tp = frames / 86.0 / dt  # audio-sec per wall-sec, whole mesh
        if base_tp is None:
            base_tp = tp / n_data  # per-data-shard unit
        eff = tp / (base_tp * n_data)
        print(json.dumps({
            "metric": "scaling", "data": n_data, "model": args.model,
            "global_batch": B, "audio_sec_per_sec": round(tp, 2),
            "efficiency": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
