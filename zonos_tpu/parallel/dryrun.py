"""Multi-chip dry run: compile + execute one sharded training step and one
sharded decode step on an n-device mesh (virtual CPU devices in CI).

Exercises the real sharding rules: data-parallel batch, tensor-parallel
attention/MLP/vocab (2-way when the device count allows), sharded KV cache.
Sequence/pipeline/expert parallelism are explicit non-goals for this model
family (SURVEY.md §2.4: max sequence ~2.7k tokens, no MoE, fits one chip).
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from zonos_tpu.config import HYBRID_CONFIG_DICT, TRANSFORMER_CONFIG_DICT, ZonosConfig
from zonos_tpu.parallel.mesh import make_mesh
from zonos_tpu.parallel.sharding import param_shardings, shard_params
from zonos_tpu.parallel.train import make_optimizer, make_train_step


def _tiny_cfg() -> ZonosConfig:
    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 128, "n_layer": 2, "attn_mlp_d_intermediate": 256,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    return ZonosConfig.from_dict(d)


def run_dryrun(n_devices: int) -> None:
    # The dry run builds every model with random weights by design; force the
    # hub probe offline for its scope so air-gapped/CI hosts fail fast to
    # random init instead of paying ~25 s of network retry backoff per
    # checkpoint probe (utils/hub.py) — even inside the shipped container,
    # which exports ZONOS_TPU_OFFLINE=0.  Restored on exit so a host process
    # that runs a dryrun preflight keeps its own hub behavior (ADVICE r4).
    import os

    prev_offline = os.environ.get("ZONOS_TPU_OFFLINE")
    os.environ["ZONOS_TPU_OFFLINE"] = "1"
    try:
        _run_dryrun_body(n_devices)
    finally:
        if prev_offline is None:
            os.environ.pop("ZONOS_TPU_OFFLINE", None)
        else:
            os.environ["ZONOS_TPU_OFFLINE"] = prev_offline


def _run_dryrun_body(n_devices: int) -> None:
    devices = jax.devices()[:n_devices]
    n_model = 2 if n_devices % 2 == 0 else 1
    mesh = make_mesh(n_devices // n_model, n_model, devices)

    cfg = _tiny_cfg()
    from zonos_tpu.models.tts import Zonos

    model = Zonos(cfg, seed=0)
    params = shard_params(mesh, model.params)

    B = mesh.shape["data"] * 2  # 2 samples per data shard
    Lc, T = 8, 12
    key = jax.random.key(0)
    cond = jax.device_put(
        jax.random.normal(key, (B, Lc, cfg.backbone.d_model), jnp.bfloat16),
        NamedSharding(mesh, P("data", None, None)),
    )
    codes = jax.device_put(
        jnp.asarray(np.random.default_rng(0).integers(0, 1024, (B, 9, T)), jnp.int32),
        NamedSharding(mesh, P("data", None, None)),
    )

    optimizer = make_optimizer()
    opt_state = jax.tree.map(
        lambda x: x, optimizer.init(params)
    )  # inherits param shardings lazily

    step = jax.jit(
        make_train_step(cfg, optimizer),
        in_shardings=(
            param_shardings(mesh, model.params),
            None,
            NamedSharding(mesh, P("data", None, None)),
            NamedSharding(mesh, P("data", None, None)),
        ),
    )
    params2, opt_state, loss = step(params, opt_state, cond, codes)
    loss_val = float(loss)
    assert np.isfinite(loss_val), f"non-finite training loss {loss_val}"

    # one sharded generate step (inference path under the same mesh)
    from zonos_tpu.models.tts import GenerateStatics, build_generate_fn
    from zonos_tpu.ops.sampling import SamplingParams

    statics = GenerateStatics(
        batch_size=B, cond_len=Lc, prefix_audio_len=0, max_new_tokens=4,
        sampling=SamplingParams.greedy(),
    )
    gen = jax.jit(build_generate_fn(cfg, statics))
    prefix = jnp.concatenate([cond, cond], axis=0)
    delayed, offset = gen(
        params2, prefix, jnp.zeros((B, 9, 0), jnp.int32), jnp.float32(2.0), jax.random.key(1)
    )
    assert int(offset) > 0 and np.asarray(delayed).shape[0] == B
    print(f"dryrun ok: {n_devices} devices, mesh {dict(mesh.shape)}, loss {loss_val:.3f}")

    # sharded STREAMING decode on the same mesh: the host-driven chunk loop
    # (init/loop programs + windowed vocode) must compile and execute with
    # the batch sharded along `data` — the serving streaming path, not just
    # the one-shot generate program
    model.params = params2
    model._generate_cache.clear()
    events = []
    for ev in model.stream_generate_batch(
        jnp.concatenate([cond, cond], axis=0), max_new_tokens=12,
        chunk_frames=6, margin_frames=16, batch_size=B,
        sampling_params=SamplingParams.greedy(),
    ):
        events.extend(ev)
    assert events and all(np.isfinite(w).all() for _, w in events)
    print(f"dryrun streaming ok: {len(events)} chunk events, batch {B} on data axis")

    # HYBRID backbone (Mamba2 + interleaved attention) sharded generate:
    # TP attention/MLP along `model`, mamba params replicated, batch along
    # `data` (parallel/sharding.py hybrid specs)
    dh = copy.deepcopy(HYBRID_CONFIG_DICT)
    dh["backbone"].update(
        {
            "d_model": 64,
            "n_layer": 4,
            "attn_layer_idx": [1, 3],
            "attn_mlp_d_intermediate": 128,
            "ssm_cfg": {"layer": "Mamba2", "d_state": 16, "expand": 2, "headdim": 16},
            "attn_cfg": {"num_heads": 4, "num_heads_kv": 2, "head_dim": 16,
                         "rotary_emb_dim": 8},
        }
    )
    hyb = Zonos(ZonosConfig.from_dict(dh), seed=0).shard(mesh)
    hcond = jax.device_put(
        jax.random.normal(jax.random.key(2), (2 * B, 6, 64), jnp.bfloat16),
        NamedSharding(mesh, P("data", None, None)),
    )
    out = hyb.generate(hcond, batch_size=B, max_new_tokens=6, seed=0,
                       sampling_params=SamplingParams.greedy(), progress_bar=False)
    assert len(out) == B and all(o.shape[0] == 9 for o in out)
    print(f"dryrun hybrid ok: sharded Mamba2+attention generate, batch {B}, "
          f"mesh {dict(mesh.shape)}")

    # CONTINUOUS BATCHER over the sharded model: the serving layer's
    # scheduler merges real requests (text frontend -> batched prefix
    # conditioning -> bucketed generate) against tensor/data-sharded params
    # — the layout-agnostic claim of docs/SERVING.md, driven, not asserted
    from zonos_tpu.conditioning import make_cond_dict
    from zonos_tpu.serving import ContinuousBatcher, TTSRequest

    batcher = ContinuousBatcher(model, max_batch=4, max_wait_ms=500.0,
                                cond_pad_multiple=16, batch_buckets=(2, 4))
    try:
        spk = np.zeros((1, 1, 128), np.float32)
        pendings = [
            batcher.submit(TTSRequest(
                cond_dict=make_cond_dict(text=f"sharded serving {i}", speaker=spk),
                sampling=SamplingParams.greedy(), seed=i, max_new_tokens=10))
            for i in range(2)
        ]
        wavs = [p.wait(timeout=900) for p in pendings]
        assert all(w.shape[-1] > 0 and np.isfinite(w).all() for w in wavs)
        snap = batcher.snapshot()
        assert snap["completed"] == 2 and snap["failed"] == 0
    finally:
        batcher.close()
    print(f"dryrun batcher ok: {len(wavs)} sharded serving requests, "
          f"max_batch_seen {snap['max_batch_seen']}")
