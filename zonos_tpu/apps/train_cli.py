"""Training driver CLI: dataset -> sharded train loop -> checkpoints.

The reference has no trainer (SURVEY.md §1); this wires the framework's
training stack end to end:

    data/ (manifest | LJSpeech | wav+txt dir; DAC-code disk cache;
           length-pooled bucketed batches; async prefetch)
 -> parallel/train.py (conditioned multi-codebook LM loss with CFG dropout,
           AdamW + warmup-cosine, grad clipping, optional remat)
 -> utils/train_state.py (orbax checkpoints, resume-from-latest)

Multi-chip: with more than one device the step is jitted over a
("data","model") mesh — batches ride `data`, weights are tensor-sharded per
parallel/sharding.py, and the loader's prefetch thread places batches under
their NamedSharding so H2D overlaps compute.

Examples
--------
    python -m zonos_tpu.apps.train_cli --ljspeech /data/LJSpeech-1.1 \
        --steps 10000 --batch 16 --ckpt_dir ckpts
    python -m zonos_tpu.apps.train_cli --manifest data.jsonl --model hybrid \
        --pretrained Zyphra/Zonos-v0.1-hybrid --lr 1e-5 --steps 2000
"""

from __future__ import annotations

import argparse
import copy
import logging
import time

import numpy as np

log = logging.getLogger("zonos.train")


def _build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Train / finetune a zonos-tpu model")
    src = ap.add_argument_group("data")
    src.add_argument("--manifest", help="JSONL manifest with {audio, text, ...} rows")
    src.add_argument("--ljspeech", help="LJSpeech-layout dataset root (metadata.csv + wavs/)")
    src.add_argument("--dir", help="directory of <name>.wav + <name>.txt pairs")
    src.add_argument("--language", default="en-us", help="language for --ljspeech/--dir sources")
    src.add_argument("--cache_dir", default=".codes_cache", help="DAC-code cache directory")
    src.add_argument("--speaker_embed", action="store_true",
                     help="condition on per-example speaker embeddings from the "
                          "speaker tower (cached); default trains speaker-unconditional")
    src.add_argument("--max_seconds", type=float, default=30.0,
                     help="drop clips longer than this (model cap is 30 s)")

    mdl = ap.add_argument_group("model")
    mdl.add_argument("--model", choices=["transformer", "hybrid"], default="transformer")
    mdl.add_argument("--pretrained", default=None,
                     help="HF repo id / local dir to finetune from (reference-format checkpoint)")
    mdl.add_argument("--tiny", action="store_true",
                     help="tiny debug config (fast CPU smoke runs)")
    mdl.add_argument("--param_dtype", choices=["float32", "bfloat16"], default="float32",
                     help="training parameter dtype (float32 recommended)")

    tr = ap.add_argument_group("optimization")
    tr.add_argument("--steps", type=int, default=1000)
    tr.add_argument("--batch", type=int, default=8)
    tr.add_argument("--lr", type=float, default=3e-4)
    tr.add_argument("--warmup", type=int, default=100)
    tr.add_argument("--weight_decay", type=float, default=0.01)
    tr.add_argument("--grad_clip", type=float, default=1.0)
    tr.add_argument("--lora_rank", type=int, default=0,
                    help="train rank-r LoRA adapters on the backbone "
                         "projections instead of full weights (voice/style "
                         "adaptation; ~0.1%% of params at r=8); --export "
                         "merges them into reference-format weights")
    tr.add_argument("--lora_alpha", type=float, default=16.0,
                    help="LoRA scale: merged W = base + (alpha/r)*A@B")
    tr.add_argument("--optimizer", choices=["adamw", "adafactor"], default="adamw",
                    help="adafactor's factored second moment (O(rows+cols) "
                         "per matrix vs AdamW's 2x O(params)) lets the 1.6B "
                         "flagship train on a single 16 GB chip")
    tr.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation micro-batches per step "
                         "(peak activation memory scales with batch/accum)")
    tr.add_argument("--uncond_p", type=float, default=0.1,
                    help="classifier-free-guidance dropout probability per conditioner")
    tr.add_argument("--remat", action="store_true",
                    help="rematerialize backbone layers in the backward pass")
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--phoneme_bucket", type=int, default=16)
    tr.add_argument("--code_bucket", type=int, default=64)
    tr.add_argument("--val_frac", type=float, default=0.0,
                    help="hold out this fraction of examples (deterministic "
                         "in --seed) and report their loss every --eval_every steps")
    tr.add_argument("--eval_every", type=int, default=100)

    rt = ap.add_argument_group("runtime")
    rt.add_argument("--ckpt_dir", default=None, help="orbax checkpoint directory")
    rt.add_argument("--export", default=None, metavar="DIR",
                    help="after training, write config.json + model.safetensors "
                         "in the reference's format (loads in the PyTorch "
                         "reference and via Zonos.from_pretrained)")
    rt.add_argument("--ckpt_every", type=int, default=500)
    rt.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    rt.add_argument("--log_every", type=int, default=10)
    rt.add_argument("--dp", type=int, default=0, help="data-parallel mesh size (0 = auto)")
    rt.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh size")
    rt.add_argument("--profile", default=None, help="capture a jax.profiler trace to this dir")
    rt.add_argument("--verbose", action="store_true")
    return ap


def _collect_examples(args):
    from zonos_tpu.data import read_manifest, scan_dir, scan_ljspeech

    if args.manifest:
        return read_manifest(args.manifest)
    if args.ljspeech:
        return scan_ljspeech(args.ljspeech, args.language)
    if args.dir:
        return scan_dir(args.dir, args.language)
    raise SystemExit("one of --manifest / --ljspeech / --dir is required")


def _build_model(args):
    from zonos_tpu.config import HYBRID_CONFIG_DICT, TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos

    if args.pretrained:
        return Zonos.from_pretrained(args.pretrained)
    base = TRANSFORMER_CONFIG_DICT if args.model == "transformer" else HYBRID_CONFIG_DICT
    d = copy.deepcopy(base)
    if args.tiny:
        if args.model == "transformer":
            d["backbone"].update(
                d_model=64, n_layer=2, attn_mlp_d_intermediate=128,
                attn_cfg={"num_heads": 4, "num_heads_kv": 2},
            )
        else:
            d["backbone"].update(
                d_model=64, n_layer=4, attn_layer_idx=[1, 3], attn_mlp_d_intermediate=128,
                ssm_cfg={"layer": "Mamba2", "d_state": 16, "expand": 2, "headdim": 16},
                attn_cfg={"num_heads": 4, "num_heads_kv": 2, "head_dim": 16,
                          "rotary_emb_dim": 8},
            )
    return Zonos(ZonosConfig.from_dict(d), seed=args.seed)


def main(argv: list[str] | None = None) -> None:
    args = _build_argparser().parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")

    import jax
    import jax.numpy as jnp

    from zonos_tpu.data import BatchSpec, CodesCache, PrefetchLoader, prepare_examples
    from zonos_tpu.data.dataset import FRAME_RATE, total_audio_seconds
    from zonos_tpu.parallel.train import make_conditioned_train_step, make_optimizer

    examples = _collect_examples(args)
    log.info("dataset: %d examples", len(examples))

    model = _build_model(args)
    cfg = model.config

    speaker_fn = None
    if args.speaker_embed:
        from zonos_tpu.speaker_db import SpeakerUtils

        su = SpeakerUtils(model=model)
        speaker_fn = su.get_speaker_embedding

    cache = CodesCache(model.autoencoder, args.cache_dir)
    t0 = time.time()
    prepared = prepare_examples(examples, cache, speaker_fn=speaker_fn, on_error="skip")
    if not prepared:
        raise SystemExit("no usable examples after preparation")
    log.info("prepared %d examples (%.1f s of audio; %d fresh encodes) in %.1fs",
             len(prepared), total_audio_seconds(prepared), cache.encode_calls,
             time.time() - t0)

    val = []
    if args.val_frac > 0:
        rng = np.random.default_rng(args.seed)
        order = rng.permutation(len(prepared))
        n_val = max(1, int(len(prepared) * args.val_frac))
        if n_val >= len(prepared):
            raise SystemExit(f"--val_frac {args.val_frac} leaves no training data")
        val = [prepared[i] for i in order[:n_val]]
        prepared = [prepared[i] for i in order[n_val:]]
        log.info("holding out %d examples for validation", n_val)

    dtype = jnp.float32 if args.param_dtype == "float32" else jnp.bfloat16
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype)
                          if jnp.issubdtype(x.dtype, jnp.floating) else x, model.params)

    lora = args.lora_rank > 0
    if lora and args.accum > 1:
        raise SystemExit("--lora_rank does not combine with --accum "
                         "(adapters are tiny; accumulation buys nothing)")
    optimizer = make_optimizer(lr=args.lr, weight_decay=args.weight_decay,
                               warmup_steps=args.warmup, total_steps=args.steps,
                               grad_clip=args.grad_clip, kind=args.optimizer)

    # --- mesh / shardings ------------------------------------------------
    device_put_fn = None
    opt_shardings = None
    n_dev = jax.device_count()
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from zonos_tpu.parallel import make_mesh
        from zonos_tpu.parallel.sharding import shard_params

        dp = args.dp or n_dev // args.tp
        if args.dp and args.batch % args.dp:
            raise SystemExit(f"--batch {args.batch} not divisible by --dp {args.dp}")
        while args.batch % dp:  # auto: largest dp that divides the batch
            dp -= 1
        mesh = make_mesh(dp, args.tp, jax.devices()[: dp * args.tp])
        log.info("mesh: %s over %d devices", dict(mesh.shape), n_dev)
        params = shard_params(mesh, params)

        def _put(x):
            spec = P("data", *([None] * (np.asarray(x).ndim - 1)))
            return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

        def device_put_fn(batch):
            return {
                "cond_inputs": {k: (None if v is None else _put(v))
                                for k, v in batch["cond_inputs"].items()},
                "codes": _put(batch["codes"]),
            }

    # --- trainable: full params or LoRA adapters over a frozen base -------
    if lora:
        from zonos_tpu.parallel.lora import (
            count_lora_params,
            init_lora,
            make_lora_eval_fn,
            make_lora_train_step,
        )

        trainable = init_lora(jax.random.key(args.seed ^ 0x10A4),
                              params, rank=args.lora_rank)
        log.info("LoRA rank %d: %d adapter params", args.lora_rank,
                 count_lora_params(trainable))
        step_fn = make_lora_train_step(cfg, model.specs, optimizer,
                                       alpha=args.lora_alpha,
                                       uncond_p=args.uncond_p, remat=args.remat)
    else:
        trainable = params
        step_fn = make_conditioned_train_step(cfg, model.specs, optimizer,
                                              uncond_p=args.uncond_p,
                                              remat=args.remat,
                                              accum_steps=args.accum)

    if n_dev > 1:
        if lora:  # adapters are tiny: replicate them over the mesh
            trainable = jax.device_put(trainable, NamedSharding(mesh, P()))
        # Optimizer-state shardings: optax moment leaves mirror a trainable
        # leaf's shape/dtype -> reuse that leaf's sharding; everything else
        # (schedule counts, clip state) replicates over the mesh.  Without
        # explicit out_shardings, jit places value-independent init outputs
        # on device 0 alone, which then clashes with the sharded params
        # inside the train step.
        by_shape = {}
        for p in jax.tree.leaves(trainable):
            by_shape.setdefault((p.shape, p.dtype.name), p.sharding)
        rep = NamedSharding(mesh, P())
        opt_shardings = jax.tree.map(
            lambda a: by_shape.get((a.shape, a.dtype.name), rep),
            jax.eval_shape(optimizer.init, trainable))

    step_fn = jax.jit(step_fn, donate_argnums=(0, 1))
    if lora:
        # bind the frozen base as a jit ARGUMENT (a closure would bake the
        # full weights into the executable as constants — 2x HBM)
        _lora_step = step_fn
        step_fn = lambda t, o, ci, c, k: _lora_step(t, o, params, ci, c, k)  # noqa: E731
    opt_state = jax.jit(optimizer.init, out_shardings=opt_shardings)(trainable)

    # --- resume ----------------------------------------------------------
    start_step = 0
    if args.ckpt_dir and args.resume:
        from zonos_tpu.utils.train_state import restore_train_state

        restored = restore_train_state(args.ckpt_dir, trainable, opt_state)
        if restored is not None:
            start_step, trainable, opt_state = restored
            log.info("resumed from step %d", start_step)

    bs = BatchSpec(batch_size=args.batch, phoneme_bucket=args.phoneme_bucket,
                   code_bucket=args.code_bucket,
                   max_code_len=int(args.max_seconds * FRAME_RATE),
                   eos_token_id=cfg.eos_token_id)
    loader = PrefetchLoader(prepared, model.specs, cfg.masked_token_id, bs,
                            seed=args.seed, device_put_fn=device_put_fn,
                            start_step=start_step)

    eval_fn, val_batches = None, []
    if val:
        from zonos_tpu.data import iter_epoch_batches
        from zonos_tpu.parallel.train import make_conditioned_eval_fn

        val_batches = list(iter_epoch_batches(
            val, model.specs, cfg.masked_token_id, bs, seed=args.seed, epoch=0))
        if device_put_fn is not None:
            val_batches = [device_put_fn(b) for b in val_batches]
        if lora:
            _lora_eval = jax.jit(make_lora_eval_fn(cfg, model.specs,
                                                   alpha=args.lora_alpha,
                                                   remat=args.remat))
            eval_fn = lambda t, ci, c: _lora_eval(t, params, ci, c)  # noqa: E731
        else:
            eval_fn = jax.jit(make_conditioned_eval_fn(cfg, model.specs,
                                                       remat=args.remat))

    def run_eval(trainable, step):
        vl = float(np.mean([
            float(eval_fn(trainable, b["cond_inputs"], jnp.asarray(b["codes"])))
            for b in val_batches]))
        log.info("step %d  val_loss %.4f (%d batches)", step, vl, len(val_batches))
        return vl

    base_key = jax.random.key(args.seed ^ 0x7A0705)
    profile_cm = None
    if args.profile:
        profile_cm = jax.profiler.trace(args.profile)
        profile_cm.__enter__()

    frames_seen = 0
    t_log = time.time()
    last_loss = float("nan")
    last_ckpt = start_step
    try:
        for step, batch in loader:
            if step >= args.steps:
                break
            step_key = jax.random.fold_in(base_key, step)
            trainable, opt_state, loss = step_fn(
                trainable, opt_state, batch["cond_inputs"], batch["codes"], step_key)
            frames_seen += batch["codes"].shape[0] * batch["codes"].shape[-1]
            if (step + 1) % args.log_every == 0 or step + 1 == args.steps:
                last_loss = float(loss)  # sync point, amortized over log_every
                dt = time.time() - t_log
                log.info("step %d  loss %.4f  %.0f frames/s (%.1fx realtime audio)",
                         step + 1, last_loss, frames_seen / dt,
                         frames_seen / dt / FRAME_RATE)
                frames_seen, t_log = 0, time.time()
            if eval_fn is not None and ((step + 1) % args.eval_every == 0
                                        or step + 1 == args.steps):
                run_eval(trainable, step + 1)
            if args.ckpt_dir and (step + 1) % args.ckpt_every == 0:
                from zonos_tpu.utils.train_state import save_train_state

                save_train_state(args.ckpt_dir, step + 1, trainable, opt_state)
                last_ckpt = step + 1
                log.info("checkpoint @ step %d", step + 1)
    finally:
        loader.stop()
        if profile_cm is not None:
            profile_cm.__exit__(None, None, None)

    # start_step >= steps means a resumed run that did no work: writing the
    # restored (later-step) state labeled as args.steps would leave a
    # mislabeled, regressed-step checkpoint behind
    if args.ckpt_dir and last_ckpt != args.steps and start_step < args.steps:
        from zonos_tpu.utils.train_state import save_train_state

        save_train_state(args.ckpt_dir, args.steps, trainable, opt_state)
    if args.export:
        from zonos_tpu.utils.checkpoint import export_zonos_checkpoint

        # NOT `params`: in full training that name still aliases the initial
        # arrays, which donate_argnums freed on step 0 (CPU ignores donation,
        # masking it in tests; on TPU the export would read deleted buffers)
        out_params = trainable
        if lora:
            from zonos_tpu.parallel.lora import merge_lora

            out_params = merge_lora(params, trainable, alpha=args.lora_alpha)
        path = export_zonos_checkpoint(cfg, out_params, args.export)
        log.info("exported reference-format checkpoint: %s", path)
    log.info("done: %d steps, final loss %.4f", args.steps, last_loss)


if __name__ == "__main__":
    main()
