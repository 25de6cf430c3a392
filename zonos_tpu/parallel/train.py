"""Sharded training step (teacher-forced multi-codebook LM loss).

The reference ships inference only (SURVEY.md §1); this trainer makes the
framework production-complete: delay-patterned 9-codebook cross-entropy with
mask-token positions excluded, AdamW via optax, and a jitted step whose
parameters carry tensor-parallel shardings and whose batch carries data-
parallel shardings — XLA emits the DP gradient psums and TP activation
collectives from the annotations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from zonos_tpu.conditioning import prefix_conditioner_forward
from zonos_tpu.config import ZonosConfig
from zonos_tpu.models.backbone import transformer_forward
from zonos_tpu.models.tts import embed_codes
from zonos_tpu.ops.delay import apply_delay_pattern


def _backbone_forward(cfg: ZonosConfig, params: dict, x: jnp.ndarray, remat: bool) -> jnp.ndarray:
    if cfg.backbone.is_transformer:
        return transformer_forward(cfg.backbone, params["backbone"], x, remat=remat)
    from zonos_tpu.models.hybrid import create_hybrid_cache, hybrid_prefill

    cache = create_hybrid_cache(cfg.backbone, x.shape[0], x.shape[1], x.dtype)
    hidden, _ = hybrid_prefill(cfg.backbone, params["backbone"], x, cache)
    return hidden


def multicodebook_loss(
    cfg: ZonosConfig, params: dict, cond: jnp.ndarray, codes: jnp.ndarray, remat: bool = False
):
    """cond [B, Lc, d]; codes [B, K, T] raw (no delay). Returns scalar loss.

    Applies the delay pattern, teacher-forces positions, and ignores
    mask-token targets (structural padding of the staircase).  Works for
    both backbones; ``remat`` rematerializes transformer layers backward.
    """
    K, Vp = cfg.num_codebooks, cfg.padded_vocab_size
    mask_id = cfg.masked_token_id
    delayed = apply_delay_pattern(codes, mask_id)  # [B, K, T+K]
    T = delayed.shape[-1]
    inputs = delayed[..., : T - 1]
    targets = delayed[..., 1:]  # predict next delayed frame

    x = jnp.concatenate([cond, embed_codes(params, inputs).astype(cond.dtype)], axis=1)
    hidden = _backbone_forward(cfg, params, x, remat)
    Lc = cond.shape[1]
    # hidden[:, Lc + j] sits at the position of inputs[j] = delayed[j] and
    # must predict delayed[j+1] = targets[j] — the same contract the decode
    # loop uses (the step's hidden state yields the NEXT delayed frame).
    # Slicing from Lc-1 instead would train every position one frame ahead
    # of what inference asks of it (tested: test_train_matches_inference).
    h_audio = hidden[:, Lc : Lc + targets.shape[-1]]  # [B, T-1, d]
    logits = (h_audio @ params["heads"]).reshape(*h_audio.shape[:2], K, Vp)
    logits = logits.astype(jnp.float32)

    tgt = jnp.swapaxes(targets, 1, 2)  # [B, T-1, K]
    valid = tgt != mask_id
    tgt = jnp.clip(tgt, 0, Vp - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def conditioned_loss(
    cfg: ZonosConfig,
    specs,
    params: dict,
    cond_inputs: dict,
    codes: jnp.ndarray,
    drop_key=None,
    uncond_p: float = 0.1,
    remat: bool = False,
):
    """End-to-end loss from raw conditioning inputs (loader batches).

    Unlike :func:`multicodebook_loss` (which takes a precomputed prefix),
    this runs the PrefixConditioner inside the differentiated region, so the
    conditioner projections, embeddings, and — crucially — the learned
    *unconditional vectors* train.  ``uncond_p`` is classifier-free-guidance
    dropout: each conditioner with an uncond vector is independently replaced
    by it on a ``uncond_p`` fraction of rows (per-row Bernoulli from
    ``drop_key``), which is what makes CFG inference
    (``uncond + (cond-uncond)*scale``, ref model.py:112-114) meaningful.
    Conditioners whose batch input is None always use their uncond vector,
    matching inference's uncond branch (ref model.py:211-212)."""
    uncond_drop = None
    if drop_key is not None and uncond_p > 0.0:
        names = [s.name for s in specs if s.uncond and cond_inputs.get(s.name) is not None]
        if names:
            B = codes.shape[0]
            joint_key, *keys = jax.random.split(drop_key, len(names) + 1)
            # JOINT drop with probability uncond_p: all droppable
            # conditioners take their uncond vector together — this is the
            # exact configuration CFG's uncond branch evaluates at inference
            # (model.py:211-212 builds the uncond prefix from required keys
            # only), so it must be trained directly; independent drops alone
            # would hit it with probability ~p^n.  Additional independent
            # per-conditioner drops (same rate) train the partial-uncond
            # rows that user `unconditional_keys` produce in the cond branch.
            joint = jax.random.bernoulli(joint_key, uncond_p, (B,))
            uncond_drop = {
                n: joint | jax.random.bernoulli(k, uncond_p, (B,))
                for n, k in zip(names, keys)
            }
    cond = prefix_conditioner_forward(
        params["prefix_conditioner"], specs, cfg.prefix_conditioner, cond_inputs,
        cfg.backbone.norm_epsilon, uncond_drop,
    )
    ref_dtype = jax.tree.leaves(params["heads"])[0].dtype
    return multicodebook_loss(cfg, params, cond.astype(ref_dtype), codes, remat=remat)


def make_conditioned_train_step(
    cfg: ZonosConfig, specs, optimizer, uncond_p: float = 0.1, remat: bool = False,
    accum_steps: int = 1,
):
    """Jittable step over loader batches: (params, opt_state, cond_inputs,
    codes, step_key) -> (params, opt_state, loss).

    ``accum_steps > 1`` accumulates gradients over that many micro-batches
    with a ``lax.scan`` (same ladder as :func:`make_train_step`): activations
    exist for one micro-batch at a time, so peak HBM scales with
    B/accum_steps.  Batch-replicated conditioning inputs (leading dim 1,
    e.g. a shared speaker embedding) are passed to every micro-batch as-is."""

    def loss_fn(params, cond_inputs, codes, step_key):
        return conditioned_loss(cfg, specs, params, cond_inputs, codes,
                                drop_key=step_key, uncond_p=uncond_p, remat=remat)

    def train_step(params, opt_state, cond_inputs, codes, step_key):
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, cond_inputs, codes, step_key)
        else:
            B = codes.shape[0]
            if B % accum_steps:
                raise ValueError(f"batch {B} not divisible by accum_steps {accum_steps}")
            mb = B // accum_steps

            def split(x):
                if x is None or x.shape[0] == 1:  # batch-broadcast input
                    return x
                return x.reshape(accum_steps, mb, *x.shape[1:])

            cond_mb = {k: split(v) for k, v in cond_inputs.items()}
            codes_mb = codes.reshape(accum_steps, mb, *codes.shape[1:])
            keys = jax.random.split(step_key, accum_steps)

            def micro(carry, xs):
                loss_acc, grads_acc = carry
                i, k = xs
                ci = {name: (v if v is None or v.shape[0] == 1 else v[i])
                      for name, v in cond_mb.items()}
                loss, grads = jax.value_and_grad(loss_fn)(params, ci, codes_mb[i], k)
                return (
                    loss_acc + loss / accum_steps,
                    jax.tree.map(lambda a, g: a + g / accum_steps, grads_acc, grads),
                ), None

            zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
            (loss, grads), _ = jax.lax.scan(
                micro, (jnp.float32(0.0), zeros),
                (jnp.arange(accum_steps), keys))
            grads = jax.tree.map(lambda g, p: g.astype(p.dtype), grads, params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_conditioned_eval_fn(cfg: ZonosConfig, specs, remat: bool = False):
    """Jittable held-out loss over loader batches: (params, cond_inputs,
    codes) -> scalar.  No CFG dropout — evaluates the conditioned model the
    way inference's cond branch runs it."""

    def eval_fn(params, cond_inputs, codes):
        return conditioned_loss(cfg, specs, params, cond_inputs, codes,
                                drop_key=None, uncond_p=0.0, remat=remat)

    return eval_fn


def make_optimizer(
    lr: float = 3e-4,
    weight_decay: float = 0.01,
    warmup_steps: int = 0,
    total_steps: int | None = None,
    grad_clip: float | None = 1.0,
    kind: str = "adamw",
):
    """Global-norm clipping + AdamW/Adafactor; linear warmup into cosine
    decay when ``total_steps`` is given, constant LR otherwise.

    ``kind="adafactor"`` is the single-chip memory ladder's last rung: its
    factored second moment stores O(rows+cols) per matrix instead of AdamW's
    2x O(params) fp32 moments, which is what lets the 1.6B flagship train on
    one 16 GB chip (moments alone would be 12.8 GB under AdamW).
    """
    if total_steps is not None:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1),
        )
    elif warmup_steps:
        schedule = optax.linear_schedule(0.0, lr, warmup_steps)
    else:
        schedule = lr
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if kind == "adamw":
        parts.append(optax.adamw(schedule, weight_decay=weight_decay))
    elif kind == "adafactor":
        parts.append(optax.adafactor(
            schedule,
            # external clipping + schedule; keep adafactor's own scaling off
            clipping_threshold=None,
            multiply_by_parameter_scale=False,
            weight_decay_rate=weight_decay if weight_decay else None,
        ))
    else:
        raise ValueError(f"unknown optimizer kind {kind!r}")
    return optax.chain(*parts)


def make_train_step(cfg: ZonosConfig, optimizer, accum_steps: int = 1, remat: bool = False):
    """One jittable optimizer step.

    ``accum_steps > 1`` splits the batch into that many micro-batches and
    accumulates gradients with a ``lax.scan`` — activations exist for one
    micro-batch at a time, so peak HBM scales with B/accum_steps (combine
    with ``remat=True`` for the full memory ladder).  The batch dimension
    must divide evenly."""
    loss_fn = partial(multicodebook_loss, cfg, remat=remat)

    def train_step(params, opt_state, cond, codes):
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, cond, codes)
        else:
            B = codes.shape[0]
            if B % accum_steps:
                raise ValueError(f"batch {B} not divisible by accum_steps {accum_steps}")
            mb = B // accum_steps
            cond_mb = cond.reshape(accum_steps, mb, *cond.shape[1:])
            codes_mb = codes.reshape(accum_steps, mb, *codes.shape[1:])

            def micro(carry, xs):
                loss_acc, grads_acc = carry
                c, t = xs
                loss, grads = jax.value_and_grad(loss_fn)(params, c, t)
                return (
                    loss_acc + loss / accum_steps,
                    jax.tree.map(lambda a, g: a + g / accum_steps, grads_acc, grads),
                ), None

            zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
            (loss, grads), _ = jax.lax.scan(micro, (jnp.float32(0.0), zeros), (cond_mb, codes_mb))
            grads = jax.tree.map(lambda g, p: g.astype(p.dtype), grads, params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
