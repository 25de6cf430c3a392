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

from zonos_tpu.config import ZonosConfig
from zonos_tpu.models.backbone import transformer_forward
from zonos_tpu.models.tts import embed_codes
from zonos_tpu.ops.delay import apply_delay_pattern


def multicodebook_loss(cfg: ZonosConfig, params: dict, cond: jnp.ndarray, codes: jnp.ndarray):
    """cond [B, Lc, d]; codes [B, K, T] raw (no delay). Returns scalar loss.

    Applies the delay pattern, teacher-forces positions, and ignores
    mask-token targets (structural padding of the staircase).
    """
    K, Vp = cfg.num_codebooks, cfg.padded_vocab_size
    mask_id = cfg.masked_token_id
    delayed = apply_delay_pattern(codes, mask_id)  # [B, K, T+K]
    T = delayed.shape[-1]
    inputs = delayed[..., : T - 1]
    targets = delayed[..., 1:]  # predict next delayed frame

    x = jnp.concatenate([cond, embed_codes(params, inputs).astype(cond.dtype)], axis=1)
    hidden = transformer_forward(cfg.backbone, params["backbone"], x)
    Lc = cond.shape[1]
    h_audio = hidden[:, Lc - 1 : Lc - 1 + targets.shape[-1]]  # [B, T-1, d]
    logits = (h_audio @ params["heads"]).reshape(*h_audio.shape[:2], K, Vp)
    logits = logits.astype(jnp.float32)

    tgt = jnp.swapaxes(targets, 1, 2)  # [B, T-1, K]
    valid = tgt != mask_id
    tgt = jnp.clip(tgt, 0, Vp - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def make_optimizer(lr: float = 3e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(cfg: ZonosConfig, optimizer):
    def train_step(params, opt_state, cond, codes):
        loss, grads = jax.value_and_grad(partial(multicodebook_loss, cfg))(params, cond, codes)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
