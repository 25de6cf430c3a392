"""LoRA voice-adaptation finetuning (parameter-efficient, single-chip).

The reference has no training at all (SURVEY.md §1); full finetuning of the
1.6B flagship needs the adafactor+remat memory ladder.  LoRA is the
production path for the dominant TTS adaptation workload — cloning a voice
or style from minutes of audio: freeze the base weights, train rank-r
factors ``W + (alpha/r)·A@B`` on the backbone projections only (~0.1% of
the parameters at r=8), keep AdamW, and export by merging into
reference-format weights.

TPU-first notes:
- The transformer keeps its stacked-[L, in, out] layer layout; adapters are
  stacked too ([L, in, r] / [L, r, out]) and merged with one batched matmul
  per weight family — the merge is a handful of MXU calls per step, cheap
  next to the forward/backward.
- Merging happens *inside* the differentiated function, so the backward
  pass reaches only the adapters; the frozen base never gets a gradient
  buffer (the grads pytree is adapter-sized, not model-sized).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from zonos_tpu.config import ZonosConfig
from zonos_tpu.parallel.train import conditioned_loss

# Backbone projection leaves that receive adapters (final pytree key):
# transformer stacked layers + hybrid per-layer mamba/attention projections.
DEFAULT_TARGETS = ("wqkv", "wo", "w1", "w2", "in_proj", "out_proj")


def _leaf_name(path) -> str:
    k = path[-1]
    return getattr(k, "key", getattr(k, "name", str(k)))


def init_lora(key, params: dict, rank: int = 8,
              targets: tuple[str, ...] = DEFAULT_TARGETS) -> dict:
    """Adapter pytree mirroring ``params``: target leaves become
    ``{"a": [..., in, r], "b": [..., r, out]}``, everything else ``None``.

    Standard LoRA init: ``a`` gaussian, ``b`` zero — the merged model starts
    exactly equal to the base."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    ks = iter(jax.random.split(key, len(flat)))
    out = []
    for path, leaf in flat:
        k = next(ks)
        # backbone subtree only: conditioner MLP projections also have
        # 'w1'/'w2' leaves and must NOT silently grow adapters
        in_backbone = len(path) > 0 and _leaf_name(path[:1]) == "backbone"
        if (in_backbone and _leaf_name(path) in targets
                and getattr(leaf, "ndim", 0) >= 2):
            *batch, fan_in, fan_out = leaf.shape
            a = jax.random.normal(k, (*batch, fan_in, rank), jnp.float32)
            a = a / np.sqrt(fan_in)
            b = jnp.zeros((*batch, rank, fan_out), jnp.float32)
            out.append({"a": a, "b": b})
        else:
            out.append(None)
    return jax.tree_util.tree_unflatten(treedef, out)


def merge_lora(params: dict, adapters: dict, alpha: float = 16.0) -> dict:
    """Base + (alpha/r)·A@B on adapted leaves (others pass through)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ad_nodes = treedef.flatten_up_to(adapters)

    def merge(p, ad):
        if ad is None:
            return p
        rank = ad["a"].shape[-1]
        delta = (alpha / rank) * (ad["a"] @ ad["b"])
        return (p.astype(jnp.float32) + delta).astype(p.dtype)

    return jax.tree_util.tree_unflatten(
        treedef, [merge(p, ad) for p, ad in zip(leaves, ad_nodes)])


def count_lora_params(adapters: dict) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(adapters))


def make_lora_train_step(cfg: ZonosConfig, specs, optimizer,
                         alpha: float = 16.0, uncond_p: float = 0.1,
                         remat: bool = False):
    """Jittable LoRA step: (adapters, opt_state, base_params, cond_inputs,
    codes, key) -> (adapters, opt_state, loss).

    The frozen base is an explicit argument, NOT a closure: a closed-over
    pytree is baked into the compiled program as multi-GB constants
    (duplicating the weights in HBM and bloating the executable)."""

    def loss_fn(adapters, base_params, cond_inputs, codes, step_key):
        merged = merge_lora(base_params, adapters, alpha)
        return conditioned_loss(cfg, specs, merged, cond_inputs, codes,
                                drop_key=step_key, uncond_p=uncond_p,
                                remat=remat)

    def train_step(adapters, opt_state, base_params, cond_inputs, codes, step_key):
        loss, grads = jax.value_and_grad(loss_fn)(
            adapters, base_params, cond_inputs, codes, step_key)
        updates, opt_state = optimizer.update(grads, opt_state, adapters)
        adapters = optax.apply_updates(adapters, updates)
        return adapters, opt_state, loss

    return train_step


def make_lora_eval_fn(cfg: ZonosConfig, specs,
                      alpha: float = 16.0, remat: bool = False):
    def eval_fn(adapters, base_params, cond_inputs, codes):
        merged = merge_lora(base_params, adapters, alpha)
        return conditioned_loss(cfg, specs, merged, cond_inputs, codes,
                                drop_key=None, uncond_p=0.0, remat=remat)

    return eval_fn
