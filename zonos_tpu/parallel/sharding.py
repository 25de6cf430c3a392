"""Sharding rules (PartitionSpecs) for the model pytrees.

Tensor-parallel layout of the transformer (Megatron-style, expressed purely
as GSPMD annotations — XLA inserts the all-reduces):

- attention: QKV projection column-parallel over heads (``wqkv`` last dim on
  "model"), output projection row-parallel (``wo`` first matrix dim on
  "model") => one psum per attention block;
- MLP: ``w1`` column-parallel, ``w2`` row-parallel => one psum per MLP;
- heads: vocab-parallel (last dim on "model"); logits all-gathered by XLA
  only at the (tiny) [B, 9, V] boundary;
- KV cache: kv-heads on "model", batch on "data";
- activations/codes: batch on "data"; everything else replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def kv_cache_sharding(mesh: Mesh) -> NamedSharding:
    # [L, B, H_kv, S, hd]: batch on data, kv heads on model
    return NamedSharding(mesh, P(None, "data", "model", None, None))


def transformer_param_specs() -> dict:
    layers = {
        "norm1_scale": P(), "norm1_bias": P(),
        "wqkv": P(None, None, "model"),
        "wo": P(None, "model", None),
        "norm2_scale": P(), "norm2_bias": P(),
        "w1": P(None, None, "model"),
        "w2": P(None, "model", None),
    }
    return {"layers": layers, "normf_scale": P(), "normf_bias": P()}


def embed_head_specs() -> dict:
    return {
        # vocab-parallel heads; embedding tables replicated (gathers are tiny)
        "embeddings": P(),
        "heads": P(None, "model"),
    }


def zonos_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a Zonos param pytree."""
    specs: dict = {}
    for k, v in params.items():
        if k == "backbone":
            specs[k] = transformer_param_specs()
        elif k == "embeddings":
            specs[k] = P()
        elif k == "heads":
            specs[k] = P(None, "model")
        else:  # prefix conditioner & friends: replicated
            specs[k] = jax.tree.map(lambda _: P(), v)
    return specs


def param_shardings(mesh: Mesh, params: dict) -> dict:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        zonos_param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: dict) -> dict:
    """Place a (host/replicated) param pytree onto the mesh."""
    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
