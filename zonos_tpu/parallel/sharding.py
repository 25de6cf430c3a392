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


# Dense projections by TP role: column-parallel shards the output features
# ("model" on the last axis), row-parallel shards the contraction ("model"
# on the second-to-last axis, partial results psum'd by XLA).
_COL_PARALLEL = ("wqkv", "w1")
_ROW_PARALLEL = ("wo", "w2")


def _axis_spec(ndim: int, axis: int) -> P:
    axis = ndim + axis if axis < 0 else axis
    parts = [None] * ndim
    parts[axis] = "model"
    return P(*parts)


def _dense_spec(w, axis: int):
    """Spec for one dense weight: plain [.., in, out], int8 {"q","s"}, or
    int4 {"q4","s4"}.  axis=-1 column-parallel, axis=-2 row-parallel."""
    if isinstance(w, dict) and "q" in w:
        if axis == -1:  # out-features sharded: scale shards with them
            return {"q": _axis_spec(w["q"].ndim, -1), "s": _axis_spec(w["s"].ndim, -1)}
        # in-features sharded: per-out-channel scale replicated (applied
        # after the partial matmul; psum(x@q)*s == psum(x@q*s))
        return {"q": _axis_spec(w["q"].ndim, -2), "s": jax.tree.map(lambda _: P(), w["s"])}
    if isinstance(w, dict) and "q4" in w:
        if axis == -1:
            return {"q4": _axis_spec(w["q4"].ndim, -1), "s4": _axis_spec(w["s4"].ndim, -1)}
        # row-parallel int4 would split the nibble-packed halves layout and
        # the group axis; replicate (int4 is a single-chip memory mode)
        return jax.tree.map(lambda _: P(), w)
    return _axis_spec(w.ndim, axis)


def transformer_param_specs(backbone: dict | None = None) -> dict:
    layers_p = (backbone or {}).get("layers", {})
    layers = {
        "norm1_scale": P(), "norm1_bias": P(),
        "norm2_scale": P(), "norm2_bias": P(),
    }
    for name in _COL_PARALLEL:
        layers[name] = _dense_spec(layers_p[name], -1) if name in layers_p else P(None, None, "model")
    for name in _ROW_PARALLEL:
        layers[name] = _dense_spec(layers_p[name], -2) if name in layers_p else P(None, "model", None)
    return {"layers": layers, "normf_scale": P(), "normf_bias": P()}


def hybrid_param_specs(backbone: dict) -> dict:
    """Specs for the hybrid (Mamba2 + attention) backbone.

    Attention and MLP projections get the same Megatron TP layout as the
    transformer.  Mamba mixer weights stay replicated: the in_proj output is
    the packed [z | x | B | C | dt] layout whose section boundaries do not
    align with an even "model" split, and the SSD scan state is per-head —
    head-parallel Mamba TP is possible but is not needed for this model
    family (the 0.3 B hybrid fits one chip many times over; scale-out rides
    the "data" axis)."""
    layers_list = []
    for lp in backbone["layers_list"]:
        spec: dict = {}
        for name, w in lp.items():
            if name in _COL_PARALLEL:
                spec[name] = _dense_spec(w, -1)
            elif name in _ROW_PARALLEL:
                spec[name] = _dense_spec(w, -2)
            else:
                spec[name] = jax.tree.map(lambda _: P(), w)
        layers_list.append(spec)
    out = {"layers_list": layers_list, "normf_scale": P()}
    if "normf_bias" in backbone:
        out["normf_bias"] = P()
    return out


def zonos_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a Zonos param pytree (plain or
    quantized weights, transformer or hybrid backbone)."""
    specs: dict = {}
    for k, v in params.items():
        if k == "backbone":
            specs[k] = (
                hybrid_param_specs(v) if "layers_list" in v else transformer_param_specs(v)
            )
        elif k == "embeddings":
            specs[k] = P()
        elif k == "heads":
            specs[k] = _dense_spec(v, -1) if isinstance(v, dict) else P(None, "model")
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
