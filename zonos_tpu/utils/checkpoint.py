"""safetensors (PyTorch layout) -> JAX pytree checkpoint conversion.

Loads reference-format Zonos checkpoints (the key naming produced by
zonos/model.py:22-47's module tree) into this framework's stacked-layer
pytrees: torch ``nn.Linear`` weights are ``[out, in]`` and become
transposed ``[in, out]`` matrices; per-layer tensors are stacked on a
leading layer axis; embedding/head vocab is zero-padded to the TPU lane
multiple (config.padded_vocab_size), the analogue of the reference's
pad-to-%8 post-load hook (zonos/model.py:46-51, zonos/utils.py:22-37).
"""

from __future__ import annotations

import numpy as np

from zonos_tpu.config import ZonosConfig
from zonos_tpu.conditioning import build_specs


def _np(t) -> np.ndarray:
    return np.asarray(t, dtype=np.float32)


def load_safetensors_numpy(path: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def _pad_rows(x: np.ndarray, rows: int) -> np.ndarray:
    if x.shape[0] >= rows:
        return x[:rows]
    pad = np.zeros((rows - x.shape[0], *x.shape[1:]), x.dtype)
    return np.concatenate([x, pad], axis=0)


def _stack_layers(sd: dict, pattern: str, n_layer: int, transpose: bool) -> np.ndarray:
    mats = []
    for i in range(n_layer):
        t = _np(sd[pattern.format(i)])
        mats.append(t.T if transpose else t)
    return np.stack(mats)


def convert_transformer_backbone(sd: dict, cfg: ZonosConfig) -> dict:
    L = cfg.backbone.n_layer
    pre = "backbone.layers.{}."
    return {
        "layers": {
            "norm1_scale": _stack_layers(sd, pre + "norm.weight", L, False),
            "norm1_bias": _stack_layers(sd, pre + "norm.bias", L, False),
            "wqkv": _stack_layers(sd, pre + "mixer.in_proj.weight", L, True),
            "wo": _stack_layers(sd, pre + "mixer.out_proj.weight", L, True),
            "norm2_scale": _stack_layers(sd, pre + "norm2.weight", L, False),
            "norm2_bias": _stack_layers(sd, pre + "norm2.bias", L, False),
            "w1": _stack_layers(sd, pre + "mlp.fc1.weight", L, True),
            "w2": _stack_layers(sd, pre + "mlp.fc2.weight", L, True),
        },
        "normf_scale": _np(sd["backbone.norm_f.weight"]),
        "normf_bias": _np(sd["backbone.norm_f.bias"]),
    }


def convert_embeddings_heads(sd: dict, cfg: ZonosConfig) -> dict:
    K, Vp, d = cfg.num_codebooks, cfg.padded_vocab_size, cfg.backbone.d_model
    emb = np.stack([_pad_rows(_np(sd[f"embeddings.{k}.weight"]), Vp) for k in range(K)])
    heads = np.zeros((d, K * Vp), np.float32)
    for k in range(K):
        w = _np(sd[f"heads.{k}.weight"])  # [V_out, d]
        heads[:, k * Vp : k * Vp + w.shape[0]] = w.T
    return {"embeddings": emb, "heads": heads}


def convert_prefix_conditioner(sd: dict, cfg: ZonosConfig) -> dict:
    specs = build_specs(cfg.prefix_conditioner, cfg.backbone.d_model)
    params: dict = {
        "_norm": {
            "scale": _np(sd["prefix_conditioner.norm.weight"]),
            "bias": _np(sd["prefix_conditioner.norm.bias"]),
        },
        "_project": {},
    }
    if "prefix_conditioner.project.weight" in sd:
        params["_project"] = {
            "w": _np(sd["prefix_conditioner.project.weight"]).T,
            "b": _np(sd["prefix_conditioner.project.bias"]),
        }
    for j, spec in enumerate(specs):
        pre = f"prefix_conditioner.conditioners.{j}."
        p: dict = {"project": {}}
        if pre + "project.weight" in sd:
            p["project"] = {"w": _np(sd[pre + "project.weight"]).T, "b": _np(sd[pre + "project.bias"])}
        elif pre + "project.0.weight" in sd:  # mlp projection
            p["project"] = {
                "w1": _np(sd[pre + "project.0.weight"]).T,
                "b1": _np(sd[pre + "project.0.bias"]),
                "w2": _np(sd[pre + "project.2.weight"]).T,
                "b2": _np(sd[pre + "project.2.bias"]),
            }
        if pre + "uncond_vector" in sd:
            p["uncond_vector"] = _np(sd[pre + "uncond_vector"])
        if spec.type == "Espeak":
            p["embed"] = _np(sd[pre + "phoneme_embedder.weight"])
        elif spec.type == "Fourier":
            p["weight"] = _np(sd[pre + "weight"])
        elif spec.type == "Integer":
            p["embed"] = _np(sd[pre + "int_embedder.weight"])
        params[spec.name] = p
    return params


def load_zonos_checkpoint(
    cfg: ZonosConfig, path: str, init_params: dict | None = None, mesh=None
) -> dict:
    """Convert a reference-format checkpoint into the runtime pytree (bf16).

    With ``mesh``, every tensor is placed directly under its serving
    ``NamedSharding`` (parallel/sharding.py) as it is converted — each
    process reads the file and contributes its addressable shards, so no
    device ever holds a full replica of a tensor-parallel weight (the
    sharded-loading requirement of SURVEY.md §5 "Checkpoint / resume")."""
    import jax
    import jax.numpy as jnp

    sd = load_safetensors_numpy(path)
    if cfg.backbone.is_transformer:
        backbone = convert_transformer_backbone(sd, cfg)
    else:
        from zonos_tpu.models.hybrid import convert_hybrid_backbone

        backbone = convert_hybrid_backbone(sd, cfg)
    params = {
        "backbone": backbone,
        "prefix_conditioner": convert_prefix_conditioner(sd, cfg),
    }
    params.update(convert_embeddings_heads(sd, cfg))

    if mesh is None:

        def cast(x):
            return jnp.asarray(np.asarray(x), jnp.bfloat16)

        return jax.tree.map(cast, params)

    from jax.sharding import NamedSharding

    from zonos_tpu.parallel.sharding import zonos_param_specs

    specs = zonos_param_specs(params)

    def place(x, spec):
        return jax.device_put(jnp.asarray(np.asarray(x), jnp.bfloat16), NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs)
