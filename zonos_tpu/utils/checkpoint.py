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
    cfg: ZonosConfig, path: str, init_params: dict | None = None, mesh=None,
    dtype=None,
) -> dict:
    """Convert a reference-format checkpoint into the runtime pytree (bf16,
    or ``dtype`` — fp32 is used by the oracle parity tests for tight
    tolerances).

    With ``mesh``, every tensor is placed directly under its serving
    ``NamedSharding`` (parallel/sharding.py) as it is converted — each
    process reads the file and contributes its addressable shards, so no
    device ever holds a full replica of a tensor-parallel weight (the
    sharded-loading requirement of SURVEY.md §5 "Checkpoint / resume")."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16
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
            return jnp.asarray(np.asarray(x), dtype)

        return jax.tree.map(cast, params)

    from jax.sharding import NamedSharding

    from zonos_tpu.parallel.sharding import zonos_param_specs

    specs = zonos_param_specs(params)

    def place(x, spec):
        return jax.device_put(jnp.asarray(np.asarray(x), dtype), NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs)


# ---------------------------------------------------------------------------
# Inverse conversion: runtime pytree -> reference-format checkpoint
# ---------------------------------------------------------------------------


def _t(x, transpose: bool = False) -> np.ndarray:
    import jax

    a = np.asarray(jax.device_get(x), np.float32)
    return a.T if transpose else a


def export_state_dict(cfg: ZonosConfig, params: dict) -> dict[str, np.ndarray]:
    """Runtime pytree -> flat dict with the reference's state_dict names.

    Exact inverse of the loaders above: layer stacks are unstacked, linear
    weights transposed back to torch's ``[out, in]``, and embedding/head
    vocab un-padded to the reference's 1026/1025 rows (the reference re-pads
    to %8 itself after load, zonos/model.py:46-51).  Quantized serving
    params cannot be exported — dequantize/finetune in float first."""
    if "layers" not in params.get("backbone", {}) and "layers_list" not in params.get("backbone", {}):
        raise ValueError("params do not look like a runtime pytree (quantized or partial?)")
    sd: dict[str, np.ndarray] = {}
    bb = params["backbone"]
    if cfg.backbone.is_transformer:
        L = cfg.backbone.n_layer
        lay = bb["layers"]
        for i in range(L):
            pre = f"backbone.layers.{i}."
            sd[pre + "norm.weight"] = _t(lay["norm1_scale"][i])
            sd[pre + "norm.bias"] = _t(lay["norm1_bias"][i])
            sd[pre + "mixer.in_proj.weight"] = _t(lay["wqkv"][i], True)
            sd[pre + "mixer.out_proj.weight"] = _t(lay["wo"][i], True)
            sd[pre + "norm2.weight"] = _t(lay["norm2_scale"][i])
            sd[pre + "norm2.bias"] = _t(lay["norm2_bias"][i])
            sd[pre + "mlp.fc1.weight"] = _t(lay["w1"][i], True)
            sd[pre + "mlp.fc2.weight"] = _t(lay["w2"][i], True)
        sd["backbone.norm_f.weight"] = _t(bb["normf_scale"])
        sd["backbone.norm_f.bias"] = _t(bb["normf_bias"])
    else:
        for i, lp in enumerate(bb["layers_list"]):
            pre = f"backbone.layers.{i}."
            sd[pre + "norm.weight"] = _t(lp["norm_scale"])
            if "norm_bias" in lp:
                sd[pre + "norm.bias"] = _t(lp["norm_bias"])
            if "wqkv" in lp:  # attention layer
                sd[pre + "mixer.in_proj.weight"] = _t(lp["wqkv"], True)
                sd[pre + "mixer.out_proj.weight"] = _t(lp["wo"], True)
            else:  # Mamba2 layer
                sd[pre + "mixer.in_proj.weight"] = _t(lp["in_proj"], True)
                sd[pre + "mixer.conv1d.weight"] = _t(lp["conv_w"], True)[:, None, :]  # [K,C] -> [C,1,K]
                sd[pre + "mixer.conv1d.bias"] = _t(lp["conv_b"])
                sd[pre + "mixer.A_log"] = _t(lp["A_log"])
                sd[pre + "mixer.D"] = _t(lp["D"])
                sd[pre + "mixer.dt_bias"] = _t(lp["dt_bias"])
                sd[pre + "mixer.norm.weight"] = _t(lp["mixer_norm"])
                sd[pre + "mixer.out_proj.weight"] = _t(lp["out_proj"], True)
            if "w1" in lp:
                sd[pre + "norm2.weight"] = _t(lp["norm2_scale"])
                if "norm2_bias" in lp:
                    sd[pre + "norm2.bias"] = _t(lp["norm2_bias"])
                sd[pre + "mlp.fc1.weight"] = _t(lp["w1"], True)
                sd[pre + "mlp.fc2.weight"] = _t(lp["w2"], True)
        sd["backbone.norm_f.weight"] = _t(bb["normf_scale"])
        if "normf_bias" in bb:
            sd["backbone.norm_f.bias"] = _t(bb["normf_bias"])

    K, Vp, d = cfg.num_codebooks, cfg.padded_vocab_size, cfg.backbone.d_model
    Vi, Vo = cfg.input_vocab_size, cfg.output_vocab_size
    emb = _t(params["embeddings"])  # [K, Vp, d]
    heads = _t(params["heads"])  # [d, K*Vp]
    for k in range(K):
        sd[f"embeddings.{k}.weight"] = emb[k, :Vi]
        sd[f"heads.{k}.weight"] = heads[:, k * Vp : k * Vp + Vo].T

    pc = params["prefix_conditioner"]
    sd["prefix_conditioner.norm.weight"] = _t(pc["_norm"]["scale"])
    sd["prefix_conditioner.norm.bias"] = _t(pc["_norm"]["bias"])
    if pc.get("_project"):
        sd["prefix_conditioner.project.weight"] = _t(pc["_project"]["w"], True)
        sd["prefix_conditioner.project.bias"] = _t(pc["_project"]["b"])
    specs = build_specs(cfg.prefix_conditioner, d)
    for j, spec in enumerate(specs):
        pre = f"prefix_conditioner.conditioners.{j}."
        p = pc[spec.name]
        proj = p.get("project") or {}
        if "w" in proj:
            sd[pre + "project.weight"] = _t(proj["w"], True)
            sd[pre + "project.bias"] = _t(proj["b"])
        elif "w1" in proj:
            sd[pre + "project.0.weight"] = _t(proj["w1"], True)
            sd[pre + "project.0.bias"] = _t(proj["b1"])
            sd[pre + "project.2.weight"] = _t(proj["w2"], True)
            sd[pre + "project.2.bias"] = _t(proj["b2"])
        if "uncond_vector" in p:
            sd[pre + "uncond_vector"] = _t(p["uncond_vector"])
        if spec.type == "Espeak":
            sd[pre + "phoneme_embedder.weight"] = _t(p["embed"])
        elif spec.type == "Fourier":
            sd[pre + "weight"] = _t(p["weight"])
        elif spec.type == "Integer":
            sd[pre + "int_embedder.weight"] = _t(p["embed"])
    return sd


def config_to_reference_dict(cfg: ZonosConfig) -> dict:
    """ZonosConfig -> the reference's config.json schema (zonos/config.py:28-62)."""
    bb = cfg.backbone
    return {
        "backbone": {
            "d_model": bb.d_model,
            "d_intermediate": bb.d_intermediate,
            "attn_mlp_d_intermediate": bb.attn_mlp_d_intermediate,
            "n_layer": bb.n_layer,
            "ssm_cfg": dict(bb.ssm_cfg),
            "attn_layer_idx": list(bb.attn_layer_idx),
            "attn_cfg": dict(bb.attn_cfg),
            "rms_norm": bb.rms_norm,
            "residual_in_fp32": bb.residual_in_fp32,
            "norm_epsilon": bb.norm_epsilon,
        },
        "prefix_conditioner": {
            "conditioners": [dict(c) for c in cfg.prefix_conditioner.conditioners],
            "projection": cfg.prefix_conditioner.projection,
        },
        "eos_token_id": cfg.eos_token_id,
        "masked_token_id": cfg.masked_token_id,
    }


def export_zonos_checkpoint(cfg: ZonosConfig, params: dict, out_dir: str,
                            dtype: str = "bfloat16") -> str:
    """Write ``config.json`` + ``model.safetensors`` in the reference's
    format under ``out_dir`` — models trained/finetuned here load directly
    in the PyTorch reference (and back here via `Zonos.from_pretrained`).
    Returns the safetensors path."""
    import json
    from pathlib import Path

    import torch
    from safetensors.torch import save_file

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    torch_dtype = {"bfloat16": torch.bfloat16, "float32": torch.float32}[dtype]
    sd = {k: torch.from_numpy(v).to(torch_dtype).contiguous()
          for k, v in export_state_dict(cfg, params).items()}
    path = out / "model.safetensors"
    save_file(sd, str(path))
    with open(out / "config.json", "w") as f:
        json.dump(config_to_reference_dict(cfg), f, indent=2)
    return str(path)
