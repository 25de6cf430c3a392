"""Conditioning system: prefix conditioners and the user-facing cond dict.

Capability parity with the reference conditioning stack
(zonos/conditioning.py:12-54, 295-496): the same four conditioner types
(Espeak phoneme embedding, Fourier feature, Integer embedding, Passthrough),
each with optional linear/MLP projection and a learned unconditional vector;
a PrefixConditioner that concatenates all conditioner outputs along the
sequence axis and applies a shared projection + LayerNorm; and
``make_cond_dict`` with the same conditioning vocabulary and defaults.

TPU-first split: everything string-shaped (phonemization, tokenization)
happens on host in :func:`prepare_cond_inputs`; the jittable
:func:`prefix_conditioner_forward` consumes only arrays.  Conditioner
params are a dict pytree keyed by conditioner name.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.config import PrefixConditionerConfig
from zonos_tpu.ops.norms import layer_norm
from zonos_tpu.text import phonemize, tokenize_phonemes
from zonos_tpu.text.symbols import SYMBOL_VOCAB_SIZE


@dataclass(frozen=True)
class ConditionerSpec:
    type: str  # Espeak | Fourier | Integer | Passthrough
    name: str
    cond_dim: int
    projection: str  # none | linear | mlp
    uncond: bool
    input_dim: int = 1
    min_val: float = 0.0
    max_val: float = 1.0
    int_min: int = 0
    int_max: int = 512
    fourier_std: float = 1.0


def build_specs(config: PrefixConditionerConfig, output_dim: int) -> tuple[ConditionerSpec, ...]:
    specs = []
    for raw in config.conditioners:
        c = dict(raw)
        ctype = c.pop("type").replace("Conditioner", "").replace("EspeakPhoneme", "Espeak")
        name = c.pop("name")
        specs.append(
            ConditionerSpec(
                type=ctype,
                name=name,
                cond_dim=int(c.get("cond_dim", output_dim)),
                projection=c.get("projection", "none"),
                uncond=c.get("uncond_type", "none") == "learned",
                input_dim=int(c.get("input_dim", 1)),
                min_val=float(c.get("min_val", 0.0)),
                max_val=float(c.get("max_val", 1.0)),
                int_min=int(c.get("min_val", 0)),
                int_max=int(c.get("max_val", 512)),
                fourier_std=float(c.get("std", 1.0)),
            )
        )
    return tuple(specs)


def required_keys(specs: tuple[ConditionerSpec, ...]) -> set[str]:
    """Conditioners without a learned uncond vector must always be supplied
    (ref: zonos/conditioning.py:378)."""
    return {s.name for s in specs if not s.uncond}


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def _init_projection(key, spec: ConditionerSpec, out_dim: int, dtype):
    if spec.projection == "linear":
        k1, _ = jax.random.split(key)
        return {
            "w": (jax.random.normal(k1, (spec.cond_dim, out_dim), jnp.float32) / np.sqrt(spec.cond_dim)).astype(dtype),
            "b": jnp.zeros((out_dim,), dtype),
        }
    if spec.projection == "mlp":
        k1, k2 = jax.random.split(key)
        return {
            "w1": (jax.random.normal(k1, (spec.cond_dim, out_dim), jnp.float32) / np.sqrt(spec.cond_dim)).astype(dtype),
            "b1": jnp.zeros((out_dim,), dtype),
            "w2": (jax.random.normal(k2, (out_dim, out_dim), jnp.float32) / np.sqrt(out_dim)).astype(dtype),
            "b2": jnp.zeros((out_dim,), dtype),
        }
    return {}


def init_conditioner_params(key, spec: ConditionerSpec, out_dim: int, dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(key, 3)
    p: dict = {"project": _init_projection(keys[0], spec, out_dim, dtype)}
    if spec.uncond:
        p["uncond_vector"] = jnp.zeros((out_dim,), dtype)
    if spec.type == "Espeak":
        p["embed"] = (jax.random.normal(keys[1], (SYMBOL_VOCAB_SIZE, out_dim), jnp.float32) * 0.02).astype(dtype)
    elif spec.type == "Fourier":
        # Random-feature matrix is a checkpoint buffer in the reference
        # (zonos/conditioning.py:330); shape [out_dim/2, input_dim].
        p["weight"] = (jax.random.normal(keys[2], (out_dim // 2, spec.input_dim), jnp.float32) * spec.fourier_std).astype(jnp.float32)
    elif spec.type == "Integer":
        n = spec.int_max - spec.int_min + 1
        p["embed"] = (jax.random.normal(keys[1], (n, out_dim), jnp.float32) * 0.02).astype(dtype)
    return p


def init_prefix_conditioner_params(
    key, config: PrefixConditionerConfig, out_dim: int, dtype=jnp.bfloat16
) -> dict:
    specs = build_specs(config, out_dim)
    keys = jax.random.split(key, len(specs) + 1)
    params = {s.name: init_conditioner_params(k, s, out_dim, dtype) for s, k in zip(specs, keys[:-1])}
    params["_norm"] = {"scale": jnp.ones((out_dim,), dtype), "bias": jnp.zeros((out_dim,), dtype)}
    top = ConditionerSpec("Passthrough", "prefix", out_dim, config.projection, False)
    params["_project"] = _init_projection(keys[-1], top, out_dim, dtype)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _project(p: dict, projection: str, x: jnp.ndarray) -> jnp.ndarray:
    if projection == "linear":
        return x @ p["w"] + p["b"]
    if projection == "mlp":
        h = jax.nn.silu(x @ p["w1"] + p["b1"])
        return h @ p["w2"] + p["b2"]
    return x


def conditioner_forward(params: dict, spec: ConditionerSpec, value) -> jnp.ndarray:
    """One conditioner: raw input array -> [b, seq, out_dim] embedding."""
    if value is None:
        return params["uncond_vector"][None, None, :]
    if spec.type == "Espeak":
        cond = params["embed"][value]  # [b, T, d] gather
    elif spec.type == "Fourier":
        x = (jnp.asarray(value, jnp.float32) - spec.min_val) / (spec.max_val - spec.min_val)
        f = 2 * jnp.pi * (x @ params["weight"].T)  # [b, s, out/2]
        cond = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1).astype(jnp.bfloat16)
    elif spec.type == "Integer":
        cond = params["embed"][jnp.squeeze(value, -1) - spec.int_min]
    elif spec.type == "Passthrough":
        cond = jnp.asarray(value)
    else:
        raise ValueError(f"unknown conditioner type {spec.type}")
    return _project(params["project"], spec.projection, cond)


def prefix_conditioner_forward(
    params: dict,
    specs: tuple[ConditionerSpec, ...],
    config: PrefixConditionerConfig,
    inputs: dict,
    eps: float = 1e-5,
    uncond_drop: dict | None = None,
) -> jnp.ndarray:
    """Concat all conditioner outputs on the seq axis -> [B, cond_len, d].

    ``inputs[name]`` is an array or None (=> learned uncond vector), matching
    the reference semantics (zonos/conditioning.py:380-389).

    ``uncond_drop[name]`` (training only) is a per-row boolean mask [B]:
    rows where it is True take the conditioner's learned uncond vector
    instead of the conditioned output — classifier-free-guidance dropout,
    which is what trains the uncond vectors CFG inference relies on.  Only
    valid for conditioners with ``uncond=True`` (those emit one sequence
    position, so the row-wise select is shape-safe).
    """
    conds = []
    for s in specs:
        c = conditioner_forward(params[s.name], s, inputs.get(s.name))
        if uncond_drop is not None and s.name in uncond_drop:
            if not s.uncond:
                raise ValueError(f"conditioner {s.name!r} has no uncond vector to drop to")
            u = params[s.name]["uncond_vector"][None, None, :].astype(c.dtype)
            mask = uncond_drop[s.name].reshape(-1, 1, 1)
            c = jnp.where(mask, u, c)
        conds.append(c)
    max_b = max(c.shape[0] for c in conds)
    conds = [jnp.broadcast_to(c, (max_b, *c.shape[1:])) if c.shape[0] == 1 else c for c in conds]
    x = jnp.concatenate(conds, axis=-2)
    x = _project(params["_project"], config.projection, x)
    return layer_norm(x, params["_norm"]["scale"], params["_norm"]["bias"], eps)


# ---------------------------------------------------------------------------
# User-facing cond dict (host side)
# ---------------------------------------------------------------------------

supported_language_codes = [
    'af', 'am', 'an', 'ar', 'as', 'az', 'ba', 'bg', 'bn', 'bpy', 'bs', 'ca', 'cmn',
    'cs', 'cy', 'da', 'de', 'el', 'en-029', 'en-gb', 'en-gb-scotland', 'en-gb-x-gbclan',
    'en-gb-x-gbcwmd', 'en-gb-x-rp', 'en-us', 'eo', 'es', 'es-419', 'et', 'eu', 'fa',
    'fa-latn', 'fi', 'fr-be', 'fr-ch', 'fr-fr', 'ga', 'gd', 'gn', 'grc', 'gu', 'hak',
    'hi', 'hr', 'ht', 'hu', 'hy', 'hyw', 'ia', 'id', 'is', 'it', 'ja', 'jbo', 'ka',
    'kk', 'kl', 'kn', 'ko', 'kok', 'ku', 'ky', 'la', 'lfn', 'lt', 'lv', 'mi', 'mk',
    'ml', 'mr', 'ms', 'mt', 'my', 'nb', 'nci', 'ne', 'nl', 'om', 'or', 'pa', 'pap',
    'pl', 'pt', 'pt-br', 'py', 'quc', 'ro', 'ru', 'ru-lv', 'sd', 'shn', 'si', 'sk',
    'sl', 'sq', 'sr', 'sv', 'sw', 'ta', 'te', 'tn', 'tr', 'tt', 'ur', 'uz', 'vi',
    'vi-vn-x-central', 'vi-vn-x-south', 'yue',
]  # matches the reference list (zonos/conditioning.py:392-403)

LANGUAGE_TO_ID = {lang: i for i, lang in enumerate(supported_language_codes)}


def make_cond_dict(
    text: str | list[str] = "Zonos uses eSpeak for text to phoneme conversion!",
    language: str = "en-us",
    speaker: np.ndarray | None = None,
    emotion: list[float] = (1.0, 0.05, 0.05, 0.05, 0.05, 0.05, 0.1, 0.2),
    fmax: float = 22050.0,
    pitch_std: float = 20.0,
    speaking_rate: float = 15.0,
    vqscore_8: list[float] = (0.78,) * 8,
    ctc_loss: float = 0.0,
    dnsmos_ovrl: float = 4.0,
    speaker_noised: bool = False,
    unconditional_keys=frozenset({"emotion", "vqscore_8", "dnsmos_ovrl"}),
) -> dict:
    """Build the conditioning dict (ref surface: zonos/conditioning.py:406-496).

    Values become numpy arrays of shape ``[1, 1, dim]``; the emotion vector
    is renormalized to sum to 1; keys in ``unconditional_keys`` are dropped
    so the corresponding conditioner uses its learned uncond vector.
    """
    if isinstance(text, str):
        text = [text]
    language = language.lower().replace("_", "-")
    assert language in supported_language_codes, (
        f"Language code {language} not supported; pick one of {supported_language_codes}"
    )

    cond: dict = {
        "espeak": (text, [language] * len(text)),
        "speaker": speaker,
        "emotion": list(emotion),
        "fmax": fmax,
        "pitch_std": pitch_std,
        "speaking_rate": speaking_rate,
        "language_id": LANGUAGE_TO_ID[language],
        "vqscore_8": list(vqscore_8),
        "ctc_loss": ctc_loss,
        "dnsmos_ovrl": dnsmos_ovrl,
        "speaker_noised": int(speaker_noised),
    }
    for k in unconditional_keys:
        cond.pop(k, None)

    for k, v in list(cond.items()):
        if isinstance(v, (int, float, list)):
            v = np.asarray(v, dtype=np.float32)
        if isinstance(v, (np.ndarray, jnp.ndarray)):
            cond[k] = np.asarray(v, dtype=np.float32).reshape(1, 1, -1)
        if k == "emotion":
            cond[k] = cond[k] / cond[k].sum(axis=-1, keepdims=True)
    return cond


def prepare_cond_inputs(
    specs: tuple[ConditionerSpec, ...], cond_dict: dict, pad_to_multiple: int = 1
) -> dict:
    """Host stage: strings -> arrays.  Returns name -> array-or-None.

    ``pad_to_multiple`` left-pads the phoneme ids (PAD symbol — the
    reference's own intra-batch padding, zonos/conditioning.py:186-191) so
    the prefix length snaps to a bucket: generate programs are compiled per
    cond_len, so callers issuing many different texts (SRT segments, CLIs)
    use this to stay inside the jit cache."""
    missing = required_keys(specs) - set(cond_dict)
    if missing:
        raise ValueError(f"Missing required conditioning keys: {missing}")
    inputs: dict = {}
    for spec in specs:
        v = cond_dict.get(spec.name)
        if v is None:
            inputs[spec.name] = None
        elif spec.type == "Espeak":
            texts, languages = v
            ids, _ = tokenize_phonemes(phonemize(list(texts), list(languages)))
            if pad_to_multiple > 1 and ids.shape[1] % pad_to_multiple:
                from zonos_tpu.text.symbols import PAD_ID

                L = -(-ids.shape[1] // pad_to_multiple) * pad_to_multiple
                padded = np.full((ids.shape[0], L), PAD_ID, ids.dtype)
                padded[:, L - ids.shape[1]:] = ids
                ids = padded
            inputs[spec.name] = ids
        elif spec.type == "Integer":
            inputs[spec.name] = np.asarray(v, dtype=np.int32).reshape(1, 1, -1)
        else:
            inputs[spec.name] = np.asarray(v, dtype=np.float32)
    return inputs
