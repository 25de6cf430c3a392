"""Conditioning-system tests: Fourier/Integer/Passthrough math oracles,
PrefixConditioner assembly, make_cond_dict semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_tpu.conditioning import (
    ConditionerSpec,
    build_specs,
    conditioner_forward,
    init_conditioner_params,
    make_cond_dict,
    prepare_cond_inputs,
    required_keys,
)
from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig


def test_fourier_oracle():
    """cos/sin random-feature encoding with min/max normalization
    (math of zonos/conditioning.py:318-337)."""
    spec = ConditionerSpec("Fourier", "pitch", 16, "none", True,
                           input_dim=1, min_val=0.0, max_val=400.0)
    params = init_conditioner_params(jax.random.key(0), spec, 16)
    x = np.array([[[100.0]]], np.float32)
    out = np.asarray(conditioner_forward(params, spec, jnp.asarray(x)), np.float32)
    W = np.asarray(params["weight"], np.float32)  # [8, 1]
    f = 2 * np.pi * (x / 400.0) @ W.T
    expect = np.concatenate([np.cos(f), np.sin(f)], axis=-1)
    np.testing.assert_allclose(out, expect, rtol=2e-2, atol=2e-2)  # bf16 cast


def test_integer_embedding_offset():
    spec = ConditionerSpec("Integer", "lang", 8, "none", True, int_min=-1, int_max=5)
    params = init_conditioner_params(jax.random.key(1), spec, 8)
    v = np.array([[[2]]], np.int32)
    out = conditioner_forward(params, spec, jnp.asarray(v))
    np.testing.assert_array_equal(
        np.asarray(out)[0, 0], np.asarray(params["embed"])[3]  # 2 - (-1) = row 3
    )


def test_uncond_vector_used_when_missing():
    spec = ConditionerSpec("Fourier", "emotion", 8, "none", True, input_dim=8)
    params = init_conditioner_params(jax.random.key(2), spec, 8)
    out = conditioner_forward(params, spec, None)
    assert out.shape == (1, 1, 8)
    np.testing.assert_array_equal(np.asarray(out)[0, 0], np.asarray(params["uncond_vector"]))


def test_required_keys_match_reference_semantics():
    cfg = ZonosConfig.from_dict(TRANSFORMER_CONFIG_DICT)
    specs = build_specs(cfg.prefix_conditioner, cfg.backbone.d_model)
    # only conditioners WITHOUT a learned uncond vector are required
    assert required_keys(specs) == {"espeak"}


def test_make_cond_dict_emotion_normalized():
    cond = make_cond_dict(text="x", unconditional_keys=frozenset())
    np.testing.assert_allclose(cond["emotion"].sum(), 1.0, rtol=1e-6)
    assert cond["emotion"].shape == (1, 1, 8)


def test_make_cond_dict_drops_unconditional():
    cond = make_cond_dict(text="x", unconditional_keys={"emotion", "pitch_std"})
    assert "emotion" not in cond and "pitch_std" not in cond
    assert "espeak" in cond


def test_prepare_inputs_tokenizes_text():
    cfg = ZonosConfig.from_dict(TRANSFORMER_CONFIG_DICT)
    specs = build_specs(cfg.prefix_conditioner, cfg.backbone.d_model)
    cond = make_cond_dict(text=["hi", "hello there"], speaker=np.zeros((1, 1, 128), np.float32))
    inputs = prepare_cond_inputs(specs, cond)
    ids = inputs["espeak"]
    assert ids.ndim == 2 and ids.shape[0] == 2
    assert inputs["speaker"].shape == (1, 1, 128)


def test_missing_required_key_raises():
    cfg = ZonosConfig.from_dict(TRANSFORMER_CONFIG_DICT)
    specs = build_specs(cfg.prefix_conditioner, cfg.backbone.d_model)
    with pytest.raises(ValueError, match="espeak"):
        prepare_cond_inputs(specs, {"speaker": np.zeros((1, 1, 128), np.float32)})
