"""int8/int4 weight-quantization tests: reconstruction error bounds and
end-to-end quantized generates."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.models.backbone import matmul_w, quantize_weight_int4, quantize_weight_int8


def test_quantized_matmul_close():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    q = quantize_weight_int8(w)
    ref = np.asarray(x @ w)
    got = np.asarray(matmul_w(x, q))
    # per-channel symmetric int8: relative error well under 2%
    denom = np.abs(ref).mean()
    assert np.abs(got - ref).mean() / denom < 0.02


def test_quantized_stacked_layers():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(3, 16, 32)).astype(np.float32))  # [L, in, out]
    q = quantize_weight_int8(w)
    assert q["q"].shape == (3, 16, 32) and q["s"].shape == (3, 32)
    x = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    for layer in range(3):
        ref = np.asarray(x @ w[layer])
        got = np.asarray(matmul_w(x, {"q": q["q"][layer], "s": q["s"][layer]}))
        assert np.abs(got - ref).mean() / np.abs(ref).mean() < 0.02


def test_int4_matmul_close():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(256, 96)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    q = quantize_weight_int4(w, group_size=64)
    # packed two nibbles per byte: half the rows, int8 storage
    assert q["q4"].dtype == jnp.int8
    assert q["q4"].shape == (128, 96) and q["s4"].shape == (4, 96)
    ref = np.asarray(x @ w)
    got = np.asarray(matmul_w(x, q))
    # group-wise symmetric int4 (range +-7): ~10.7% relative error on pure
    # gaussians (the worst case — no outlier structure for the group scales
    # to exploit); bound it at 12%
    assert np.abs(got - ref).mean() / np.abs(ref).mean() < 0.12


def test_int4_better_than_per_channel_scale():
    """Group scales must beat one whole-column int4 scale on outlier rows."""
    rng = np.random.default_rng(3)
    w = rng.normal(size=(256, 32)).astype(np.float32)
    w[7, :] *= 50.0  # an outlier row wrecks a per-column scale
    x = rng.normal(size=(8, 256)).astype(np.float32)
    ref = x @ w
    got_grouped = np.asarray(matmul_w(jnp.asarray(x), quantize_weight_int4(jnp.asarray(w), 32)))
    coarse = quantize_weight_int4(jnp.asarray(w), 128)
    got_coarse = np.asarray(matmul_w(jnp.asarray(x), coarse))
    err_g = np.abs(got_grouped - ref).mean()
    err_c = np.abs(got_coarse - ref).mean()
    assert err_g < err_c


def test_int4_generate_end_to_end():
    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.sampling import SamplingParams

    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    model = Zonos(ZonosConfig.from_dict(d), seed=0).quantize_int4(group_size=32)
    prefix = jnp.zeros((2, 4, 64), jnp.bfloat16)
    out = model.generate(prefix, max_new_tokens=6, seed=0,
                         sampling_params=SamplingParams.greedy(), progress_bar=False)
    assert out[0].shape[0] == 9
    assert ((out[0] >= 0) & (out[0] < 1024)).all()


def test_quantized_generate_end_to_end():
    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.sampling import SamplingParams

    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    model = Zonos(ZonosConfig.from_dict(d), seed=0).quantize_int8()
    prefix = jnp.zeros((2, 4, 64), jnp.bfloat16)
    out = model.generate(prefix, max_new_tokens=6, seed=0,
                         sampling_params=SamplingParams.greedy(), progress_bar=False)
    assert out[0].shape[0] == 9
    assert ((out[0] >= 0) & (out[0] < 1024)).all()


def test_hybrid_int8_generate_end_to_end():
    from zonos_tpu.config import HYBRID_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.sampling import SamplingParams

    d = copy.deepcopy(HYBRID_CONFIG_DICT)
    d["backbone"].update(
        {
            "d_model": 64,
            "n_layer": 4,
            "attn_layer_idx": [1, 3],
            "attn_mlp_d_intermediate": 128,
            "ssm_cfg": {"layer": "Mamba2", "d_state": 16, "expand": 2, "headdim": 16},
            "attn_cfg": {"num_heads": 4, "num_heads_kv": 2, "head_dim": 16, "rotary_emb_dim": 8},
        }
    )
    model = Zonos(ZonosConfig.from_dict(d), seed=0).quantize_int8()
    # every dense projection in every layer got the quantized form
    for lp in model.params["backbone"]["layers_list"]:
        for name in ("in_proj", "out_proj", "wqkv", "wo", "w1", "w2"):
            if name in lp:
                assert isinstance(lp[name], dict) and "q" in lp[name]
    prefix = jnp.zeros((2, 4, 64), jnp.bfloat16)
    out = model.generate(prefix, max_new_tokens=6, seed=0,
                         sampling_params=SamplingParams.greedy(), progress_bar=False)
    assert out[0].shape[0] == 9
    assert ((out[0] >= 0) & (out[0] < 1024)).all()


def test_hybrid_int8_matches_bf16_logits_closely():
    """Quantized hybrid decode should track the bf16 model (distribution-level)."""
    import jax

    from zonos_tpu.models.hybrid import (
        create_hybrid_cache,
        hybrid_prefill,
        init_hybrid_params,
    )
    from zonos_tpu.config import HYBRID_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.backbone import quantize_weight_int8

    d = copy.deepcopy(HYBRID_CONFIG_DICT)
    d["backbone"].update(
        {
            "d_model": 64,
            "n_layer": 4,
            "attn_layer_idx": [1, 3],
            "attn_mlp_d_intermediate": 128,
            "ssm_cfg": {"layer": "Mamba2", "d_state": 16, "expand": 2, "headdim": 16},
            "attn_cfg": {"num_heads": 4, "num_heads_kv": 2, "head_dim": 16, "rotary_emb_dim": 8},
        }
    )
    cfg = ZonosConfig.from_dict(d).backbone
    params = init_hybrid_params(jax.random.key(0), cfg, dtype=jnp.float32)
    qparams = {**params, "layers_list": []}
    for lp in params["layers_list"]:
        lp = dict(lp)
        for name in ("in_proj", "out_proj", "wqkv", "wo", "w1", "w2"):
            if name in lp:
                lp[name] = quantize_weight_int8(lp[name])
        qparams["layers_list"].append(lp)
    x = jax.random.normal(jax.random.key(1), (2, 7, 64), jnp.float32)
    cache = create_hybrid_cache(cfg, 2, 16, jnp.float32)
    h_ref, _ = hybrid_prefill(cfg, params, x, cache)
    h_q, _ = hybrid_prefill(cfg, qparams, x, cache)
    err = np.abs(np.asarray(h_q) - np.asarray(h_ref)).mean()
    scale = np.abs(np.asarray(h_ref)).mean() + 1e-6
    assert err / scale < 0.08
