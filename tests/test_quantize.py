"""int8 weight-quantization tests: reconstruction error bound and an
end-to-end quantized generate."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.models.backbone import matmul_w, quantize_weight_int8


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
