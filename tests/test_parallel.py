"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""

import jax
import numpy as np
import pytest


def test_mesh_shapes():
    from zonos_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_dryrun_8dev():
    from zonos_tpu.parallel.dryrun import run_dryrun

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    run_dryrun(8)


def test_tp_matches_single_device():
    """A TP=2/DP=1 sharded forward must equal the unsharded forward."""
    import copy

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.backbone import transformer_forward
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.parallel.mesh import make_mesh
    from zonos_tpu.parallel.sharding import param_shardings, shard_params

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")

    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    cfg = ZonosConfig.from_dict(d)
    model = Zonos(cfg, seed=0)
    x = jax.random.normal(jax.random.key(1), (2, 6, 64), jnp.float32)

    ref = transformer_forward(cfg.backbone, model.params["backbone"], x)

    mesh = make_mesh(1, 2, jax.devices()[:2])
    sharded = shard_params(mesh, model.params)
    fn = jax.jit(
        lambda p, x: transformer_forward(cfg.backbone, p["backbone"], x),
        in_shardings=(param_shardings(mesh, model.params), NamedSharding(mesh, P())),
    )
    got = fn(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_sharded_generate_matches_single_device():
    """Zonos.shard(mesh): the full jitted generate under DP=2/TP=2 must
    produce the same greedy codes as the unsharded model."""
    import copy

    import jax.numpy as jnp

    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.sampling import SamplingParams
    from zonos_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")

    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    cfg = ZonosConfig.from_dict(d)
    B = 2
    prefix = jax.random.normal(jax.random.key(5), (2 * B, 4, 64), jnp.bfloat16)

    ref_model = Zonos(cfg, seed=0)
    mesh = make_mesh(2, 2, jax.devices()[:4])
    sharded_model = Zonos(cfg, seed=0).shard(mesh)

    # 1) numeric check without autoregressive cascade: the CFG logits of the
    # prefill's last position must agree between the sharded and unsharded
    # programs (bf16 TP all-reduce reorders sums -> tolerance, not equality;
    # comparing sampled AR *tokens* instead is flaky because one near-tie
    # argmax flip at any step rewrites every later token)
    from zonos_tpu.models.backbone import KVCache, transformer_prefill
    from zonos_tpu.models.tts import apply_heads, cfg_blend, embed_codes

    @jax.jit
    def prefill_logits(params):
        x = jnp.asarray(prefix, jnp.bfloat16)
        cache = KVCache.create(cfg.backbone, 2 * B, 16)
        hidden, _ = transformer_prefill(cfg.backbone, params["backbone"], x, cache)
        return cfg_blend(apply_heads(params, cfg, hidden[:, -1]), jnp.float32(2.0))

    ref_logits = np.asarray(prefill_logits(ref_model.params), np.float32)
    got_logits = np.asarray(prefill_logits(sharded_model.params), np.float32)
    np.testing.assert_allclose(got_logits, ref_logits, rtol=0.1, atol=0.15)

    # 2) the full sharded generate runs end-to-end with the right contract
    got = sharded_model.generate(prefix, batch_size=B, max_new_tokens=6, seed=3,
                                 sampling_params=SamplingParams.greedy(), progress_bar=False)
    assert len(got) == B
    for g in got:
        assert g.shape[0] == cfg.num_codebooks
        assert ((g >= 0) & (g < 1024)).all()



def _tiny_transformer():
    import copy

    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig

    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    return ZonosConfig.from_dict(d)


def test_tp_int8_matches_single_device():
    """TP=2 sharded int8 forward == unsharded int8 forward (quantized
    weights get structural specs: q/s shard with the out-features)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zonos_tpu.models.backbone import transformer_forward
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.parallel.mesh import make_mesh
    from zonos_tpu.parallel.sharding import param_shardings, shard_params

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")

    cfg = _tiny_transformer()
    model = Zonos(cfg, seed=0).quantize_int8()
    x = jax.random.normal(jax.random.key(1), (2, 6, 64), jnp.float32)

    ref = transformer_forward(cfg.backbone, model.params["backbone"], x)

    mesh = make_mesh(1, 2, jax.devices()[:2])
    sharded = shard_params(mesh, model.params)
    fn = jax.jit(
        lambda p, x: transformer_forward(cfg.backbone, p["backbone"], x),
        in_shardings=(param_shardings(mesh, model.params), NamedSharding(mesh, P())),
    )
    got = fn(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_hybrid_shard_generate():
    """Sharded hybrid model (attention/MLP TP, mamba replicated) generates."""
    import copy

    import jax.numpy as jnp

    from zonos_tpu.config import HYBRID_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.sampling import SamplingParams
    from zonos_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")

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
    mesh = make_mesh(1, 2, jax.devices()[:2])
    model = Zonos(ZonosConfig.from_dict(d), seed=0).shard(mesh)
    prefix = jnp.zeros((2, 4, 64), jnp.bfloat16)
    out = model.generate(prefix, max_new_tokens=6, seed=0,
                         sampling_params=SamplingParams.greedy(), progress_bar=False)
    assert out[0].shape[0] == 9
