"""Checkpoint tests: reference-format safetensors conversion round-trip and
orbax train-state save/resume."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_cfg():
    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig

    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    return ZonosConfig.from_dict(d)


def _fake_reference_state_dict(cfg):
    """Build a reference-shaped safetensors state dict with random values."""
    rng = np.random.default_rng(0)
    d = cfg.backbone.d_model
    H, Hkv = 4, 2
    hd = d // H
    inter = cfg.backbone.attn_mlp_d_intermediate
    sd = {}
    for i in range(cfg.backbone.n_layer):
        p = f"backbone.layers.{i}."
        sd[p + "norm.weight"] = rng.normal(size=(d,))
        sd[p + "norm.bias"] = rng.normal(size=(d,))
        sd[p + "mixer.in_proj.weight"] = rng.normal(size=((H + 2 * Hkv) * hd, d))
        sd[p + "mixer.out_proj.weight"] = rng.normal(size=(d, H * hd))
        sd[p + "norm2.weight"] = rng.normal(size=(d,))
        sd[p + "norm2.bias"] = rng.normal(size=(d,))
        sd[p + "mlp.fc1.weight"] = rng.normal(size=(2 * inter, d))
        sd[p + "mlp.fc2.weight"] = rng.normal(size=(d, inter))
    sd["backbone.norm_f.weight"] = rng.normal(size=(d,))
    sd["backbone.norm_f.bias"] = rng.normal(size=(d,))
    for k in range(9):
        sd[f"embeddings.{k}.weight"] = rng.normal(size=(1026, d))
        sd[f"heads.{k}.weight"] = rng.normal(size=(1025, d))
    # prefix conditioner pieces for the canonical conditioner list
    sd["prefix_conditioner.norm.weight"] = rng.normal(size=(d,))
    sd["prefix_conditioner.norm.bias"] = rng.normal(size=(d,))
    names = ["espeak", "speaker", "emotion", "fmax", "pitch_std", "speaking_rate", "language_id"]
    for j, name in enumerate(names):
        p = f"prefix_conditioner.conditioners.{j}."
        if name == "espeak":
            from zonos_tpu.text.symbols import SYMBOL_VOCAB_SIZE

            sd[p + "phoneme_embedder.weight"] = rng.normal(size=(SYMBOL_VOCAB_SIZE, d))
        elif name == "speaker":
            sd[p + "project.weight"] = rng.normal(size=(d, 128))
            sd[p + "project.bias"] = rng.normal(size=(d,))
            sd[p + "uncond_vector"] = rng.normal(size=(d,))
        elif name == "language_id":
            sd[p + "int_embedder.weight"] = rng.normal(size=(128, d))
            sd[p + "uncond_vector"] = rng.normal(size=(d,))
        else:
            dim = {"emotion": 8}.get(name, 1)
            sd[p + "weight"] = rng.normal(size=(d // 2, dim))
            sd[p + "uncond_vector"] = rng.normal(size=(d,))
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_safetensors_conversion_round_trip(tmp_path):
    from safetensors.numpy import save_file

    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.utils.checkpoint import load_zonos_checkpoint

    cfg = _tiny_cfg()
    sd = _fake_reference_state_dict(cfg)
    path = str(tmp_path / "model.safetensors")
    save_file(sd, path)

    params = load_zonos_checkpoint(cfg, path)
    # shape checks against the runtime pytree
    model = Zonos(cfg, params=params)
    ref_shapes = jax.tree.map(lambda x: x.shape, Zonos(cfg, seed=0).params)
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes
    # loaded values survive: head column for codebook 0 equals sd transpose
    Vp = cfg.padded_vocab_size
    heads = np.asarray(params["heads"], np.float32)
    np.testing.assert_allclose(
        heads[:, :1025], sd["heads.0.weight"].T, rtol=1e-2, atol=1e-2
    )
    # padded vocab region is zero
    assert (heads[:, 1026:Vp] == 0).all()
    # the model generates with the loaded weights
    prefix = jnp.zeros((2, 4, cfg.backbone.d_model), jnp.bfloat16)
    out = model.generate(prefix, max_new_tokens=4, seed=0, progress_bar=False)
    assert out[0].shape[0] == 9


def test_orbax_train_state_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    import optax

    from zonos_tpu.utils.train_state import restore_train_state, save_train_state

    params = {"w": jnp.arange(8, dtype=jnp.float32), "b": jnp.ones((2,), jnp.float32)}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    save_train_state(str(tmp_path / "ckpt"), 5, params, opt_state)

    out = restore_train_state(str(tmp_path / "ckpt"), params, opt_state)
    assert out is not None
    step, p2, os2 = out
    assert step == 5
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(params["w"]))


def _tiny_hybrid_cfg():
    from zonos_tpu.config import HYBRID_CONFIG_DICT, ZonosConfig

    d = copy.deepcopy(HYBRID_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_layer_idx": [1],
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2, "head_dim": 16}}
    )
    return ZonosConfig.from_dict(d)


def test_hybrid_safetensors_conversion_round_trip(tmp_path):
    """mamba_ssm-layout hybrid checkpoint -> JAX pytree -> generate."""
    from safetensors.numpy import save_file

    from zonos_tpu.models.hybrid import _dims
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.utils.checkpoint import load_zonos_checkpoint

    cfg = _tiny_hybrid_cfg()
    bb = cfg.backbone
    d, d_inner, H, G, N, K, conv_dim = _dims(bb)
    rng = np.random.default_rng(1)
    sd = {}
    for i in range(bb.n_layer):
        p = f"backbone.layers.{i}."
        sd[p + "norm.weight"] = rng.normal(size=(d,))
        if i == 1:  # attention layer
            aH, aHkv, ahd = 4, 2, 16
            sd[p + "mixer.in_proj.weight"] = rng.normal(size=((aH + 2 * aHkv) * ahd, d))
            sd[p + "mixer.out_proj.weight"] = rng.normal(size=(d, aH * ahd))
        else:  # Mamba2 mixer
            zxbcdt = d_inner + conv_dim + H
            sd[p + "mixer.in_proj.weight"] = rng.normal(size=(zxbcdt, d))
            sd[p + "mixer.conv1d.weight"] = rng.normal(size=(conv_dim, 1, K))
            sd[p + "mixer.conv1d.bias"] = rng.normal(size=(conv_dim,))
            sd[p + "mixer.A_log"] = rng.normal(size=(H,))
            sd[p + "mixer.D"] = rng.normal(size=(H,))
            sd[p + "mixer.dt_bias"] = rng.normal(size=(H,))
            sd[p + "mixer.norm.weight"] = rng.normal(size=(d_inner,))
            sd[p + "mixer.out_proj.weight"] = rng.normal(size=(d, d_inner))
    sd["backbone.norm_f.weight"] = rng.normal(size=(d,))
    base = _fake_reference_state_dict(_tiny_cfg())
    for k, v in base.items():  # embeddings / heads / conditioners are shared
        if not k.startswith("backbone."):
            sd[k] = v
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    path = str(tmp_path / "model.safetensors")
    save_file(sd, path)
    params = load_zonos_checkpoint(cfg, path)
    model = Zonos(cfg, params=params)
    prefix = jnp.zeros((2, 4, d), jnp.bfloat16)
    out = model.generate(prefix, max_new_tokens=4, seed=0, progress_bar=False)
    assert out[0].shape[0] == 9


def test_sharded_checkpoint_load(tmp_path):
    """mesh= places every converted tensor under its serving sharding, and
    the values match an unsharded load."""
    import pytest
    from safetensors.numpy import save_file

    from zonos_tpu.parallel.mesh import make_mesh
    from zonos_tpu.utils.checkpoint import load_zonos_checkpoint

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")

    cfg = _tiny_cfg()
    sd = _fake_reference_state_dict(cfg)
    path = str(tmp_path / "model.safetensors")
    save_file(sd, path)

    mesh = make_mesh(1, 2, jax.devices()[:2])
    sharded = load_zonos_checkpoint(cfg, path, mesh=mesh)
    plain = load_zonos_checkpoint(cfg, path)

    # TP weights actually sharded over "model"
    wqkv = sharded["backbone"]["layers"]["wqkv"]
    assert "model" in wqkv.sharding.spec
    # one device holds only half the columns of a column-parallel weight
    shard = wqkv.addressable_shards[0]
    assert shard.data.shape[-1] == wqkv.shape[-1] // 2

    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32)),
        sharded, plain,
    )
    assert all(jax.tree.leaves(same))


def _hyb_tiny_cfg():
    from zonos_tpu.config import HYBRID_CONFIG_DICT, ZonosConfig

    d = copy.deepcopy(HYBRID_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 4, "attn_layer_idx": [1, 3],
         "attn_mlp_d_intermediate": 128,
         "ssm_cfg": {"layer": "Mamba2", "d_state": 16, "expand": 2, "headdim": 16},
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2, "head_dim": 16,
                      "rotary_emb_dim": 8}}
    )
    return ZonosConfig.from_dict(d)


@pytest.mark.parametrize("which", ["transformer", "hybrid"])
def test_export_reference_checkpoint_round_trip(tmp_path, which):
    """Export runtime params to the reference format, reload them through the
    forward converter, and require bit-identical bf16 weights — the
    train-here/run-in-the-reference interop path."""
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.utils.checkpoint import (
        export_state_dict,
        export_zonos_checkpoint,
        load_zonos_checkpoint,
    )

    cfg = _tiny_cfg() if which == "transformer" else _hyb_tiny_cfg()
    model = Zonos(cfg, seed=5)
    path = export_zonos_checkpoint(cfg, model.params, tmp_path / "export")
    assert (tmp_path / "export" / "config.json").exists()

    # config.json round-trips through the reference schema
    from zonos_tpu.config import ZonosConfig

    cfg2 = ZonosConfig.from_json(str(tmp_path / "export" / "config.json"))
    assert cfg2.backbone == cfg.backbone

    reloaded = load_zonos_checkpoint(cfg, str(path))
    sd1 = export_state_dict(cfg, model.params)
    sd2 = export_state_dict(cfg, reloaded)
    assert set(sd1) == set(sd2)
    bf16 = jnp.bfloat16
    for k in sd1:
        # the export contract is bf16 (the reference's dtype): fp32 runtime
        # leaves (e.g. Fourier buffers) round once on export, then round-trip
        np.testing.assert_array_equal(
            np.asarray(sd1[k].astype(bf16), np.float32), sd2[k], err_msg=k)


def test_exported_checkpoint_loads_into_zonos(tmp_path):
    """from_local on an exported dir must produce identical generations."""
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.utils.checkpoint import export_zonos_checkpoint

    cfg = _tiny_cfg()
    model = Zonos(cfg, seed=7)
    export_zonos_checkpoint(cfg, model.params, tmp_path / "ck")
    model2 = Zonos.from_local(str(tmp_path / "ck" / "config.json"),
                              str(tmp_path / "ck" / "model.safetensors"))
    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(model2.params)):
        # export rounds fp32 runtime leaves (Fourier buffers) to bf16 once
        np.testing.assert_array_equal(
            np.asarray(jnp.asarray(a).astype(jnp.bfloat16), np.float32),
            np.asarray(b, np.float32))
