"""End-to-end generation tests on a tiny random-weight model (CPU).

Without the real checkpoint (air-gapped test env) these validate the decode
machinery: shapes, determinism, EOS choreography, audio-prefix continuation,
and batch behavior — the contract of zonos/model.py:224-457.
"""

import copy

import jax
import numpy as np
import pytest

from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
from zonos_tpu.models.tts import Zonos
from zonos_tpu.ops.sampling import SamplingParams


def tiny_config() -> ZonosConfig:
    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    return ZonosConfig.from_dict(d)


@pytest.fixture(scope="module")
def model():
    return Zonos(tiny_config(), seed=0)


@pytest.fixture(scope="module")
def cond(model):
    from zonos_tpu.conditioning import make_cond_dict

    speaker = np.zeros((1, 1, 128), np.float32)
    return make_cond_dict(text="hello world", speaker=speaker, language="en-us")


def test_prepare_conditioning_shape(model, cond):
    prefix = model.prepare_conditioning(cond)
    assert prefix.ndim == 3
    assert prefix.shape[0] == 2  # cond + uncond
    assert prefix.shape[2] == model.config.backbone.d_model
    # uncond prefix is shorter than cond (espeak text dropped) but both are
    # padded/expanded to the same length? No: they are separate sequences
    # concatenated on batch, so lengths must match => the conditioner pads.
    # (cond and uncond differ only in which values are the learned vectors)


def test_generate_greedy_deterministic(model, cond):
    prefix = model.prepare_conditioning(cond)
    kw = dict(max_new_tokens=16, sampling_params=SamplingParams.greedy(), seed=7)
    a = model.generate(prefix, **kw)
    b = model.generate(prefix, **kw)
    assert len(a) == 1
    np.testing.assert_array_equal(a[0], b[0])
    assert a[0].shape[0] == 9
    assert a[0].shape[1] <= 16
    assert ((a[0] >= 0) & (a[0] < 1024)).all()


def test_generate_sampled(model, cond):
    prefix = model.prepare_conditioning(cond)
    out1 = model.generate(prefix, max_new_tokens=12, seed=1)
    out2 = model.generate(prefix, max_new_tokens=12, seed=2)
    assert out1[0].shape[0] == 9
    # different seeds should (overwhelmingly) give different tokens
    if out1[0].shape == out2[0].shape:
        assert not np.array_equal(out1[0], out2[0])


def test_generate_batch(model):
    from zonos_tpu.conditioning import make_cond_dict

    speaker = np.zeros((1, 1, 128), np.float32)
    cond = make_cond_dict(
        text=["hello world", "good morning"], language="en-us", speaker=speaker
    )
    prefix = model.prepare_conditioning(cond)
    assert prefix.shape[0] == 4  # 2 * batch 2
    out = model.generate(prefix, batch_size=2, max_new_tokens=10, seed=3)
    assert len(out) == 2
    for codes in out:
        assert codes.shape[0] == 9


def test_audio_prefix_continuation(model, cond):
    prefix = model.prepare_conditioning(cond)
    rng = np.random.default_rng(0)
    audio_prefix = rng.integers(0, 1024, size=(1, 9, 5)).astype(np.int32)
    out = model.generate(
        prefix,
        audio_prefix_codes=audio_prefix,
        max_new_tokens=8,
        sampling_params=SamplingParams.greedy(),
        seed=5,
    )
    # prefix frames are trimmed from the output (ref model.py:451)
    assert out[0].shape[1] <= 8


def test_eos_trimming_semantics(model, cond):
    """Outputs never contain EOS/mask ids (masked to 0, ref model.py:448)."""
    prefix = model.prepare_conditioning(cond)
    out = model.generate(prefix, max_new_tokens=20, seed=11)
    assert (out[0] < 1024).all() and (out[0] >= 0).all()


def test_cache_growth_matches_full_allocation():
    """Greedy decode with bucketed cache growth is bit-identical to the
    full-size cache (masked validity; -inf scores weigh exactly zero)."""
    import copy

    import jax.numpy as jnp

    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.sampling import SamplingParams

    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    model = Zonos(ZonosConfig.from_dict(d), seed=0)
    prefix = jax.random.normal(jax.random.key(2), (2, 4, 64), jnp.bfloat16)
    kw = dict(max_new_tokens=400, seed=11,
              sampling_params=SamplingParams.greedy(), progress_bar=False)
    ref = model.generate(prefix, cache_growth=False, **kw)
    got = model.generate(prefix, cache_growth=True, **kw)
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_callback_sees_finishing_chunk(model, cond):
    """The step callback must run for the chunk in which generation ends
    (the reference calls it on every step including the last,
    zonos/model.py:430-432) — a consumer tracking completion through it
    must observe done == max_steps."""
    prefix = model.prepare_conditioning(cond)
    calls = []

    def cb(frame, done, max_steps):
        calls.append((done, max_steps))
        return True

    # step_limits=10 finishes inside the first 32-step chunk
    model.generate(prefix, max_new_tokens=86, seed=5, step_limits=10,
                   progress_bar=False, callback=cb)
    assert calls, "callback never invoked"
    assert calls[-1][0] == calls[-1][1], f"final callback saw {calls[-1]}"


def test_default_cache_growth_heuristic():
    """Growth defaults on for long sequences at any batch and for batch >= 8
    past the first bucket; off where cache reads are a rounding error
    (batch 1, short budgets) — docs/PERFORMANCE.md has the measurements."""
    from zonos_tpu.models.tts import default_cache_growth

    assert default_cache_growth(2688, batch_size=1)  # 30-s generation
    assert default_cache_growth(960, batch_size=8)  # 10-s utterance, batch 8
    assert default_cache_growth(960, batch_size=64)
    assert not default_cache_growth(960, batch_size=1)  # weight-stream bound
    assert not default_cache_growth(384, batch_size=64)  # fits first bucket
    assert not default_cache_growth(128, batch_size=1)
    # hybrid: SSM states dominate; only grow where it bounds allocation
    assert not default_cache_growth(960, batch_size=64, is_transformer=False)
    assert default_cache_growth(2688, batch_size=1, is_transformer=False)


def test_step_limits_per_sample():
    """Traced per-sample duration caps: one compiled program serves mixed
    durations; each sample's codes match the uncapped run's prefix (greedy
    lockstep) and are trimmed to its own cap."""
    import copy

    import jax.numpy as jnp

    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.sampling import SamplingParams

    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    model = Zonos(ZonosConfig.from_dict(d), seed=0)
    B = 2
    prefix = jax.random.normal(jax.random.key(3), (2 * B, 4, 64), jnp.bfloat16)
    kw = dict(batch_size=B, max_new_tokens=40, seed=5,
              sampling_params=SamplingParams.greedy(), progress_bar=False)
    full = model.generate(prefix, **kw)
    capped = model.generate(prefix, step_limits=[12, 30], **kw)
    assert capped[0].shape[1] <= 12 and capped[1].shape[1] <= 30
    for f, c in zip(full, capped):
        n = c.shape[1]
        np.testing.assert_array_equal(f[:, :n], c)


def test_cfg_free_fast_path_matches_cfg_program():
    """cfg_scale=1.0 statically drops the uncond half (GenerateStatics.
    use_cfg=False).  With the uncond prefix rows set EQUAL to the cond rows,
    the full CFG program's blend is bitwise the cond logits at any scale —
    so the fast path must produce identical codes while running half the
    rows."""
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.sampling import SamplingParams

    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    model = Zonos(ZonosConfig.from_dict(d), seed=0)
    B = 2
    cond = jax.random.normal(jax.random.key(7), (B, 5, 64), jnp.bfloat16)
    prefix = jnp.concatenate([cond, cond], axis=0)
    kw = dict(batch_size=B, max_new_tokens=16, seed=9, progress_bar=False,
              sampling_params=SamplingParams.greedy())
    ref = model.generate(prefix, cfg_scale=2.0, **kw)
    fast = model.generate(prefix, cfg_scale=1.0, **kw)
    assert len(ref) == len(fast) == B
    for r, f in zip(ref, fast):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(f))


def test_cfg_free_fast_path_hybrid():
    """Same static drop on the hybrid backbone (half the SSM state rows)."""
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    from zonos_tpu.config import HYBRID_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.ops.sampling import SamplingParams

    d = copy.deepcopy(HYBRID_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 4, "attn_layer_idx": [1, 3],
         "attn_mlp_d_intermediate": 128,
         "ssm_cfg": {"layer": "Mamba2", "d_state": 16, "expand": 2, "headdim": 16},
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2, "head_dim": 16,
                      "rotary_emb_dim": 8}}
    )
    model = Zonos(ZonosConfig.from_dict(d), seed=0)
    cond = jax.random.normal(jax.random.key(3), (1, 5, 64), jnp.bfloat16)
    prefix = jnp.concatenate([cond, cond], axis=0)
    kw = dict(max_new_tokens=10, seed=4, progress_bar=False,
              sampling_params=SamplingParams.greedy())
    ref = model.generate(prefix, cfg_scale=2.0, **kw)
    fast = model.generate(prefix, cfg_scale=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(fast[0]))


def test_ban_eos_pins_exact_length(model):
    """Fixed-length mode (bench determinism, r4 verdict #1): with
    ``SamplingParams(ban_eos=True)`` every sample generates exactly its step
    budget — EOS is statically -inf in both the prefill sample and the
    decode-loop bias, so RTF rows no longer depend on sampled EOS luck."""
    B = 3
    prefix = jax.random.normal(
        jax.random.key(5), (2 * B, 8, model.config.backbone.d_model))
    out = model.generate(
        prefix, max_new_tokens=24, batch_size=B, seed=11, progress_bar=False,
        sampling_params=SamplingParams(ban_eos=True))
    assert [o.shape for o in out] == [(9, 24)] * B
    eos = model.config.eos_token_id
    for o in out:
        assert not (o == eos).any()
