"""Data-pipeline tests: manifests, code cache, bucketing/padding, loader
determinism, conditioned training end-to-end, and the train CLI."""

import copy
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_tpu.audio.io import save_audio
from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
from zonos_tpu.data import (
    BatchSpec,
    CodesCache,
    PrefetchLoader,
    assemble_batch,
    iter_epoch_batches,
    prepare_examples,
    read_manifest,
    scan_dir,
    scan_ljspeech,
)
from zonos_tpu.models.dac import DACAutoencoder
from zonos_tpu.models.dac.codec import DACConfig, init_dac_params
from zonos_tpu.models.tts import Zonos
from zonos_tpu.text.symbols import PAD_ID

TINY_DAC = DACConfig(
    encoder_hidden_size=8,
    downsampling_ratios=(2, 4),
    decoder_hidden_size=16,
    n_codebooks=9,
    codebook_size=16,
    codebook_dim=4,
    sampling_rate=8000,
)

TINY_TTS = ZonosConfig.from_dict(
    {
        **copy.deepcopy(TRANSFORMER_CONFIG_DICT),
        "backbone": {
            **copy.deepcopy(TRANSFORMER_CONFIG_DICT["backbone"]),
            "d_model": 64,
            "n_layer": 2,
            "attn_mlp_d_intermediate": 128,
            "attn_cfg": {"num_heads": 4, "num_heads_kv": 2},
        },
    }
)

def _tiny_dac():
    import jax

    return DACAutoencoder(params=init_dac_params(jax.random.key(0), TINY_DAC),
                          cfg=TINY_DAC)


TEXTS = [
    "hello world",
    "the quick brown fox",
    "testing one two three",
    "a longer sentence to make the phoneme lengths differ quite a bit more",
    "short",
]


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """LJSpeech-layout dataset of short sine clips at 8 kHz."""
    root = tmp_path_factory.mktemp("ljs")
    (root / "wavs").mkdir()
    rows = []
    rng = np.random.default_rng(0)
    for i, text in enumerate(TEXTS):
        n = 8000 // 4 + i * 512  # 0.25-0.5 s, varied lengths
        t = np.arange(n) / 8000.0
        wav = 0.3 * np.sin(2 * np.pi * (110 + 50 * i) * t) + 0.01 * rng.normal(size=n)
        save_audio(str(root / "wavs" / f"clip{i}.wav"), wav.astype(np.float32), 8000)
        rows.append(f"clip{i}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")
    return root


@pytest.fixture(scope="module")
def prepared(dataset_dir, tmp_path_factory):
    cache_dir = tmp_path_factory.mktemp("codes")
    dac = _tiny_dac()
    cache = CodesCache(dac, cache_dir, codec_tag="tiny")
    examples = scan_ljspeech(dataset_dir)
    out = prepare_examples(examples, cache, frame_rate=TINY_DAC.sampling_rate / 8)
    assert cache.encode_calls == len(TEXTS)
    return out


def test_scan_ljspeech(dataset_dir):
    ex = scan_ljspeech(dataset_dir)
    assert len(ex) == len(TEXTS)
    assert ex[0].text == TEXTS[0]
    assert ex[0].audio.endswith("clip0.wav")


def test_scan_dir_and_manifest(tmp_path, dataset_dir):
    # wav+txt sidecar layout
    import shutil

    for i in range(2):
        shutil.copy(dataset_dir / "wavs" / f"clip{i}.wav", tmp_path / f"c{i}.wav")
        (tmp_path / f"c{i}.txt").write_text(TEXTS[i])
    ex = scan_dir(tmp_path)
    assert [e.text for e in ex] == TEXTS[:2]

    # jsonl manifest with relative paths and overrides
    man = tmp_path / "data.jsonl"
    man.write_text(
        json.dumps({"audio": "c0.wav", "text": "hi", "speaking_rate": 12.5}) + "\n"
        + json.dumps({"audio": "c1.wav", "text": "yo", "language": "de"}) + "\n"
    )
    ex = read_manifest(man)
    assert ex[0].speaking_rate == 12.5
    assert ex[1].language == "de"
    assert ex[0].audio == str(tmp_path / "c0.wav")


def test_codes_cache_hits(dataset_dir, tmp_path):
    dac = _tiny_dac()
    cache = CodesCache(dac, tmp_path, codec_tag="tiny")
    p = str(dataset_dir / "wavs" / "clip0.wav")
    c1 = cache.encode_file(p)
    assert cache.encode_calls == 1
    c2 = cache.encode_file(p)
    assert cache.encode_calls == 1  # second call served from disk
    np.testing.assert_array_equal(c1, c2)
    assert c1.shape[0] == 9 and c1.dtype == np.int32

    # different codec tag = different namespace -> re-encodes
    cache_b = CodesCache(dac, tmp_path, codec_tag="other")
    cache_b.encode_file(p)
    assert cache_b.encode_calls == 1


def test_prepare_examples(prepared):
    assert len(prepared) == len(TEXTS)
    for p in prepared:
        assert p.phonemes.ndim == 1 and p.phonemes.dtype == np.int32
        assert p.codes.shape[0] == 9
        assert p.speaker is None
        rate = p.values["speaking_rate"]
        assert rate.shape == (1, 1) and 0 < rate[0, 0] <= 40
        assert p.values["emotion"].shape == (1, 8)
        np.testing.assert_allclose(p.values["emotion"].sum(), 1.0, rtol=1e-5)
        assert p.values["language_id"].dtype == np.int32


def test_prepare_examples_skips_unphonemizable_row(dataset_dir, tmp_path):
    """One row whose phonemization raises (Thai script, builtin G2P) must not
    abort the batch when on_error='skip': the batched fast path falls back to
    per-row phonemization and only the bad row is dropped."""
    from zonos_tpu.data import TrainExample

    cache = CodesCache(_tiny_dac(), tmp_path, codec_tag="tiny")
    wav = str(dataset_dir / "wavs" / "clip0.wav")
    examples = [
        TrainExample(audio=wav, text="hello world", language="en-us"),
        TrainExample(audio=wav, text="สวัสดี", language="th"),  # raises ValueError
        TrainExample(audio=wav, text="good morning", language="en-us"),
    ]
    out = prepare_examples(examples, cache,
                           frame_rate=TINY_DAC.sampling_rate / 8, on_error="skip")
    assert len(out) == 2
    with pytest.raises(ValueError):
        prepare_examples(examples, cache,
                         frame_rate=TINY_DAC.sampling_rate / 8, on_error="raise")


def test_assemble_batch_padding(prepared):
    model = Zonos(TINY_TTS, seed=0)
    bs = BatchSpec(batch_size=3, phoneme_bucket=16, code_bucket=8)
    batch = assemble_batch(prepared[:3], model.specs, TINY_TTS.masked_token_id, bs)
    ph = batch["cond_inputs"]["espeak"]
    codes = batch["codes"]
    assert ph.shape[0] == 3 and ph.shape[1] % 16 == 0
    assert codes.shape[:2] == (3, 9) and codes.shape[2] % 8 == 0
    # left-padded phonemes: padding at the front only
    for i, p in enumerate(prepared[:3]):
        n = len(p.phonemes)
        np.testing.assert_array_equal(ph[i, ph.shape[1] - n:], p.phonemes)
        assert (ph[i, : ph.shape[1] - n] == PAD_ID).all()
        # right-padded codes with the mask token
        t = p.codes.shape[-1]
        np.testing.assert_array_equal(codes[i, :, :t], p.codes)
        assert (codes[i, :, t:] == TINY_TTS.masked_token_id).all()
    # spec-driven conditioning inputs
    assert batch["cond_inputs"]["speaker"] is None
    assert batch["cond_inputs"]["speaking_rate"].shape == (3, 1, 1)
    assert batch["cond_inputs"]["emotion"].shape == (3, 1, 8)


def test_assemble_batch_eos_frame(prepared):
    model = Zonos(TINY_TTS, seed=0)
    bs = BatchSpec(batch_size=3, phoneme_bucket=16, code_bucket=8,
                   eos_token_id=TINY_TTS.eos_token_id)
    batch = assemble_batch(prepared[:3], model.specs, TINY_TTS.masked_token_id, bs)
    codes = batch["codes"]
    for i, p in enumerate(prepared[:3]):
        t = p.codes.shape[-1]
        np.testing.assert_array_equal(codes[i, :, :t], p.codes)
        assert (codes[i, :, t] == TINY_TTS.eos_token_id).all()
        assert (codes[i, :, t + 1:] == TINY_TTS.masked_token_id).all()


def test_epoch_batches_deterministic_and_complete(prepared):
    model = Zonos(TINY_TTS, seed=0)
    bs = BatchSpec(batch_size=2, phoneme_bucket=16, code_bucket=8)
    a = list(iter_epoch_batches(prepared, model.specs, TINY_TTS.masked_token_id, bs,
                                seed=7, epoch=0))
    b = list(iter_epoch_batches(prepared, model.specs, TINY_TTS.masked_token_id, bs,
                                seed=7, epoch=0))
    c = list(iter_epoch_batches(prepared, model.specs, TINY_TTS.masked_token_id, bs,
                                seed=7, epoch=1))
    assert len(a) == -(-len(prepared) // 2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["codes"], y["codes"])
    assert any(not np.array_equal(x["codes"], y["codes"]) for x, y in zip(a, c))
    # every batch is full-size (trailing batch wrapped)
    assert all(x["codes"].shape[0] == 2 for x in a)


def test_prefetch_loader_matches_sync_batches(prepared):
    model = Zonos(TINY_TTS, seed=0)
    bs = BatchSpec(batch_size=2, phoneme_bucket=16, code_bucket=8)
    sync = list(iter_epoch_batches(prepared, model.specs, TINY_TTS.masked_token_id,
                                   bs, seed=3, epoch=0))
    loader = PrefetchLoader(prepared, model.specs, TINY_TTS.masked_token_id, bs, seed=3)
    got = []
    for step, batch in loader:
        got.append((step, batch))
        if len(got) == len(sync) + 1:
            break
    loader.stop()
    assert [s for s, _ in got] == list(range(len(sync) + 1))
    for (_, x), y in zip(got[: len(sync)], sync):
        np.testing.assert_array_equal(x["codes"], y["codes"])
        np.testing.assert_array_equal(x["cond_inputs"]["espeak"], y["cond_inputs"]["espeak"])


def test_loader_start_step_resume(prepared):
    model = Zonos(TINY_TTS, seed=0)
    bs = BatchSpec(batch_size=2, phoneme_bucket=16, code_bucket=8)

    def take(loader, n):
        out = []
        for step, batch in loader:
            out.append((step, batch["codes"]))
            if len(out) == n:
                break
        loader.stop()
        return out

    full = take(PrefetchLoader(prepared, model.specs, TINY_TTS.masked_token_id, bs,
                               seed=3), 6)
    resumed = take(PrefetchLoader(prepared, model.specs, TINY_TTS.masked_token_id, bs,
                                  seed=3, start_step=4), 2)
    assert [s for s, _ in resumed] == [4, 5]
    for (s, c), (s2, c2) in zip(resumed, full[4:]):
        assert s == s2
        np.testing.assert_array_equal(c, c2)


def test_conditioned_train_step(prepared):
    from zonos_tpu.parallel.train import make_conditioned_train_step, make_optimizer

    model = Zonos(TINY_TTS, seed=0)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        model.params,
    )
    bs = BatchSpec(batch_size=4, phoneme_bucket=16, code_bucket=8)
    batch = assemble_batch(prepared[:4], model.specs, TINY_TTS.masked_token_id, bs)

    opt = make_optimizer(lr=1e-3)
    step = jax.jit(make_conditioned_train_step(TINY_TTS, model.specs, opt, uncond_p=0.3))
    opt_state = opt.init(params)
    key = jax.random.key(0)
    losses = []
    for i in range(5):
        params, opt_state, loss = step(params, opt_state, batch["cond_inputs"],
                                       jnp.asarray(batch["codes"]),
                                       jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_cfg_dropout_trains_uncond_vectors(prepared):
    """With uncond_p=1 every droppable conditioner uses its uncond vector, so
    those vectors must receive gradient; with uncond_p=0 they must not."""
    from zonos_tpu.parallel.train import conditioned_loss

    model = Zonos(TINY_TTS, seed=0)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        model.params,
    )
    bs = BatchSpec(batch_size=4, phoneme_bucket=16, code_bucket=8)
    batch = assemble_batch(prepared[:4], model.specs, TINY_TTS.masked_token_id, bs)
    codes = jnp.asarray(batch["codes"])
    key = jax.random.key(1)

    def grad_of_uncond(p_drop):
        g = jax.grad(
            lambda p: conditioned_loss(TINY_TTS, model.specs, p,
                                       batch["cond_inputs"], codes,
                                       drop_key=key, uncond_p=p_drop)
        )(params)
        return g["prefix_conditioner"]["emotion"]["uncond_vector"]

    assert float(jnp.abs(grad_of_uncond(1.0)).sum()) > 0
    assert float(jnp.abs(grad_of_uncond(0.0)).sum()) == 0


def test_train_cli_end_to_end(dataset_dir, tmp_path):
    """Smoke the whole driver: tiny model, 4 steps, checkpoint, resume."""
    import zonos_tpu.apps.train_cli as tc
    from zonos_tpu.models import tts as tts_mod

    # patch the tiny model's DAC so encoding stays fast
    orig = tts_mod.Zonos.autoencoder
    dac = _tiny_dac()
    try:
        tts_mod.Zonos.autoencoder = property(lambda self: dac)
        common = [
            "--ljspeech", str(dataset_dir), "--tiny", "--batch", "2",
            "--lr", "1e-3", "--warmup", "0", "--log_every", "2",
            "--cache_dir", str(tmp_path / "cache"),
            "--ckpt_dir", str(tmp_path / "ck"), "--ckpt_every", "2",
            "--phoneme_bucket", "16", "--code_bucket", "8",
        ]
        tc.main(common + ["--steps", "2"])
        assert (tmp_path / "ck").exists()
        tc.main(common + ["--steps", "4", "--resume",  # resumes from step 2
                          "--export", str(tmp_path / "ref_ck")])
    finally:
        tts_mod.Zonos.autoencoder = orig
    assert (tmp_path / "ref_ck" / "model.safetensors").exists()
    assert (tmp_path / "ref_ck" / "config.json").exists()
    # the exported checkpoint loads back as a reference-format model
    m = tts_mod.Zonos.from_local(str(tmp_path / "ref_ck" / "config.json"),
                                 str(tmp_path / "ref_ck" / "model.safetensors"))
    assert m.config.backbone.d_model == 64


def test_train_cli_validation_split(dataset_dir, tmp_path, caplog):
    """--val_frac holds out data and reports val_loss at --eval_every."""
    import logging

    import zonos_tpu.apps.train_cli as tc
    from zonos_tpu.models import tts as tts_mod

    orig = tts_mod.Zonos.autoencoder
    dac = _tiny_dac()
    try:
        tts_mod.Zonos.autoencoder = property(lambda self: dac)
        with caplog.at_level(logging.INFO, logger="zonos.train"):
            tc.main([
                "--ljspeech", str(dataset_dir), "--tiny", "--batch", "2",
                "--steps", "2", "--lr", "1e-3", "--warmup", "0",
                "--cache_dir", str(tmp_path / "cache"),
                "--phoneme_bucket", "16", "--code_bucket", "8",
                "--val_frac", "0.25", "--eval_every", "2",
                "--optimizer", "adafactor", "--accum", "2",
            ])
    finally:
        tts_mod.Zonos.autoencoder = orig
    assert any("holding out 1 examples" in r.message for r in caplog.records)
    val_msgs = [r.message for r in caplog.records if "val_loss" in r.message]
    assert val_msgs and "step 2" in val_msgs[-1]


def test_train_cli_lora(dataset_dir, tmp_path):
    """LoRA finetune via the CLI: adapters train, resume, merged export loads."""
    import zonos_tpu.apps.train_cli as tc
    from zonos_tpu.models import tts as tts_mod

    orig = tts_mod.Zonos.autoencoder
    dac = _tiny_dac()
    try:
        tts_mod.Zonos.autoencoder = property(lambda self: dac)
        common = [
            "--ljspeech", str(dataset_dir), "--tiny", "--batch", "2",
            "--lr", "1e-2", "--warmup", "0", "--log_every", "2",
            "--cache_dir", str(tmp_path / "cache"),
            "--ckpt_dir", str(tmp_path / "ck"), "--ckpt_every", "2",
            "--phoneme_bucket", "16", "--code_bucket", "8",
            "--lora_rank", "4",
        ]
        tc.main(common + ["--steps", "2"])
        tc.main(common + ["--steps", "4", "--resume",
                          "--export", str(tmp_path / "merged")])
        m = tts_mod.Zonos.from_local(str(tmp_path / "merged" / "config.json"),
                                     str(tmp_path / "merged" / "model.safetensors"))
        assert m.config.backbone.d_model == 64
    finally:
        tts_mod.Zonos.autoencoder = orig
