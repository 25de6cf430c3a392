"""Application-layer tests: CLI end-to-end with a tiny local model config,
SRT parsing/solving, speaker DB cache, sampler-explain output."""

import copy
import json
import os
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    """Local model dir (config.json, no checkpoint) for fast CLI runs."""
    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT

    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    out = tmp_path_factory.mktemp("tiny_model")
    (out / "config.json").write_text(json.dumps(d))
    return str(out)


def test_cli_end_to_end(tiny_model_dir, tmp_path):
    from zonos_tpu.apps.cli import main

    out = str(tmp_path / "out.wav")
    main([
        "--text", "hello there", "--language", "en-us", "--output", out,
        "--model", tiny_model_dir, "--max_new_tokens", "24",
        "--no_prefix_silence", "--seed", "5",
    ])
    assert os.path.exists(out)
    with wave.open(out) as w:
        assert w.getframerate() == 44100
        assert w.getnframes() > 0


def test_batch_cli_end_to_end(tiny_model_dir, tmp_path):
    from zonos_tpu.apps.batch_cli import main

    outdir = str(tmp_path / "batch")
    main([
        "--text", "one", "two", "--model", tiny_model_dir,
        "--max_new_tokens", "16", "--output_dir", outdir,
        "--max_per_batch", "2", "--score",
    ])
    wavs = [f for f in os.listdir(outdir) if f.endswith(".wav")]
    assert len(wavs) == 2


def test_srt_parse_and_solver(tmp_path):
    from zonos_tpu.apps.srt import parse_srt, segment_budget, solve_speaking_rate

    srt = tmp_path / "test.srt"
    srt.write_text(
        "1\n00:00:01,000 --> 00:00:03,000\nHello world.\n\n"
        "2\n00:00:04,500 --> 00:00:06,000\nSecond line\ncontinues here.\n"
    )
    segs = parse_srt(str(srt))
    assert len(segs) == 2
    assert segs[0]["start"] == 1.0 and segs[0]["end"] == 3.0
    assert segs[1]["text"] == "Second line continues here."
    b0 = segment_budget(segs, 0)
    assert 0.3 <= b0 <= 4.0  # capped at 2x nominal
    rate = solve_speaking_rate("Hello world.", "en-us", b0)
    assert 0 < rate <= 40


def test_srt_end_to_end(tiny_model_dir, tmp_path):
    from zonos_tpu.apps.srt import main

    srt = tmp_path / "mini.srt"
    srt.write_text("1\n00:00:00,000 --> 00:00:00,800\nHi.\n")
    outdir = str(tmp_path / "srt_out")
    main([str(srt), "--model", tiny_model_dir, "--output_dir", outdir,
          "--candidates", "2", "--concat", str(tmp_path / "full.wav")])
    assert os.path.exists(os.path.join(outdir, "seg_0001.wav"))
    meta = json.loads((tmp_path / "srt_out" / "seg_0001.json").read_text())
    assert meta["candidates"] == 2
    assert os.path.exists(tmp_path / "full.wav")
    # incremental: second run skips
    main([str(srt), "--model", tiny_model_dir, "--output_dir", outdir,
          "--candidates", "2"])


def test_srt_survives_bad_segment(tiny_model_dir, tmp_path, monkeypatch, capsys):
    """A failing segment must not abort the job (ref: srt_generate.py:543-547
    wraps per-file work in try/except so long batch runs survive)."""
    import zonos_tpu.apps.srt as srt_mod

    srt = tmp_path / "two.srt"
    srt.write_text(
        "1\n00:00:00,000 --> 00:00:00,500\nHi.\n\n"
        "2\n00:00:01,000 --> 00:00:01,500\nBye.\n"
    )
    outdir = str(tmp_path / "srt_out")

    real = srt_mod._generate_segment

    def sometimes_fail(args, model, speaker, segments, i, seg, *rest):
        if seg["index"] == 1:
            raise RuntimeError("synthetic segment failure")
        return real(args, model, speaker, segments, i, seg, *rest)

    monkeypatch.setattr(srt_mod, "_generate_segment", sometimes_fail)
    srt_mod.main([str(srt), "--model", tiny_model_dir, "--output_dir", outdir,
                  "--candidates", "1"])
    out = capsys.readouterr().out
    assert "FAILED" in out and "1 segment(s) failed" in out
    assert os.path.exists(os.path.join(outdir, "seg_0002.wav"))  # kept going


def test_speaker_db_cache(tmp_path):
    from zonos_tpu.audio.io import save_audio
    from zonos_tpu.speaker_db import SpeakerUtils, hash_audio_file

    wav_path = str(tmp_path / "a.wav")
    save_audio(wav_path, np.random.default_rng(0).normal(size=(1, 8000)) * 0.1, 16000)

    class FakeModel:
        calls = 0

        def make_speaker_embedding(self, wav, sr):
            FakeModel.calls += 1
            return np.ones((1, 1, 128), np.float32)

    su = SpeakerUtils(FakeModel(), embed_store_dir=tmp_path / ".voices")
    e1 = su.get_speaker_embedding(wav_path, tags={"gender": "x"})
    e2 = su.get_speaker_embedding(wav_path)
    assert FakeModel.calls == 1  # second call served from cache
    np.testing.assert_array_equal(e1, e2)
    # hash-addressed load
    h = hash_audio_file(wav_path)
    e3 = su.get_speaker_embedding(h)
    np.testing.assert_array_equal(e1, e3)
    # tag average
    avg = su.load_average({"gender": "x"})
    np.testing.assert_array_equal(avg, e1)
    with pytest.raises(ValueError):
        su.load_average({"gender": "nope"})


def test_sampler_explain_output(capsys):
    from zonos_tpu.apps.sampler_explain import main, suggested_params

    conf, quad = suggested_params(0.5)
    assert abs(quad - (1 / 3 - 0.5 * 4 / 15)) < 1e-9
    assert abs(conf + quad / 2) < 1e-9
    main(["--linear", "0.5"])
    out = capsys.readouterr().out
    assert "Unified sampler" in out and "H=0.50" in out


def test_random_sentence_offline():
    from zonos_tpu.speaker_db import SpeakerUtils

    s = SpeakerUtils.random_sentence("en")
    assert isinstance(s, str) and len(s) > 10
    s_de = SpeakerUtils.random_sentence("de")
    assert isinstance(s_de, str)
    # unknown language falls back without network
    s_xx = SpeakerUtils.random_sentence("tlh")
    assert isinstance(s_xx, str)


def test_phase_timer_and_trace(tmp_path):
    from zonos_tpu.utils.profiling import PhaseTimer, device_trace

    lines = []
    t = PhaseTimer(printer=lines.append)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    t.report()
    assert any("a" in l for l in lines) and any("total" in l for l in lines)
    with device_trace(None):  # no-op path
        pass


def test_device_helpers():
    from zonos_tpu.utils.device import default_device, device_summary

    d = default_device()
    assert d is not None
    s = device_summary()
    assert "cpu" in s or "tpu" in s


def test_espeak_library_env_is_harmless(monkeypatch):
    """PHONEMIZER_ESPEAK_LIBRARY must not break the builtin G2P fallback."""
    from zonos_tpu.text import g2p

    g2p._espeak_backend.cache_clear()
    monkeypatch.setenv("PHONEMIZER_ESPEAK_LIBRARY", "/nonexistent/libespeak.so")
    out = g2p.phonemize(["Hello world"], ["en-us"])
    assert out and out[0]
    g2p._espeak_backend.cache_clear()


def test_cli_long_form(tiny_model_dir, tmp_path):
    from zonos_tpu.apps.cli import main

    out = str(tmp_path / "long.wav")
    main([
        "--text", "First sentence here. Second sentence there. Third one now.",
        "--language", "en-us", "--output", out, "--model", tiny_model_dir,
        "--long", "--max_segment_seconds", "2", "--carry_frames", "8",
        "--max_new_tokens", "30", "--no_prefix_silence", "--seed", "5",
        "--no_progress_bar",
    ])
    assert os.path.exists(out)
    with wave.open(out) as w:
        assert w.getframerate() == 44100
        assert w.getnframes() > 0
