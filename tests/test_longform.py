"""Long-form synthesis: sentence splitting, duration packing, audio-prefix
continuity across segments, receptive-field-safe decode joins."""

import copy

import numpy as np
import pytest

from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
from zonos_tpu.longform import pack_segments, split_sentences, synthesize_long
from zonos_tpu.models.tts import Zonos

TINY = ZonosConfig.from_dict(
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


def test_split_sentences_basic():
    s = split_sentences("Hello world. How are you? Fine! Done…")
    assert s == ["Hello world.", "How are you?", "Fine!", "Done…"]


def test_split_sentences_abbreviations_and_initials():
    s = split_sentences("Dr. Smith met J. Doe. They talked.")
    assert s == ["Dr. Smith met J. Doe.", "They talked."]
    s = split_sentences("See fig. 3 for details. Then stop.")
    assert s == ["See fig. 3 for details.", "Then stop."]


def test_split_sentences_no_punctuation():
    assert split_sentences("no punctuation at all") == ["no punctuation at all"]
    assert split_sentences("") == []


def test_pack_segments_budget_and_order():
    sentences = [f"sentence number {i} is here." for i in range(10)]
    segs = pack_segments(sentences, speaking_rate=15.0, max_segment_seconds=4.0)
    assert len(segs) > 1
    # order preserved, nothing lost
    assert " ".join(segs) == " ".join(sentences)
    # each segment respects the budget under the same estimate
    budget = 4.0 * 15.0
    for seg in segs:
        assert len(seg) * 0.9 <= budget + len(sentences[0])  # last-fit slack


def test_pack_segments_wraps_overlong_sentence():
    long_sent = "word " * 200
    segs = pack_segments([long_sent.strip()], speaking_rate=15.0,
                         max_segment_seconds=3.0)
    assert len(segs) > 1
    assert " ".join(segs).split() == long_sent.split()


def test_synthesize_long_end_to_end():
    """Two+ segments, prefix continuity plumbed, concatenated wav lengths."""
    model = Zonos(TINY, seed=0)

    calls = []
    orig_generate = model.generate

    def spy(prefix_cond, **kw):
        calls.append(kw.get("audio_prefix_codes"))
        return orig_generate(prefix_cond, **kw)

    model.generate = spy
    text = ("The first sentence is short. The second sentence is a little "
            "longer than that. A third one arrives. And then a fourth one.")
    wav, seg_codes = synthesize_long(
        model, text, max_segment_seconds=2.0, carry_frames=8,
        max_new_tokens=40, seed=7,
    )
    assert len(seg_codes) >= 2
    assert len(calls) == len(seg_codes)
    assert calls[0] is None  # first segment: no carry
    for c in calls[1:]:  # later segments carry codes from the previous one
        assert c is not None and c.shape[1] == TINY.num_codebooks
        assert 0 < c.shape[2] <= 8
    # receptive-field-trimmed concatenation: total = sum of per-segment codes
    hop = 512
    assert wav.shape[-1] == sum(c.shape[-1] for c in seg_codes) * hop
    assert np.isfinite(wav).all()


def test_synthesize_long_empty_text_raises():
    model = Zonos(TINY, seed=0)
    with pytest.raises(ValueError):
        synthesize_long(model, "   ")


def test_synthesize_long_initial_prefix():
    """initial_prefix_codes seeds the first segment's generate call and is
    excluded from the output (generate strips prefixes)."""
    model = Zonos(TINY, seed=0)
    calls = []
    orig = model.generate

    def spy(prefix_cond, **kw):
        calls.append(kw.get("audio_prefix_codes"))
        return orig(prefix_cond, **kw)

    model.generate = spy
    init = np.random.default_rng(0).integers(
        0, 1024, size=(1, TINY.num_codebooks, 5)).astype(np.int32)
    wav, seg_codes = synthesize_long(model, "Only one short sentence.",
                                     max_new_tokens=30, seed=3,
                                     initial_prefix_codes=init)
    assert calls[0] is not None and calls[0].shape == (1, TINY.num_codebooks, 5)
    np.testing.assert_array_equal(np.asarray(calls[0][0]), init[0])
    assert wav.shape[-1] == sum(c.shape[-1] for c in seg_codes) * 512
