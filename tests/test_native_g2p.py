"""Native C++ G2P engine vs the Python matcher: identical output required."""

import pytest


def _python_rules(word: str) -> list[str]:
    """Invoke the pure-Python matcher directly (bypassing native dispatch)."""
    from zonos_tpu.text import g2p as m
    from zonos_tpu.text import g2p_rules_en as EN

    phones = []
    i = 0
    while i < len(word):
        ch = word[i]
        matched = False
        for grapheme, left, right, out in m._RULE_TABLE.get(ch, ()):
            if word[i : i + len(grapheme)] != grapheme:
                continue
            if left and not m._match_context(left, word, i - 1, forward=False):
                continue
            if right and not m._match_context(right, word, i + len(grapheme), forward=True):
                continue
            if out:
                phones.extend(out.split())
            i += len(grapheme)
            matched = True
            break
        if not matched:
            i += 1
    return phones


@pytest.fixture(scope="module")
def native():
    from zonos_tpu.text.native import get_engine

    engine = get_engine()
    if engine is None:
        pytest.skip("native toolchain unavailable")
    return engine


WORDS = [
    "cat", "phone", "through", "running", "boxes", "knight", "gnome",
    "psychology", "strength", "quiet", "yellow", "jazz", "rhythm",
    "wonderful", "extraordinary", "blip", "zorp", "tchaikovsky",
    "a", "i", "xylophone", "church", "shine", "thinking", "feather",
]


def test_native_matches_python(native):
    for w in WORDS:
        assert native(w).split() == _python_rules(w), w


def test_native_used_in_pipeline(native):
    from zonos_tpu.text.g2p import _english_word_to_ipa

    _english_word_to_ipa.cache_clear()
    out = _english_word_to_ipa("zorpington")
    assert isinstance(out, str) and len(out) > 3
