"""Phoneme error rate (PER) between IPA strings.

Used to quantify the built-in G2P engine against the espeak golden fixtures
(tests/fixtures/espeak_golden.json, numbers in docs/TEXT_FRONTEND.md) and to
tolerate espeak version drift in the gated espeak regression test.
"""

from __future__ import annotations

# Pure-notation equivalences folded before comparison, so PER measures
# phonological disagreement rather than transcription style: rhotic symbol
# choice, affricate ligature vs digraph, ASCII-vs-IPA g, and length/stress
# marks (which espeak emits inconsistently across versions).
_FOLD = str.maketrans({
    "ɹ": "r", "ɾ": "r", "ʁ": "r", "ɐ": "ə", "g": "ɡ", "ʋ": "v",
    "ˈ": None, "ˌ": None, "ː": None, "ˑ": None, "̃": None, "͡": None,
    "̯": None,  # non-syllabic diphthong diacritic (uo̯): notation only —
    # the SYLLABIC mark (U+0329) is deliberately NOT folded: the engine
    # never emits syllabicity, so folding it would silently mask a real
    # phonological disagreement against a future fixture (e.g. cs vl̩k)
    ".": None, " ": None, "\t": None, "\n": None,
})
_LIGATURES = [("ʧ", "tʃ"), ("ʤ", "dʒ"), ("ʦ", "ts"), ("ʣ", "dz")]
_PUNCT = set(";:,.!?¡¿—…\"«»“”() *~-/\\&'")


def normalize_ipa(s: str) -> str:
    for lig, digraph in _LIGATURES:
        s = s.replace(lig, digraph)
    s = s.translate(_FOLD)
    return "".join(ch for ch in s if ch not in _PUNCT)


def phoneme_error_rate(hyp: str, ref: str) -> float:
    """Levenshtein distance over normalized IPA characters / len(ref)."""
    h, r = normalize_ipa(hyp), normalize_ipa(ref)
    if not r:
        return 0.0 if not h else 1.0
    prev = list(range(len(h) + 1))
    for i, rc in enumerate(r, 1):
        cur = [i]
        for j, hc in enumerate(h, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (rc != hc)))
        prev = cur
    return prev[-1] / len(r)


def substring_per(needle: str, haystack: str) -> float:
    """Best (lowest) edit distance of ``needle`` against any substring of
    ``haystack``, / len(needle) — approximate word-in-sentence agreement.

    Standard semi-global alignment: deletions from the haystack before the
    match start and after the match end are free.  Used to cross-validate
    the sentence-level espeak fixtures against independent per-word
    dictionary IPA (tests/test_fixture_cross_validation.py)."""
    n, h = normalize_ipa(needle), normalize_ipa(haystack)
    if not n:
        return 0.0
    prev = [0] * (len(h) + 1)  # free leading haystack chars
    for i, nc in enumerate(n, 1):
        cur = [i]
        for j, hc in enumerate(h, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (nc != hc)))
        prev = cur
    return min(prev) / len(n)  # free trailing haystack chars


def corpus_per(pairs: list[tuple[str, str]]) -> float:
    """Length-weighted corpus PER over (hypothesis, reference) pairs."""
    num = sum(phoneme_error_rate(h, r) * len(normalize_ipa(r)) for h, r in pairs)
    den = sum(len(normalize_ipa(r)) for _, r in pairs)
    return num / max(den, 1)
