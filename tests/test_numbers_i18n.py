"""Native cardinal expansion (numbers_i18n.py): the reference reads digits
through espeak's per-language number grammars; the builtin engine must not
feed ENGLISH number words through Spanish/German/... letter rules."""

import pytest

from zonos_tpu.text import phonemize
from zonos_tpu.text.numbers_i18n import (
    normalize_numbers_i18n,
    number_to_words_i18n,
)

CASES = {
    "es": [(0, "cero"), (16, "dieciséis"), (23, "veintitrés"),
           (31, "treinta y uno"), (100, "cien"), (101, "ciento uno"),
           (555, "quinientos cincuenta y cinco"), (1000, "mil"),
           (2023, "dos mil veintitrés"), (1000000, "un millón"),
           (2500000, "dos millones quinientos mil")],
    "de": [(0, "null"), (1, "eins"), (23, "dreiundzwanzig"),
           (31, "einunddreißig"), (100, "einhundert"), (101, "einhunderteins"),
           (1000, "eintausend"), (2023, "zweitausenddreiundzwanzig"),
           (1000000, "eine Million"), (2000000, "zwei Millionen")],
    "fr": [(21, "vingt et un"), (23, "vingt-trois"), (71, "soixante et onze"),
           (75, "soixante-quinze"), (80, "quatre-vingts"),
           (81, "quatre-vingt-un"), (91, "quatre-vingt-onze"), (100, "cent"),
           (200, "deux cents"), (201, "deux cent un"), (1000, "mille"),
           (2023, "deux mille vingt-trois"), (1000000, "un million")],
    "it": [(21, "ventuno"), (23, "ventitré"), (28, "ventotto"),
           (31, "trentuno"), (100, "cento"), (108, "centotto"),
           (180, "centottanta"), (1000, "mille"), (2000, "duemila"),
           (2023, "duemilaventitré"), (1000000, "un milione")],
    "pt": [(23, "vinte e três"), (100, "cem"), (101, "cento e um"),
           (200, "duzentos"), (345, "trezentos e quarenta e cinco"),
           (1000, "mil"), (1100, "mil e cem"), (2023, "dois mil e vinte e três"),
           (1000000, "um milhão")],
    "ru": [(0, "ноль"), (23, "двадцать три"), (40, "сорок"), (100, "сто"),
           (555, "пятьсот пятьдесят пять"), (1000, "одна тысяча"),
           (2000, "две тысячи"), (5000, "пять тысяч"),
           (2023, "две тысячи двадцать три"), (1000000, "один миллион"),
           (2000000, "два миллиона"), (5000000, "пять миллионов")],
}


@pytest.mark.parametrize("lang", sorted(CASES))
def test_cardinals(lang):
    for n, want in CASES[lang]:
        assert number_to_words_i18n(n, lang) == want, (lang, n)


def test_decimal_comma_and_grouping():
    assert normalize_numbers_i18n("1,5 Liter", "de") == "eins Komma fünf Liter"
    assert normalize_numbers_i18n("1.234.567", "de") == (
        "eine Million zweihundertvierunddreißigtausendfünfhundertsiebenundsechzig")
    assert normalize_numbers_i18n("2,75", "fr") == "deux virgule sept cinq"
    # a prose comma (space after) is not a decimal
    assert normalize_numbers_i18n("uno, dos", "es") == "uno, dos"


def test_huge_numbers_read_digit_by_digit():
    out = number_to_words_i18n(10**10, "es")
    assert out.startswith("uno cero cero")


def test_phonemize_uses_native_numbers():
    """End-to-end: digits reach the letter tables as native words."""
    assert "beintitrˈes" in phonemize(["Tengo 23 gatos"], ["es"])[0]
    out = phonemize(["Ich habe 23 Katzen"], ["de"])[0]
    assert "tsvantsɪk" in out  # ...undzwanzig
    assert "dvadtsatʲ trʲi" in phonemize(["У меня 23 кота"], ["ru"])[0]
    # English path unchanged
    assert "twɛnt" in phonemize(["I have 23 cats"], ["en-us"])[0]


def test_euro_amounts():
    assert normalize_numbers_i18n("Das kostet 5,50 €", "de") == (
        "Das kostet fünf Euro fünfzig Cent")
    assert normalize_numbers_i18n("€1 por favor", "es") == "un euro por favor"
    assert normalize_numbers_i18n("1 € bitte", "de") == "ein Euro bitte"
    assert normalize_numbers_i18n("Ça coûte 2,5 €", "fr") == (
        "Ça coûte deux euros cinquante centimes")
    assert normalize_numbers_i18n("Custa 1,01 €", "pt") == "Custa um euro um cêntimo"


def test_apocope_before_scale_words():
    assert number_to_words_i18n(21000, "es") == "veintiún mil"
    assert number_to_words_i18n(31000000, "es") == "treinta y un millones"
    assert number_to_words_i18n(21000, "it") == "ventunmila"
