"""Electronic (email/url) + whitelist ITN classes.

Counterpart of the reference per-language taggers
``fun_text_processing/inverse_text_normalization/<lang>/taggers/electronic.py``
(e.g. en graph: "c d f one at a b c dot e d u" -> "cdf1@abc.edu") and
``.../taggers/whitelist.py`` (spoken phrase -> written abbreviation).
"""

import pytest

from funasr_tpu.text.electronic import apply_electronic, apply_whitelist
from funasr_tpu.text.inverse_normalize import InverseNormalizer


EMAIL_CASES = [
    # reference canonical shape: spelled username + spelled domain
    ("en", "c d f at a b c dot e d u", "cdf@abc.edu"),
    ("en", "my email is john at gmail dot com", "my email is john@gmail.com"),
    # greedy middle segments terminate at the explicit dot word
    ("en", "j o h n at g mail dot co dot uk", "john@gmail.co.uk"),
    ("de", "hans at gmail punkt de", "hans@gmail.de"),
    ("es", "c d f arroba a b c punto e d u", "cdf@abc.edu"),
    ("fr", "dupont arobase orange point fr", "dupont@orange.fr"),
    ("pt", "silva arroba uol ponto com ponto br", "silva@uol.com.br"),
    ("vi", "a b c a còng d e f chấm com", "abc@def.com"),
    ("id", "user at gmail titik com", "user@gmail.com"),
    # CJK byte-literal (unspaced) shapes
    ("ja", "abcアットマークdefドットcom", "abc@def.com"),
    ("ko", "abc골뱅이def닷com", "abc@def.com"),
    ("zh", "abc艾特gmail点com", "abc@gmail.com"),
]

URL_CASES = [
    ("en", "www a b c dot com", "www.abc.com"),
    ("en", "www open a i dot com", "www.openai.com"),
    ("en", "www dot example dot org please", "www.example.org please"),
    ("fr", "www point le monde point fr", "www.lemonde.fr"),
]

# prose with at/dot words must NOT be swallowed
GUARD_CASES = [
    ("en", "at the house"),
    ("en", "meet me at noon dot"),
    ("en", "i will be at home later"),
    ("en", "www is short for world wide web"),
    ("de", "wir treffen uns at punkt"),
]

WHITELIST_CASES = [
    ("en", "doctor smith", "dr. smith"),
    ("en", "for example this", "e.g. this"),
    ("en", "mister and misses jones", "mr. and mrs. jones"),
    ("fr", "monsieur dupont", "M. dupont"),
    ("de", "doktor schmidt", "Dr. schmidt"),
    ("pt", "senhora silva", "sra. silva"),
    ("ru", "то есть да", "т. е. да"),
    ("ja", "セブンイレブンです", "7-elevenです"),
]


@pytest.mark.parametrize("lang,text,want", EMAIL_CASES + URL_CASES)
def test_electronic(lang, text, want):
    assert apply_electronic(lang, text) == want


@pytest.mark.parametrize("lang,text", GUARD_CASES)
def test_electronic_guard(lang, text):
    assert apply_electronic(lang, text) == text


@pytest.mark.parametrize("lang,text,want", WHITELIST_CASES)
def test_whitelist(lang, text, want):
    assert apply_whitelist(lang, text) == want


def test_whitelist_token_boundaries():
    # "doctor" inside a longer token must not match
    assert apply_whitelist("en", "doctors orders") == "doctors orders"
    assert apply_whitelist("en", "the saintly one") == "the saintly one"


def test_full_pipeline_integration():
    """The electronic/whitelist classes run inside InverseNormalizer after
    cardinals+classes (reference pipeline order: taggers compose)."""
    itn = InverseNormalizer(lang="en")
    assert (itn.inverse_normalize("doctor smith wrote john at gmail dot com")
            == "dr. smith wrote john@gmail.com")
    itn_de = InverseNormalizer(lang="de")
    assert (itn_de.inverse_normalize("doktor schmidt hat fünfzig prozent")
            == "Dr. schmidt hat 50 %")
    # ko: the cardinal pass rewrites 골뱅이 -> 골뱅2 (이=2) before the
    # electronic pass; the at-table carries both surfaces
    itn_ko = InverseNormalizer(lang="ko")
    assert (itn_ko.inverse_normalize("abc골뱅이def닷com") == "abc@def.com")
    itn_zh = InverseNormalizer(lang="zh")
    assert (itn_zh.inverse_normalize("我的邮箱是abc艾特gmail点com")
            == "我的邮箱是abc@gmail.com")
    # 点 stays the time/decimal class marker when no email shape matches
    assert itn_zh.inverse_normalize("三点十五分") == "3:15"


def test_archive_roundtrip_has_electronic():
    from funasr_tpu.text.export_grammar import GRAMMAR_VERSION, export_grammar
    assert GRAMMAR_VERSION >= 6
    archive = export_grammar()
    assert archive["languages"]["de"]["electronic"]["dot"] == ["punkt"]
    assert archive["languages"]["fr"]["whitelist"]["monsieur"] == "M."
    assert "electronic" in archive["languages"]["zh"]
