"""Multilingual ITN (12 reference languages)."""

import pytest

from funasr_tpu.text.inverse_normalize import InverseNormalizer


@pytest.mark.parametrize("lang,text,want", [
    ("zh", "一共三百二十五元", "325"),
    ("en", "twenty three dollars", "23"),
    ("ja", "価格は三千五百円です", "3500"),
    ("ja", "二〇二三年", "2023"),
    ("ko", "삼만 오천 원", "35000"),
    ("ko", "이십일", "21"),
    ("de", "ich habe dreiundzwanzig Katzen", "23"),
    ("de", "zweitausendvierundzwanzig", "2024"),
    ("es", "tengo veintitrés gatos", "23"),
    ("es", "quinientos treinta y dos", "532"),
    ("fr", "quatre-vingt-dix-sept", "97"),
    ("fr", "deux cents euros", "200"),
    ("pt", "duzentos e cinquenta", "250"),
    ("ru", "двести пятьдесят три", "253"),
    ("ru", "пять тысяч", "5000"),
    ("id", "dua puluh tiga ribu", "23000"),
    ("vi", "hai mươi ba nghìn", "23000"),
    ("vi", "một trăm lẻ năm", "105"),
    ("tl", "dalawampu at lima", "25"),
])
def test_itn(lang, text, want):
    out = InverseNormalizer(lang=lang).inverse_normalize(text)
    assert want in out, out


@pytest.mark.parametrize("lang,text,want", [
    # fractions (reference per-language taggers/fraction.py)
    ("de", "drei fünftel", "3/5"),
    ("de", "ein viertel", "1/4"),
    ("fr", "deux tiers", "2/3"),
    ("fr", "trois quarts", "3/4"),
    ("pt", "dois terços", "2/3"),
    ("id", "tiga per empat", "3/4"),
    ("vi", "ba phần tư", "3/4"),
    ("ja", "三分の一", "1/3"),
    ("ko", "삼분의 일", "1/3"),
    # measures (taggers/measure.py)
    ("de", "fünf kilometer", "5 km"),
    ("de", "zwei komma fünf kilogramm", "2,5 kg"),
    ("es", "cinco kilómetros", "5 km"),
    ("fr", "cinq kilomètres", "5 km"),
    ("pt", "cinco quilômetros", "5 km"),
    ("ru", "пять километров", "5 км"),
    ("ru", "сто граммов", "100 г"),
    ("id", "lima kilometer", "5 km"),
    ("vi", "năm ki-lô-mét", "5 km"),
    ("ja", "五キロメートル", "5km"),
    ("ko", "오 킬로미터", "5km"),
    ("ko", "오미터", "5m"),
    # telephone (taggers/telephone.py; digit-word runs merge in the
    # cardinal pass, ja groups on の)
    ("de", "null sieben drei drei eins acht neun vier", "07331894"),
    ("ja", "ゼロ三の一二三四の五六七八", "03-1234-5678"),
])
def test_itn_class_rules(lang, text, want):
    out = InverseNormalizer(lang=lang).inverse_normalize(text)
    assert out == want, out


def test_non_number_text_untouched():
    for lang in ("ja", "ko", "de", "es", "fr", "pt", "ru", "id", "vi", "tl"):
        inv = InverseNormalizer(lang=lang)
        assert inv.inverse_normalize("hello world") in ("hello world",)


def test_unknown_language_raises():
    with pytest.raises(ValueError):
        InverseNormalizer(lang="xx")


@pytest.mark.parametrize("lang,n", [
    ("de", 23), ("de", 2024), ("de", 1000000),
    ("es", 532), ("es", 150), ("es", 21),
    ("ru", 253), ("ru", 5000), ("ru", 1001)])
def test_tn_itn_roundtrip(lang, n):
    from funasr_tpu.text.inverse_normalize import Normalizer
    spoken = Normalizer(lang=lang).normalize(str(n))
    back = InverseNormalizer(lang=lang).inverse_normalize(spoken)
    assert str(n) in back, (spoken, back)
