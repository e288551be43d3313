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
    # vi time/money/date (reference vi taggers: "hai rưỡi" -> 2:30,
    # "chín giờ kém hai mươi" -> 8:40, currency.tsv "đô la mỹ" -> $)
    ("vi", "hai giờ rưỡi", "2:30"),
    ("vi", "chín giờ kém hai mươi", "8:40"),
    ("vi", "mười giờ chín phút bốn mươi lăm giây", "10:09:45"),
    ("vi", "mười hai đô la mỹ", "$12"),
    ("vi", "hai mươi euro", "€20"),
    ("vi", "ngày hai mươi tháng tư năm hai nghìn không trăm hai mươi",
     "ngày 20 tháng 4 năm 2020"),
    ("vi", "một hai ba một hai ba năm sáu bảy tám", "1231235678"),
    # tl cardinal teens / ordinal ika- / money / percent (reference tl
    # data/numbers/teen.tsv, taggers/ordinal.py, currency.tsv)
    ("tl", "labinlima", "15"),
    ("tl", "tatlo libo labintatlo", "3013"),
    ("tl", "ikalimang hakbang", "ika-5 hakbang"),
    ("tl", "sampu porsyento", "10 %"),
    ("tl", "lima piso", "₱5"),
    ("tl", "lima kilometro", "5 km"),
    # ja/ko money (reference ja/ko data/currency.tsv: symbol-prefixed)
    ("ja", "価格は三千五百円です", "価格は¥3500です"),
    ("ja", "十二ドル", "$12"),
    ("ko", "삼만 오천 원", "₩35000"),
    ("ko", "십이 달러", "$12"),
    # id teens / date months capitalized / ordinal ke- / time setengah
    # (reference id data/months.tsv, taggers/{ordinal,time}.py)
    ("id", "dua ribu tiga belas", "2013"),
    ("id", "dua puluh empat januari dua ribu tiga belas",
     "24 Januari 2013"),
    ("id", "kelima", "ke-5"),
    ("id", "pertama", "ke-1"),
    ("id", "jam setengah lima", "4:30"),
    ("id", "lima ribu rupiah", "Rp5000"),
])
def test_itn_class_rules(lang, text, want):
    out = InverseNormalizer(lang=lang).inverse_normalize(text)
    assert out == want, out


def test_extensible_whitelist():
    """User-supplied whitelists: dict or reference-format TSV
    (written<TAB>spoken rows, data/whitelist.tsv role)."""
    import os
    import tempfile
    inv = InverseNormalizer(lang="en",
                            whitelist={"as soon as possible": "ASAP"})
    assert inv.inverse_normalize("reply as soon as possible") == "reply ASAP"
    fd, path = tempfile.mkstemp(suffix=".tsv")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        f.write("AT&T\ta t and t\n7-eleven\tseven eleven\n")
    try:
        inv2 = InverseNormalizer(lang="en", whitelist=path)
        assert inv2.inverse_normalize("i work at a t and t") \
            == "i work at AT&T"
    finally:
        os.unlink(path)
    # global registration API (load_whitelist_tsv / add_whitelist)
    from funasr_tpu.text.electronic import WHITELIST, add_whitelist
    add_whitelist("en", {"et cetera": "etc."})
    try:
        out = InverseNormalizer(lang="en").inverse_normalize(
            "pens pencils et cetera")
        assert out == "pens pencils etc."
    finally:
        WHITELIST["en"].pop("et cetera")


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
