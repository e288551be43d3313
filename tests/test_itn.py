"""ITN/TN rule tests (zh + en)."""

import pytest

from funasr_tpu.text.inverse_normalize import InverseNormalizer, Normalizer
from funasr_tpu.text.zh_numbers import parse_cn_number, verbalize_number_zh


@pytest.mark.parametrize("spoken,written", [
    ("三百二十五", "325"),
    ("一千零二十四", "1024"),
    ("两万三千", "23000"),
    ("一亿二千万", "120000000"),
    ("十五", "15"),
    ("二零二三", "2023"),
    ("三点一四", "3.14"),
    ("幺三九", "139"),
])
def test_parse_cn_number(spoken, written):
    assert parse_cn_number(spoken) == written


@pytest.mark.parametrize("num,spoken", [
    ("325", "三百二十五"),
    ("1024", "一千零二十四"),
    ("15", "十五"),
    ("3.14", "三点一四"),
    ("100000000", "一亿"),
])
def test_verbalize_zh(num, spoken):
    assert verbalize_number_zh(num) == spoken


def test_itn_zh_sentences():
    itn = InverseNormalizer(lang="zh")
    assert itn.inverse_normalize("百分之五十") == "50%"
    assert itn.inverse_normalize("今年是二零二三年五月二十号") == "今年是2023年5月20日"
    assert itn.inverse_normalize("现在是下午三点三十分") == "现在是下午3:30"
    assert itn.inverse_normalize("这个东西五十块钱") == "这个东西50块钱"
    assert itn.inverse_normalize("我们一起去") == "我们一起去"  # bare 一 untouched


def test_itn_en_sentences():
    itn = InverseNormalizer(lang="en")
    assert itn.inverse_normalize("i have twenty five apples") == "i have 25 apples"
    assert itn.inverse_normalize("fifty percent of the time") == "50% of the time"
    assert itn.inverse_normalize(
        "three hundred and forty two thousand") == "342000"
    assert itn.inverse_normalize("one and two") == "1 and 2"


def test_tn_zh():
    tn = Normalizer(lang="zh")
    assert tn.normalize("我有325个苹果") == "我有三百二十五个苹果"
    assert tn.normalize("涨了12%") == "涨了百分之十二"


def test_unknown_language():
    with pytest.raises(ValueError):
        InverseNormalizer(lang="xx")
    itn = InverseNormalizer(lang="ja")  # known but unimplemented -> passthrough
    assert itn.inverse_normalize("こんにちは") == "こんにちは"


def test_itn_zh_dates_times_money():
    from funasr_tpu.text.zh_numbers import inverse_normalize_zh as itn

    assert itn("十二月三十一日") == "12月31日"
    assert itn("二零二三年五月一号") == "2023年5月1日"
    assert itn("十月一号国庆节") == "10月1日国庆节"
    assert itn("三点十五分") == "3:15"
    assert itn("两点半") == "2:30"
    assert itn("下午四点零五分二十秒开会") == "下午4:05:20开会"
    assert itn("三点一四") == "3.14"  # decimal, not a clock time
    assert itn("五块钱") == "5块钱"
    # month-day bounds: "三百万日元" must not become a date
    assert itn("三百万日元") == "3000000日元"


def test_itn_en_ordinals_money():
    from funasr_tpu.text.en_numbers import inverse_normalize_en as itn

    assert itn("three dollars fifty") == "$3.50"
    assert itn("three dollars and fifty cents") == "$3.50"
    assert itn("fifty cents") == "$0.50"
    assert itn("two hundred dollars") == "$200"
    assert itn("twenty first") == "21st"
    assert itn("january third") == "january 3rd"
    assert itn("one hundred and first") == "101st"
    assert itn("second place") == "2nd place"
    assert itn("the twenty second of may") == "the 22nd of may"
