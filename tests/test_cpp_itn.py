"""C++ ITN golden parity vs the Python engine (cardinal + percent subset)."""

import ctypes
import os
import subprocess

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

LIB_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "runtime", "funasr_tpu_runtime")
LIB = os.path.join(LIB_DIR, "build", "libfunasr_tpu_runtime.so")


@pytest.fixture(scope="module")
def lib():
    if not os.path.exists(LIB):
        if not os.path.exists(os.path.join(LIB_DIR, "build")):
            subprocess.run(["cmake", "-B", "build", "-G", "Ninja"],
                           cwd=LIB_DIR, check=True, capture_output=True)
        subprocess.run(["ninja", "-C", "build"], cwd=LIB_DIR, check=True,
                       capture_output=True)
    so = ctypes.CDLL(LIB)
    so.FunASRITNNormalize.restype = ctypes.c_void_p
    so.FunASRITNNormalize.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    so.FunASRITNFree.argtypes = [ctypes.c_void_p]
    return so


def _cpp_itn(so, text, lang):
    ptr = so.FunASRITNNormalize(text.encode(), lang.encode())
    out = ctypes.string_at(ptr).decode()
    so.FunASRITNFree(ptr)
    return out


ZH_CASES = ["一共三百二十五元", "二零二三", "五千四百零三", "一亿二千万",
            "百分之五十", "他说了三万五千字", "你好世界",
            # dates / times / money / decimals (round-2 grammar depth)
            "十二月三十一日", "二零二三年五月一号", "十月一号国庆节",
            "三点十五分", "两点半", "下午四点零五分二十秒开会", "三点一四",
            "三点", "十二点零一分", "五块钱", "三百万日元",
            "我有一百二十三块钱和百分之三十的股份", "二十一世纪",
            "他一个人去了",
            # v6: electronic (email) — 点 doubles as dot word and time marker
            "我的邮箱是abc艾特gmail点com", "三点十五分"]
EN_CASES = ["twenty three dollars", "one hundred and five people",
            "three thousand five hundred", "fifty percent done",
            "no numbers here",
            # ordinals / dates / money (round-2 grammar depth)
            "three dollars fifty", "three dollars and fifty cents",
            "fifty cents", "twenty first", "january third",
            "one hundred and first", "second place", "the third of may",
            "one million bucks", "two hundred dollars",
            # v6: electronic (email/url) + whitelist
            "my email is john at gmail dot com",
            "j o h n at g mail dot co dot uk", "www open a i dot com",
            "doctor smith said for example twenty three",
            "meet me at noon dot", "at the house"]


def test_cpp_zh_matches_python(lib):
    from funasr_tpu.text.zh_numbers import inverse_normalize_zh
    for case in ZH_CASES:
        assert _cpp_itn(lib, case, "zh") == inverse_normalize_zh(case), case


def test_cpp_en_matches_python(lib):
    from funasr_tpu.text.en_numbers import inverse_normalize_en
    for case in EN_CASES:
        assert _cpp_itn(lib, case, "en") == inverse_normalize_en(case), case


def test_cpp_unknown_language_passthrough(lib):
    assert _cpp_itn(lib, "twenty three", "fr") == "twenty three"
