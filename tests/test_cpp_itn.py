"""C++ ITN golden parity vs the Python engine (cardinal + percent subset)."""

import ctypes
import os
import subprocess

import pytest

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
            "百分之五十", "他说了三万五千字", "你好世界"]
EN_CASES = ["twenty three dollars", "one hundred and five people",
            "three thousand five hundred", "fifty percent done",
            "no numbers here"]


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
