"""Mobile/ARM compile verification for the C++ runtime + JNI binding.

The reference ships buildable Android/iOS runtimes
(``/root/reference/runtime/android``); this repo's JNI/ObjC bindings sit on
the same C API but previously only ever compiled with host x86 flags. This
test compile-verifies the ARM view of the tree:

- if an ``aarch64-linux-gnu-g++`` cross compiler is installed, a real
  aarch64 cross build of the library + JNI TU runs
  (cmake/aarch64-linux-gnu.toolchain.cmake);
- otherwise it builds with ``-DFUNASR_TPU_PORTABLE=ON``, which strips every
  x86 ISA flag — since the sources contain no NEON/x86 intrinsics outside
  the macro-gated ``nn_amx.cc`` (all ``__AMX_*__`` paths off without the
  flags), this compiles the IDENTICAL source view an ARM compiler sees,
  short of codegen.
"""

import os
import shutil
import subprocess

import pytest

pytestmark = pytest.mark.slow  # full library build

RUNTIME = os.path.join(os.path.dirname(__file__), "..",
                       "runtime", "funasr_tpu_runtime")


def _build(build_dir, *cmake_args):
    subprocess.run(["cmake", "-B", build_dir, "-G", "Ninja", *cmake_args],
                   cwd=RUNTIME, check=True, capture_output=True, text=True)
    r = subprocess.run(["ninja", "-C", build_dir, "funasr_tpu_runtime",
                        "funasr_tpu_jni_check"],
                       cwd=RUNTIME, check=True, capture_output=True, text=True)
    return r


def test_arm_view_compiles(tmp_path):
    cross = shutil.which("aarch64-linux-gnu-g++")
    build_dir = str(tmp_path / "build-arm")
    if cross:
        _build(build_dir,
               "-DCMAKE_TOOLCHAIN_FILE=cmake/aarch64-linux-gnu.toolchain.cmake")
        lib = os.path.join(build_dir, "libfunasr_tpu_runtime.so")
        out = subprocess.run(["file", lib], capture_output=True, text=True)
        assert "aarch64" in out.stdout.lower(), out.stdout
    else:
        _build(build_dir, "-DFUNASR_TPU_PORTABLE=ON")
        # the portable build must not have fed any x86 ISA flag to the
        # AMX TU — i.e. nn_amx.cc compiled exactly as ARM would see it
        ninja_build = open(os.path.join(RUNTIME, build_dir, "build.ninja")
                           if not os.path.isabs(build_dir)
                           else os.path.join(build_dir, "build.ninja")).read()
        assert "-mamx" not in ninja_build
        assert "-march=native" not in ninja_build
        assert os.path.exists(os.path.join(build_dir,
                                           "libfunasr_tpu_runtime.so"))
