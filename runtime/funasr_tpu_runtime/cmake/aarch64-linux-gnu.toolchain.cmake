# Cross-compile toolchain for aarch64 Linux (and a close proxy for Android
# arm64-v8a: the sources are pure C++17 with no NEON intrinsics — every x86
# ISA path is macro-gated in nn_amx.cc and degrades to the portable GEMM).
#
#   cmake -B build-aarch64 -G Ninja \
#     -DCMAKE_TOOLCHAIN_FILE=cmake/aarch64-linux-gnu.toolchain.cmake
#   ninja -C build-aarch64 funasr_tpu_runtime funasr_tpu_jni_check
#
# Requires the distro cross packages (g++-aarch64-linux-gnu). When no cross
# compiler is installed, tests/test_cross_compile.py falls back to a
# -DFUNASR_TPU_PORTABLE=ON host build, which compiles the identical
# (no-x86-ISA) source view an ARM compiler sees.

set(CMAKE_SYSTEM_NAME Linux)
set(CMAKE_SYSTEM_PROCESSOR aarch64)

set(CMAKE_C_COMPILER aarch64-linux-gnu-gcc)
set(CMAKE_CXX_COMPILER aarch64-linux-gnu-g++)

set(CMAKE_FIND_ROOT_PATH /usr/aarch64-linux-gnu)
set(CMAKE_FIND_ROOT_PATH_MODE_PROGRAM NEVER)
set(CMAKE_FIND_ROOT_PATH_MODE_LIBRARY ONLY)
set(CMAKE_FIND_ROOT_PATH_MODE_INCLUDE ONLY)
set(CMAKE_FIND_ROOT_PATH_MODE_PACKAGE ONLY)

# no -march=native / AMX probing on the cross target
set(FUNASR_TPU_PORTABLE ON CACHE BOOL "" FORCE)
