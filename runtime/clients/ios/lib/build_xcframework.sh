#!/bin/bash
# Builds FunasrTpu.xcframework (device + simulator) from the shared C++
# runtime. Run on macOS with Xcode command-line tools.
#
#   ./build_xcframework.sh [out_dir]
#
# The framework bundles libfunasr_tpu (FTR engines, DSP, VAD, punc, ITN) and
# the ObjC wrapper; apps add the xcframework plus a model directory
# (weights.ftr — int4 export recommended for install size, tokens.txt,
# am.mvn, optional vad.ftr/punc.ftr) to their bundle.
set -euo pipefail

OUT="${1:-out}"
RUNTIME="$(cd "$(dirname "$0")/../../../funasr_tpu_runtime" && pwd)"
SRC=("$RUNTIME"/src/*.cc "$(dirname "$0")/FunasrTpuRecognizer.mm")
HDR="$(dirname "$0")/FunasrTpuRecognizer.h"

build_slice() {  # $1 sdk  $2 archflags  $3 outdir
  local sdk="$1" arch="$2" dir="$3"
  mkdir -p "$dir"
  xcrun --sdk "$sdk" clang++ -std=c++17 -ObjC++ -fobjc-arc -O2 $arch \
      -I"$RUNTIME/include" -I"$RUNTIME/src" \
      -c "${SRC[@]}"
  mv ./*.o "$dir/"
  xcrun --sdk "$sdk" ar rcs "$dir/libFunasrTpu.a" "$dir"/*.o
}

rm -rf "$OUT" && mkdir -p "$OUT"
build_slice iphoneos "-arch arm64 -miphoneos-version-min=13.0" "$OUT/ios"
build_slice iphonesimulator \
    "-arch arm64 -arch x86_64 -mios-simulator-version-min=13.0" "$OUT/sim"

mkdir -p "$OUT/headers"
cp "$HDR" "$RUNTIME/include/funasr-tpu-runtime.h" "$OUT/headers/"
xcodebuild -create-xcframework \
    -library "$OUT/ios/libFunasrTpu.a" -headers "$OUT/headers" \
    -library "$OUT/sim/libFunasrTpu.a" -headers "$OUT/headers" \
    -output "$OUT/FunasrTpu.xcframework"
echo "built $OUT/FunasrTpu.xcframework"
