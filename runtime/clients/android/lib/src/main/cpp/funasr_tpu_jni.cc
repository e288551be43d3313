// JNI bindings: on-device Android inference over the funasr_tpu C runtime.
//
// TPU-era counterpart of the reference Android library (FunASR
// runtime/android — JNI over the ONNX runtime): the same offline/streaming
// surface, but backed by the FTR int8/int4 engines (AMX paths disable
// themselves on ARM; the portable int8 GEMM runs everywhere).
//
// Build: consumed by src/main/cpp/CMakeLists.txt under the Android NDK
// toolchain (externalNativeBuild). On the Linux CI host the same file is
// compile-checked against third_party/jni_stub/jni.h so signature drift
// against the C API fails the build before it reaches a device.

#include <jni.h>

#include <cstring>
#include <string>
#include <vector>

#include "funasr-tpu-runtime.h"

namespace {

std::string ToStdString(JNIEnv* env, jstring s) {
  if (s == nullptr) return "";
  const char* chars = env->GetStringUTFChars(s, nullptr);
  std::string out(chars ? chars : "");
  if (chars) env->ReleaseStringUTFChars(s, chars);
  return out;
}

jstring ResultText(JNIEnv* env, FUNASR_RESULT result) {
  if (result == nullptr) return env->NewStringUTF("");
  const char* text = FunASRGetResult(result, 0);
  jstring out = env->NewStringUTF(text ? text : "");
  return out;
}

}  // namespace

extern "C" {

// ---- offline recognizer -------------------------------------------------

JNIEXPORT jlong JNICALL Java_com_funasr_tpu_FunasrTpu_nativeInit(
    JNIEnv* env, jclass, jstring model_dir, jint threads) {
  const std::string dir = ToStdString(env, model_dir);
  return reinterpret_cast<jlong>(FunASRInit(dir.c_str(), threads));
}

JNIEXPORT void JNICALL Java_com_funasr_tpu_FunasrTpu_nativeRelease(
    JNIEnv*, jclass, jlong handle) {
  if (handle) FunASRUninit(reinterpret_cast<FUNASR_HANDLE>(handle));
}

// PCM16 mono audio -> transcript (VAD+ASR+punc+ITN composition when the
// model dir carries those exports, matching FunOfflineInfer semantics).
JNIEXPORT jstring JNICALL Java_com_funasr_tpu_FunasrTpu_nativeInferPcm(
    JNIEnv* env, jclass, jlong handle, jshortArray pcm, jint sample_rate) {
  if (!handle || pcm == nullptr) return env->NewStringUTF("");
  const jsize n = env->GetArrayLength(pcm);
  std::vector<jshort> buf(n);
  env->GetShortArrayRegion(pcm, 0, n, buf.data());
  FUNASR_RESULT r = FunOfflineInfer(
      reinterpret_cast<FUNASR_HANDLE>(handle),
      reinterpret_cast<const char*>(buf.data()),
      static_cast<int>(n * sizeof(jshort)), FUNASR_MODE_OFFLINE, sample_rate);
  jstring out = ResultText(env, r);
  if (r) FunASRFreeResult(r);
  return out;
}

// Per-token timestamps from the last offline result require the BiCif head;
// returns "[[start_ms,end_ms],...]" JSON or "".
JNIEXPORT jstring JNICALL Java_com_funasr_tpu_FunasrTpu_nativeInferPcmJson(
    JNIEnv* env, jclass, jlong handle, jshortArray pcm, jint sample_rate) {
  if (!handle || pcm == nullptr) return env->NewStringUTF("{}");
  const jsize n = env->GetArrayLength(pcm);
  std::vector<jshort> buf(n);
  env->GetShortArrayRegion(pcm, 0, n, buf.data());
  FUNASR_RESULT r = FunOfflineInfer(
      reinterpret_cast<FUNASR_HANDLE>(handle),
      reinterpret_cast<const char*>(buf.data()),
      static_cast<int>(n * sizeof(jshort)), FUNASR_MODE_OFFLINE, sample_rate);
  std::string json = "{\"text\":\"";
  if (r) {
    const char* text = FunASRGetResult(r, 0);
    for (const char* c = text ? text : ""; *c; ++c) {
      if (*c == '"' || *c == '\\') json.push_back('\\');
      json.push_back(*c);
    }
    json += "\",\"timestamp\":";
    const char* stamp = FunASRGetStamp(r);
    json += (stamp && *stamp) ? stamp : "[]";
    json += "}";
    FunASRFreeResult(r);
  } else {
    json += "\",\"timestamp\":[]}";
  }
  return env->NewStringUTF(json.c_str());
}

// ---- streaming (600 ms chunked paraformer-online role) ------------------

JNIEXPORT jlong JNICALL Java_com_funasr_tpu_FunasrTpu_nativeStreamCreate(
    JNIEnv*, jclass, jlong handle) {
  if (!handle) return 0;
  return reinterpret_cast<jlong>(
      FunASRStreamCreate(reinterpret_cast<FUNASR_HANDLE>(handle)));
}

JNIEXPORT jstring JNICALL Java_com_funasr_tpu_FunasrTpu_nativeStreamInfer(
    JNIEnv* env, jclass, jlong stream, jshortArray pcm, jboolean is_final,
    jint sample_rate) {
  if (!stream) return env->NewStringUTF("");
  std::vector<jshort> buf;
  jsize n = 0;
  if (pcm != nullptr) {
    n = env->GetArrayLength(pcm);
    buf.resize(n);
    env->GetShortArrayRegion(pcm, 0, n, buf.data());
  }
  FUNASR_RESULT r = FunASRStreamInfer(
      reinterpret_cast<FUNASR_STREAM>(stream),
      reinterpret_cast<const char*>(buf.data()),
      static_cast<int>(n * sizeof(jshort)), is_final ? 1 : 0, sample_rate);
  jstring out = ResultText(env, r);
  if (r) FunASRFreeResult(r);
  return out;
}

JNIEXPORT void JNICALL Java_com_funasr_tpu_FunasrTpu_nativeStreamFree(
    JNIEnv*, jclass, jlong stream) {
  if (stream) FunASRStreamFree(reinterpret_cast<FUNASR_STREAM>(stream));
}

// ---- VAD ----------------------------------------------------------------

JNIEXPORT jintArray JNICALL Java_com_funasr_tpu_FunasrTpu_nativeVadInfer(
    JNIEnv* env, jclass, jlong handle, jshortArray pcm, jint sample_rate) {
  if (!handle || pcm == nullptr) return env->NewIntArray(0);
  const jsize n = env->GetArrayLength(pcm);
  std::vector<jshort> buf(n);
  env->GetShortArrayRegion(pcm, 0, n, buf.data());
  FUNASR_RESULT r = FunVadInfer(
      reinterpret_cast<FUNASR_HANDLE>(handle),
      reinterpret_cast<const char*>(buf.data()),
      static_cast<int>(n * sizeof(jshort)), sample_rate);
  if (r == nullptr) return env->NewIntArray(0);
  const int count = FunASRGetSegmentCount(r);
  std::vector<jint> flat(static_cast<size_t>(count) * 2);
  for (int i = 0; i < count; ++i) {
    flat[2 * i] = FunASRGetSegmentStart(r, i);
    flat[2 * i + 1] = FunASRGetSegmentEnd(r, i);
  }
  FunASRFreeResult(r);
  jintArray out = env->NewIntArray(count * 2);
  if (count > 0) env->SetIntArrayRegion(out, 0, count * 2, flat.data());
  return out;
}

}  // extern "C"
