package com.funasr.tpu;

/**
 * On-device speech recognition over the funasr_tpu native runtime.
 *
 * TPU-era counterpart of the reference Android library (FunASR
 * runtime/android): the full pipeline — fbank/LFR/CMVN DSP, FTR int8/int4
 * Paraformer engines, FSMN-VAD, CT-Transformer punctuation, ITN — runs
 * on-device inside libfunasr_tpu_jni.so; no network, no server.
 *
 * <pre>
 *   FunasrTpu asr = FunasrTpu.load(modelDir, 2);
 *   String text = asr.recognize(pcm16, 16000);          // offline
 *   FunasrTpu.Stream s = asr.openStream();              // streaming
 *   String partial = s.feed(chunk, false, 16000);
 *   String tail = s.feed(new short[0], true, 16000);    // flush
 *   s.close(); asr.close();
 * </pre>
 *
 * The model directory is produced by {@code funasr-tpu-export --runtime
 * native --quant int8|int4} (weights.ftr + tokens.txt + am.mvn + optional
 * vad.ftr/punc.ftr); int4 halves the file for mobile installs.
 */
public final class FunasrTpu implements AutoCloseable {

    static {
        System.loadLibrary("funasr_tpu_jni");
    }

    private long handle;

    private FunasrTpu(long handle) {
        this.handle = handle;
    }

    /** Loads a recognizer; threads bounds the intra-op GEMM pool. */
    public static FunasrTpu load(String modelDir, int threads) {
        long h = nativeInit(modelDir, threads);
        if (h == 0) {
            throw new IllegalArgumentException(
                    "failed to load model dir: " + modelDir);
        }
        return new FunasrTpu(h);
    }

    /** Offline transcription of a whole utterance (PCM16 mono). */
    public String recognize(short[] pcm, int sampleRate) {
        checkOpen();
        return nativeInferPcm(handle, pcm, sampleRate);
    }

    /**
     * Offline transcription returning JSON {@code {"text": ..., "timestamp":
     * [[startMs, endMs], ...]}} (timestamps need a BiCif/SeACo export).
     */
    public String recognizeWithTimestamps(short[] pcm, int sampleRate) {
        checkOpen();
        return nativeInferPcmJson(handle, pcm, sampleRate);
    }

    /** VAD segments as [start0, end0, start1, end1, ...] milliseconds. */
    public int[] detectVoice(short[] pcm, int sampleRate) {
        checkOpen();
        return nativeVadInfer(handle, pcm, sampleRate);
    }

    /** Opens a streaming session (600 ms chunked decode with carry caches). */
    public Stream openStream() {
        checkOpen();
        long s = nativeStreamCreate(handle);
        if (s == 0) throw new IllegalStateException("stream create failed");
        return new Stream(s);
    }

    @Override
    public void close() {
        if (handle != 0) {
            nativeRelease(handle);
            handle = 0;
        }
    }

    private void checkOpen() {
        if (handle == 0) throw new IllegalStateException("recognizer closed");
    }

    /** A streaming decode session; NOT thread-safe (one feeder thread). */
    public static final class Stream implements AutoCloseable {
        private long stream;

        private Stream(long stream) {
            this.stream = stream;
        }

        /**
         * Feeds PCM16 and returns the NEW tokens decoded from the complete
         * 600 ms strides buffered so far ("" while accumulating). Passing
         * {@code isFinal=true} flushes the tail and resets the session.
         */
        public String feed(short[] pcm, boolean isFinal, int sampleRate) {
            if (stream == 0) throw new IllegalStateException("stream closed");
            return nativeStreamInfer(stream, pcm, isFinal, sampleRate);
        }

        @Override
        public void close() {
            if (stream != 0) {
                nativeStreamFree(stream);
                stream = 0;
            }
        }
    }

    private static native long nativeInit(String modelDir, int threads);
    private static native void nativeRelease(long handle);
    private static native String nativeInferPcm(long handle, short[] pcm,
                                                int sampleRate);
    private static native String nativeInferPcmJson(long handle, short[] pcm,
                                                    int sampleRate);
    private static native long nativeStreamCreate(long handle);
    private static native String nativeStreamInfer(long stream, short[] pcm,
                                                   boolean isFinal,
                                                   int sampleRate);
    private static native void nativeStreamFree(long stream);
    private static native int[] nativeVadInfer(long handle, short[] pcm,
                                               int sampleRate);
}
