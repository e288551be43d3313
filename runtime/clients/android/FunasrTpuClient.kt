/*
 * Android (Kotlin) client for the funasr_tpu realtime ASR servers
 * (counterpart of reference runtime/android; original implementation using
 * OkHttp's WebSocket + AudioRecord).
 *
 * Gradle: implementation("com.squareup.okhttp3:okhttp:4.12.0")
 * Manifest: RECORD_AUDIO + INTERNET permissions.
 */
package com.funasr.tpu.client

import android.annotation.SuppressLint
import android.media.AudioFormat
import android.media.AudioRecord
import android.media.MediaRecorder
import okhttp3.OkHttpClient
import okhttp3.Request
import okhttp3.Response
import okhttp3.WebSocket
import okhttp3.WebSocketListener
import okio.ByteString.Companion.toByteString
import org.json.JSONObject
import java.util.concurrent.atomic.AtomicBoolean

class FunasrTpuClient(
    private val url: String = "ws://127.0.0.1:10095",
    private val mode: String = "2pass",
    private val hotwords: String = "",
    private val onPartial: (String) -> Unit,
    private val onFinal: (String) -> Unit,
) {
    private val http = OkHttpClient()
    private var ws: WebSocket? = null
    private val recording = AtomicBoolean(false)
    private var recorder: AudioRecord? = null

    private val listener = object : WebSocketListener() {
        override fun onMessage(webSocket: WebSocket, text: String) {
            val msg = JSONObject(text)
            val m = msg.optString("mode")
            val t = msg.optString("text")
            if (m.endsWith("online")) onPartial(t) else onFinal(t)
        }

        override fun onFailure(webSocket: WebSocket, t: Throwable, r: Response?) {
            stop()
        }
    }

    @SuppressLint("MissingPermission")
    fun start() {
        ws = http.newWebSocket(Request.Builder().url(url).build(), listener)
        val cfg = JSONObject()
            .put("mode", mode)
            .put("chunk_size", listOf(5, 10, 5))
            .put("chunk_interval", 10)
            .put("wav_name", "android")
            .put("is_speaking", true)
            .put("itn", true)
        if (hotwords.isNotEmpty()) cfg.put("hotwords", hotwords)
        ws?.send(cfg.toString())

        val minBuf = AudioRecord.getMinBufferSize(
            16000, AudioFormat.CHANNEL_IN_MONO, AudioFormat.ENCODING_PCM_16BIT)
        recorder = AudioRecord(
            MediaRecorder.AudioSource.VOICE_RECOGNITION, 16000,
            AudioFormat.CHANNEL_IN_MONO, AudioFormat.ENCODING_PCM_16BIT,
            maxOf(minBuf, 9600))
        recording.set(true)
        recorder?.startRecording()
        Thread {
            val buf = ByteArray(9600) // 300 ms at 16 kHz PCM16
            while (recording.get()) {
                val n = recorder?.read(buf, 0, buf.size) ?: break
                if (n > 0) ws?.send(buf.copyOf(n).toByteString())
            }
        }.start()
    }

    fun stop() {
        recording.set(false)
        recorder?.stop(); recorder?.release(); recorder = null
        ws?.send("""{"is_speaking": false}""")
        ws?.close(1000, "done")
    }
}
