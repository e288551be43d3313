/*
 * Java WebSocket client for the funasr_tpu realtime ASR servers
 * (counterpart of reference runtime/java/FunasrWsClient.java, rebuilt on the
 * JDK 11+ java.net.http.WebSocket API — no external deps).
 *
 * Build & run:
 *   javac FunasrTpuWsClient.java
 *   java FunasrTpuWsClient ws://127.0.0.1:10095 2pass audio.wav
 */

import java.io.ByteArrayOutputStream;
import java.io.DataInputStream;
import java.io.FileInputStream;
import java.net.URI;
import java.net.http.HttpClient;
import java.net.http.WebSocket;
import java.nio.ByteBuffer;
import java.util.concurrent.CompletableFuture;
import java.util.concurrent.CompletionStage;
import java.util.concurrent.CountDownLatch;
import java.util.concurrent.TimeUnit;

public class FunasrTpuWsClient {

    static final CountDownLatch done = new CountDownLatch(1);

    static class Listener implements WebSocket.Listener {
        private final StringBuilder buf = new StringBuilder();

        @Override
        public CompletionStage<?> onText(WebSocket ws, CharSequence data,
                                         boolean last) {
            buf.append(data);
            if (last) {
                String msg = buf.toString();
                buf.setLength(0);
                System.out.println("<- " + msg);
                // the offline/2pass final carries "is_final": true
                if (msg.contains("\"is_final\": true")
                        || msg.contains("\"is_final\":true")) {
                    done.countDown();
                }
            }
            ws.request(1);
            return null;
        }

        @Override
        public void onError(WebSocket ws, Throwable error) {
            System.err.println("ws error: " + error);
            done.countDown();
        }
    }

    /** Strip a RIFF/WAVE header if present; assumes 16 kHz mono PCM16 data. */
    static byte[] readPcm(String path) throws Exception {
        DataInputStream in = new DataInputStream(new FileInputStream(path));
        ByteArrayOutputStream out = new ByteArrayOutputStream();
        byte[] tmp = new byte[8192];
        int n;
        while ((n = in.read(tmp)) > 0) out.write(tmp, 0, n);
        in.close();
        byte[] all = out.toByteArray();
        if (all.length > 44 && all[0] == 'R' && all[1] == 'I' && all[2] == 'F'
                && all[3] == 'F') {
            byte[] pcm = new byte[all.length - 44];
            System.arraycopy(all, 44, pcm, 0, pcm.length);
            return pcm;
        }
        return all;
    }

    public static void main(String[] args) throws Exception {
        String url = args.length > 0 ? args[0] : "ws://127.0.0.1:10095";
        String mode = args.length > 1 ? args[1] : "2pass";
        String wav = args.length > 2 ? args[2] : "audio.wav";

        WebSocket ws = HttpClient.newHttpClient().newWebSocketBuilder()
                .buildAsync(URI.create(url), new Listener())
                .join();

        String cfg = String.format(
                "{\"mode\": \"%s\", \"chunk_size\": [5, 10, 5], "
                + "\"chunk_interval\": 10, \"wav_name\": \"%s\", "
                + "\"is_speaking\": true, \"itn\": true}", mode, wav);
        ws.sendText(cfg, true).join();

        byte[] pcm = readPcm(wav);
        int stride = 960 * 2 * 5;  // 60ms * chunk_size[1]/chunk_interval at 16 kHz
        for (int off = 0; off < pcm.length; off += stride) {
            int len = Math.min(stride, pcm.length - off);
            CompletableFuture<WebSocket> f =
                    ws.sendBinary(ByteBuffer.wrap(pcm, off, len), true);
            f.join();
            if (!mode.equals("offline")) Thread.sleep(5);
        }
        ws.sendText("{\"is_speaking\": false}", true).join();

        done.await(60, TimeUnit.SECONDS);
        ws.sendClose(WebSocket.NORMAL_CLOSURE, "done").join();
    }
}
