// funasr_tpu html5 microphone client.
// getUserMedia -> AudioWorklet downsample to 16 kHz PCM16 -> WebSocket frames,
// rendering 2pass-online partials and 2pass-offline finals.

const $ = (id) => document.getElementById(id);
let ws = null, audioCtx = null, node = null, stream = null;

const WORKLET = `
class Pcm16Downsampler extends AudioWorkletProcessor {
  constructor() { super(); this.acc = []; this.ratio = sampleRate / 16000; this.pos = 0; }
  process(inputs) {
    const ch = inputs[0][0];
    if (!ch) return true;
    // linear-interpolation resample to 16 kHz
    const out = [];
    while (this.pos < ch.length - 1) {
      const i = Math.floor(this.pos), frac = this.pos - i;
      out.push(ch[i] * (1 - frac) + ch[i + 1] * frac);
      this.pos += this.ratio;
    }
    this.pos -= ch.length;
    if (out.length) {
      const buf = new Int16Array(out.length);
      for (let i = 0; i < out.length; i++)
        buf[i] = Math.max(-32768, Math.min(32767, out[i] * 32768));
      this.port.postMessage(buf.buffer, [buf.buffer]);
    }
    return true;
  }
}
registerProcessor("pcm16-downsampler", Pcm16Downsampler);
`;

function render(msg) {
  if ((msg.mode || "").endsWith("online")) {
    $("partial").textContent = msg.text || "";
  } else {
    $("final").textContent += (msg.text || "");
    $("partial").textContent = "";
  }
}

async function start() {
  ws = new WebSocket($("url").value);
  ws.onmessage = (e) => { try { render(JSON.parse(e.data)); } catch (_) {} };
  ws.onclose = () => { $("status").textContent = "disconnected"; };
  await new Promise((ok, err) => { ws.onopen = ok; ws.onerror = err; });

  const cfg = { mode: $("mode").value, chunk_size: [5, 10, 5],
                chunk_interval: 10, wav_name: "h5", is_speaking: true,
                itn: true };
  const hw = $("hotwords").value.trim();
  if (hw) cfg.hotwords = hw;
  ws.send(JSON.stringify(cfg));

  stream = await navigator.mediaDevices.getUserMedia({ audio: true });
  audioCtx = new AudioContext();
  const blob = new Blob([WORKLET], { type: "application/javascript" });
  await audioCtx.audioWorklet.addModule(URL.createObjectURL(blob));
  node = new AudioWorkletNode(audioCtx, "pcm16-downsampler");
  node.port.onmessage = (e) => {
    if (ws && ws.readyState === WebSocket.OPEN) ws.send(e.data);
  };
  audioCtx.createMediaStreamSource(stream).connect(node);
  $("start").disabled = true; $("stop").disabled = false;
  $("status").textContent = "recording";
}

function stop() {
  if (node) node.disconnect();
  if (stream) stream.getTracks().forEach((t) => t.stop());
  if (audioCtx) audioCtx.close();
  if (ws && ws.readyState === WebSocket.OPEN) {
    ws.send(JSON.stringify({ is_speaking: false }));
    setTimeout(() => ws.close(), 2000);
  }
  $("start").disabled = false; $("stop").disabled = true;
  $("status").textContent = "idle";
}

$("start").onclick = () => start().catch((e) => {
  $("status").textContent = "error: " + e;
});
$("stop").onclick = stop;
