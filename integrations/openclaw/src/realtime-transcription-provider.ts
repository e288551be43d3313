/**
 * OpenClaw realtime transcription provider for the funasr_tpu WebSocket
 * server (funasr_tpu/bin/funasr_wss_server.py protocol, which mirrors the
 * upstream FunASR runtime protocol):
 *
 *   -> text config: {"mode": "2pass"|"online"|"offline", "chunk_size":
 *      [5,10,5], "wav_name", "is_speaking": true, "hotwords", "itn"}
 *   -> binary: 16 kHz PCM16 little-endian frames (~60 ms)
 *   -> text   {"is_speaking": false} to finalize
 *   <- text: {"mode": "2pass-online"|..., "text", "wav_name", "is_final"}
 *
 * Audio in from OpenClaw is 8 kHz G.711 mu-law; see audio.ts for the
 * conversion pipeline. 2pass mode: online partials accumulate per segment
 * and are REPLACED by the offline final for that segment.
 */

import { FrameAccumulator, decodeUlaw, upsample8kTo16k } from "./audio";

export interface FunasrTpuProviderOptions {
  url?: string;
  mode?: "online" | "offline" | "2pass";
  hotwords?: string;
  itn?: boolean;
  bearerToken?: string;
  wavName?: string;
  /** cap on retained transcript segments (bounded state) */
  maxSegments?: number;
}

export interface TranscriptEvent {
  text: string;
  isFinal: boolean;
  /** full transcript so far (finals + current partial) */
  transcript: string;
}

type Listener = (ev: TranscriptEvent) => void;

export class FunasrTpuRealtimeTranscriptionProvider {
  private ws: WebSocket | null = null;
  private readonly frames = new FrameAccumulator(960); // 60 ms @ 16 kHz
  private finals: string[] = [];
  private partial = "";
  private listeners: Listener[] = [];
  private readonly opts: Required<FunasrTpuProviderOptions>;

  constructor(options: FunasrTpuProviderOptions = {}) {
    const env =
      typeof process !== "undefined" ? (process.env ?? {}) : ({} as any);
    this.opts = {
      url: options.url ?? env.FUNASR_WS_URL ?? "ws://127.0.0.1:10095",
      mode: options.mode ?? "2pass",
      hotwords: options.hotwords ?? "",
      itn: options.itn ?? true,
      bearerToken: options.bearerToken ?? env.FUNASR_WS_TOKEN ?? "",
      wavName: options.wavName ?? "openclaw",
      maxSegments: options.maxSegments ?? 256,
    };
  }

  onTranscript(fn: Listener): void {
    this.listeners.push(fn);
  }

  get transcript(): string {
    return (this.finals.join("") + this.partial).trim();
  }

  async start(): Promise<void> {
    const protocols = this.opts.bearerToken
      ? ["binary", `bearer.${this.opts.bearerToken}`]
      : ["binary"];
    const ws = new WebSocket(this.opts.url, protocols);
    ws.binaryType = "arraybuffer";
    this.ws = ws;
    await new Promise<void>((resolve, reject) => {
      ws.onopen = () => resolve();
      ws.onerror = (e) => reject(e);
    });
    ws.onmessage = (ev) => this.handleMessage(ev.data);
    ws.send(
      JSON.stringify({
        mode: this.opts.mode,
        chunk_size: [5, 10, 5],
        wav_name: this.opts.wavName,
        is_speaking: true,
        hotwords: this.opts.hotwords,
        itn: this.opts.itn,
      }),
    );
  }

  /** Feed one OpenClaw media frame: 8 kHz G.711 mu-law bytes. */
  pushUlaw(frame: Uint8Array): void {
    if (!this.ws) return;
    const pcm16k = upsample8kTo16k(decodeUlaw(frame));
    for (const f of this.frames.push(pcm16k)) this.ws.send(f);
  }

  /** Feed 16 kHz PCM16 directly (Talk surfaces that already resample). */
  pushPcm16(samples: Int16Array): void {
    if (!this.ws) return;
    for (const f of this.frames.push(samples)) this.ws.send(f);
  }

  /** Finalize the utterance: flush the remainder and signal end-of-speech. */
  async stop(): Promise<void> {
    if (!this.ws) return;
    const tail = this.frames.flush();
    if (tail) this.ws.send(tail);
    this.ws.send(JSON.stringify({ is_speaking: false }));
  }

  close(): void {
    this.ws?.close();
    this.ws = null;
  }

  private handleMessage(data: unknown): void {
    if (typeof data !== "string") return;
    let msg: any;
    try {
      msg = JSON.parse(data);
    } catch {
      return;
    }
    const mode: string = msg.mode ?? "";
    const text: string = msg.text ?? "";
    if (!text && !msg.is_final) return;
    if (mode.endsWith("offline")) {
      // 2pass/offline final: replaces the accumulated online partial
      this.finals.push(text);
      if (this.finals.length > this.opts.maxSegments) this.finals.shift();
      this.partial = "";
    } else {
      // online increments: the server sends deltas; clients concatenate
      this.partial += text;
    }
    const isFinal = Boolean(msg.is_final) || mode.endsWith("offline");
    const ev: TranscriptEvent = { text, isFinal, transcript: this.transcript };
    for (const fn of this.listeners) fn(ev);
  }
}
