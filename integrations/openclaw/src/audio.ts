/**
 * Telephony audio conversion for the funasr_tpu voice path: OpenClaw delivers
 * 8 kHz G.711 mu-law frames; the funasr_tpu WebSocket server expects 16 kHz
 * PCM16 little-endian binary frames of ~60 ms.
 *
 * Counterpart of funasr_tpu/utils/load_utils.py `_g711_ulaw_decode` (same
 * ITU-T G.711 expansion) so both ends of the wire agree bit-for-bit.
 */

/** G.711 mu-law byte -> linear PCM16 sample. */
export function ulawToPcm16(b: number): number {
  const u = ~b & 0xff;
  const sign = u & 0x80;
  const exponent = (u >> 4) & 0x07;
  const mantissa = u & 0x0f;
  const mag = (((mantissa << 3) + 0x84) << exponent) - 0x84;
  return sign ? -mag : mag;
}

/** Decode a mu-law buffer to an Int16Array. */
export function decodeUlaw(buf: Uint8Array): Int16Array {
  const out = new Int16Array(buf.length);
  for (let i = 0; i < buf.length; i++) out[i] = ulawToPcm16(buf[i]);
  return out;
}

/** Linear 2x upsample 8 kHz -> 16 kHz (interpolated midpoints). */
export function upsample8kTo16k(x: Int16Array): Int16Array {
  const out = new Int16Array(x.length * 2);
  for (let i = 0; i < x.length; i++) {
    out[2 * i] = x[i];
    const next = i + 1 < x.length ? x[i + 1] : x[i];
    out[2 * i + 1] = (x[i] + next) >> 1;
  }
  return out;
}

/** Frames 16 kHz PCM16 into fixed-size chunks (default 60 ms = 960 samples). */
export class FrameAccumulator {
  private pending: Int16Array = new Int16Array(0);
  constructor(private readonly samplesPerFrame = 960) {}

  /** Push samples; returns zero or more complete frames as binary buffers. */
  push(samples: Int16Array): Uint8Array[] {
    const merged = new Int16Array(this.pending.length + samples.length);
    merged.set(this.pending, 0);
    merged.set(samples, this.pending.length);
    const frames: Uint8Array[] = [];
    let off = 0;
    while (merged.length - off >= this.samplesPerFrame) {
      const frame = merged.subarray(off, off + this.samplesPerFrame);
      frames.push(new Uint8Array(frame.slice().buffer));
      off += this.samplesPerFrame;
    }
    this.pending = merged.slice(off);
    return frames;
  }

  /** Flush the (zero-padded) remainder as a final short frame, if any. */
  flush(): Uint8Array | null {
    if (this.pending.length === 0) return null;
    const out = new Uint8Array(this.pending.slice().buffer);
    this.pending = new Int16Array(0);
    return out;
  }
}
