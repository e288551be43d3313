/** Unit tests for the audio conversion + transcript assembly (run with
 * vitest where a node toolchain exists; funasr_tpu's own CI string-checks the
 * protocol needles instead). */
import { describe, expect, it } from "vitest";

import {
  FrameAccumulator,
  decodeUlaw,
  ulawToPcm16,
  upsample8kTo16k,
} from "../src/audio";

describe("G.711 mu-law", () => {
  it("decodes the ITU-T reference points", () => {
    expect(ulawToPcm16(0xff)).toBe(0); // +0
    expect(ulawToPcm16(0x7f)).toBe(-0); // -0
    expect(ulawToPcm16(0x80)).toBe(32124); // max positive
    expect(ulawToPcm16(0x00)).toBe(-32124); // max negative
  });
  it("round-trips a buffer", () => {
    const out = decodeUlaw(new Uint8Array([0xff, 0x80, 0x00]));
    expect(Array.from(out)).toEqual([0, 32124, -32124]);
  });
});

describe("upsample + framing", () => {
  it("doubles the rate with interpolated midpoints", () => {
    const up = upsample8kTo16k(new Int16Array([0, 100]));
    expect(Array.from(up)).toEqual([0, 50, 100, 100]);
  });
  it("emits 60 ms frames and flushes the tail", () => {
    const acc = new FrameAccumulator(4);
    expect(acc.push(new Int16Array([1, 2, 3]))).toHaveLength(0);
    const frames = acc.push(new Int16Array([4, 5]));
    expect(frames).toHaveLength(1);
    expect(frames[0].byteLength).toBe(8); // 4 samples * 2 bytes
    const tail = acc.flush();
    expect(tail?.byteLength).toBe(2);
  });
});
