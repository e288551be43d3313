//
// iOS (Swift) client for the funasr_tpu realtime ASR servers
// (counterpart of reference runtime/ios; original implementation using
// URLSessionWebSocketTask + AVAudioEngine, no external deps).
//
// Info.plist: NSMicrophoneUsageDescription.
//

import AVFoundation
import Foundation

final class FunasrTpuClient: NSObject {
    private var task: URLSessionWebSocketTask?
    private let engine = AVAudioEngine()
    var onPartial: ((String) -> Void)?
    var onFinal: ((String) -> Void)?

    func start(url: URL = URL(string: "ws://127.0.0.1:10095")!,
               mode: String = "2pass", hotwords: String = "") throws {
        task = URLSession(configuration: .default).webSocketTask(with: url)
        task?.resume()
        receiveLoop()

        var cfg: [String: Any] = [
            "mode": mode, "chunk_size": [5, 10, 5], "chunk_interval": 10,
            "wav_name": "ios", "is_speaking": true, "itn": true,
        ]
        if !hotwords.isEmpty { cfg["hotwords"] = hotwords }
        let data = try JSONSerialization.data(withJSONObject: cfg)
        task?.send(.string(String(data: data, encoding: .utf8)!)) { _ in }

        let input = engine.inputNode
        let inFormat = input.outputFormat(forBus: 0)
        let outFormat = AVAudioFormat(commonFormat: .pcmFormatInt16,
                                      sampleRate: 16000, channels: 1,
                                      interleaved: true)!
        let converter = AVAudioConverter(from: inFormat, to: outFormat)!
        input.installTap(onBus: 0, bufferSize: 4096, format: inFormat) {
            [weak self] buffer, _ in
            let frames = AVAudioFrameCount(
                Double(buffer.frameLength) * 16000 / inFormat.sampleRate)
            guard let out = AVAudioPCMBuffer(pcmFormat: outFormat,
                                             frameCapacity: frames) else { return }
            var err: NSError?
            converter.convert(to: out, error: &err) { _, status in
                status.pointee = .haveData
                return buffer
            }
            guard err == nil, let ch = out.int16ChannelData else { return }
            let data = Data(bytes: ch[0], count: Int(out.frameLength) * 2)
            self?.task?.send(.data(data)) { _ in }
        }
        try engine.start()
    }

    func stop() {
        engine.inputNode.removeTap(onBus: 0)
        engine.stop()
        task?.send(.string("{\"is_speaking\": false}")) { _ in }
        DispatchQueue.main.asyncAfter(deadline: .now() + 2) {
            self.task?.cancel(with: .normalClosure, reason: nil)
        }
    }

    private func receiveLoop() {
        task?.receive { [weak self] result in
            guard let self = self else { return }
            if case .success(let message) = result {
                if case .string(let text) = message,
                   let obj = try? JSONSerialization.jsonObject(
                       with: Data(text.utf8)) as? [String: Any] {
                    let mode = obj["mode"] as? String ?? ""
                    let body = obj["text"] as? String ?? ""
                    if mode.hasSuffix("online") { self.onPartial?(body) }
                    else { self.onFinal?(body) }
                }
                self.receiveLoop()
            }
        }
    }
}
