// C# WebSocket client for the funasr_tpu realtime ASR servers
// (counterpart of reference runtime/csharp/ws-client, rebuilt on
// System.Net.WebSockets.ClientWebSocket — no external deps).
//
//   dotnet run -- ws://127.0.0.1:10095 2pass audio.wav

using System;
using System.IO;
using System.Net.WebSockets;
using System.Text;
using System.Text.Json;
using System.Threading;
using System.Threading.Tasks;

public static class FunasrTpuWsClient
{
    public static async Task<int> Main(string[] args)
    {
        var url = args.Length > 0 ? args[0] : "ws://127.0.0.1:10095";
        var mode = args.Length > 1 ? args[1] : "2pass";
        var wav = args.Length > 2 ? args[2] : "audio.wav";

        using var ws = new ClientWebSocket();
        await ws.ConnectAsync(new Uri(url), CancellationToken.None);

        var cfg = JsonSerializer.Serialize(new
        {
            mode,
            chunk_size = new[] { 5, 10, 5 },
            chunk_interval = 10,
            wav_name = wav,
            is_speaking = true,
            itn = true,
        });
        await SendText(ws, cfg);

        var done = new TaskCompletionSource<bool>();
        _ = Task.Run(async () =>
        {
            var buf = new byte[1 << 16];
            var sb = new StringBuilder();
            while (ws.State == WebSocketState.Open)
            {
                var res = await ws.ReceiveAsync(buf, CancellationToken.None);
                if (res.MessageType == WebSocketMessageType.Close) break;
                sb.Append(Encoding.UTF8.GetString(buf, 0, res.Count));
                if (!res.EndOfMessage) continue;
                var msg = sb.ToString(); sb.Clear();
                Console.WriteLine("<- " + msg);
                using var doc = JsonDocument.Parse(msg);
                var root = doc.RootElement;
                bool isFinal = root.TryGetProperty("is_final", out var f)
                               && f.GetBoolean();
                string m = root.TryGetProperty("mode", out var mm)
                           ? mm.GetString() ?? "" : "";
                if (isFinal && !m.EndsWith("online")) { done.TrySetResult(true); break; }
            }
            done.TrySetResult(true);
        });

        var pcm = File.ReadAllBytes(wav);
        int offset = pcm.Length > 44 && pcm[0] == 'R' && pcm[1] == 'I' ? 44 : 0;
        const int stride = 960 * 2 * 5; // 60ms * chunk_size[1]/chunk_interval
        for (int off = offset; off < pcm.Length; off += stride)
        {
            int len = Math.Min(stride, pcm.Length - off);
            await ws.SendAsync(new ArraySegment<byte>(pcm, off, len),
                               WebSocketMessageType.Binary, true,
                               CancellationToken.None);
            if (mode != "offline") await Task.Delay(5);
        }
        await SendText(ws, "{\"is_speaking\": false}");

        await Task.WhenAny(done.Task, Task.Delay(TimeSpan.FromSeconds(60)));
        if (ws.State == WebSocketState.Open)
            await ws.CloseAsync(WebSocketCloseStatus.NormalClosure, "done",
                                CancellationToken.None);
        return 0;
    }

    private static Task SendText(ClientWebSocket ws, string text) =>
        ws.SendAsync(Encoding.UTF8.GetBytes(text), WebSocketMessageType.Text,
                     true, CancellationToken.None);
}
