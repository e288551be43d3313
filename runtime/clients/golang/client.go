// Go WebSocket client for the funasr_tpu realtime ASR servers
// (counterpart of reference runtime/golang/websocket, rebuilt on a minimal
// stdlib-only RFC 6455 implementation — no gorilla dependency).
//
//	go run client.go -url ws://127.0.0.1:10095 -mode 2pass -audio a.wav
package main

import (
	"bufio"
	"crypto/rand"
	"crypto/sha1"
	"encoding/base64"
	"encoding/binary"
	"encoding/json"
	"flag"
	"fmt"
	"net"
	"net/url"
	"os"
	"strings"
	"time"
)

// ---- minimal RFC 6455 client ----

type wsConn struct {
	conn net.Conn
	br   *bufio.Reader
}

func wsDial(rawURL string) (*wsConn, error) {
	u, err := url.Parse(rawURL)
	if err != nil {
		return nil, err
	}
	host := u.Host
	if !strings.Contains(host, ":") {
		host += ":80"
	}
	conn, err := net.DialTimeout("tcp", host, 10*time.Second)
	if err != nil {
		return nil, err
	}
	keyRaw := make([]byte, 16)
	rand.Read(keyRaw)
	key := base64.StdEncoding.EncodeToString(keyRaw)
	path := u.Path
	if path == "" {
		path = "/"
	}
	fmt.Fprintf(conn, "GET %s HTTP/1.1\r\nHost: %s\r\nUpgrade: websocket\r\n"+
		"Connection: Upgrade\r\nSec-WebSocket-Key: %s\r\n"+
		"Sec-WebSocket-Version: 13\r\n\r\n", path, u.Host, key)
	br := bufio.NewReader(conn)
	status, err := br.ReadString('\n')
	if err != nil || !strings.Contains(status, "101") {
		return nil, fmt.Errorf("handshake rejected: %q %v", status, err)
	}
	accept := ""
	for {
		line, err := br.ReadString('\n')
		if err != nil {
			return nil, err
		}
		line = strings.TrimSpace(line)
		if line == "" {
			break
		}
		if strings.HasPrefix(strings.ToLower(line), "sec-websocket-accept:") {
			accept = strings.TrimSpace(line[len("sec-websocket-accept:"):])
		}
	}
	h := sha1.Sum([]byte(key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"))
	if accept != base64.StdEncoding.EncodeToString(h[:]) {
		return nil, fmt.Errorf("bad Sec-WebSocket-Accept")
	}
	return &wsConn{conn: conn, br: br}, nil
}

func (w *wsConn) send(opcode byte, payload []byte) error {
	head := []byte{0x80 | opcode}
	n := len(payload)
	switch {
	case n < 126:
		head = append(head, 0x80|byte(n))
	case n < 1<<16:
		head = append(head, 0x80|126, byte(n>>8), byte(n))
	default:
		ext := make([]byte, 9)
		ext[0] = 0x80 | 127
		binary.BigEndian.PutUint64(ext[1:], uint64(n))
		head = append(head, ext...)
	}
	mask := make([]byte, 4)
	rand.Read(mask)
	head = append(head, mask...)
	masked := make([]byte, n)
	for i, b := range payload {
		masked[i] = b ^ mask[i%4]
	}
	if _, err := w.conn.Write(head); err != nil {
		return err
	}
	_, err := w.conn.Write(masked)
	return err
}

func (w *wsConn) recv() (byte, []byte, error) {
	var msg []byte
	var op byte
	for {
		h := make([]byte, 2)
		if _, err := readFull(w.br, h); err != nil {
			return 0, nil, err
		}
		fin := h[0]&0x80 != 0
		opcode := h[0] & 0x0f
		n := uint64(h[1] & 0x7f)
		if n == 126 {
			ext := make([]byte, 2)
			readFull(w.br, ext)
			n = uint64(binary.BigEndian.Uint16(ext))
		} else if n == 127 {
			ext := make([]byte, 8)
			readFull(w.br, ext)
			n = binary.BigEndian.Uint64(ext)
		}
		payload := make([]byte, n)
		if _, err := readFull(w.br, payload); err != nil {
			return 0, nil, err
		}
		switch opcode {
		case 0x9: // ping -> pong
			w.send(0xA, payload)
			continue
		case 0x8:
			return 0x8, payload, nil
		case 0x0:
		default:
			op = opcode
		}
		msg = append(msg, payload...)
		if fin {
			return op, msg, nil
		}
	}
}

func readFull(br *bufio.Reader, buf []byte) (int, error) {
	total := 0
	for total < len(buf) {
		n, err := br.Read(buf[total:])
		if err != nil {
			return total, err
		}
		total += n
	}
	return total, nil
}

// ---- funasr_tpu protocol ----

type result struct {
	Mode    string `json:"mode"`
	Text    string `json:"text"`
	IsFinal bool   `json:"is_final"`
}

func main() {
	urlFlag := flag.String("url", "ws://127.0.0.1:10095", "server url")
	mode := flag.String("mode", "2pass", "offline|online|2pass")
	audio := flag.String("audio", "audio.wav", "wav/pcm file (16 kHz PCM16)")
	hotwords := flag.String("hotwords", "", "hotword string")
	flag.Parse()

	ws, err := wsDial(*urlFlag)
	if err != nil {
		fmt.Fprintln(os.Stderr, "dial:", err)
		os.Exit(1)
	}
	cfg := map[string]interface{}{
		"mode": *mode, "chunk_size": []int{5, 10, 5}, "chunk_interval": 10,
		"wav_name": *audio, "is_speaking": true, "itn": true,
	}
	if *hotwords != "" {
		cfg["hotwords"] = *hotwords
	}
	buf, _ := json.Marshal(cfg)
	ws.send(0x1, buf)

	pcm, err := os.ReadFile(*audio)
	if err != nil {
		fmt.Fprintln(os.Stderr, "read:", err)
		os.Exit(1)
	}
	if len(pcm) > 44 && string(pcm[:4]) == "RIFF" {
		pcm = pcm[44:]
	}

	doneCh := make(chan struct{})
	go func() {
		defer close(doneCh)
		for {
			op, payload, err := ws.recv()
			if err != nil || op == 0x8 {
				return
			}
			var r result
			if json.Unmarshal(payload, &r) == nil {
				fmt.Printf("<- [%s] %s\n", r.Mode, r.Text)
				if r.IsFinal && !strings.HasSuffix(r.Mode, "online") {
					return
				}
			}
		}
	}()

	stride := 960 * 2 * 5 // 60ms * chunk_size[1]/chunk_interval at 16 kHz
	for off := 0; off < len(pcm); off += stride {
		end := off + stride
		if end > len(pcm) {
			end = len(pcm)
		}
		ws.send(0x2, pcm[off:end])
		if *mode != "offline" {
			time.Sleep(5 * time.Millisecond)
		}
	}
	ws.send(0x1, []byte(`{"is_speaking": false}`))

	select {
	case <-doneCh:
	case <-time.After(60 * time.Second):
	}
	ws.send(0x8, nil)
}
