"""ExportedModel artifact loader + MCP stdio server."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_exported_model_roundtrip(tmp_path, rng):
    """export CLI artifacts -> ExportedModel reproduces infer_jit outputs."""
    import jax
    import jax.numpy as jnp
    from funasr_tpu.bin.export import export_model
    from funasr_tpu.export_runtime import ExportedModel, save_params_npz
    from funasr_tpu.register import tables
    import funasr_tpu  # noqa: F401

    model = tables.model_classes["Paraformer"](
        input_size=40, vocab_size=16, sos=1, eos=2, sampling_ratio=0.0,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2, kernel_size=11, sanm_shfit=0),
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, kernel_size=11, sanm_shfit=0),
        predictor_conf=dict(idim=32, l_order=1, r_order=1))
    params = model.init_params(jax.random.PRNGKey(0))
    d = str(tmp_path)
    export_model(model, params, d, buckets=[(2, 24)])
    save_params_npz(params, os.path.join(d, "params.npz"))
    with open(os.path.join(d, "tokens.txt"), "w") as f:
        f.write("\n".join(f"t{i}" for i in range(16)))
    # frontend-free check: call the deserialized function directly
    m = ExportedModel(d)
    speech = jnp.asarray(rng.standard_normal((2, 24, 40)), jnp.float32)
    lens = jnp.asarray([24, 20], jnp.int32)
    y_ref, l_ref, _, _, _ = model.infer_jit(params, speech, lens)
    y, l, _ = m.functions[0]["call"](m.params, speech, lens)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    np.testing.assert_array_equal(np.asarray(l), np.asarray(l_ref))


def test_ftr_int4_pack_exact(tmp_path, rng):
    """int4 FTR nibble packing is bit-exact against a reference unpacker."""
    import struct

    from funasr_tpu.export_runtime import _write_ftr

    w = rng.standard_normal((96, 64)).astype(np.float32)
    path = str(tmp_path / "w.ftr")
    _write_ftr(path, {"model": "T"}, {"lin/w": w}, quant="int4")

    with open(path, "rb") as f:
        assert f.read(4) == b"FTR1"
        (meta_len,) = struct.unpack("<I", f.read(4))
        f.read(meta_len)
        (n,) = struct.unpack("<I", f.read(4))
        assert n == 1
        (name_len,) = struct.unpack("<I", f.read(4))
        assert f.read(name_len) == b"lin/w"
        dtype, ndim = struct.unpack("<BB", f.read(2))
        assert dtype == 2 and ndim == 2
        shape = struct.unpack("<2q", f.read(16))
        assert shape == (96, 64)
        (n_scales,) = struct.unpack("<q", f.read(8))
        scales = np.frombuffer(f.read(4 * n_scales), "<f4")
        packed = np.frombuffer(f.read((96 * 64 + 1) // 2), np.uint8)

    # reference unpack: low nibble = even flat index, sign-extend via (x^8)-8
    lo = (packed & 0x0F).astype(np.int16)
    hi = (packed >> 4).astype(np.int16)
    q = np.empty(96 * 64, np.int16)
    q[0::2] = lo
    q[1::2] = hi
    q = ((q ^ 8) - 8).astype(np.float32).reshape(96, 64)
    want = np.clip(np.round(w / scales[None, :]), -7, 7)
    np.testing.assert_array_equal(q, want)
    # dequant error bound: half a quantization step per weight
    np.testing.assert_allclose(q * scales[None, :], w,
                               atol=float(scales.max()) * 0.5 + 1e-7)


def test_mcp_server_protocol(tmp_path):
    """Stdio JSON-RPC: tools/list + inverse_normalize (no model build)."""
    reqs = [
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
        {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
         "params": {"name": "inverse_normalize",
                    "arguments": {"text": "三百二十五", "language": "zh"}}},
        {"jsonrpc": "2.0", "id": 4, "method": "nope"},
    ]
    payload = "\n".join(json.dumps(r) for r in reqs) + "\n"
    out = subprocess.run(
        [sys.executable, "-m", "funasr_tpu.bin.mcp_server", "--model", "x",
         "--device", "cpu"],
        input=payload, capture_output=True, text=True, timeout=120,
        env={**os.environ,
             "PYTHONPATH": os.path.dirname(os.path.dirname(__file__))})
    lines = [json.loads(x) for x in out.stdout.strip().splitlines()]
    by_id = {r["id"]: r for r in lines}
    assert by_id[1]["result"]["serverInfo"]["name"] == "funasr-tpu"
    names = [t["name"] for t in by_id[2]["result"]["tools"]]
    assert names == ["transcribe", "inverse_normalize"]
    assert by_id[3]["result"]["content"][0]["text"] == "325"
    assert by_id[4]["error"]["code"] == -32601
