"""Web UI end-to-end: serve on a local port, POST a synthesis request."""

import copy
import io
import json
import threading
import urllib.request
import wave

import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    import zonos_tpu.apps.webui as ui
    from zonos_tpu.config import TRANSFORMER_CONFIG_DICT, ZonosConfig
    from zonos_tpu.models.tts import Zonos

    # preload a tiny model so the request path doesn't build the flagship
    d = copy.deepcopy(TRANSFORMER_CONFIG_DICT)
    d["backbone"].update(
        {"d_model": 64, "n_layer": 2, "attn_mlp_d_intermediate": 128,
         "attn_cfg": {"num_heads": 4, "num_heads_kv": 2}}
    )
    ui._STATE["model"] = Zonos(ZonosConfig.from_dict(d), seed=0)
    ui._STATE["model_name"] = "tiny"

    srv = ThreadingHTTPServer(("127.0.0.1", 0), ui.Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _multipart(fields: dict) -> tuple[bytes, str]:
    boundary = "testboundary123"
    out = io.BytesIO()
    for k, v in fields.items():
        out.write(f"--{boundary}\r\n".encode())
        out.write(f'Content-Disposition: form-data; name="{k}"\r\n\r\n'.encode())
        out.write(str(v).encode() + b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


def test_index_page(server):
    html = urllib.request.urlopen(server + "/").read().decode()
    assert "zonos-tpu" in html and "Synthesize" in html


def test_conditioners_endpoint(server):
    names = json.loads(urllib.request.urlopen(server + "/conditioners").read())
    assert "espeak" in names and "speaker" in names


def test_synthesize_roundtrip(server):
    body, ctype = _multipart({
        "model": "tiny", "text": "hi there", "language": "en-us",
        "seconds": "0.3", "seed": "3", "linear": "0", "conf": "0",
        "pitch_std": "45", "speaking_rate": "15", "fmax": "22050",
        "cfg_scale": "2", "quad": "0", "min_p": "0", "top_p": "0",
        "top_k": "0", "repetition_penalty": "3",
        "unconditional_keys": "emotion vqscore_8 dnsmos_ovrl",
        **{f"emotion_{i}": "0.1" for i in range(8)},
    })
    req = urllib.request.Request(server + "/synthesize", data=body,
                                 headers={"Content-Type": ctype})
    resp = urllib.request.urlopen(req, timeout=300)
    assert resp.status == 200
    with wave.open(io.BytesIO(resp.read())) as w:
        assert w.getframerate() == 44100
        assert w.getnframes() > 0


def test_synthesize_longform(server):
    body, ctype = _multipart({
        "model": "tiny",
        "text": "One short sentence here. Another sentence follows it. "
                "Then a third one arrives.",
        "language": "en-us", "longform": "1",
        "seconds": "0.3", "seed": "3", "linear": "0", "conf": "0",
        "pitch_std": "45", "speaking_rate": "15", "fmax": "22050",
        "cfg_scale": "2", "quad": "0", "min_p": "0", "top_p": "0",
        "top_k": "0", "repetition_penalty": "3",
        "unconditional_keys": "emotion vqscore_8 dnsmos_ovrl",
        **{f"emotion_{i}": "0.1" for i in range(8)},
    })
    req = urllib.request.Request(server + "/synthesize", data=body,
                                 headers={"Content-Type": ctype})
    resp = urllib.request.urlopen(req, timeout=600)
    assert resp.status == 200
    with wave.open(io.BytesIO(resp.read())) as w:
        assert w.getframerate() == 44100
        assert w.getnframes() > 0
