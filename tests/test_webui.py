"""Web UI end-to-end: serve on a local port, POST a synthesis request."""

import copy
import io
import json
import threading
import urllib.error
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


def _base_fields(**over):
    f = {
        "model": "tiny", "text": "hi there", "language": "en-us",
        "seconds": "0.3", "seed": "3", "linear": "0", "conf": "0",
        "pitch_std": "45", "speaking_rate": "15", "fmax": "22050",
        "cfg_scale": "2", "quad": "0", "min_p": "0", "top_p": "0",
        "top_k": "0", "repetition_penalty": "3",
        "unconditional_keys": "emotion vqscore_8 dnsmos_ovrl",
        **{f"emotion_{i}": "0.1" for i in range(8)},
    }
    f.update(over)
    return f


def _get_json(url, timeout=60):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_async_job_progress_and_result(server):
    """The async surface the UI uses: submit -> poll /progress (step counts
    must advance) -> fetch /result as a playable wav."""
    import time

    body, ctype = _multipart(_base_fields(seconds="1.5"))
    req = urllib.request.Request(server + "/synthesize_async", data=body,
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=60) as r:
        jid = json.loads(r.read())["job"]

    seen_steps = []
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        _, p = _get_json(server + f"/progress?job={jid}")
        seen_steps.append(p["step"])
        if p["done"]:
            assert p["error"] is None
            break
        time.sleep(0.2)
    else:
        raise AssertionError("job did not finish")
    assert max(seen_steps) > 0 and p["total"] >= max(seen_steps)

    with urllib.request.urlopen(server + f"/result?job={jid}", timeout=60) as r:
        assert r.status == 200
        with wave.open(io.BytesIO(r.read())) as w:
            assert w.getframerate() == 44100 and w.getnframes() > 0


def test_async_job_cancel_mid_generation(server):
    """Cancel while the decode loop is running: the job ends 'cancelled'
    well before its full duration, and the server keeps serving."""
    import time

    # 25 s of audio = ~2150 steps: far more than can finish before cancel
    body, ctype = _multipart(_base_fields(seconds="25", text="cancel this"))
    req = urllib.request.Request(server + "/synthesize_async", data=body,
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=60) as r:
        jid = json.loads(r.read())["job"]

    # wait until generation is demonstrably mid-flight
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        _, p = _get_json(server + f"/progress?job={jid}")
        if p["step"] > 0 and not p["done"]:
            break
        if p["done"]:
            raise AssertionError(f"job finished before cancel: {p}")
        time.sleep(0.1)
    creq = urllib.request.Request(server + f"/cancel?job={jid}", data=b"",
                                  method="POST")
    with urllib.request.urlopen(creq, timeout=60) as r:
        assert r.status == 200

    while time.monotonic() < deadline:
        _, p = _get_json(server + f"/progress?job={jid}")
        if p["done"]:
            break
        time.sleep(0.1)
    assert p["done"] and p["error"] == "cancelled"
    assert p["step"] < p["total"], "cancel happened but the loop ran to completion"

    # the server still serves: a short sync request completes
    body, ctype = _multipart(_base_fields())
    req = urllib.request.Request(server + "/synthesize", data=body,
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.status == 200


def test_unknown_job_404(server):
    try:
        urllib.request.urlopen(server + "/progress?job=nope", timeout=30)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_async_longform_cancel(server):
    """Cancel mid-long-form: the per-segment step callback raises, aborting
    between/within segments; the job ends 'cancelled'."""
    import time

    body, ctype = _multipart(_base_fields(
        longform="1", seconds="20",
        text="First sentence of a long text. " * 10))
    req = urllib.request.Request(server + "/synthesize_async", data=body,
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=60) as r:
        jid = json.loads(r.read())["job"]

    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        _, p = _get_json(server + f"/progress?job={jid}")
        if p["step"] > 0 and not p["done"]:
            break
        if p["done"]:
            raise AssertionError(f"long-form job finished before cancel: {p}")
        time.sleep(0.1)
    with urllib.request.urlopen(urllib.request.Request(
            server + f"/cancel?job={jid}", data=b"", method="POST"),
            timeout=60) as r:
        assert r.status == 200
    while time.monotonic() < deadline:
        _, p = _get_json(server + f"/progress?job={jid}")
        if p["done"]:
            break
        time.sleep(0.1)
    assert p["done"] and p["error"] == "cancelled"
