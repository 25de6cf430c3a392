"""Browser UI for interactive synthesis (parity surface: gradio_interface.py,
built on the stdlib http.server so it runs with zero extra dependencies).

Features mirrored from the reference UI: model selection
(transformer/hybrid hot-swap), dynamic conditioning controls driven by the
loaded model's conditioner names, emotion sliders, sampling accordions,
unconditional-keys checkboxes, speaker reference upload with embedding
caching by content hash, seed control with randomize, and streaming-free
one-shot synthesis returning a playable wav.
"""

from __future__ import annotations

import io
import json
import threading
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_STATE: dict = {"model": None, "model_name": None, "spk_cache": {}}
_LOCK = threading.Lock()


def _parse_multipart(rfile, headers) -> dict:
    """Minimal multipart/form-data parser (the stdlib ``cgi`` module was
    removed in Python 3.13).  Returns name -> (value, filename); text fields
    are decoded str values with filename None."""
    import email
    import email.policy

    length = int(headers.get("Content-Length", 0))
    body = rfile.read(length)
    ctype = headers.get("Content-Type", "")
    raw = (f"Content-Type: {ctype}\r\nMIME-Version: 1.0\r\n\r\n").encode() + body
    msg = email.message_from_bytes(raw, policy=email.policy.HTTP)
    form: dict = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if not name:
            continue
        filename = part.get_filename()
        payload = part.get_payload(decode=True) or b""
        form[name] = (payload if filename else payload.decode("utf-8", "replace"), filename)
    return form


def _get_model(name: str):
    with _LOCK:
        if _STATE["model_name"] != name:
            from zonos_tpu.apps.common import load_model

            class _Args:
                model = name
                backbone = "hybrid" if "hybrid" in name else "transformer"
                verbose = False

            _STATE["model"] = load_model(_Args())
            _STATE["model_name"] = name
        return _STATE["model"]


PAGE = """<!doctype html>
<html><head><title>zonos-tpu</title><style>
body { font-family: system-ui, sans-serif; max-width: 760px; margin: 2rem auto; }
fieldset { margin: 1rem 0; border: 1px solid #ccc; border-radius: 6px; }
label { display: inline-block; min-width: 10rem; margin: .2rem 0; }
input[type=number] { width: 6rem; }
#out { margin-top: 1rem; }
.slider-val { font-variant-numeric: tabular-nums; }
</style></head><body>
<h2>zonos-tpu synthesis</h2>
<form id="f">
<fieldset><legend>Model</legend>
<label>Model</label>
<select name="model">
<option>Zyphra/Zonos-v0.1-transformer</option>
<option>Zyphra/Zonos-v0.1-hybrid</option>
</select>
</fieldset>
<fieldset><legend>Text</legend>
<textarea name="text" rows="3" cols="70">Hello from the TPU-native Zonos rebuild!</textarea><br>
<label>Language</label><input name="language" value="en-us">
</fieldset>
<fieldset><legend>Speaker</legend>
<label>Reference wav</label><input type="file" name="speaker_wav" accept=".wav"><br>
</fieldset>
<fieldset><legend>Conditioning</legend>
<span id="cond-controls"></span>
<label>pitch_std</label><input type="number" step="1" name="pitch_std" value="45"><br>
<label>speaking_rate</label><input type="number" step="0.5" name="speaking_rate" value="15"><br>
<label>fmax</label><input type="number" step="50" name="fmax" value="22050"><br>
<label>Emotion</label><br>
<span id="emotions"></span>
<label>unconditional keys</label>
<input name="unconditional_keys" value="emotion vqscore_8 dnsmos_ovrl" size="40">
</fieldset>
<fieldset><legend>Sampling</legend>
<label>linear</label><input type="number" step="0.05" name="linear" value="0.55"><br>
<label>conf</label><input type="number" step="0.05" name="conf" value="0.4"><br>
<label>quad</label><input type="number" step="0.05" name="quad" value="0"><br>
<label>min_p</label><input type="number" step="0.01" name="min_p" value="0"><br>
<label>top_p</label><input type="number" step="0.05" name="top_p" value="0"><br>
<label>top_k</label><input type="number" step="1" name="top_k" value="0"><br>
<label>repetition_penalty</label><input type="number" step="0.1" name="repetition_penalty" value="3"><br>
<label>cfg_scale</label><input type="number" step="0.1" name="cfg_scale" value="2"><br>
<label>max seconds</label><input type="number" step="1" name="seconds" value="10">
<small>(per segment in long-form mode)</small><br>
<label>long-form</label><input type="checkbox" name="longform" value="1">
<small>(split long text into segments with voice continuity; lifts the 30 s cap)</small><br>
<label>seed</label><input type="number" name="seed" value="423">
<button type="button" onclick="f.seed.value=Math.floor(Math.random()*1e6)">randomize</button>
</fieldset>
<button type="submit">Synthesize</button>
</form>
<div id="out"></div>
<script>
const EMOTIONS = ["Happiness","Sadness","Disgust","Fear","Surprise","Anger","Other","Neutral"];
const DEFAULTS = [1.0,0.05,0.05,0.05,0.05,0.05,0.1,0.2];
const span = document.getElementById("emotions");
EMOTIONS.forEach((e,i)=>{
  span.insertAdjacentHTML("beforeend",
   `<label>${e}</label><input type="range" min="0" max="1" step="0.05" value="${DEFAULTS[i]}"
     name="emotion_${i}" oninput="this.nextElementSibling.textContent=this.value">
     <span class="slider-val">${DEFAULTS[i]}</span><br>`);
});
fetch("/conditioners").then(r=>r.json()).then(names=>{
  document.getElementById("cond-controls").textContent =
    "model conditioners: " + names.join(", ");
});
document.getElementById("f").addEventListener("submit", async (ev)=>{
  ev.preventDefault();
  const fd = new FormData(ev.target);
  document.getElementById("out").textContent = "generating...";
  const res = await fetch("/synthesize", {method:"POST", body: fd});
  if (!res.ok) { document.getElementById("out").textContent = "error: " + await res.text(); return; }
  const blob = await res.blob();
  const url = URL.createObjectURL(blob);
  document.getElementById("out").innerHTML =
    `<audio controls src="${url}"></audio> <a href="${url}" download="zonos_tpu.wav">download</a>`;
});
</script></body></html>"""


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *a):  # quiet
        pass

    def do_GET(self):
        if self.path == "/conditioners":
            model = _get_model(_STATE.get("model_name") or "Zyphra/Zonos-v0.1-transformer")
            names = [s.name for s in model.specs]
            body = json.dumps(names).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.end_headers()
        self.wfile.write(PAGE.encode())

    def do_POST(self):
        try:
            form = _parse_multipart(self.rfile, self.headers)
            wav_bytes = self._synthesize(form)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.end_headers()
            self.wfile.write(wav_bytes)
        except Exception as e:  # surface errors to the page
            import traceback

            traceback.print_exc()
            self.send_response(500)
            self.end_headers()
            self.wfile.write(str(e).encode())

    def _synthesize(self, form: dict) -> bytes:
        from zonos_tpu.conditioning import make_cond_dict

        g = lambda k, d=None: form.get(k, (d, None))[0]
        model = _get_model(g("model", "Zyphra/Zonos-v0.1-transformer"))

        speaker = None
        file_entry = form.get("speaker_wav")
        if file_entry and file_entry[1]:  # (bytes, filename)
            data = file_entry[0]
            key = hash(data)
            if key not in _STATE["spk_cache"]:
                import os
                import tempfile

                from zonos_tpu.audio.io import load_audio, to_mono

                with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                    f.write(data)
                try:
                    wav, sr = load_audio(f.name)
                finally:
                    os.unlink(f.name)  # one leaked clip per upload otherwise
                _STATE["spk_cache"][key] = model.make_speaker_embedding(to_mono(wav), sr)
            speaker = _STATE["spk_cache"][key]

        emotion = [float(g(f"emotion_{i}", 0.1)) for i in range(8)]
        sampling = dict(
            linear=float(g("linear", 0.55)), conf=float(g("conf", 0.4)),
            quad=float(g("quad", 0)), min_p=float(g("min_p", 0)),
            top_p=float(g("top_p", 0)), top_k=int(g("top_k", 0)),
            repetition_penalty=float(g("repetition_penalty", 3.0)),
        )
        uncond_keys = set((g("unconditional_keys", "") or "").split())
        if g("longform"):
            from zonos_tpu.longform import synthesize_long

            wav_arr, _ = synthesize_long(
                model, g("text", "Hello"), language=g("language", "en-us"),
                speaker=speaker,
                cond_overrides=dict(
                    emotion=emotion, fmax=float(g("fmax", 22050)),
                    pitch_std=float(g("pitch_std", 45)),
                    speaking_rate=float(g("speaking_rate", 15)),
                    unconditional_keys=uncond_keys,
                ),
                sampling_params=sampling,
                cfg_scale=float(g("cfg_scale", 2.0)),
                seed=int(g("seed", 423)),
                # the UI "max seconds" field bounds each segment (the 30 s
                # model cap still applies); without this the control was
                # silently ignored in long-form mode
                max_segment_seconds=min(25.0, float(g("seconds", 10))),
                max_new_tokens=int(min(30.0, float(g("seconds", 10))) * 86),
            )
            from zonos_tpu.audio import normalize_loudness

            # same -23 LUFS target as the non-long path's codes_to_wavs, so
            # toggling long-form doesn't step the output loudness
            out_wav = normalize_loudness(wav_arr, model.autoencoder.sampling_rate,
                                         target_lufs=-23.0)
        else:
            cond = make_cond_dict(
                text=g("text", "Hello"),
                language=g("language", "en-us"),
                speaker=speaker,
                emotion=emotion,
                fmax=float(g("fmax", 22050)),
                pitch_std=float(g("pitch_std", 45)),
                speaking_rate=float(g("speaking_rate", 15)),
                unconditional_keys=uncond_keys,
            )
            prefix = model.prepare_conditioning(cond)
            codes = model.generate(
                prefix,
                max_new_tokens=int(float(g("seconds", 10)) * 86),
                cfg_scale=float(g("cfg_scale", 2.0)),
                sampling_params=sampling,
                seed=int(g("seed", 423)),
            )
            out_wav = model.autoencoder.codes_to_wavs(codes)[0][0]
        pcm = (np.clip(out_wav, -1, 1) * 32767).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(model.autoencoder.sampling_rate)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="zonos-tpu web UI")
    ap.add_argument("--host", default="0.0.0.0")
    import os

    # honor the reference UI's env override (gradio_interface.py:423-425)
    ap.add_argument("--port", type=int,
                    default=int(os.environ.get("GRADIO_SERVER_PORT", 7860)))
    args = ap.parse_args(argv)
    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"zonos-tpu UI on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
