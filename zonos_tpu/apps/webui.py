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

# Async synthesis jobs (per-step progress + cancel — the reference UI's
# progress bar / cancellation surface, gradio_interface.py:185-197, built on
# the generate step callback, zonos/model.py:430-432).
_JOBS: dict = {}
_JOBS_LOCK = threading.Lock()


class _Cancelled(Exception):
    """Raised from the generate step callback to abort a cancelled job —
    propagates out of Zonos.generate / synthesize_long mid-loop, freeing the
    chip at the next chunk boundary."""


def _new_job() -> tuple[str, dict]:
    import time
    import uuid

    job = {"step": 0, "total": 1, "done": False, "error": None,
           "wav": None, "cancel": False, "ts": time.time()}
    jid = uuid.uuid4().hex[:12]
    with _JOBS_LOCK:
        # prune finished jobs older than an hour (their wav bytes are the
        # bulk of the memory)
        for k in [k for k, j in _JOBS.items()
                  if j["done"] and time.time() - j["ts"] > 3600]:
            del _JOBS[k]
        _JOBS[jid] = job
    return jid, job


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
<button type="submit" id="go">Synthesize</button>
<button type="button" id="stop" style="display:none">Cancel</button>
</form>
<progress id="prog" max="1" value="0" style="display:none;width:100%"></progress>
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
let currentJob = null;
const out = document.getElementById("out"), prog = document.getElementById("prog");
const stopBtn = document.getElementById("stop"), goBtn = document.getElementById("go");
stopBtn.addEventListener("click", ()=>{
  if (currentJob) fetch(`/cancel?job=${currentJob}`, {method:"POST"});
});
document.getElementById("f").addEventListener("submit", async (ev)=>{
  ev.preventDefault();
  const fd = new FormData(ev.target);
  out.textContent = "generating...";
  goBtn.disabled = true; stopBtn.style.display = "";
  prog.style.display = ""; prog.value = 0; prog.max = 1;
  try {
    const res = await fetch("/synthesize_async", {method:"POST", body: fd});
    if (!res.ok) { out.textContent = "error: " + await res.text(); return; }
    currentJob = (await res.json()).job;
    while (true) {
      await new Promise(r=>setTimeout(r, 400));
      const p = await (await fetch(`/progress?job=${currentJob}`)).json();
      prog.max = p.total; prog.value = p.step;
      out.textContent = `generating... ${p.step}/${p.total} steps`;
      if (p.done) {
        if (p.error) { out.textContent = p.error === "cancelled" ? "cancelled" : "error: " + p.error; return; }
        break;
      }
    }
    const blob = await (await fetch(`/result?job=${currentJob}`)).blob();
    const url = URL.createObjectURL(blob);
    out.innerHTML =
      `<audio controls src="${url}"></audio> <a href="${url}" download="zonos_tpu.wav">download</a>`;
  } finally {
    currentJob = null;
    goBtn.disabled = false; stopBtn.style.display = "none";
    prog.style.display = "none";
  }
});
</script></body></html>"""


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *a):  # quiet
        pass

    def do_GET(self):
        from urllib.parse import parse_qs, urlparse

        path = urlparse(self.path).path
        if path in ("/progress", "/result"):
            q = parse_qs(urlparse(self.path).query)
            jid = (q.get("job") or [""])[0]
            with _JOBS_LOCK:
                job = _JOBS.get(jid)
            if job is None:
                self._json(404, {"error": "unknown job"})
                return
            if path == "/progress":
                self._json(200, {"step": job["step"], "total": job["total"],
                                 "done": job["done"], "error": job["error"]})
                return
            if not job["done"]:
                self._json(409, {"error": "not done"})
            elif job["error"]:
                self._json(500, {"error": job["error"]})
            else:
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.end_headers()
                self.wfile.write(job["wav"])
            return
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

    def _json(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        try:
            from urllib.parse import parse_qs, urlparse

            path = urlparse(self.path).path
            if path == "/synthesize_async":
                form = _parse_multipart(self.rfile, self.headers)
                jid, job = _new_job()
                threading.Thread(target=self._run_job, args=(form, job),
                                 daemon=True).start()
                self._json(200, {"job": jid})
                return
            if path == "/cancel":
                q = parse_qs(urlparse(self.path).query)
                jid = (q.get("job") or [""])[0]
                with _JOBS_LOCK:
                    job = _JOBS.get(jid)
                if job is None:
                    self._json(404, {"error": "unknown job"})
                    return
                job["cancel"] = True
                self._json(200, {"ok": True})
                return
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

    def _run_job(self, form: dict, job: dict):
        try:
            job["wav"] = self._synthesize(form, job=job)
        except _Cancelled:
            job["error"] = "cancelled"
        except Exception as e:  # noqa: BLE001 — report to the polling UI
            job["error"] = f"{type(e).__name__}: {e}"
        finally:
            import time

            job["done"] = True
            job["ts"] = time.time()

    def _synthesize(self, form: dict, job: dict | None = None) -> bytes:
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

        step_cb = None
        long_cb = None
        if job is not None:
            def step_cb(_frame, step, total):
                if job["cancel"]:
                    raise _Cancelled
                job["step"], job["total"] = int(step), int(total)
                return True

            def long_cb(seg, n_seg, step, total):
                if job["cancel"]:
                    raise _Cancelled
                # global progress across segments (each segment may stop
                # early at EOS, so this is an upper-bound estimate)
                job["step"] = int(seg * total + step)
                job["total"] = int(n_seg * total)
                return True

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
                step_callback=long_cb,
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
                callback=step_cb,
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
