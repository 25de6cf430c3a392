# zonos-tpu serving container.
#
# Capability replacement for the reference's Dockerfile (CUDA/torch base +
# espeak-ng apt dep + editable install): same role — a self-contained image
# that runs the web UI / REST server — but built for TPU hosts.  On a Cloud
# TPU VM run with `--privileged --network host` so the libtpu driver can
# reach the chips; on a CPU-only host set JAX_PLATFORMS=cpu.
FROM python:3.11-slim

# espeak-ng gives the text frontend bit-compatibility with the reference's
# phonemizer path (zonos_tpu/text/g2p.py uses it when present; the built-in
# engine is the fallback).  g++/make build the optional native engines.
RUN apt-get update && \
    apt-get install -y --no-install-recommends espeak-ng g++ make libsndfile1 && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . ./

# TPU wheels come from the libtpu releases index; on a non-TPU host the
# extra resolves to CPU jax and JAX_PLATFORMS=cpu selects it at runtime.
RUN pip install --no-cache-dir -U pip && \
    pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install --no-cache-dir -e . phonemizer

# Pre-build the native g2p/audio engines (best-effort: pure-Python
# fallbacks exist for both).
RUN python -c "from zonos_tpu.text.native import get_engine; get_engine()" || true

EXPOSE 7860 8600
ENV ZONOS_TPU_OFFLINE=0
# REST serving on :8600 by default; compose overrides per-service.
CMD ["python", "-m", "zonos_tpu.serving", "--port", "8600"]
