"""Checkpoint discovery: local-first with an optional hub fallback.

Mirrors the reference's local-first policy (zonos/utils.py:12-19): if the
file exists under a local models directory (env ``ZONOS_TPU_MODELS_DIR``,
default ``./models/<repo_id>``) use it; otherwise attempt a HuggingFace hub
download (which requires network access and is expected to fail in
air-gapped deployments with a clear error).
"""

from __future__ import annotations

import os
from pathlib import Path


def hub_download(repo_id: str, filename: str, revision: str | None = None) -> str:
    base = os.environ.get("ZONOS_TPU_MODELS_DIR", "models")
    local = Path(base) / repo_id / filename
    if local.exists():
        return str(local)
    try:
        from huggingface_hub import hf_hub_download

        # Cache hit first (instant); only then try the network — and skip it
        # entirely when offline mode is requested, to avoid retry storms in
        # air-gapped deployments.
        try:
            return hf_hub_download(
                repo_id=repo_id, filename=filename, revision=revision, local_files_only=True
            )
        except Exception:
            if os.environ.get("HF_HUB_OFFLINE") == "1" or os.environ.get("ZONOS_TPU_OFFLINE") == "1":
                raise
        return hf_hub_download(repo_id=repo_id, filename=filename, revision=revision)
    except Exception as e:  # no network / not cached
        raise FileNotFoundError(
            f"Checkpoint file {filename!r} for {repo_id!r} not found locally "
            f"(looked in {local}) and hub download failed: {e}. "
            f"Place the file under $ZONOS_TPU_MODELS_DIR/{repo_id}/ for air-gapped use, "
            f"or set ZONOS_TPU_OFFLINE=1 to fail fast without network retries."
        ) from e
