"""Backbone registry (parity surface: zonos/backbone/__init__.py:1-12).

Maps architecture names to (init, prefill, decode_step, cache_fn) bundles so
alternative backbones can be registered without touching the orchestrator.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable


@dataclass(frozen=True)
class BackboneOps:
    supported_architectures: tuple
    init: Callable
    prefill: Callable
    decode_step: Callable
    make_cache: Callable


def _transformer_ops() -> BackboneOps:
    from zonos_tpu.models.backbone import (
        KVCache,
        init_transformer_params,
        transformer_decode_step,
        transformer_prefill,
    )

    return BackboneOps(
        supported_architectures=("transformer",),
        init=init_transformer_params,
        prefill=transformer_prefill,
        decode_step=transformer_decode_step,
        make_cache=lambda cfg, batch, seqlen: KVCache.create(cfg, batch, seqlen),
    )


def _hybrid_ops() -> BackboneOps:
    from zonos_tpu.models.hybrid import (
        create_hybrid_cache,
        hybrid_decode_step,
        hybrid_prefill,
        init_hybrid_params,
    )

    return BackboneOps(
        supported_architectures=("transformer", "hybrid"),
        init=init_hybrid_params,
        prefill=hybrid_prefill,
        decode_step=hybrid_decode_step,
        make_cache=lambda cfg, batch, seqlen: create_hybrid_cache(cfg, batch, seqlen),
    )


BACKBONES: dict[str, Callable[[], BackboneOps]] = {
    "transformer": _transformer_ops,
    "hybrid": _hybrid_ops,
}


def resolve_backbone(name: str) -> BackboneOps:
    if name not in BACKBONES:
        raise KeyError(f"unknown backbone {name!r}; registered: {sorted(BACKBONES)}")
    return BACKBONES[name]()
