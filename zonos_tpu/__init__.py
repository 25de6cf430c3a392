"""zonos_tpu — a TPU-native (JAX/XLA/Pallas) text-to-speech framework.

A from-scratch rebuild of the capabilities of Zonos-v0.1 (reference:
coezbek/Zonos), designed TPU-first: functional pytree models, one jitted
`lax.while_loop` decode program with zero per-token host syncs, Pallas
kernels for the hot paths, and `jax.sharding` meshes for multi-chip scale.

Public API mirrors the capability surface of the reference
(`/root/reference/zonos/model.py:22-457`) without copying its design:

    from zonos_tpu import Zonos, make_cond_dict
    model = Zonos.from_pretrained("Zyphra/Zonos-v0.1-transformer")
    cond = make_cond_dict(text="Hello, world!", speaker=spk, language="en-us")
    codes = model.generate(model.prepare_conditioning(cond))
    model.autoencoder.save_codes(["out.wav"], codes)
"""

from zonos_tpu.config import BackboneConfig, PrefixConditionerConfig, ZonosConfig
from zonos_tpu.conditioning import make_cond_dict, supported_language_codes
from zonos_tpu.models.tts import Zonos

__version__ = "0.1.0"

__all__ = [
    "BackboneConfig",
    "PrefixConditionerConfig",
    "ZonosConfig",
    "Zonos",
    "make_cond_dict",
    "supported_language_codes",
    "__version__",
]
