"""DAC codec (Descript Audio Codec) — encoder, RVQ, decoder in JAX.

Architecture parity with the 44.1 kHz model the reference wraps
(zonos/autoencoder.py:15 via transformers DacModel): encoder stem conv ->
4 strided encoder blocks (3 dilated snake residual units + downsample conv,
strides [2,4,8,8]) -> latent conv; 9-codebook residual VQ with factorized
L2-normalized 8-dim lookups; mirrored decoder with transposed convs and a
tanh output head.  Hop = prod(strides) = 512 samples @ 44.1 kHz = 86.13 Hz.

Functional pytree params; activations NWC (see layers.py).  fp32 throughout
(the codec is kept out of bf16 in the reference too, zonos/model.py:79-80).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.models.dac.layers import conv1d, conv_transpose1d, snake


@dataclass(frozen=True)
class DACConfig:
    encoder_hidden_size: int = 64
    downsampling_ratios: tuple = (2, 4, 8, 8)
    decoder_hidden_size: int = 1536
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    sampling_rate: int = 44100

    @property
    def hidden_size(self) -> int:
        return self.encoder_hidden_size * 2 ** len(self.downsampling_ratios)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.downsampling_ratios))

    @property
    def upsampling_ratios(self) -> tuple:
        return tuple(reversed(self.downsampling_ratios))


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _conv_init(key, k, cin, cout, std=0.02):
    kw, _ = jax.random.split(key)
    return {
        "w": jax.random.truncated_normal(kw, -2, 2, (k, cin, cout), jnp.float32) * std,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _res_unit_init(key, dim, dilation):
    k1, k2 = jax.random.split(key)
    return {
        "alpha1": jnp.ones((dim,), jnp.float32),
        "conv1": _conv_init(k1, 7, dim, dim),
        "alpha2": jnp.ones((dim,), jnp.float32),
        "conv2": _conv_init(k2, 1, dim, dim),
    }


def init_dac_params(key: jax.Array, cfg: DACConfig) -> dict:
    keys = iter(jax.random.split(key, 64))
    enc_blocks = []
    for i, stride in enumerate(cfg.downsampling_ratios):
        dim = cfg.encoder_hidden_size * 2 ** (i + 1)
        enc_blocks.append(
            {
                "res1": _res_unit_init(next(keys), dim // 2, 1),
                "res2": _res_unit_init(next(keys), dim // 2, 3),
                "res3": _res_unit_init(next(keys), dim // 2, 9),
                "alpha": jnp.ones((dim // 2,), jnp.float32),
                "down": _conv_init(next(keys), 2 * stride, dim // 2, dim),
            }
        )
    dec_blocks = []
    for i, stride in enumerate(cfg.upsampling_ratios):
        in_dim = cfg.decoder_hidden_size // 2**i
        out_dim = cfg.decoder_hidden_size // 2 ** (i + 1)
        dec_blocks.append(
            {
                "alpha": jnp.ones((in_dim,), jnp.float32),
                "up": _conv_init(next(keys), 2 * stride, in_dim, out_dim),
                "res1": _res_unit_init(next(keys), out_dim, 1),
                "res2": _res_unit_init(next(keys), out_dim, 3),
                "res3": _res_unit_init(next(keys), out_dim, 9),
            }
        )
    final_dim = cfg.decoder_hidden_size // 2 ** len(cfg.upsampling_ratios)
    quantizers = []
    for _ in range(cfg.n_codebooks):
        quantizers.append(
            {
                "in_proj": _conv_init(next(keys), 1, cfg.hidden_size, cfg.codebook_dim),
                "out_proj": _conv_init(next(keys), 1, cfg.codebook_dim, cfg.hidden_size),
                "codebook": jax.random.normal(next(keys), (cfg.codebook_size, cfg.codebook_dim), jnp.float32) * 0.02,
            }
        )
    return {
        "encoder": {
            "conv1": _conv_init(next(keys), 7, 1, cfg.encoder_hidden_size),
            "blocks": enc_blocks,
            "alpha": jnp.ones((cfg.hidden_size,), jnp.float32),
            "conv2": _conv_init(next(keys), 3, cfg.hidden_size, cfg.hidden_size),
        },
        "decoder": {
            "conv1": _conv_init(next(keys), 7, cfg.hidden_size, cfg.decoder_hidden_size),
            "blocks": dec_blocks,
            "alpha": jnp.ones((final_dim,), jnp.float32),
            "conv2": _conv_init(next(keys), 7, final_dim, 1),
        },
        "quantizers": quantizers,
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _res_unit(p: dict, x: jnp.ndarray, dilation: int) -> jnp.ndarray:
    from zonos_tpu.ops.attention import use_pallas

    C = x.shape[-1]
    if use_pallas() and C % 128 == 0:
        from zonos_tpu.ops.pallas_dac import snake_residual_unit_pallas

        return snake_residual_unit_pallas(p, x, dilation)
    pad = (7 - 1) * dilation // 2
    y = conv1d(snake(x, p["alpha1"]), p["conv1"]["w"], p["conv1"]["b"], padding=pad, dilation=dilation)
    y = conv1d(snake(y, p["alpha2"]), p["conv2"]["w"], p["conv2"]["b"])
    return x + y


def dac_encode_latents(params: dict, cfg: DACConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """audio [B, T, 1] -> latents [B, T/512, hidden]."""
    p = params["encoder"]
    x = conv1d(audio, p["conv1"]["w"], p["conv1"]["b"], padding=3)
    for block, stride in zip(p["blocks"], cfg.downsampling_ratios):
        x = _res_unit(block["res1"], x, 1)
        x = _res_unit(block["res2"], x, 3)
        x = _res_unit(block["res3"], x, 9)
        x = snake(x, block["alpha"])
        x = conv1d(x, block["down"]["w"], block["down"]["b"], stride=stride,
                   padding=int(np.ceil(stride / 2)))
    x = snake(x, p["alpha"])
    return conv1d(x, p["conv2"]["w"], p["conv2"]["b"], padding=1)


def rvq_encode(params: dict, latents: jnp.ndarray) -> jnp.ndarray:
    """Residual VQ: latents [B, T, H] -> codes [B, K, T] int32.

    Factorized lookup: project to 8-d, L2-normalize both sides, nearest
    neighbor by cosine similarity (the improved-VQGAN trick the torch model
    uses), subtract the dequantized vector, repeat per codebook.
    """
    residual = latents
    codes = []
    quantized_sum = 0.0
    for q in params["quantizers"]:
        z = conv1d(residual, q["in_proj"]["w"], q["in_proj"]["b"])  # [B,T,8]
        zn = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        cb = q["codebook"]
        cbn = cb / jnp.maximum(jnp.linalg.norm(cb, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("btd,nd->btn", zn, cbn)
        idx = jnp.argmax(sim, axis=-1)  # [B, T]
        codes.append(idx)
        zq = cb[idx]  # [B, T, 8]
        dq = conv1d(zq, q["out_proj"]["w"], q["out_proj"]["b"])
        quantized_sum = quantized_sum + dq
        residual = residual - dq
    return jnp.stack(codes, axis=1).astype(jnp.int32)


def rvq_decode(params: dict, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, K, T] -> quantized latents [B, T, H]."""
    out = 0.0
    K = codes.shape[1]
    for k in range(K):
        q = params["quantizers"][k]
        z = q["codebook"][codes[:, k]]  # [B, T, 8]
        out = out + conv1d(z, q["out_proj"]["w"], q["out_proj"]["b"])
    return out


def decoder_receptive_field_frames(cfg: DACConfig) -> int:
    """Upper bound on the decoder's receptive HALF-width, in code frames.

    Streaming emission (models/tts.py:stream_generate_batch) vocodes a
    window with ``margin_frames`` of code context on each side and emits
    only the interior; the margin is sound iff it covers this bound.

    Derivation (all convs 'same'-padded, so half-width = (k-1)/2 * dilation
    at each layer's own resolution):

    - decoder conv1: k=7 at code-frame rate -> +-3 frames
    - each upsampling block: transposed conv k=2*stride (<= +-2 steps at
      the block's INPUT resolution, conservatively), then three residual
      units k=7 with dilations 1/3/9 -> +-(3+9+27) = +-39 steps at the
      block's OUTPUT resolution
    - final conv2: k=7 at audio rate -> +-3 samples

    For the 44.1 kHz config (hop 512, up ratios 8/8/4/2) this sums to
    ~5,636 audio samples ~= 11.01 frames -> 12.  Measured empirically
    (tests/test_dac.py::test_decoder_receptive_field_bound): perturbing one
    code frame changes samples up to 10.11 frames away, inside the bound.
    """
    res_half = sum((7 - 1) * d // 2 for d in (1, 3, 9))  # 39 steps/block
    half = 3 * cfg.hop_length  # decoder conv1
    cur = cfg.hop_length  # audio samples per step at the current resolution
    for stride in cfg.upsampling_ratios:
        half += 2 * cur  # transposed conv k=2*stride
        cur //= stride
        half += res_half * cur
    half += 3  # final conv2
    return -(-half // cfg.hop_length)


def dac_decode_latents(params: dict, cfg: DACConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """quantized latents [B, T, H] -> waveform [B, T*512, 1] in [-1, 1]."""
    p = params["decoder"]
    x = conv1d(latents, p["conv1"]["w"], p["conv1"]["b"], padding=3)
    for block, stride in zip(p["blocks"], cfg.upsampling_ratios):
        x = snake(x, block["alpha"])
        x = conv_transpose1d(x, block["up"]["w"], block["up"]["b"], stride=stride,
                             padding=int(np.ceil(stride / 2)))
        x = _res_unit(block["res1"], x, 1)
        x = _res_unit(block["res2"], x, 3)
        x = _res_unit(block["res3"], x, 9)
    x = snake(x, p["alpha"])
    x = conv1d(x, p["conv2"]["w"], p["conv2"]["b"], padding=3)
    return jnp.tanh(x)


def dac_encode(params: dict, cfg: DACConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """audio [B, T, 1] -> codes [B, K, T/512]."""
    return rvq_encode(params, dac_encode_latents(params, cfg, audio))


def dac_decode(params: dict, cfg: DACConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, K, T] -> waveform [B, T*512, 1]."""
    return dac_decode_latents(params, cfg, rvq_decode(params, codes))
