"""ECAPA-TDNN alternative speaker tower.

Parity with the reference's secondary (unused-by-default) verification
architecture (zonos/speaker_cloning.py:226-352): Res2Net-style Bottle2neck
blocks with dilated 1-D convs and squeeze-excitation, multi-layer feature
aggregation, attentive statistics pooling with global context, and a 192-d
embedding head.  Functional JAX, activations ``[B, T, C]`` (time on
sublanes, channels on lanes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.models.speaker.resnet import batch_norm, make_bn  # noqa: F401 (re-export for converters)


def conv1d_ncl(x, w, b, dilation=1, padding=0):
    """x [B, T, C_in]; w [K, C_in, C_out] (torch-Conv1d equivalent)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b


def se_module(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Squeeze-excitation over time (ref: zonos/speaker_cloning.py:226-240)."""
    s = x.mean(axis=1, keepdims=True)  # [B, 1, C]
    s = jax.nn.relu(conv1d_ncl(s, p["w1"], p["b1"]))
    s = jax.nn.sigmoid(conv1d_ncl(s, p["w2"], p["b2"]))
    return x * s


def bottle2neck(p: dict, x: jnp.ndarray, scale: int, dilation: int) -> jnp.ndarray:
    """Res2Net block with hierarchical dilated convs
    (ref: zonos/speaker_cloning.py:243-291)."""
    residual = x
    out = jax.nn.relu(conv1d_ncl(x, p["conv1"]["w"], p["conv1"]["b"]))
    out = batch_norm(out, p["bn1"])
    width = out.shape[-1] // scale
    splits = [out[..., i * width : (i + 1) * width] for i in range(scale)]
    pieces = []
    sp = None
    K = p["convs"][0]["w"].shape[0]
    pad = (K // 2) * dilation
    for i in range(scale - 1):
        sp = splits[i] if sp is None else sp + splits[i]
        sp = conv1d_ncl(sp, p["convs"][i]["w"], p["convs"][i]["b"], dilation, pad)
        sp = batch_norm(jax.nn.relu(sp), p["bns"][i])
        pieces.append(sp)
    pieces.append(splits[-1])
    out = jnp.concatenate(pieces, axis=-1)
    out = batch_norm(jax.nn.relu(conv1d_ncl(out, p["conv3"]["w"], p["conv3"]["b"])), p["bn3"])
    out = se_module(p["se"], out)
    return out + residual


def ecapa_forward(params: dict, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, 80, T] -> embedding [B, 192] (ref: zonos/speaker_cloning.py:318-352)."""
    x = jnp.swapaxes(mel, 1, 2)  # [B, T, 80]
    x = batch_norm(jax.nn.relu(conv1d_ncl(x, params["conv1"]["w"], params["conv1"]["b"], padding=2)), params["bn1"])
    x1 = bottle2neck(params["layer1"], x, scale=8, dilation=2)
    x2 = bottle2neck(params["layer2"], x + x1, scale=8, dilation=3)
    x3 = bottle2neck(params["layer3"], x + x1 + x2, scale=8, dilation=4)
    cat = jnp.concatenate([x1, x2, x3], axis=-1)
    x = jax.nn.relu(conv1d_ncl(cat, params["layer4"]["w"], params["layer4"]["b"]))

    T = x.shape[1]
    mu_g = jnp.broadcast_to(x.mean(axis=1, keepdims=True), x.shape)
    sg_g = jnp.broadcast_to(
        jnp.sqrt(jnp.clip(x.var(axis=1, keepdims=True), 1e-4)), x.shape
    )
    glob = jnp.concatenate([x, mu_g, sg_g], axis=-1)  # [B, T, 3C]

    a = jax.nn.relu(conv1d_ncl(glob, params["att1"]["w"], params["att1"]["b"]))
    a = jnp.tanh(batch_norm(a, params["att_bn"]))
    a = conv1d_ncl(a, params["att2"]["w"], params["att2"]["b"])
    w = jax.nn.softmax(a, axis=1)  # over time

    mu = jnp.sum(x * w, axis=1)
    sg = jnp.sqrt(jnp.clip(jnp.sum(jnp.square(x) * w, axis=1) - jnp.square(mu), 1e-4))
    stats = batch_norm(jnp.concatenate([mu, sg], axis=-1)[:, None], params["bn5"])[:, 0]
    emb = stats @ params["fc6_w"] + params["fc6_b"]
    return batch_norm(emb[:, None], params["bn6"])[:, 0]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _conv(key, k, cin, cout):
    return {
        "w": jax.random.normal(key, (k, cin, cout), jnp.float32) / np.sqrt(k * cin),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _bn(c):
    return {"scale": jnp.ones((c,), jnp.float32), "shift": jnp.zeros((c,), jnp.float32)}


def _bottle2neck_init(keys, C, scale=8, kernel=3):
    width = C // scale
    ks = iter(keys)
    return {
        "conv1": _conv(next(ks), 1, C, width * scale),
        "bn1": _bn(width * scale),
        "convs": [_conv(next(ks), kernel, width, width) for _ in range(scale - 1)],
        "bns": [_bn(width) for _ in range(scale - 1)],
        "conv3": _conv(next(ks), 1, width * scale, C),
        "bn3": _bn(C),
        "se": {
            "w1": jax.random.normal(next(ks), (1, C, 128), jnp.float32) / np.sqrt(C),
            "b1": jnp.zeros((128,), jnp.float32),
            "w2": jax.random.normal(next(ks), (1, 128, C), jnp.float32) / np.sqrt(128),
            "b2": jnp.zeros((C,), jnp.float32),
        },
    }


def init_ecapa_params(key: jax.Array, C: int = 1024) -> dict:
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    return {
        "conv1": _conv(next(ki), 5, 80, C),
        "bn1": _bn(C),
        "layer1": _bottle2neck_init(jax.random.split(next(ki), 16), C),
        "layer2": _bottle2neck_init(jax.random.split(next(ki), 16), C),
        "layer3": _bottle2neck_init(jax.random.split(next(ki), 16), C),
        "layer4": _conv(next(ki), 1, 3 * C, 1536),
        "att1": _conv(next(ki), 1, 4608, 256),
        "att_bn": _bn(256),
        "att2": _conv(next(ki), 1, 256, 1536),
        "bn5": _bn(3072),
        "fc6_w": jax.random.normal(next(ki), (3072, 192), jnp.float32) / np.sqrt(3072),
        "fc6_b": jnp.zeros((192,), jnp.float32),
        "bn6": _bn(192),
    }
