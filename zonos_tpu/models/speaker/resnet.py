"""Speaker-verification backbone: SimAM ResNet293 + attentive stats pooling.

Capability parity with the reference tower (zonos/speaker_cloning.py:37-223):
3x3 conv stem, four stages of SimAM basic blocks [10, 20, 64, 3] with channel
doubling and stride-2 downsampling from stage 2, parameter-free SimAM spatial
attention inside every block, ASP pooling (conv-attention over time with
weighted mean/std statistics), and a linear bottleneck to a 256-d embedding.

Functional JAX, NHWC activations (channels on TPU lanes); BatchNorm is
inference-mode (running stats folded into scale/shift at load time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(x, w, stride=1, padding=0):
    """x [B,H,W,C_in]; w [kh,kw,C_in,C_out]; torch-style symmetric padding."""
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def batch_norm(x, p):
    """Inference BN: p = {scale, shift} precomputed from γ,β,μ,σ²."""
    return x * p["scale"] + p["shift"]


def make_bn(gamma, beta, mean, var, eps=1e-5):
    scale = np.asarray(gamma) / np.sqrt(np.asarray(var) + eps)
    return {
        "scale": jnp.asarray(scale, jnp.float32),
        "shift": jnp.asarray(np.asarray(beta) - np.asarray(mean) * scale, jnp.float32),
    }


def simam(x: jnp.ndarray, lambda_p: float = 1e-4) -> jnp.ndarray:
    """Parameter-free SimAM attention over spatial dims of [B,H,W,C]
    (ref math: zonos/speaker_cloning.py:90-95)."""
    n = x.shape[1] * x.shape[2] - 1
    d = jnp.square(x - x.mean(axis=(1, 2), keepdims=True))
    v = d.sum(axis=(1, 2), keepdims=True) / n
    e_inv = d / (4 * (v + lambda_p)) + 0.5
    return x * jax.nn.sigmoid(e_inv)


def simam_block(p: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    out = jax.nn.relu(batch_norm(conv2d(x, p["conv1"], stride, 1), p["bn1"]))
    out = batch_norm(conv2d(out, p["conv2"], 1, 1), p["bn2"])
    out = simam(out)
    if "down_conv" in p:
        x = batch_norm(conv2d(x, p["down_conv"], stride, 0), p["down_bn"])
    return jax.nn.relu(out + x)


RESNET293_BLOCKS = (10, 20, 64, 3)


def resnet_forward(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x [B, H=80, W=frames, 1] -> feature map [B, H/8, W/8, C*8]."""
    x = jax.nn.relu(batch_norm(conv2d(x, params["stem_conv"], 1, 1), params["stem_bn"]))
    for stage_idx, stage in enumerate(params["stages"]):
        stride = 1 if stage_idx == 0 else 2
        for i, block in enumerate(stage):
            x = simam_block(block, x, stride if i == 0 else 1)
    return x


def asp_forward(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Attentive statistics pooling (ref: zonos/speaker_cloning.py:37-60).

    x [B, H', W, C] -> [B, 2 * C*H'] (weighted mean ++ weighted std).
    """
    B, H, W, C = x.shape
    # flatten channel x freq -> feature axis, time stays: [B, W, C*H]
    feats = jnp.transpose(x, (0, 2, 3, 1)).reshape(B, W, C * H)
    h = jax.nn.relu(feats @ p["att1_w"] + p["att1_b"])
    h = batch_norm(h, p["att_bn"])
    logits = h @ p["att2_w"] + p["att2_b"]  # [B, W, C*H]
    w = jax.nn.softmax(logits, axis=1)
    mu = jnp.sum(feats * w, axis=1)
    sg = jnp.sqrt(jnp.clip(jnp.sum(jnp.square(feats) * w, axis=1) - jnp.square(mu), 1e-5))
    return jnp.concatenate([mu, sg], axis=-1)


def speaker_embed_forward(params: dict, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, 80, frames] -> embedding [B, 256]."""
    x = mel[..., None].transpose(0, 1, 2, 3)  # [B, 80, W, 1]
    fm = resnet_forward(params["resnet"], x)
    pooled = asp_forward(params["asp"], fm)
    return pooled @ params["bottleneck_w"] + params["bottleneck_b"]


# ---------------------------------------------------------------------------
# Random init (shape-complete; real weights come from the converter)
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) / np.sqrt(fan)


def _bn_ident(c):
    return {"scale": jnp.ones((c,), jnp.float32), "shift": jnp.zeros((c,), jnp.float32)}


def init_speaker_params(key: jax.Array, in_planes: int = 64, embd_dim: int = 256,
                        acoustic_dim: int = 80) -> dict:
    keys = iter(jax.random.split(key, 512))
    stages = []
    cin = in_planes
    for stage_idx, n_blocks in enumerate(RESNET293_BLOCKS):
        cout = in_planes * 2**stage_idx
        stage = []
        for b in range(n_blocks):
            blk = {
                "conv1": _conv_init(next(keys), 3, 3, cin, cout),
                "bn1": _bn_ident(cout),
                "conv2": _conv_init(next(keys), 3, 3, cout, cout),
                "bn2": _bn_ident(cout),
            }
            stride = (1 if stage_idx == 0 else 2) if b == 0 else 1
            if stride != 1 or cin != cout:
                blk["down_conv"] = _conv_init(next(keys), 1, 1, cin, cout)
                blk["down_bn"] = _bn_ident(cout)
            stage.append(blk)
            cin = cout
        stages.append(stage)

    feat_dim = in_planes * 8 * (acoustic_dim // 8)  # C*H' after 3 stride-2 stages
    return {
        "resnet": {
            "stem_conv": _conv_init(next(keys), 3, 3, 1, in_planes),
            "stem_bn": _bn_ident(in_planes),
            "stages": stages,
        },
        "asp": {
            "att1_w": _conv_init(next(keys), 1, 1, feat_dim, 128)[0, 0],
            "att1_b": jnp.zeros((128,), jnp.float32),
            "att_bn": _bn_ident(128),
            "att2_w": _conv_init(next(keys), 1, 1, 128, feat_dim)[0, 0],
            "att2_b": jnp.zeros((feat_dim,), jnp.float32),
        },
        "bottleneck_w": jax.random.normal(next(keys), (feat_dim * 2, embd_dim), jnp.float32)
        / np.sqrt(feat_dim * 2),
        "bottleneck_b": jnp.zeros((embd_dim,), jnp.float32),
    }
