"""DAC building blocks: snake activation and 1-D (transposed) convolutions.

Layout: activations are ``[batch, time, channels]`` (NWC) — channels ride the
TPU lane dimension so XLA tiles the convs onto the MXU as implicit matmuls;
the torch reference layout (NCW) would put time on lanes and waste the MXU.

Math parity targets (for the converter/tests):
- transformers.models.dac.modeling_dac.Snake1d (x + (1/a)·sin²(ax))
- torch Conv1d / ConvTranspose1d padding semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation, per-channel alpha.  x [.., C]; alpha [C]."""
    s = jnp.sin(alpha * x)
    return x + s * s / (alpha + 1e-9)


def conv1d(
    x: jnp.ndarray,  # [B, T, C_in]
    w: jnp.ndarray,  # [K, C_in, C_out]
    b: jnp.ndarray | None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jnp.ndarray:
    """torch.nn.Conv1d equivalent in NWC layout."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        out = out + b
    return out


def conv_transpose1d(
    x: jnp.ndarray,  # [B, T, C_in]
    w: jnp.ndarray,  # [K, C_in, C_out]  (already transposed from torch's [C_in, C_out, K])
    b: jnp.ndarray | None,
    stride: int,
    padding: int,
) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d equivalent: out_len = (T-1)*stride - 2*padding + K.

    Implemented as an input-dilated convolution with a flipped kernel — the
    standard fractionally-strided-conv identity, which XLA lowers to the same
    tiled matmul as a forward conv.
    """
    K = w.shape[0]
    out = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=0),
        window_strides=(1,),
        padding=[(K - 1 - padding, K - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        out = out + b
    return out
