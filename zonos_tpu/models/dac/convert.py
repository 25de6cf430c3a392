"""Convert a torch DacModel state dict (HF `descript/dac_44khz` layout) into
the JAX codec pytree, folding weight-norm parametrizations.

Key layouts:
- torch Conv1d weight  [C_out, C_in, K] -> ours [K, C_in, C_out]
- torch ConvTranspose1d weight [C_in, C_out, K] -> ours [K, C_in, C_out]
- weight-norm: w = g * v / ||v||_(per out-channel); stored either as
  (weight_g, weight_v) or (parametrizations.weight.original0/1).
"""

from __future__ import annotations

import numpy as np

from zonos_tpu.models.dac.codec import DACConfig


def _get_conv_weight(sd: dict, prefix: str) -> np.ndarray:
    if prefix + ".weight" in sd:
        return np.asarray(sd[prefix + ".weight"], np.float32)
    for g_key, v_key in (
        (prefix + ".weight_g", prefix + ".weight_v"),
        (prefix + ".parametrizations.weight.original0", prefix + ".parametrizations.weight.original1"),
    ):
        if g_key in sd:
            g = np.asarray(sd[g_key], np.float32)
            v = np.asarray(sd[v_key], np.float32)
            norm = np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
            return g * v / np.maximum(norm, 1e-12)
    raise KeyError(f"no weight found for {prefix}")


def _conv(sd: dict, prefix: str, transposed: bool = False) -> dict:
    w = _get_conv_weight(sd, prefix)
    if transposed:  # [C_in, C_out, K] -> [K, C_in, C_out]
        w = np.transpose(w, (2, 0, 1))
    else:  # [C_out, C_in, K] -> [K, C_in, C_out]
        w = np.transpose(w, (2, 1, 0))
    return {"w": w, "b": np.asarray(sd[prefix + ".bias"], np.float32)}


def _alpha(sd: dict, key: str) -> np.ndarray:
    return np.asarray(sd[key], np.float32).reshape(-1)  # [1, C, 1] -> [C]


def _res_unit(sd: dict, prefix: str) -> dict:
    return {
        "alpha1": _alpha(sd, prefix + ".snake1.alpha"),
        "conv1": _conv(sd, prefix + ".conv1"),
        "alpha2": _alpha(sd, prefix + ".snake2.alpha"),
        "conv2": _conv(sd, prefix + ".conv2"),
    }


def convert_dac_state_dict(sd: dict, cfg: DACConfig) -> dict:
    """torch state dict (tensors or ndarrays) -> JAX DAC param pytree."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v) for k, v in sd.items()}

    enc_blocks = []
    for i in range(len(cfg.downsampling_ratios)):
        pre = f"encoder.block.{i}"
        enc_blocks.append(
            {
                "res1": _res_unit(sd, pre + ".res_unit1"),
                "res2": _res_unit(sd, pre + ".res_unit2"),
                "res3": _res_unit(sd, pre + ".res_unit3"),
                "alpha": _alpha(sd, pre + ".snake1.alpha"),
                "down": _conv(sd, pre + ".conv1"),
            }
        )
    dec_blocks = []
    for i in range(len(cfg.upsampling_ratios)):
        pre = f"decoder.block.{i}"
        dec_blocks.append(
            {
                "alpha": _alpha(sd, pre + ".snake1.alpha"),
                "up": _conv(sd, pre + ".conv_t1", transposed=True),
                "res1": _res_unit(sd, pre + ".res_unit1"),
                "res2": _res_unit(sd, pre + ".res_unit2"),
                "res3": _res_unit(sd, pre + ".res_unit3"),
            }
        )
    quantizers = []
    for k in range(cfg.n_codebooks):
        pre = f"quantizer.quantizers.{k}"
        quantizers.append(
            {
                "in_proj": _conv(sd, pre + ".in_proj"),
                "out_proj": _conv(sd, pre + ".out_proj"),
                "codebook": np.asarray(sd[pre + ".codebook.weight"], np.float32),
            }
        )
    return {
        "encoder": {
            "conv1": _conv(sd, "encoder.conv1"),
            "blocks": enc_blocks,
            "alpha": _alpha(sd, "encoder.snake1.alpha"),
            "conv2": _conv(sd, "encoder.conv2"),
        },
        "decoder": {
            "conv1": _conv(sd, "decoder.conv1"),
            "blocks": dec_blocks,
            "alpha": _alpha(sd, "decoder.snake1.alpha"),
            "conv2": _conv(sd, "decoder.conv2"),
        },
        "quantizers": quantizers,
    }
