"""Convert the reference speaker-tower checkpoints (torch .pt state dicts:
`ResNet293_SimAM_ASP_base.pt` + `..._LDA-128.pt`) into the JAX pytrees.

torch layouts: Conv2d [C_out, C_in, kh, kw] -> [kh, kw, C_in, C_out];
BatchNorm running stats folded into inference scale/shift.
"""

from __future__ import annotations

import numpy as np

from zonos_tpu.models.speaker.resnet import RESNET293_BLOCKS, make_bn


def _c2(w) -> np.ndarray:
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _bn(sd, pre):
    return make_bn(sd[pre + ".weight"], sd[pre + ".bias"],
                   sd[pre + ".running_mean"], sd[pre + ".running_var"])


def convert_speaker_state_dict(sd: dict) -> dict:
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    stages = []
    for stage_idx, n_blocks in enumerate(RESNET293_BLOCKS):
        stage = []
        for b in range(n_blocks):
            pre = f"front.layer{stage_idx + 1}.{b}"
            blk = {
                "conv1": _c2(sd[pre + ".conv1.weight"]),
                "bn1": _bn(sd, pre + ".bn1"),
                "conv2": _c2(sd[pre + ".conv2.weight"]),
                "bn2": _bn(sd, pre + ".bn2"),
            }
            if pre + ".downsample.0.weight" in sd:
                blk["down_conv"] = _c2(sd[pre + ".downsample.0.weight"])
                blk["down_bn"] = _bn(sd, pre + ".downsample.1")
            stage.append(blk)
        stages.append(stage)

    att1_w = np.asarray(sd["pooling.attention.0.weight"], np.float32)[:, :, 0].T  # [feat,128]
    att2_w = np.asarray(sd["pooling.attention.3.weight"], np.float32)[:, :, 0].T  # [128,feat]
    return {
        "resnet": {
            "stem_conv": _c2(sd["front.conv1.weight"]),
            "stem_bn": _bn(sd, "front.bn1"),
            "stages": stages,
        },
        "asp": {
            "att1_w": att1_w,
            "att1_b": np.asarray(sd["pooling.attention.0.bias"], np.float32),
            "att_bn": _bn(sd, "pooling.attention.2"),
            "att2_w": att2_w,
            "att2_b": np.asarray(sd["pooling.attention.3.bias"], np.float32),
        },
        "bottleneck_w": np.asarray(sd["bottleneck.weight"], np.float32).T,
        "bottleneck_b": np.asarray(sd["bottleneck.bias"], np.float32),
    }


def convert_lda_state_dict(sd: dict) -> dict:
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    return {"w": np.asarray(sd["weight"], np.float32).T, "b": np.asarray(sd["bias"], np.float32)}
