"""HSCNN+ and EDSR in Flax (the simple CNN members of the zoo).

Parity: predict_code/architecture/HSCNN_Plus.py (densely-fused dfus blocks;
published MRAE 0.3814 / PSNR 26.36) and edsr.py (32 ResBlocks at 64 feats;
published MRAE 0.3277 / PSNR 28.29). Both are plain conv stacks — NHWC
flax Convs with ReLU, converters included.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.models.mst_plus_plus import _conv_w


class DfusBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        relu = jax.nn.relu
        feat = relu(nn.Conv(128, (1, 1), use_bias=False, name="conv1")(x))
        up1 = relu(nn.Conv(32, (3, 3), padding=1, use_bias=False, name="conv_up1")(feat))
        up2 = relu(nn.Conv(16, (1, 1), use_bias=False, name="conv_up2")(up1))
        dn1 = relu(nn.Conv(32, (3, 3), padding=1, use_bias=False, name="conv_down1")(feat))
        dn2 = relu(nn.Conv(16, (1, 1), use_bias=False, name="conv_down2")(dn1))
        fus = jnp.concatenate([up1, up2, dn1, dn2], axis=-1)
        fus = relu(nn.Conv(32, (1, 1), use_bias=False, name="conv_fution")(fus))
        return jnp.concatenate([x, fus], axis=-1)


class HSCNNPlus(nn.Module):
    in_channels: int = 3
    out_channels: int = 31
    num_blocks: int = 30

    @nn.compact
    def __call__(self, x):  # NHWC
        relu = jax.nn.relu
        up1 = relu(nn.Conv(32, (3, 3), padding=1, use_bias=False, name="conv_up1")(x))
        up2 = relu(nn.Conv(32, (1, 1), use_bias=False, name="conv_up2")(up1))
        dn1 = relu(nn.Conv(32, (3, 3), padding=1, use_bias=False, name="conv_down1")(x))
        dn2 = relu(nn.Conv(32, (1, 1), use_bias=False, name="conv_down2")(dn1))
        fea = jnp.concatenate([up1, up2, dn1, dn2], axis=-1)
        for i in range(self.num_blocks):
            fea = DfusBlock(name=f"dfus_{i}")(fea)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv_out")(fea)


def convert_hscnn_state(state_dict) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {
        "conv_up1": {"kernel": _conv_w(sd["ddfn.conv_up1.weight"])},
        "conv_up2": {"kernel": _conv_w(sd["ddfn.conv_up2.weight"])},
        "conv_down1": {"kernel": _conv_w(sd["ddfn.conv_down1.weight"])},
        "conv_down2": {"kernel": _conv_w(sd["ddfn.conv_down2.weight"])},
        "conv_out": {"kernel": _conv_w(sd["conv_out.weight"])},
    }
    i = 0
    while f"ddfn.dfus_blocks.{i}.conv1.weight" in sd:
        params[f"dfus_{i}"] = {
            name: {"kernel": _conv_w(sd[f"ddfn.dfus_blocks.{i}.{name}.weight"])}
            for name in ("conv1", "conv_up1", "conv_up2", "conv_down1", "conv_down2", "conv_fution")
        }
        i += 1
    return {"params": params}


class EDSR(nn.Module):
    n_resblocks: int = 32
    n_feats: int = 64
    out_channels: int = 31

    @nn.compact
    def __call__(self, x):  # NHWC
        x = nn.Conv(self.n_feats, (3, 3), padding=1, use_bias=True, name="head")(x)
        res = x
        for i in range(self.n_resblocks):
            y = nn.Conv(self.n_feats, (3, 3), padding=1, use_bias=True, name=f"rb{i}_0")(res)
            y = jax.nn.relu(y)
            y = nn.Conv(self.n_feats, (3, 3), padding=1, use_bias=True, name=f"rb{i}_1")(y)
            res = res + y
        res = nn.Conv(self.n_feats, (3, 3), padding=1, use_bias=True, name="body_tail")(res)
        res = res + x
        return nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=True, name="tail")(res)


def convert_edsr_state(state_dict, n_resblocks: int = 32) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix):
        return {"kernel": _conv_w(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}

    params = {"head": conv("head.0"), "tail": conv("tail.0"),
              "body_tail": conv(f"body.{n_resblocks}")}
    for i in range(n_resblocks):
        params[f"rb{i}_0"] = conv(f"body.{i}.body.0")
        params[f"rb{i}_1"] = conv(f"body.{i}.body.2")
    return {"params": params}
