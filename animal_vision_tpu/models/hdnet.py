"""HDNet (high-resolution dual-domain network) in Flax.

Parity: predict_code/architecture/HDNet.py — head conv 3->48, a body of
32 ResBlocks, SDL attention (spatial + spectral masks summed), EFF
(4-way channel split, each through a BatchNorm'd depthwise 1x1 + maxpool +
softmax spatial gate), 31 more ResBlocks, a body-end conv with global
residual, and a tail conv 48->31. Registry config: HDNet() defaults
(architecture/__init__.py:28-29). Published: MRAE 0.2048 / RMSE 0.0317 /
PSNR 32.13 (BASELINE.md). BatchNorms run in inference mode off the
checkpoint's running statistics.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.models.mst_plus_plus import _conv_w


class InferenceBN(nn.Module):
    """BatchNorm2d at eval time: normalize with stored running stats."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x - mean) / jnp.sqrt(var + self.eps) * scale + bias


class ResBlock(nn.Module):
    n_feat: int = 48

    @nn.compact
    def __call__(self, x):
        res = nn.Conv(self.n_feat, (3, 3), padding=1, name="conv0")(x)
        res = jax.nn.relu(res)
        res = nn.Conv(self.n_feat, (3, 3), padding=1, name="conv1")(res)
        return res + x


class DSC(nn.Module):
    """Depthwise-separable spatial gate: per-channel 1x1 depthwise + BN +
    relu, 3x3 maxpool, 1x1 collapse to one channel, BN + relu, softmax over
    the spatial extent, broadcast-multiply, residual add."""

    nin: int

    @nn.compact
    def __call__(self, x):  # NHWC
        b, h, w, c = x.shape
        out = nn.Conv(self.nin, (1, 1), feature_group_count=self.nin, name="conv_dws")(x)
        out = jax.nn.relu(InferenceBN(self.nin, name="bn_dws")(out))
        out = nn.max_pool(out, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        out = nn.Conv(1, (1, 1), name="conv_point")(out)
        out = jax.nn.relu(InferenceBN(1, name="bn_point")(out))
        out = jax.nn.softmax(out.reshape(b, h * w, 1), axis=1).reshape(b, h, w, 1)
        return out * x + x


class EFF(nn.Module):
    nin: int
    num_splits: int = 4

    @nn.compact
    def __call__(self, x):
        parts = jnp.split(x, self.num_splits, axis=-1)
        width = self.nin // self.num_splits
        outs = [DSC(width, name=f"sub_{i}")(p) for i, p in enumerate(parts)]
        return jnp.concatenate(outs, axis=-1)


class SDLAttention(nn.Module):
    planes: int

    @nn.compact
    def __call__(self, x):  # NHWC
        b, h, w, c = x.shape
        inter = self.planes // 2
        # spectral branch: global-avg of q_left attends over v_left pixels
        g = nn.Conv(inter, (1, 1), use_bias=False, name="conv_q_left")(x)
        avg = jnp.mean(g, axis=(1, 2))  # (b, inter)
        theta = nn.Conv(inter, (1, 1), use_bias=False, name="conv_v_left")(x)
        ctx = jnp.einsum("bc,bhwc->bhw", avg, theta).reshape(b, h * w)
        mask_sp = jax.nn.sigmoid(jax.nn.softmax(ctx, axis=1)).reshape(b, h, w, 1)
        spectral = x * mask_sp
        # spatial branch: softmax pixel mask pools v_right -> channel gate
        v = nn.Conv(inter, (1, 1), use_bias=False, name="conv_v_right")(x)
        q = nn.Conv(1, (1, 1), use_bias=False, name="conv_q_right")(x).reshape(b, h * w)
        q = jax.nn.softmax(q, axis=1)
        ctx_ch = jnp.einsum("bhwc,bhw->bc", v, q.reshape(b, h, w))[:, None, None, :]
        mask_ch = jax.nn.sigmoid(nn.Conv(self.planes, (1, 1), use_bias=False, name="conv_up")(ctx_ch))
        spatial = x * mask_ch
        return spatial + spectral


class HDNet(nn.Module):
    in_ch: int = 3
    out_ch: int = 31
    n_feats: int = 48
    n_resblocks: int = 32

    @nn.compact
    def __call__(self, x):  # NHWC
        x = nn.Conv(self.n_feats, (3, 3), padding=1, name="head")(x)
        res = x
        for i in range(self.n_resblocks):
            res = ResBlock(self.n_feats, name=f"body_{i}")(res)
        res = SDLAttention(self.n_feats, name="sdl")(res)
        res = EFF(self.n_feats, 4, name="eff")(res)
        for i in range(self.n_resblocks, 2 * self.n_resblocks - 1):
            res = ResBlock(self.n_feats, name=f"body_{i}")(res)
        res = nn.Conv(self.n_feats, (3, 3), padding=1, name="body_tail")(res)
        res = res + x
        return nn.Conv(self.out_ch, (3, 3), padding=1, name="tail")(res)


def convert_torch_state(state_dict, n_resblocks: int = 32) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix, bias=True):
        p = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
        if bias and f"{prefix}.bias" in sd:
            p["bias"] = sd[f"{prefix}.bias"]
        return p

    def dw_conv(prefix):
        # torch depthwise (nin,1,1,1) -> flax HWIO (1,1,1,nin)
        w = sd[f"{prefix}.weight"]
        return {"kernel": w.reshape(1, 1, 1, -1), "bias": sd[f"{prefix}.bias"]}

    def bn(prefix):
        return {
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"],
            "scale": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
        }

    def resblock(prefix):
        return {"conv0": conv(f"{prefix}.body.0"), "conv1": conv(f"{prefix}.body.2")}

    total = 2 * n_resblocks - 1
    params = {"head": conv("head.0"), "tail": conv("tail.0")}
    # body indices: 0..n-1 ResBlocks, n = SDL, n+1 = EFF, n+2.. ResBlocks, last conv
    for i in range(n_resblocks):
        params[f"body_{i}"] = resblock(f"body.{i}")
    sdl = f"body.{n_resblocks}"
    params["sdl"] = {
        name: conv(f"{sdl}.{name}", bias=False)
        for name in ("conv_q_right", "conv_v_right", "conv_up", "conv_q_left", "conv_v_left")
    }
    eff = f"body.{n_resblocks + 1}"
    params["eff"] = {
        f"sub_{i}": {
            "conv_dws": dw_conv(f"{eff}.subspaces.{i}.conv_dws"),
            "bn_dws": bn(f"{eff}.subspaces.{i}.bn_dws"),
            "conv_point": conv(f"{eff}.subspaces.{i}.conv_point"),
            "bn_point": bn(f"{eff}.subspaces.{i}.bn_point"),
        }
        for i in range(4)
    }
    for j, i in enumerate(range(n_resblocks, total)):
        params[f"body_{i}"] = resblock(f"body.{n_resblocks + 2 + j}")
    params["body_tail"] = conv(f"body.{n_resblocks + 2 + (n_resblocks - 1)}")
    return {"params": params}
