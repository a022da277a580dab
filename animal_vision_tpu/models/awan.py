"""AWAN (adaptive weighted attention network) in Flax.

Parity: test_develop_code/architecture/AWAN.py (the reference's eval-side
zoo adds AWAN; SURVEY.md §2.6). Published: MRAE 0.2500 / RMSE 0.0367 /
PSNR 31.22 (BASELINE.md). Pieces: reflection-padded convs, scalar PReLUs,
AWCA (softmax spatial pooling -> squeeze-excite), 8 DRAB blocks with a
running residual, and a PSNL tail (quadrant-wise non-local with
second-order covariance attention).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.models.mst_plus_plus import _conv_w, _dense_w


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("weight", nn.initializers.constant(0.25), (1,))
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class RefConv(nn.Module):
    """Conv with torch ReflectionPad2d semantics (reflect-101)."""

    out_dim: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = int(self.dilation * (self.kernel_size - 1) / 2)
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        return nn.Conv(
            self.out_dim,
            (self.kernel_size, self.kernel_size),
            padding="VALID",
            kernel_dilation=self.dilation,
            use_bias=False,
            name="conv2d",
        )(x)


class AWCA(nn.Module):
    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):  # NHWC
        b, h, w, c = x.shape
        mask = nn.Conv(1, (1, 1), use_bias=False, name="conv")(x).reshape(b, h * w)
        mask = jax.nn.softmax(mask, axis=1)
        y = jnp.einsum("bnc,bn->bc", x.reshape(b, h * w, c), mask)
        y = nn.Dense(self.channel // self.reduction, use_bias=False, name="fc_0")(y)
        y = PReLU(name="fc_prelu")(y)
        y = nn.Dense(self.channel, use_bias=False, name="fc_2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class DRAB(nn.Module):
    dim: int
    res_dim: int
    k1_size: int = 5
    k2_size: int = 3

    @nn.compact
    def __call__(self, x, res):
        x_r = x
        x = PReLU(name="relu1")(RefConv(self.dim, 3, name="conv1")(x))
        x = RefConv(self.dim, 3, name="conv2")(x)
        x = PReLU(name="relu2")(x + x_r)
        x = RefConv(self.res_dim, self.k1_size, name="up_conv")(x)
        x = PReLU(name="up_relu")(x + res)
        res = x
        x = AWCA(self.res_dim, name="se")(x)
        x = RefConv(self.dim, self.k2_size, name="down_conv")(x)
        x = PReLU(name="down_relu")(x + x_r)
        return x, res


class NonLocal2D(nn.Module):
    """Second-order (covariance) non-local block (NONLocalBlock2D)."""

    in_channels: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):  # NHWC
        b, h, w, c = x.shape
        inter = self.in_channels // self.reduction
        g = nn.Conv(inter, (1, 1), use_bias=False, name="g")(x).reshape(b, h * w, inter)
        theta = nn.Conv(inter, (1, 1), use_bias=False, name="theta")(x).reshape(b, h * w, inter)
        # count_cov_second (AWAN.py:112-117): input (b, dim=n, M=inter);
        # f = (x - mean_over_M) @ x^T / M -> an (n, n) second-order attention.
        x_mean = jnp.mean(theta, axis=2, keepdims=True)
        f = jnp.einsum("bnm,bkm->bnk", theta - x_mean, theta) / inter  # (b, n, n)
        f = jax.nn.softmax(f, axis=-1)
        y = jnp.einsum("bnk,bki->bni", f, g).reshape(b, h, w, inter)
        wy = nn.Conv(self.in_channels, (1, 1), use_bias=False, name="W")(y)
        return wy + x


class PSNL(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        h1, w1 = h // 2, w // 2
        nl = NonLocal2D(self.channels, name="non_local")
        lu = nl(x[:, :h1, :w1])
        ld = nl(x[:, h1:, :w1])
        ru = nl(x[:, :h1, w1:])
        rd = nl(x[:, h1:, w1:])
        top = jnp.concatenate([lu, ru], axis=2)
        bot = jnp.concatenate([ld, rd], axis=2)
        return jnp.concatenate([top, bot], axis=1)


class AWAN(nn.Module):
    inplanes: int = 3
    planes: int = 31
    channels: int = 96
    n_drbs: int = 8

    @nn.compact
    def __call__(self, x):  # NHWC
        out = PReLU(name="input_prelu2D")(RefConv(self.channels, 3, name="input_conv2D")(x))
        out = RefConv(self.channels, 3, name="head_conv2D")(out)
        residual = out
        res = out
        for i in range(self.n_drbs):
            out, res = DRAB(self.channels, self.channels, 5, 3, name=f"backbone_{i}")(out, res)
        out = RefConv(self.channels, 3, name="tail_conv2D")(out)
        out = out + residual
        out = RefConv(self.planes, 3, name="output_conv2D")(PReLU(name="output_prelu2D")(out))
        return PSNL(self.planes, name="tail_nonlocal")(out)


def convert_torch_state(state_dict, n_drbs: int = 8) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def refconv(prefix):
        return {"conv2d": {"kernel": _conv_w(sd[f"{prefix}.conv2d.weight"])}}

    def prelu(prefix):
        return {"weight": sd[f"{prefix}.weight"]}

    def awca(prefix, channel):
        return {
            "conv": {"kernel": _conv_w(sd[f"{prefix}.conv.weight"])},
            "fc_0": {"kernel": _dense_w(sd[f"{prefix}.fc.0.weight"])},
            "fc_prelu": prelu(f"{prefix}.fc.1"),
            "fc_2": {"kernel": _dense_w(sd[f"{prefix}.fc.2.weight"])},
        }

    params = {
        "input_conv2D": refconv("input_conv2D"),
        "input_prelu2D": prelu("input_prelu2D"),
        "head_conv2D": refconv("head_conv2D"),
        "tail_conv2D": refconv("tail_conv2D"),
        "output_prelu2D": prelu("output_prelu2D"),
        "output_conv2D": refconv("output_conv2D"),
        "tail_nonlocal": {
            "non_local": {
                "g": {"kernel": _conv_w(sd["tail_nonlocal.non_local.g.weight"])},
                "theta": {"kernel": _conv_w(sd["tail_nonlocal.non_local.theta.weight"])},
                "W": {"kernel": _conv_w(sd["tail_nonlocal.non_local.W.weight"])},
            }
        },
    }
    for i in range(n_drbs):
        p = f"backbone.{i}"
        params[f"backbone_{i}"] = {
            "conv1": refconv(f"{p}.conv1"),
            "relu1": prelu(f"{p}.relu1"),
            "conv2": refconv(f"{p}.conv2"),
            "relu2": prelu(f"{p}.relu2"),
            "up_conv": refconv(f"{p}.up_conv"),
            "up_relu": prelu(f"{p}.up_relu"),
            "se": awca(f"{p}.se", 96),
            "down_conv": refconv(f"{p}.down_conv"),
            "down_relu": prelu(f"{p}.down_relu"),
        }
    return {"params": params}
