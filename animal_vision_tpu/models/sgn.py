"""SGN (self-guided network, the reference's 'hrnet' method) in Flax.

Parity: predict_code/architecture/hrnet.py — registry config SGN()
(architecture/__init__.py:30-31): three pixel-unshuffled guidance branches
(x8/x4/x2) feeding a full-res mainstream, residual dense blocks (5 dense
convs, 0.1-scaled residual), and LeakyReLU(0.2) activations throughout.
Torch quirks honored: GlobalBlock's squeeze-excite gate is computed then
overwritten (`y = self.conv2(x)`) so the SE/fc weights are dead code — we
reproduce `residual + 0.1*conv2(conv1(x))` and the converter skips the fc
weights; the final `main4` conv is also LeakyReLU-activated, so the net
cannot emit values below 0.2*min. Published: MRAE 0.3476 / RMSE 0.0550 /
PSNR 26.89 (BASELINE.md).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.models.mst_plus_plus import _conv_w


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _pixel_unshuffle(x, df):
    """torch-order pixel unshuffle: out channel = g*df*df + y*df + x."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // df, df, w // df, df, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // df, w // df, c * df * df)


def _pixel_shuffle(x):
    """torch PixelShuffle(2): in channel c*4 + y*2 + x -> (c, 2h+y, 2w+x)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * 2, w * 2, c)


class ConvLayer(nn.Module):
    features: int
    kernel: int = 3
    act: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        y = nn.Conv(self.features, (self.kernel, self.kernel), padding=p, name="conv2d")(x)
        return _lrelu(y) if self.act else y


class RDB5C(nn.Module):
    """ResidualDenseBlock_5C: five dense LeakyReLU convs, 0.1-scaled residual."""

    in_channels: int
    latent_channels: int

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(4):
            y = ConvLayer(self.latent_channels, name=f"conv{i + 1}")(
                jnp.concatenate(feats, axis=-1)
            )
            feats.append(y)
        x5 = ConvLayer(self.in_channels, name="conv5")(jnp.concatenate(feats, axis=-1))
        return 0.1 * x5 + x


class GlobalBlock(nn.Module):
    """hrnet.py:316-345 — the SE gate result is overwritten by conv2(x);
    reproduced faithfully (the fc weights are dead)."""

    in_channels: int

    @nn.compact
    def __call__(self, x):
        residual = x
        x = ConvLayer(self.in_channels, name="conv1")(x)
        y = ConvLayer(self.in_channels, name="conv2")(x)
        return 0.1 * y + residual


class SGN(nn.Module):
    in_channels: int = 3
    out_channels: int = 31
    start_channels: int = 64

    @nn.compact
    def __call__(self, x):  # NHWC (B,H,W,3)
        b, h_inp, w_inp, _ = x.shape
        pad_h = (8 - h_inp % 8) % 8
        pad_w = (8 - w_inp % 8) % 8
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        s = self.start_channels

        x1 = _pixel_unshuffle(x, 2)
        x2 = _pixel_unshuffle(x, 4)
        x3 = _pixel_unshuffle(x, 8)

        # top (x8)
        x3 = ConvLayer(s * 8, name="top1")(x3)
        x3 = RDB5C(s * 8, s * 4, name="top21")(x3)
        x3 = GlobalBlock(s * 8, name="top22")(x3)
        x3 = ConvLayer(s * 8, kernel=1, name="top3")(x3)
        x3 = _pixel_shuffle(x3)
        # middle (x4)
        x2 = ConvLayer(s * 4, name="mid1")(x2)
        x2 = ConvLayer(s * 4, name="mid2")(jnp.concatenate([x2, x3], axis=-1))
        x2 = RDB5C(s * 4, s * 2, name="mid31")(x2)
        x2 = GlobalBlock(s * 4, name="mid32")(x2)
        x2 = ConvLayer(s * 4, name="mid4")(x2)
        x2 = _pixel_shuffle(x2)
        # bottom (x2)
        x1 = ConvLayer(s * 2, name="bot1")(x1)
        x1 = ConvLayer(s * 2, name="bot2")(jnp.concatenate([x1, x2], axis=-1))
        x1 = RDB5C(s * 2, s, name="bot31")(x1)
        x1 = RDB5C(s * 2, s, name="bot32")(x1)
        x1 = GlobalBlock(s * 2, name="bot33")(x1)
        x1 = ConvLayer(s * 2, name="bot4")(x1)
        x1 = _pixel_shuffle(x1)
        # mainstream (full res)
        x = ConvLayer(s, name="main1")(x)
        x = ConvLayer(s, name="main2")(jnp.concatenate([x, x1], axis=-1))
        for i in range(1, 5):
            x = RDB5C(s, s // 2, name=f"main3{i}")(x)
        x = GlobalBlock(s, name="main35")(x)
        x = ConvLayer(self.out_channels, name="main4")(x)  # lrelu'd output (quirk)
        return x[:, :h_inp, :w_inp, :]


def convert_torch_state(state_dict) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def convlayer(prefix):
        return {"conv2d": {"kernel": _conv_w(sd[f"{prefix}.conv2d.weight"]),
                           "bias": sd[f"{prefix}.conv2d.bias"]}}

    def rdb(prefix):
        return {f"conv{i}": convlayer(f"{prefix}.conv{i}") for i in range(1, 6)}

    def glob(prefix):  # fc weights are dead code — skipped
        return {"conv1": convlayer(f"{prefix}.conv1"), "conv2": convlayer(f"{prefix}.conv2")}

    params = {}
    for name in ("top1", "top3", "mid1", "mid2", "mid4", "bot1", "bot2", "bot4",
                 "main1", "main2", "main4"):
        params[name] = convlayer(name)
    for name in ("top21", "mid31", "bot31", "bot32", "main31", "main32", "main33", "main34"):
        params[name] = rdb(name)
    for name in ("top22", "mid32", "bot33", "main35"):
        params[name] = glob(name)
    return {"params": params}
