"""HINet (half-instance-norm U-Net, two stages with SAM) in Flax.

Parity: predict_code/architecture/hinet.py — registry config 'hinet' is
HINet(depth=4) at wf=31: conv_in 3->31, two 4-level U-Nets; every conv block
normalizes the first ceil(C/2) channels with an affine InstanceNorm (the
"HIN" trick), LeakyReLU(0.2); stage 2 receives a supervised-attention (SAM)
feature plus cross-stage (CSFF) skips; global residual on the 31-feature
image. Published: MRAE 0.2032 / RMSE 0.0303 / PSNR 32.51 (BASELINE.md).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.models.mst_plus_plus import _conv_w, _convtrans_as_conv


def _instance_norm(x, scale, bias, eps=1e-5):
    """InstanceNorm2d(affine): per-sample, per-channel over (H, W)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


class UNetConvBlock(nn.Module):
    out_size: int
    relu_slope: float = 0.2
    use_hin: bool = False
    use_csff: bool = False

    @nn.compact
    def __call__(self, x, enc=None, dec=None):
        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=self.relu_slope)
        out = nn.Conv(self.out_size, (3, 3), padding=1, use_bias=True, name="conv_1")(x)
        if self.use_hin:
            half = (self.out_size + 1) // 2
            scale = self.param("norm_scale", nn.initializers.ones, (half,))
            bias = self.param("norm_bias", nn.initializers.zeros, (half,))
            out1 = _instance_norm(out[..., :half], scale, bias)
            out = jnp.concatenate([out1, out[..., half:]], axis=-1)
        out = lrelu(out)
        out = lrelu(nn.Conv(self.out_size, (3, 3), padding=1, use_bias=True, name="conv_2")(out))
        out = out + nn.Conv(self.out_size, (1, 1), use_bias=True, name="identity")(x)
        if enc is not None and dec is not None:
            assert self.use_csff
            out = out + nn.Conv(self.out_size, (3, 3), padding=1, use_bias=True, name="csff_enc")(enc)
            out = out + nn.Conv(self.out_size, (3, 3), padding=1, use_bias=True, name="csff_dec")(dec)
        return out


class HINet(nn.Module):
    in_chn: int = 31
    out_chn: int = 31
    wf: int = 31
    depth: int = 4
    relu_slope: float = 0.2

    def _down(self, name, out_size):
        return nn.Conv(out_size, (4, 4), strides=2, padding=1, use_bias=False, name=name)

    def _up(self, name, out_size, x):
        # ConvTranspose(k=2,s=2,bias) as 1x1 conv + depth-to-space
        up = nn.Conv(out_size * 4, (1, 1), use_bias=True, name=name)(x)
        b, h, w, _ = up.shape
        up = up.reshape(b, h, w, 2, 2, out_size)
        return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, out_size)

    @nn.compact
    def __call__(self, x):  # NHWC (B,H,W,3)
        b, h_inp, w_inp, _ = x.shape
        pad_h = (16 - h_inp % 16) % 16
        pad_w = (16 - w_inp % 16) % 16
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")

        image = nn.Conv(self.in_chn, (3, 3), padding=1, use_bias=False, name="conv_in")(x)

        # stage 1
        x1 = nn.Conv(self.wf, (3, 3), padding=1, use_bias=True, name="conv_01")(image)
        encs = []
        for i in range(self.depth):
            block = UNetConvBlock(
                (2**i) * self.wf, self.relu_slope, use_hin=True, name=f"down1_{i}"
            )
            x1 = block(x1)
            if i + 1 < self.depth:
                encs.append(x1)
                x1 = self._down(f"down1_{i}_ds", (2**i) * self.wf)(x1)

        decs = []
        prev = (2 ** (self.depth - 1)) * self.wf
        for idx, i in enumerate(reversed(range(self.depth - 1))):
            out_size = (2**i) * self.wf
            up = self._up(f"up1_{idx}", out_size, x1)
            bridge = nn.Conv(out_size, (3, 3), padding=1, use_bias=True,
                             name=f"skip1_{idx}")(encs[-idx - 1])
            x1 = UNetConvBlock(out_size, self.relu_slope, name=f"up1_{idx}_block")(
                jnp.concatenate([up, bridge], axis=-1)
            )
            decs.append(x1)

        # SAM (hinet.py:19-32)
        sam_x1 = nn.Conv(self.wf, (3, 3), padding=1, use_bias=True, name="sam_conv1")(x1)
        sam_img = nn.Conv(self.wf, (3, 3), padding=1, use_bias=True, name="sam_conv2")(x1) + image
        gate = jax.nn.sigmoid(
            nn.Conv(self.wf, (3, 3), padding=1, use_bias=True, name="sam_conv3")(sam_img)
        )
        sam_feature = sam_x1 * gate + x1

        # stage 2
        x2 = nn.Conv(self.wf, (3, 3), padding=1, use_bias=True, name="conv_02")(image)
        x2 = nn.Conv(self.wf, (1, 1), use_bias=True, name="cat12")(
            jnp.concatenate([x2, sam_feature], axis=-1)
        )
        blocks = []
        for i in range(self.depth):
            down = i + 1 < self.depth
            block = UNetConvBlock(
                (2**i) * self.wf, self.relu_slope, use_hin=True, use_csff=down,
                name=f"down2_{i}",
            )
            if down:
                x2 = block(x2, encs[i], decs[-i - 1])
                blocks.append(x2)
                x2 = self._down(f"down2_{i}_ds", (2**i) * self.wf)(x2)
            else:
                x2 = block(x2)

        for idx, i in enumerate(reversed(range(self.depth - 1))):
            out_size = (2**i) * self.wf
            up = self._up(f"up2_{idx}", out_size, x2)
            bridge = nn.Conv(out_size, (3, 3), padding=1, use_bias=True,
                             name=f"skip2_{idx}")(blocks[-idx - 1])
            x2 = UNetConvBlock(out_size, self.relu_slope, name=f"up2_{idx}_block")(
                jnp.concatenate([up, bridge], axis=-1)
            )

        out = nn.Conv(self.out_chn, (3, 3), padding=1, use_bias=True, name="last")(x2)
        out = out + image
        return out[:, :h_inp, :w_inp, :]


def convert_torch_state(state_dict, depth: int = 4, wf: int = 31) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix, bias=True):
        p = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
        if bias and f"{prefix}.bias" in sd:
            p["bias"] = sd[f"{prefix}.bias"]
        return p

    def block(prefix, use_hin=False, use_csff=False):
        p = {
            "conv_1": conv(f"{prefix}.conv_1"),
            "conv_2": conv(f"{prefix}.conv_2"),
            "identity": conv(f"{prefix}.identity"),
        }
        if use_hin:
            p["norm_scale"] = sd[f"{prefix}.norm.weight"]
            p["norm_bias"] = sd[f"{prefix}.norm.bias"]
        if use_csff:
            p["csff_enc"] = conv(f"{prefix}.csff_enc")
            p["csff_dec"] = conv(f"{prefix}.csff_dec")
        return p

    def upconv(prefix, out_size):
        kernel, bias = _convtrans_as_conv(
            sd[f"{prefix}.weight"], sd.get(f"{prefix}.bias"), out_size
        )
        return {"kernel": kernel, "bias": bias}

    params = {
        "conv_in": {"kernel": _conv_w(sd["conv_in.weight"])},
        "conv_01": conv("conv_01"),
        "conv_02": conv("conv_02"),
        "cat12": conv("cat12"),
        "last": conv("last"),
        "sam_conv1": conv("sam12.conv1"),
        "sam_conv2": conv("sam12.conv2"),
        "sam_conv3": conv("sam12.conv3"),
    }
    for i in range(depth):
        down = i + 1 < depth
        params[f"down1_{i}"] = block(f"down_path_1.{i}", use_hin=True)
        params[f"down2_{i}"] = block(f"down_path_2.{i}", use_hin=True, use_csff=down)
        if down:
            params[f"down1_{i}_ds"] = {"kernel": _conv_w(sd[f"down_path_1.{i}.downsample.weight"])}
            params[f"down2_{i}_ds"] = {"kernel": _conv_w(sd[f"down_path_2.{i}.downsample.weight"])}
    for idx, i in enumerate(reversed(range(depth - 1))):
        out_size = (2**i) * wf
        params[f"up1_{idx}"] = upconv(f"up_path_1.{idx}.up", out_size)
        params[f"up2_{idx}"] = upconv(f"up_path_2.{idx}.up", out_size)
        params[f"up1_{idx}_block"] = block(f"up_path_1.{idx}.conv_block")
        params[f"up2_{idx}_block"] = block(f"up_path_2.{idx}.conv_block")
        params[f"skip1_{idx}"] = conv(f"skip_conv_1.{idx}")
        params[f"skip2_{idx}"] = conv(f"skip_conv_2.{idx}")
    return {"params": params}
