"""MIRNet in Flax.

Parity: predict_code/architecture/MIRNet.py — registry config
MIRNet(n_RRG=3, n_MSRB=1, height=3, width=1) (architecture/__init__.py:14-15).
Multi-scale residual blocks over a 3-row pyramid: anti-aliased blur-pool
downsamples (fixed [1,2,1] binomial depthwise filter), residual upsamples
(k3 s2 transposed conv + bilinear skip), dual-attention units (spatial
max/mean-pool gate + channel squeeze-excite), and selective-kernel fusion
(softmax over pyramid rows). Torch quirks honored: every DAU shares one
PReLU object (mutable default arg) — weights are identical per site; the
bilinear skip uses align_corners=bias i.e. False; with width=1 the mesh
columns collapse to a single chain. Published: MRAE 0.3139 / RMSE 0.0508 /
PSNR 29.15 (BASELINE.md).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.models.mst_plus_plus import _conv_w


def _bilinear2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear", antialias=False)


def _blur_pool(x):
    """downsamp(filt_size=3, stride=2): reflect pad 1, depthwise [1,2,1]
    binomial blur, stride-2 subsample."""
    c = x.shape[-1]
    a = jnp.array([1.0, 2.0, 1.0])
    filt = (a[:, None] * a[None, :]) / 16.0
    w = jnp.tile(filt[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


class ConvTranspose3x3(nn.Module):
    """torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1): zero-insert
    by 2, pad (1,2), correlate with the flipped in/out-swapped kernel —
    expressed as one lax conv with lhs_dilation."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, in_c, self.features)
        )
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("weight", nn.initializers.constant(0.25), (1,))
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class ResidualDownSample(nn.Module):
    in_channels: int

    @nn.compact
    def __call__(self, x):
        out_c = self.in_channels * 2
        top = nn.Conv(self.in_channels, (1, 1), use_bias=False, name="top_0")(x)
        top = PReLU(name="top_1")(top)
        top = nn.Conv(self.in_channels, (3, 3), padding=1, use_bias=False, name="top_2")(top)
        top = PReLU(name="top_3")(top)
        top = nn.Conv(out_c, (1, 1), use_bias=False, name="top_5")(_blur_pool(top))
        bot = nn.Conv(out_c, (1, 1), use_bias=False, name="bot_1")(_blur_pool(x))
        return top + bot


class ResidualUpSample(nn.Module):
    in_channels: int

    @nn.compact
    def __call__(self, x):
        out_c = self.in_channels // 2
        top = nn.Conv(self.in_channels, (1, 1), use_bias=False, name="top_0")(x)
        top = PReLU(name="top_1")(top)
        top = ConvTranspose3x3(self.in_channels, name="top_2")(top)
        top = PReLU(name="top_3")(top)
        top = nn.Conv(out_c, (1, 1), use_bias=False, name="top_4")(top)
        bot = nn.Conv(out_c, (1, 1), use_bias=False, name="bot_1")(_bilinear2x(x))
        return top + bot


class DownSampleN(nn.Module):
    in_channels: int
    scale_factor: int

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        for i in range(int(np.log2(self.scale_factor))):
            x = ResidualDownSample(c, name=f"body_{i}")(x)
            c *= 2
        return x


class UpSampleN(nn.Module):
    in_channels: int
    scale_factor: int

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        for i in range(int(np.log2(self.scale_factor))):
            x = ResidualUpSample(c, name=f"body_{i}")(x)
            c //= 2
        return x


class SpatialAttn(nn.Module):
    @nn.compact
    def __call__(self, x):
        pooled = jnp.concatenate(
            [jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)],
            axis=-1,
        )
        gate = nn.Conv(1, (5, 5), padding=2, use_bias=False, name="spatial")(pooled)
        return x * jax.nn.sigmoid(gate)


class ChannelAttn(nn.Module):
    channel: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(self.channel // self.reduction, (1, 1), use_bias=False, name="du_0")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.channel, (1, 1), use_bias=False, name="du_2")(y)
        return x * jax.nn.sigmoid(y)


class DAU(nn.Module):
    n_feat: int

    @nn.compact
    def __call__(self, x):
        res = nn.Conv(self.n_feat, (3, 3), padding=1, use_bias=False, name="body_0")(x)
        res = PReLU(name="act")(res)
        res = nn.Conv(self.n_feat, (3, 3), padding=1, use_bias=False, name="body_2")(res)
        sa = SpatialAttn(name="sa")(res)
        ca = ChannelAttn(self.n_feat, name="ca")(res)
        res = nn.Conv(self.n_feat, (1, 1), use_bias=False, name="conv1x1")(
            jnp.concatenate([sa, ca], axis=-1)
        )
        return res + x


class SKFF(nn.Module):
    in_channels: int
    height: int = 3
    reduction: int = 8

    @nn.compact
    def __call__(self, inp_feats):
        d = max(self.in_channels // self.reduction, 4)
        stacked = jnp.stack(inp_feats, axis=1)  # (b, height, h, w, c)
        u = jnp.sum(stacked, axis=1)
        z = jnp.mean(u, axis=(1, 2), keepdims=True)
        z = nn.Conv(d, (1, 1), use_bias=False, name="du_0")(z)
        z = PReLU(name="du_1")(z)
        attn = jnp.stack(
            [nn.Conv(self.in_channels, (1, 1), use_bias=False, name=f"fc_{i}")(z)
             for i in range(self.height)],
            axis=1,
        )  # (b, height, 1, 1, c)
        attn = jax.nn.softmax(attn, axis=1)
        return jnp.sum(stacked * attn, axis=1)


class MSRB(nn.Module):
    n_feat: int
    height: int = 3
    width: int = 1
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        feats = [self.n_feat * self.stride**i for i in range(self.height)]
        # one DAU per row (torch's [DAU]*width aliases a single instance)
        daus = [DAU(feats[j], name=f"dau_{j}") for j in range(self.height)]
        skffs = [SKFF(feats[j], self.height, name=f"skff_{j}") for j in range(self.height)]

        def down(t, feat, scale, tag):
            return DownSampleN(feat, scale, name=f"down_{feat}_{scale}{tag}")(t)

        def up(t, feat, scale, tag):
            return UpSampleN(feat, scale, name=f"up_{feat}_{scale}{tag}")(t)

        # column 1: cascade down the pyramid
        inp = x
        blocks_out = []
        for j in range(self.height):
            if j > 0:
                inp = down(inp, feats[j - 1], 2, "")
            inp = daus[j](inp)
            blocks_out.append(inp)

        # mesh columns (no-op at the registry width=1)
        for i in range(1, self.width):
            tmp = []
            for j in range(self.height):
                gathered = []
                for k in range(self.height):
                    t = blocks_out[k]
                    if j == k:
                        gathered.append(t)
                    elif j > k:
                        gathered.append(down(t, feats[k], 2 ** (j - k), f"_m{i}{j}{k}"))
                    else:
                        gathered.append(up(t, feats[k], 2 ** (k - j), f"_m{i}{j}{k}"))
                tmp.append(skffs[j](gathered))
            blocks_out = [daus[j](tmp[j]) for j in range(self.height)]

        out = [blocks_out[0]]
        for k in range(1, self.height):
            out.append(UpSampleN(feats[k], 2**k, name=f"last_up_{k}")(blocks_out[k]))
        fused = skffs[0](out)
        fused = nn.Conv(self.n_feat, (3, 3), padding=1, use_bias=False, name="conv_out")(fused)
        return fused + x


class RRG(nn.Module):
    n_feat: int
    n_msrb: int = 1
    height: int = 3
    width: int = 1

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.n_msrb):
            res = MSRB(self.n_feat, self.height, self.width, name=f"msrb_{i}")(res)
        res = nn.Conv(self.n_feat, (3, 3), padding=1, use_bias=False, name="conv")(res)
        return res + x


class MIRNet(nn.Module):
    in_channels: int = 3
    out_channels: int = 31
    n_feat: int = 31
    n_rrg: int = 3
    n_msrb: int = 1
    height: int = 3
    width: int = 1

    @nn.compact
    def __call__(self, x):  # NHWC (B,H,W,3)
        b, h_inp, w_inp, _ = x.shape
        pad_h = (8 - h_inp % 8) % 8
        pad_w = (8 - w_inp % 8) % 8
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        x = nn.Conv(self.n_feat, (3, 3), padding=1, use_bias=False, name="conv_in")(x)
        h = x
        for i in range(self.n_rrg):
            h = RRG(self.n_feat, self.n_msrb, self.height, self.width, name=f"rrg_{i}")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, name="conv_out")(h)
        h = h + x
        return h[:, :h_inp, :w_inp, :]


def convert_torch_state(
    state_dict, n_rrg: int = 3, n_msrb: int = 1, height: int = 3, width: int = 1,
    n_feat: int = 31,
) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix):
        return {"kernel": _conv_w(sd[f"{prefix}.weight"])}

    def prelu(prefix):
        return {"weight": sd[f"{prefix}.weight"]}

    def res_down(prefix):
        return {
            "top_0": conv(f"{prefix}.top.0"), "top_1": prelu(f"{prefix}.top.1"),
            "top_2": conv(f"{prefix}.top.2"), "top_3": prelu(f"{prefix}.top.3"),
            "top_5": conv(f"{prefix}.top.5"), "bot_1": conv(f"{prefix}.bot.1"),
        }

    def res_up(prefix):
        # ConvTranspose2d weight (Cin, Cout, kh, kw) -> flipped HWIO
        w = sd[f"{prefix}.top.2.weight"]
        tkernel = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
        return {
            "top_0": conv(f"{prefix}.top.0"), "top_1": prelu(f"{prefix}.top.1"),
            "top_2": {"kernel": tkernel}, "top_3": prelu(f"{prefix}.top.3"),
            "top_4": conv(f"{prefix}.top.4"), "bot_1": conv(f"{prefix}.bot.1"),
        }

    def down_n(prefix, scale):
        return {f"body_{i}": res_down(f"{prefix}.body.{i}")
                for i in range(int(np.log2(scale)))}

    def up_n(prefix, scale):
        return {f"body_{i}": res_up(f"{prefix}.body.{i}")
                for i in range(int(np.log2(scale)))}

    def dau(prefix):
        return {
            "body_0": conv(f"{prefix}.body.0"),
            "act": prelu(f"{prefix}.body.1"),
            "body_2": conv(f"{prefix}.body.2"),
            "sa": {"spatial": conv(f"{prefix}.SA.spatial.conv")},
            "ca": {"du_0": conv(f"{prefix}.CA.conv_du.0"), "du_2": conv(f"{prefix}.CA.conv_du.2")},
            "conv1x1": conv(f"{prefix}.conv1x1"),
        }

    def skff(prefix, h):
        p = {"du_0": conv(f"{prefix}.conv_du.0"), "du_1": prelu(f"{prefix}.conv_du.1")}
        for i in range(h):
            p[f"fc_{i}"] = conv(f"{prefix}.fcs.{i}")
        return p

    feats = [n_feat * 2**i for i in range(height)]

    def msrb(prefix):
        p = {"conv_out": conv(f"{prefix}.conv_out")}
        for j in range(height):
            p[f"dau_{j}"] = dau(f"{prefix}.blocks.{j}.0")
            p[f"skff_{j}"] = skff(f"{prefix}.selective_kernel.{j}", height)
        # column-1 downs: feat_2 chains
        for j in range(height - 1):
            p[f"down_{feats[j]}_2"] = down_n(f"{prefix}.down.{feats[j]}_2", 2)
        for k in range(1, height):
            p[f"last_up_{k}"] = up_n(f"{prefix}.last_up.{k}", 2**k)
        if width > 1:
            for i in range(1, width):
                for j in range(height):
                    for k in range(height):
                        if j > k:
                            s = 2 ** (j - k)
                            p[f"down_{feats[k]}_{s}_m{i}{j}{k}"] = down_n(
                                f"{prefix}.down.{feats[k]}_{s}", s)
                        elif j < k:
                            s = 2 ** (k - j)
                            p[f"up_{feats[k]}_{s}_m{i}{j}{k}"] = up_n(
                                f"{prefix}.up.{feats[k]}_{s}", s)
        return p

    params = {"conv_in": conv("conv_in"), "conv_out": conv("conv_out")}
    for r in range(n_rrg):
        rp = {"conv": conv(f"body.{r}.body.{n_msrb}")}
        for m in range(n_msrb):
            rp[f"msrb_{m}"] = msrb(f"body.{r}.body.{m}")
        params[f"rrg_{r}"] = rp
    return {"params": params}
