"""MPRNet in Flax.

Parity: predict_code/architecture/MPRNet.py — registry config
MPRNet(num_cab=4): three progressive stages over a multi-patch hierarchy
(4 quarter-patches -> 2 half-patches -> full frame), channel-attention
blocks (CAB, reduction=1), cross-stage feature fusion, supervised attention
(SAM), and an original-resolution ORSNet tail. The torch model shares ONE
PReLU activation object across every CAB (its weight appears under each
parent in the state_dict); bilinear resizes are align_corners=False without
antialias. Published: MRAE 0.1817 / RMSE 0.0270 / PSNR 33.50 (BASELINE.md).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.models.mst_plus_plus import _conv_w


def _bilinear(x, h, w):
    """torch F.interpolate(bilinear, align_corners=False, no antialias)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear", antialias=False)


class PReLUShared(nn.Module):
    """Scalar PReLU whose weight is converted per call-site (the torch net
    shares one object; weights are identical across sites)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("weight", nn.initializers.constant(0.25), (1,))
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class CALayer(nn.Module):
    channel: int
    reduction: int = 1

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(self.channel // self.reduction, (1, 1), use_bias=False, name="du_0")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.channel, (1, 1), use_bias=False, name="du_2")(y)
        return x * jax.nn.sigmoid(y)


class CAB(nn.Module):
    n_feat: int
    kernel: int = 3
    reduction: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        res = nn.Conv(self.n_feat, (self.kernel, self.kernel), padding=p, use_bias=False, name="body_0")(x)
        res = PReLUShared(name="act")(res)
        res = nn.Conv(self.n_feat, (self.kernel, self.kernel), padding=p, use_bias=False, name="body_2")(res)
        res = CALayer(self.n_feat, self.reduction, name="ca")(res)
        return res + x


class SAM(nn.Module):
    n_feat: int
    kernel: int = 1

    @nn.compact
    def __call__(self, x, x_img):
        p = self.kernel // 2
        k = (self.kernel, self.kernel)
        x1 = nn.Conv(self.n_feat, k, padding=p, use_bias=False, name="conv1")(x)
        img = nn.Conv(31, k, padding=p, use_bias=False, name="conv2")(x) + x_img
        gate = jax.nn.sigmoid(nn.Conv(self.n_feat, k, padding=p, use_bias=False, name="conv3")(img))
        return x1 * gate + x, img


class Encoder(nn.Module):
    n_feat: int
    scale: int
    csff: bool = False

    @nn.compact
    def __call__(self, x, encoder_outs=None, decoder_outs=None):
        f1, f2, f3 = self.n_feat, self.n_feat + self.scale, self.n_feat + 2 * self.scale
        enc1 = CAB(f1, name="l1_0")(x)
        enc1 = CAB(f1, name="l1_1")(enc1)
        if encoder_outs is not None:
            enc1 = enc1 + nn.Conv(f1, (1, 1), use_bias=False, name="csff_enc1")(encoder_outs[0]) \
                        + nn.Conv(f1, (1, 1), use_bias=False, name="csff_dec1")(decoder_outs[0])
        y = _bilinear(enc1, enc1.shape[1] // 2, enc1.shape[2] // 2)
        y = nn.Conv(f2, (1, 1), use_bias=False, name="down12")(y)
        enc2 = CAB(f2, name="l2_0")(y)
        enc2 = CAB(f2, name="l2_1")(enc2)
        if encoder_outs is not None:
            enc2 = enc2 + nn.Conv(f2, (1, 1), use_bias=False, name="csff_enc2")(encoder_outs[1]) \
                        + nn.Conv(f2, (1, 1), use_bias=False, name="csff_dec2")(decoder_outs[1])
        y = _bilinear(enc2, enc2.shape[1] // 2, enc2.shape[2] // 2)
        y = nn.Conv(f3, (1, 1), use_bias=False, name="down23")(y)
        enc3 = CAB(f3, name="l3_0")(y)
        enc3 = CAB(f3, name="l3_1")(enc3)
        if encoder_outs is not None:
            enc3 = enc3 + nn.Conv(f3, (1, 1), use_bias=False, name="csff_enc3")(encoder_outs[2]) \
                        + nn.Conv(f3, (1, 1), use_bias=False, name="csff_dec3")(decoder_outs[2])
        return [enc1, enc2, enc3]


class Decoder(nn.Module):
    n_feat: int
    scale: int

    @nn.compact
    def __call__(self, outs):
        enc1, enc2, enc3 = outs
        f1, f2, f3 = self.n_feat, self.n_feat + self.scale, self.n_feat + 2 * self.scale
        dec3 = CAB(f3, name="l3_0")(enc3)
        dec3 = CAB(f3, name="l3_1")(dec3)
        skip2 = CAB(f2, name="skip_attn2")(enc2)
        y = _bilinear(dec3, dec3.shape[1] * 2, dec3.shape[2] * 2)
        y = nn.Conv(f2, (1, 1), use_bias=False, name="up32")(y) + skip2
        dec2 = CAB(f2, name="l2_0")(y)
        dec2 = CAB(f2, name="l2_1")(dec2)
        skip1 = CAB(f1, name="skip_attn1")(enc1)
        y = _bilinear(dec2, dec2.shape[1] * 2, dec2.shape[2] * 2)
        y = nn.Conv(f1, (1, 1), use_bias=False, name="up21")(y) + skip1
        dec1 = CAB(f1, name="l1_0")(y)
        dec1 = CAB(f1, name="l1_1")(dec1)
        return [dec1, dec2, dec3]


class ORB(nn.Module):
    n_feat: int
    num_cab: int

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.num_cab):
            res = CAB(self.n_feat, name=f"cab_{i}")(res)
        res = nn.Conv(self.n_feat, (3, 3), padding=1, use_bias=False, name="tail")(res)
        return res + x


class UpSample1(nn.Module):
    out_feat: int

    @nn.compact
    def __call__(self, x):
        y = _bilinear(x, x.shape[1] * 2, x.shape[2] * 2)
        return nn.Conv(self.out_feat, (1, 1), use_bias=False, name="conv")(y)


class ORSNet(nn.Module):
    n_feat: int
    scale_ors: int
    scale_unet: int
    num_cab: int

    @nn.compact
    def __call__(self, x, encoder_outs, decoder_outs):
        fo = self.n_feat + self.scale_ors
        x = ORB(fo, self.num_cab, name="orb1")(x)
        x = x + nn.Conv(fo, (1, 1), use_bias=False, name="conv_enc1")(encoder_outs[0]) \
              + nn.Conv(fo, (1, 1), use_bias=False, name="conv_dec1")(decoder_outs[0])
        x = ORB(fo, self.num_cab, name="orb2")(x)
        ue1 = UpSample1(self.n_feat, name="up_enc1")(encoder_outs[1])
        ud1 = UpSample1(self.n_feat, name="up_dec1")(decoder_outs[1])
        x = x + nn.Conv(fo, (1, 1), use_bias=False, name="conv_enc2")(ue1) \
              + nn.Conv(fo, (1, 1), use_bias=False, name="conv_dec2")(ud1)
        x = ORB(fo, self.num_cab, name="orb3")(x)
        ue2 = UpSample1(self.n_feat, name="up_enc2_1")(
            UpSample1(self.n_feat + self.scale_unet, name="up_enc2_0")(encoder_outs[2])
        )
        ud2 = UpSample1(self.n_feat, name="up_dec2_1")(
            UpSample1(self.n_feat + self.scale_unet, name="up_dec2_0")(decoder_outs[2])
        )
        x = x + nn.Conv(fo, (1, 1), use_bias=False, name="conv_enc3")(ue2) \
              + nn.Conv(fo, (1, 1), use_bias=False, name="conv_dec3")(ud2)
        return x


class MPRNet(nn.Module):
    in_c: int = 31
    out_c: int = 31
    n_feat: int = 31
    scale_unet: int = 31
    scale_ors: int = 31
    num_cab: int = 4

    @nn.compact
    def __call__(self, x):  # NHWC (B,H,W,3)
        b, h_inp, w_inp, _ = x.shape
        pad_h = (8 - h_inp % 8) % 8
        pad_w = (8 - w_inp % 8) % 8
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        x3_img = nn.Conv(self.in_c, (3, 3), padding=1, use_bias=False, name="conv_in")(x)
        hh, ww = x3_img.shape[1], x3_img.shape[2]

        def make_shallow(name):
            cv = nn.Conv(self.n_feat, (3, 3), padding=1, use_bias=False, name=f"{name}_conv")
            cb = CAB(self.n_feat, name=f"{name}_cab")
            return lambda v: cb(cv(v))

        shallow1 = make_shallow("shallow_feat1")
        shallow2 = make_shallow("shallow_feat2")
        shallow3 = make_shallow("shallow_feat3")

        x2top_img, x2bot_img = x3_img[:, : hh // 2], x3_img[:, hh // 2 :]
        quads = [x2top_img[:, :, : ww // 2], x2top_img[:, :, ww // 2 :],
                 x2bot_img[:, :, : ww // 2], x2bot_img[:, :, ww // 2 :]]

        enc1 = Encoder(self.n_feat, self.scale_unet, name="stage1_encoder")
        sh1 = [shallow1(q) for q in quads]
        feats = [enc1(s) for s in sh1]
        feat1_top = [jnp.concatenate([k, v], axis=2) for k, v in zip(feats[0], feats[1])]
        feat1_bot = [jnp.concatenate([k, v], axis=2) for k, v in zip(feats[2], feats[3])]
        dec1 = Decoder(self.n_feat, self.scale_unet, name="stage1_decoder")
        res1_top = dec1(feat1_top)
        res1_bot = dec1(feat1_bot)
        sam12 = SAM(self.n_feat, 1, name="sam12")
        x2top_samfeats, _ = sam12(res1_top[0], x2top_img)
        x2bot_samfeats, _ = sam12(res1_bot[0], x2bot_img)

        x2top = shallow2(x2top_img)
        x2bot = shallow2(x2bot_img)  # same params, reused
        cat12 = nn.Conv(self.n_feat, (3, 3), padding=1, use_bias=False, name="concat12")
        x2top_cat = cat12(jnp.concatenate([x2top, x2top_samfeats], axis=-1))
        x2bot_cat = cat12(jnp.concatenate([x2bot, x2bot_samfeats], axis=-1))
        enc2 = Encoder(self.n_feat, self.scale_unet, csff=True, name="stage2_encoder")
        feat2_top = enc2(x2top_cat, feat1_top, res1_top)
        feat2_bot = enc2(x2bot_cat, feat1_bot, res1_bot)
        feat2 = [jnp.concatenate([k, v], axis=1) for k, v in zip(feat2_top, feat2_bot)]
        res2 = Decoder(self.n_feat, self.scale_unet, name="stage2_decoder")(feat2)
        x3_samfeats, _ = SAM(self.n_feat, 1, name="sam23")(res2[0], x3_img)

        x3 = shallow3(x3_img)
        x3_cat = nn.Conv(self.n_feat + self.scale_ors, (3, 3), padding=1, use_bias=False,
                         name="concat23")(jnp.concatenate([x3, x3_samfeats], axis=-1))
        x3_cat = ORSNet(self.n_feat, self.scale_ors, self.scale_unet, self.num_cab,
                        name="stage3_orsnet")(x3_cat, feat2, res2)
        out = nn.Conv(self.out_c, (3, 3), padding=1, use_bias=False, name="tail")(x3_cat)
        return (out + x3_img)[:, :h_inp, :w_inp, :]


def convert_torch_state(state_dict, num_cab: int = 4) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix):
        return {"kernel": _conv_w(sd[f"{prefix}.weight"])}

    def cab(prefix):
        return {
            "body_0": conv(f"{prefix}.body.0"),
            "act": {"weight": sd[f"{prefix}.body.1.weight"]},
            "body_2": conv(f"{prefix}.body.2"),
            "ca": {"du_0": conv(f"{prefix}.CA.conv_du.0"), "du_2": conv(f"{prefix}.CA.conv_du.2")},
        }

    def encoder(prefix, csff):
        p = {
            "l1_0": cab(f"{prefix}.encoder_level1.0"), "l1_1": cab(f"{prefix}.encoder_level1.1"),
            "l2_0": cab(f"{prefix}.encoder_level2.0"), "l2_1": cab(f"{prefix}.encoder_level2.1"),
            "l3_0": cab(f"{prefix}.encoder_level3.0"), "l3_1": cab(f"{prefix}.encoder_level3.1"),
            "down12": conv(f"{prefix}.down12.down.1"),
            "down23": conv(f"{prefix}.down23.down.1"),
        }
        if csff:
            for n in ("enc1", "enc2", "enc3", "dec1", "dec2", "dec3"):
                p[f"csff_{n}"] = conv(f"{prefix}.csff_{n}")
        return p

    def decoder(prefix):
        return {
            "l1_0": cab(f"{prefix}.decoder_level1.0"), "l1_1": cab(f"{prefix}.decoder_level1.1"),
            "l2_0": cab(f"{prefix}.decoder_level2.0"), "l2_1": cab(f"{prefix}.decoder_level2.1"),
            "l3_0": cab(f"{prefix}.decoder_level3.0"), "l3_1": cab(f"{prefix}.decoder_level3.1"),
            "skip_attn1": cab(f"{prefix}.skip_attn1"),
            "skip_attn2": cab(f"{prefix}.skip_attn2"),
            "up32": conv(f"{prefix}.up32.up.1"),
            "up21": conv(f"{prefix}.up21.up.1"),
        }

    def orb(prefix):
        p = {f"cab_{i}": cab(f"{prefix}.body.{i}") for i in range(num_cab)}
        p["tail"] = conv(f"{prefix}.body.{num_cab}")
        return p

    def sam(prefix):
        return {"conv1": conv(f"{prefix}.conv1"), "conv2": conv(f"{prefix}.conv2"),
                "conv3": conv(f"{prefix}.conv3")}

    params = {
        "conv_in": conv("conv_in"),
        "concat12": conv("concat12"),
        "concat23": conv("concat23"),
        "tail": conv("tail"),
        "sam12": sam("sam12"),
        "sam23": sam("sam23"),
        "stage1_encoder": encoder("stage1_encoder", False),
        "stage2_encoder": encoder("stage2_encoder", True),
        "stage1_decoder": decoder("stage1_decoder"),
        "stage2_decoder": decoder("stage2_decoder"),
        "stage3_orsnet": {
            "orb1": orb("stage3_orsnet.orb1"),
            "orb2": orb("stage3_orsnet.orb2"),
            "orb3": orb("stage3_orsnet.orb3"),
            "up_enc1": {"conv": conv("stage3_orsnet.up_enc1.up.1")},
            "up_dec1": {"conv": conv("stage3_orsnet.up_dec1.up.1")},
            "up_enc2_0": {"conv": conv("stage3_orsnet.up_enc2.0.up.1")},
            "up_enc2_1": {"conv": conv("stage3_orsnet.up_enc2.1.up.1")},
            "up_dec2_0": {"conv": conv("stage3_orsnet.up_dec2.0.up.1")},
            "up_dec2_1": {"conv": conv("stage3_orsnet.up_dec2.1.up.1")},
            **{f"conv_{n}": conv(f"stage3_orsnet.conv_{n}")
               for n in ("enc1", "enc2", "enc3", "dec1", "dec2", "dec3")},
        },
    }
    for i in (1, 2, 3):
        params[f"shallow_feat{i}_conv"] = conv(f"shallow_feat{i}.0")
        params[f"shallow_feat{i}_cab"] = cab(f"shallow_feat{i}.1")
    return {"params": params}
