"""MST (standalone, mask-guided) in Flax.

Parity: predict_code/architecture/MST.py — RGB in; two 3x3 embeddings
produce a feature map and a *mask* (both LeakyReLU(0.1)); every spectral
attention is mask-guided (MaskGuidedMechanism: 1x1 -> sigmoid(dw5x5(1x1))
gate, v scaled by the mask embedding); encoder downsamples features AND
masks; registry config 'mst' = MST(dim=31, stage=2, num_blocks=[4,7,5]).
Published MST-L quality: MRAE 0.1772 / RMSE 0.0256 / PSNR 33.90 (BASELINE.md).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.models.mst_plus_plus import (
    FeedForward,
    _LN,
    _conv_w,
    _convtrans_as_conv,
    _dense_w,
    _dw_conv_w,
    _gelu,
    DWConv,
)


class MaskGuidedMechanism(nn.Module):
    n_feat: int

    @nn.compact
    def __call__(self, mask):  # NHWC
        m = nn.Conv(self.n_feat, (1, 1), use_bias=True, name="conv1")(mask)
        g = nn.Conv(self.n_feat, (1, 1), use_bias=True, name="conv2")(m)
        g = DWConv(self.n_feat, ksize=5, use_bias=True, name="depth_conv")(g)
        attn = jax.nn.sigmoid(g)
        return m * attn + m


class MaskedMSMSA(nn.Module):
    dim: int
    dim_head: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):  # x: (B,H,W,C); mask: (1,H,W,C)
        b, h, w, c = x.shape
        n = h * w
        inner = self.dim_head * self.heads
        xf = x.reshape(b, n, c)
        q = nn.Dense(inner, use_bias=False, name="to_q")(xf)
        k = nn.Dense(inner, use_bias=False, name="to_k")(xf)
        v = nn.Dense(inner, use_bias=False, name="to_v")(xf)
        mask_attn = MaskGuidedMechanism(self.dim, name="mm")(mask)
        mask_attn = jnp.broadcast_to(mask_attn[0], (b, h, w, c)).reshape(b, n, c)

        def heads_first(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 3, 1)

        qh, kh = heads_first(q), heads_first(k)
        vh = heads_first(v * mask_attn)
        qh = qh / jnp.maximum(jnp.linalg.norm(qh, axis=-1, keepdims=True), 1e-12)
        kh = kh / jnp.maximum(jnp.linalg.norm(kh, axis=-1, keepdims=True), 1e-12)
        rescale = self.param("rescale", nn.initializers.ones, (self.heads, 1, 1))
        attn = jnp.einsum("bhdn,bhen->bhde", kh, qh) * rescale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhde,bhen->bhdn", attn, vh)
        out = out.transpose(0, 3, 1, 2).reshape(b, n, inner)
        out_c = nn.Dense(self.dim, use_bias=True, name="proj")(out).reshape(b, h, w, c)
        v_img = v.reshape(b, h, w, inner)
        p = DWConv(self.dim, name="pos_emb_0")(v_img)
        p = _gelu(p)
        p = DWConv(self.dim, name="pos_emb_2")(p)
        return out_c + p


class MaskedMSAB(nn.Module):
    dim: int
    dim_head: int
    heads: int
    num_blocks: int

    @nn.compact
    def __call__(self, x, mask):
        for i in range(self.num_blocks):
            x = MaskedMSMSA(self.dim, self.dim_head, self.heads, name=f"attn_{i}")(x, mask) + x
            scale, bias = _LN(self.dim, name=f"norm_{i}")()
            x = FeedForward(self.dim, name=f"ff_{i}")(x, scale, bias)
        return x


class MSTModel(nn.Module):
    dim: int = 31
    stage: int = 2
    num_blocks: Sequence[int] = (4, 7, 5)

    @nn.compact
    def __call__(self, x):  # NHWC (B,H,W,3)
        b, h_inp, w_inp, _ = x.shape
        pad_h = (8 - h_inp % 8) % 8
        pad_w = (8 - w_inp % 8) % 8
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")

        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.1)
        mask = lrelu(nn.Conv(self.dim, (3, 3), padding=1, use_bias=False, name="embedding_1")(x))
        fea = lrelu(nn.Conv(self.dim, (3, 3), padding=1, use_bias=False, name="embedding_2")(x))
        xin = fea

        skips, masks = [], []
        dim_stage = self.dim
        for i in range(self.stage):
            fea = MaskedMSAB(dim_stage, self.dim, dim_stage // self.dim,
                             self.num_blocks[i], name=f"enc_msab_{i}")(fea, mask[:1])
            masks.append(mask)
            skips.append(fea)
            fea = nn.Conv(dim_stage * 2, (4, 4), strides=2, padding=1, use_bias=False,
                          name=f"enc_down_{i}")(fea)
            mask = nn.Conv(dim_stage * 2, (4, 4), strides=2, padding=1, use_bias=False,
                           name=f"enc_mask_down_{i}")(mask)
            dim_stage *= 2

        fea = MaskedMSAB(dim_stage, self.dim, dim_stage // self.dim,
                         self.num_blocks[-1], name="bottleneck")(fea, mask[:1])

        for i in range(self.stage):
            half = dim_stage // 2
            up = nn.Conv(half * 4, (1, 1), use_bias=True, name=f"dec_up_{i}")(fea)
            bb, hh, ww, _ = up.shape
            up = up.reshape(bb, hh, ww, 2, 2, half)
            fea = up.transpose(0, 1, 3, 2, 4, 5).reshape(bb, hh * 2, ww * 2, half)
            fea = nn.Conv(half, (1, 1), use_bias=False, name=f"dec_fuse_{i}")(
                jnp.concatenate([fea, skips[self.stage - 1 - i]], axis=-1)
            )
            mask = masks[self.stage - 1 - i]
            fea = MaskedMSAB(half, self.dim, half // self.dim,
                             self.num_blocks[self.stage - 1 - i], name=f"dec_msab_{i}")(fea, mask[:1])
            dim_stage //= 2

        out = nn.Conv(31, (3, 3), padding=1, use_bias=False, name="mapping")(fea) + xin
        return out[:, :h_inp, :w_inp, :]


def convert_torch_state(state_dict, stage: int = 2, num_blocks=(4, 7, 5)) -> dict:
    """Map MST.py's torch state_dict onto MSTModel params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def msab(prefix, nb):
        p = {}
        for i in range(nb):
            a = f"{prefix}.blocks.{i}.0"
            p[f"attn_{i}"] = {
                "to_q": {"kernel": _dense_w(sd[f"{a}.to_q.weight"])},
                "to_k": {"kernel": _dense_w(sd[f"{a}.to_k.weight"])},
                "to_v": {"kernel": _dense_w(sd[f"{a}.to_v.weight"])},
                "rescale": sd[f"{a}.rescale"],
                "proj": {"kernel": _dense_w(sd[f"{a}.proj.weight"]),
                         "bias": sd[f"{a}.proj.bias"]},
                "pos_emb_0": {"kernel": _dw_conv_w(sd[f"{a}.pos_emb.0.weight"])},
                "pos_emb_2": {"kernel": _dw_conv_w(sd[f"{a}.pos_emb.2.weight"])},
                "mm": {
                    "conv1": {"kernel": _conv_w(sd[f"{a}.mm.conv1.weight"]),
                              "bias": sd[f"{a}.mm.conv1.bias"]},
                    "conv2": {"kernel": _conv_w(sd[f"{a}.mm.conv2.weight"]),
                              "bias": sd[f"{a}.mm.conv2.bias"]},
                    "depth_conv": {"kernel": _dw_conv_w(sd[f"{a}.mm.depth_conv.weight"]),
                                   "bias": sd[f"{a}.mm.depth_conv.bias"]},
                },
            }
            f = f"{prefix}.blocks.{i}.1"
            p[f"norm_{i}"] = {"scale": sd[f"{f}.norm.weight"], "bias": sd[f"{f}.norm.bias"]}
            p[f"ff_{i}"] = {
                "net_0": {"kernel": _conv_w(sd[f"{f}.fn.net.0.weight"])},
                "net_2": {"kernel": _dw_conv_w(sd[f"{f}.fn.net.2.weight"])},
                "net_4": {"kernel": _conv_w(sd[f"{f}.fn.net.4.weight"])},
            }
        return p

    params = {
        "embedding_1": {"kernel": _conv_w(sd["embedding_1.weight"])},
        "embedding_2": {"kernel": _conv_w(sd["embedding_2.weight"])},
        "mapping": {"kernel": _conv_w(sd["mapping.weight"])},
    }
    dim_stage = 31
    for i in range(stage):
        params[f"enc_msab_{i}"] = msab(f"encoder_layers.{i}.0", num_blocks[i])
        params[f"enc_down_{i}"] = {"kernel": _conv_w(sd[f"encoder_layers.{i}.1.weight"])}
        params[f"enc_mask_down_{i}"] = {"kernel": _conv_w(sd[f"encoder_layers.{i}.2.weight"])}
        dim_stage *= 2
    params["bottleneck"] = msab("bottleneck", num_blocks[-1])
    for i in range(stage):
        half = dim_stage // 2
        kernel, bias = _convtrans_as_conv(
            sd[f"decoder_layers.{i}.0.weight"], sd.get(f"decoder_layers.{i}.0.bias"), half
        )
        params[f"dec_up_{i}"] = {"kernel": kernel, "bias": bias}
        params[f"dec_fuse_{i}"] = {"kernel": _conv_w(sd[f"decoder_layers.{i}.1.weight"])}
        params[f"dec_msab_{i}"] = msab(f"decoder_layers.{i}.2", num_blocks[stage - 1 - i])
        dim_stage //= 2
    return {"params": params}
