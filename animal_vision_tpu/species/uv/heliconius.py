"""Heliconius butterfly — UV-and-red conjunction signal pop.

Parity: animals/heliconius.py (135 LoC). DoG band-pass (0.8/2.2) on UV and
red, product, p95-normalized; background cool+desat where conjunction weak;
conj-gated unsharp, +R 0.40*conj, saturation boost 1+0.45*conj; panorama
1.05."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur
from animal_vision_tpu.core.stats import luminance709, percentile, safe_norm
from animal_vision_tpu.species.uv.common import UVAnimal


def _sat_apply(lin, scale):
    y = luminance709(lin)[..., None]
    return jnp.clip(y + (lin - y) * scale[..., None], 0.0, 1.0)


class Heliconius(UVAnimal):
    lambdas = np.linspace(300.0, 700.0, 81)
    hsi_scale = 0.25
    panorama_scale = 1.05

    conj_sigma_small = 0.8
    conj_sigma_large = 2.2
    sat_boost = 0.45
    red_gain = 0.40
    bg_desat = 0.20
    bg_cool = 0.04
    base_soft_sigma = 0.30
    unsharp_sigma = 1.0
    unsharp_amount = 0.25

    def _band_specs(self):
        return [(320.0, 400.0), (600.0, 680.0), (500.0, 570.0)]

    def _render(self, baseline_lin, maps):
        u = safe_norm(safe_norm(maps[..., 0]))
        rb = safe_norm(maps[..., 1])

        uv_dog = jnp.clip(
            blur.gaussian_blur_uv(u, self.conj_sigma_small)
            - blur.gaussian_blur_uv(u, self.conj_sigma_large),
            0.0,
            1.0,
        )
        r_dog = jnp.clip(
            blur.gaussian_blur_uv(rb, self.conj_sigma_small)
            - blur.gaussian_blur_uv(rb, self.conj_sigma_large),
            0.0,
            1.0,
        )
        conj = uv_dog * r_dog
        conj = jnp.clip(conj / (percentile(conj, 95.0) + 1e-8), 0.0, 1.0)

        render = blur.gaussian_blur_uv(baseline_lin, self.base_soft_sigma)

        bg_w = 1.0 - conj
        render = jnp.concatenate(
            [
                render[..., :2],
                jnp.clip(render[..., 2] + self.bg_cool * bg_w, 0.0, 1.0)[..., None],
            ],
            axis=-1,
        )
        render = _sat_apply(render, 1.0 - self.bg_desat * bg_w)

        blurred = blur.gaussian_blur_uv(render, self.unsharp_sigma)
        render = jnp.clip(
            render + (self.unsharp_amount * conj[..., None]) * (render - blurred), 0.0, 1.0
        )
        render = jnp.concatenate(
            [
                jnp.clip(render[..., 0] + self.red_gain * conj, 0.0, 1.0)[..., None],
                render[..., 1:],
            ],
            axis=-1,
        )
        return _sat_apply(render, 1.0 + self.sat_boost * conj)
