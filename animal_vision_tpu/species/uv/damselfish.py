"""Damselfish — reef fish with UV-guided unsharp and blue/yellow chroma.

Parity: animals/damselfish.py (181 LoC). Bands UV 320-400 / blue 440-500 /
yellow 560-600 / red 600-680; red_kill 0.35; base blur 0.35; UV-guided
unsharp (sigma 1.2, gain 1+0.45*Un); UV gloss lift B/G/R .60/.30/.15;
blue/yellow chroma gains .22/.28 (yellow -> .65 G + .35 R); peripheral blur
0.8 at radius 0.70 softness 7; panorama 1.25."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur, effects
from animal_vision_tpu.core.stats import safe_norm
from animal_vision_tpu.species.uv.common import UVAnimal


class Damselfish(UVAnimal):
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    hsi_scale = 0.25
    panorama_scale = 1.25

    uv_edge_boost = 0.45
    uv_gloss_boost = 0.30
    blue_chroma_gain = 0.22
    yellow_chroma_gain = 0.28
    red_kill = 0.35
    base_blur_sigma = 0.35
    unsharp_sigma = 1.2
    periph_radius = 0.70
    periph_softness = 7.0
    periph_extra_blur = 0.8

    def _band_specs(self):
        return [(320.0, 400.0), (440.0, 500.0), (560.0, 600.0), (600.0, 680.0)]

    def _render(self, baseline_lin, maps):
        un = safe_norm(safe_norm(maps[..., 0]))  # integrate_uv then safe_norm again
        bn = safe_norm(maps[..., 1])
        yn = safe_norm(maps[..., 2])

        render = jnp.concatenate(
            [
                jnp.clip(baseline_lin[..., 0:1] * (1.0 - self.red_kill), 0.0, 1.0),
                baseline_lin[..., 1:3],
            ],
            axis=-1,
        )
        if self.base_blur_sigma > 0.0:
            render = blur.gaussian_blur_uv(render, self.base_blur_sigma)

        if self.unsharp_sigma > 0.0 and self.uv_edge_boost > 0.0:
            blurred = blur.gaussian_blur_uv(render, self.unsharp_sigma)
            highpass = jnp.clip(render - blurred, -1.0, 1.0)
            gain = 1.0 + self.uv_edge_boost * un[..., None]
            render = jnp.clip(render + gain * highpass, 0.0, 1.0)

        if self.uv_gloss_boost > 0.0:
            lift = self.uv_gloss_boost * un
            render = jnp.stack(
                [
                    jnp.clip(render[..., 0] + 0.15 * lift, 0.0, 1.0),
                    jnp.clip(render[..., 1] + 0.30 * lift, 0.0, 1.0),
                    jnp.clip(render[..., 2] + 0.60 * lift, 0.0, 1.0),
                ],
                axis=-1,
            )

        y_boost = self.yellow_chroma_gain * yn
        render = jnp.stack(
            [
                jnp.clip(render[..., 0] + 0.35 * y_boost, 0.0, 1.0),
                jnp.clip(render[..., 1] + 0.65 * y_boost, 0.0, 1.0),
                jnp.clip(render[..., 2] + self.blue_chroma_gain * bn, 0.0, 1.0),
            ],
            axis=-1,
        )
        return effects.peripheral_blur(
            render, self.periph_extra_blur, self.periph_radius, self.periph_softness
        )
