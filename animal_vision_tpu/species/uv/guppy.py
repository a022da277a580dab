"""Guppy — UV "private channel" spot saliency in a shallow stream.

Parity: animals/guppy.py (235 LoC). DoG band-pass on UV (sigmas 0.8/2.4,
p95-normalized) -> spot saliency; spot-gated unsharp and B/G/R lifts scaled
by Bn/Gn/Un; luma-preserving background desaturation where UV is weak;
warm tint; edge vignette; panorama 1.22."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur, effects
from animal_vision_tpu.core.stats import luminance709, percentile, safe_norm
from animal_vision_tpu.species.uv.common import UVAnimal


class Guppy(UVAnimal):
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    hsi_scale = 0.25
    panorama_scale = 1.22

    red_kill = 0.28
    haze_strength = 0.06
    haze_tint = np.array([0.92, 0.98, 1.00], dtype=np.float32)
    warm_tint = np.array([1.03, 1.01, 0.99], dtype=np.float32)
    base_soft_sigma = 0.35
    unsharp_sigma = 0.9
    unsharp_amount = 0.28
    dog_small_sigma = 0.8
    dog_large_sigma = 2.4
    uv_chroma_boost = 0.40
    uv_blue_gain = 0.55
    uv_green_gain = 0.35
    uv_red_gain = 0.12
    background_desat = 0.18
    vignette_strength = 0.12
    vignette_radius = 0.78
    vignette_softness = 7.0

    def _band_specs(self):
        return [(320.0, 400.0), (430.0, 500.0), (500.0, 570.0), (600.0, 680.0)]

    def _render(self, baseline_lin, maps):
        un = safe_norm(safe_norm(maps[..., 0]))
        bn = safe_norm(maps[..., 1])
        gn = safe_norm(maps[..., 2])

        render = jnp.concatenate(
            [
                jnp.clip(baseline_lin[..., 0:1] * (1.0 - self.red_kill), 0.0, 1.0),
                baseline_lin[..., 1:3],
            ],
            axis=-1,
        )
        a = float(np.clip(self.haze_strength, 0.0, 1.0))
        render = (1.0 - a) * render + a * jnp.asarray(self.haze_tint)[None, None, :]
        render = jnp.clip(render * jnp.asarray(self.warm_tint)[None, None, :], 0.0, 1.0)
        render = blur.gaussian_blur_uv(render, self.base_soft_sigma)

        uv_dog = jnp.clip(
            blur.gaussian_blur_uv(un, self.dog_small_sigma)
            - blur.gaussian_blur_uv(un, self.dog_large_sigma),
            0.0,
            1.0,
        )
        uv_spot = jnp.clip(uv_dog / (percentile(uv_dog, 95.0) + 1e-8), 0.0, 1.0)

        blurred = blur.gaussian_blur_uv(render, self.unsharp_sigma)
        high = jnp.clip(render - blurred, -1.0, 1.0)
        render = jnp.clip(render + (self.unsharp_amount * uv_spot[..., None]) * high, 0.0, 1.0)

        lift = self.uv_chroma_boost * uv_spot
        render = jnp.stack(
            [
                jnp.clip(render[..., 0] + self.uv_red_gain * lift * un, 0.0, 1.0),
                jnp.clip(render[..., 1] + self.uv_green_gain * lift * gn, 0.0, 1.0),
                jnp.clip(render[..., 2] + self.uv_blue_gain * lift * bn, 0.0, 1.0),
            ],
            axis=-1,
        )

        # luma-preserving background desaturation where UV is weak
        y = luminance709(render)
        mean_chroma = jnp.mean(jnp.abs(render - y[..., None]), axis=2)
        sat = mean_chroma / (percentile(mean_chroma, 95.0) + 1e-8)
        desat = 1.0 - self.background_desat * (1.0 - un) * (1.0 - sat)
        render = jnp.clip(y[..., None] + (render - y[..., None]) * desat[..., None], 0.0, 1.0)

        # edge vignette
        t = jnp.asarray(
            effects.radial_sigmoid_mask(
                (int(render.shape[0]), int(render.shape[1])),
                self.vignette_radius,
                self.vignette_softness,
            )
        )
        vign = 1.0 - self.vignette_strength * t
        return jnp.clip(render * vign[..., None], 0.0, 1.0)
