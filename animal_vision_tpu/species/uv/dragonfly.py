"""Dragonfly — dorsal sky polarization + ventral water-finder.

Parity: animals/dragonfly.py (251 LoC). Sky/ground sigmoid (prior 0.6, blue
0.4, mid 0.46, steepness 6, blur 2.5, p98); elevation-swept sky E-vector
(90deg -> -45deg sweep) vs local orientation of 0.6B+0.4U; water = horizontal
polarization cos(2theta) on ground; dorsal +B/+G gains x align x mask +
exposure balance + sky gain; ventral water gains + green support; global
clarity + highlight soft-knee 0.85/0.35; peripheral blur 0.7; panorama 1.15."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur, effects, gradients
from animal_vision_tpu.core.stats import percentile, safe_norm
from animal_vision_tpu.species.uv.common import UVAnimal


class Dragonfly(UVAnimal):
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    hsi_scale = 0.25
    panorama_scale = 1.15

    sky_prior_strength = 0.6
    sky_blue_weight = 0.4
    sky_sigmoid_mid = 0.46
    sky_sigmoid_steepness = 6.0
    sky_pol_strength = 0.65
    sky_pol_gamma = 1.3
    water_pol_strength = 0.55
    water_pol_gamma = 1.2
    sky_evec_base_deg = 90.0
    sky_evec_sweep_deg = -45.0
    red_kill = 0.22
    sky_uv_blue_gain = (0.25, 0.20)
    water_uv_blue_gain = (0.30, 0.24)
    ventral_green_gain = 0.12
    base_soft_sigma = 0.30
    unsharp_sigma = 1.0
    unsharp_amount = 0.30
    highlight_knee = 0.85
    highlight_strength = 0.35
    periph_blur_sigma = 0.7
    periph_radius = 0.80
    periph_softness = 7.0

    def _band_specs(self):
        return [(320.0, 400.0), (440.0, 500.0), (500.0, 570.0), (600.0, 680.0)]

    def _render(self, baseline_lin, maps):
        h, w = int(baseline_lin.shape[0]), int(baseline_lin.shape[1])
        u = safe_norm(safe_norm(maps[..., 0]))
        bv = safe_norm(maps[..., 1])
        gv = safe_norm(maps[..., 2])

        vert_prior = jnp.asarray(np.linspace(1.0, 0.0, h, dtype=np.float32))[:, None]
        blue_dom = jnp.clip(bv - 0.6 * gv, 0.0, 1.0)
        score = blur.gaussian_blur_uv(
            self.sky_prior_strength * vert_prior + self.sky_blue_weight * blue_dom, 2.5
        )
        score = score / (percentile(score, 98.0) + 1e-8)
        sky_w = 1.0 / (
            1.0 + jnp.exp(-self.sky_sigmoid_steepness * (score - self.sky_sigmoid_mid))
        )
        ground_w = 1.0 - sky_w

        ub = 0.6 * bv + 0.4 * u
        gx = gradients.sobel_x(ub)
        gy = gradients.sobel_y(ub)
        theta = jnp.arctan2(gy, gx)
        cos2_l, sin2_l = jnp.cos(2.0 * theta), jnp.sin(2.0 * theta)
        y_norm = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
        sky_evec = np.deg2rad(self.sky_evec_base_deg) + np.deg2rad(self.sky_evec_sweep_deg) * y_norm
        cos2_s = jnp.asarray(np.cos(2.0 * sky_evec).astype(np.float32))
        sin2_s = jnp.asarray(np.sin(2.0 * sky_evec).astype(np.float32))
        align_sky01 = jnp.clip(0.5 * (cos2_l * cos2_s + sin2_l * sin2_s + 1.0), 0.0, 1.0) ** self.sky_pol_gamma
        align_water01 = jnp.clip(0.5 * (cos2_l + 1.0), 0.0, 1.0) ** self.water_pol_gamma

        render = jnp.concatenate(
            [
                jnp.clip(baseline_lin[..., 0:1] * (1.0 - self.red_kill), 0.0, 1.0),
                baseline_lin[..., 1:3],
            ],
            axis=-1,
        )
        render = blur.gaussian_blur_uv(render, self.base_soft_sigma)

        sky_gain = (1.0 + self.sky_pol_strength * (align_sky01 * sky_w))[..., None]
        render = jnp.clip(render * (0.95 + 0.05 * sky_w)[..., None], 0.0, 1.0)
        render = jnp.stack(
            [
                render[..., 0],
                jnp.clip(render[..., 1] + 0.10 * (u * sky_w * align_sky01), 0.0, 1.0),
                jnp.clip(
                    render[..., 2] + self.sky_uv_blue_gain[1] * (bv * sky_w * align_sky01),
                    0.0,
                    1.0,
                ),
            ],
            axis=-1,
        )
        render = jnp.clip(render * sky_gain, 0.0, 1.0)

        water_gain = (1.0 + self.water_pol_strength * (align_water01 * ground_w))[..., None]
        b2 = jnp.clip(
            render[..., 2] + self.water_uv_blue_gain[1] * (bv * ground_w * align_water01),
            0.0,
            1.0,
        )
        b2 = jnp.clip(b2 + self.water_uv_blue_gain[0] * (u * ground_w * align_water01), 0.0, 1.0)
        g2 = jnp.clip(render[..., 1] + self.ventral_green_gain * (gv * ground_w), 0.0, 1.0)
        render = jnp.stack([render[..., 0], g2, b2], axis=-1)
        render = jnp.clip(render * water_gain, 0.0, 1.0)

        blurred = blur.gaussian_blur_uv(render, self.unsharp_sigma)
        high = jnp.clip(render - blurred, -1.0, 1.0)
        render = jnp.clip(render + self.unsharp_amount * high, 0.0, 1.0)
        render = effects.snow_glare_tone_compress(
            render, strength=self.highlight_strength, knee=self.highlight_knee
        )
        return effects.peripheral_blur(
            render, self.periph_blur_sigma, self.periph_radius, self.periph_softness
        )
