"""Anableps (four-eyed fish) — split-world air/water rendering.

Parity: animals/anableps.py (255 LoC). Rippled horizon (sin, amp 6 px,
2.5 waves at y=0.44), sigmoid air/water seam (softness 8 px); air branch:
warm gain (1.06,1.03,0.99) + unsharp (sigma 1.0, 0.35); water branch:
goldfish-style attenuation (red_kill 0.55, lifts 0.12/0.08) + haze
(0.10, tint 0.80/0.92/1.00) + blur 0.7 + UV shimmer (boost 3.4, gains
R/G/B 0.36/0.18/0.42) + band reinforcement (0.20 Bv, 0.26 Gv) + exponential
refraction push below the horizon (3 px, decay 2.5*seam) as a static
vertical remap; peripheral blur 1.2 @ r 0.70 softness 6; panorama 1.2."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur, effects, geometry
from animal_vision_tpu.core.stats import safe_norm
from animal_vision_tpu.species.uv.common import UVAnimal


class Anableps(UVAnimal):
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    hsi_scale = 0.25
    panorama_scale = 1.20

    horizon_y = 0.44
    seam_softness_px = 8.0
    ripple_amp_px = 6.0
    ripple_waves = 2.5
    refract_push_px = 3.0
    air_warmth = np.array([1.06, 1.03, 0.99], dtype=np.float32)
    air_clarity_unsharp = 0.35
    air_unsharp_sigma = 1.0
    red_kill = 0.55
    blue_lift = 0.08
    green_lift = 0.12
    haze_strength = 0.10
    haze_tint = np.array([0.80, 0.92, 1.00], dtype=np.float32)
    base_blur_sigma_water = 0.7
    uv_boost = 3.4
    uv_r_gain = 0.36
    uv_g_gain = 0.18
    uv_b_gain = 0.42
    periph_blur_sigma = 1.2
    periph_radius = 0.70
    periph_softness = 6.0

    def _band_specs(self):
        return [(320.0, 400.0), (430.0, 500.0), (500.0, 570.0), (600.0, 680.0)]

    def _geometry_tables(self, h: int, w: int):
        y0 = int(np.clip(self.horizon_y * h, 0, h - 1))
        if self.ripple_amp_px > 0.0:
            x = np.linspace(0, 2.0 * np.pi * self.ripple_waves, w, dtype=np.float32)
            ripple = (self.ripple_amp_px * np.sin(x)).astype(np.float32)
        else:
            ripple = np.zeros((w,), np.float32)
        yy = np.arange(h, dtype=np.float32)[:, None]
        seam = max(1.0, float(self.seam_softness_px))
        horizon = y0 + ripple[None, :]
        dist = yy - horizon
        air_w = (1.0 / (1.0 + np.exp(+dist / seam))).astype(np.float32)

        y_idx = np.repeat(np.arange(h, dtype=np.float32)[:, None], w, axis=1)
        below = np.maximum(y_idx - horizon, 0.0)
        push = self.refract_push_px * np.exp(-below / (2.5 * seam))
        map_y = np.clip(y_idx + push, 0, h - 1).astype(np.float32)
        return air_w, map_y

    def _render(self, baseline_lin, maps):
        h, w = int(baseline_lin.shape[0]), int(baseline_lin.shape[1])
        un = safe_norm(safe_norm(maps[..., 0]))
        bv = safe_norm(maps[..., 1])
        gv = safe_norm(maps[..., 2])
        air_w, map_y = self._geometry_tables(h, w)

        # air branch
        air = jnp.clip(baseline_lin * jnp.asarray(self.air_warmth)[None, None, :], 0.0, 1.0)
        air = jnp.clip(
            air
            + self.air_clarity_unsharp
            * jnp.clip(air - blur.gaussian_blur_uv(air, self.air_unsharp_sigma), -1.0, 1.0),
            0.0,
            1.0,
        )

        # water branch
        water = jnp.stack(
            [
                jnp.clip(baseline_lin[..., 0] * (1.0 - self.red_kill), 0.0, 1.0),
                jnp.clip(baseline_lin[..., 1] + self.green_lift, 0.0, 1.0),
                jnp.clip(baseline_lin[..., 2] + self.blue_lift, 0.0, 1.0),
            ],
            axis=-1,
        )
        a = float(np.clip(self.haze_strength, 0.0, 1.0))
        water = (1.0 - a) * water + a * jnp.asarray(self.haze_tint)[None, None, :]
        water = blur.gaussian_blur_uv(water, self.base_blur_sigma_water)
        water = jnp.stack(
            [
                jnp.clip(water[..., 0] + self.uv_boost * self.uv_r_gain * un, 0.0, 1.0),
                jnp.clip(water[..., 1] + self.uv_boost * self.uv_g_gain * un, 0.0, 1.0),
                jnp.clip(water[..., 2] + self.uv_boost * self.uv_b_gain * un, 0.0, 1.0),
            ],
            axis=-1,
        )
        water = jnp.stack(
            [
                water[..., 0],
                jnp.clip(water[..., 1] + 0.26 * gv, 0.0, 1.0),
                jnp.clip(water[..., 2] + 0.20 * bv, 0.0, 1.0),
            ],
            axis=-1,
        )
        if self.refract_push_px > 0.0:
            water = geometry.vertical_remap_static(water, map_y)

        render = air * air_w[..., None] + water * (1.0 - air_w)[..., None]
        return effects.peripheral_blur(
            render, self.periph_blur_sigma, self.periph_radius, self.periph_softness
        )
