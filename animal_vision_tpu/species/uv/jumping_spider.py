"""Jumping spider — foveated principal eyes with UV display-patch pop.

Parity: animals/jumping_spider.py (236 LoC). UV-patch DoG (0.9/2.2), G<->UV
opponent shaping, patch-gated clarity, scanlines (freq 22, gain 0.08),
static attention spots at (0.50,0.52)/(0.57,0.48) sigma 0.08 (brightness +
local-sharpen blend), foveation r=0.38 steep sigmoid with peripheral blur
2.2 + vignette 0.22; panorama 1.02."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur
from animal_vision_tpu.core.stats import percentile, safe_norm
from animal_vision_tpu.species.uv.common import UVAnimal


class JumpingSpider(UVAnimal):
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    hsi_scale = 0.25
    panorama_scale = 1.02

    dog_small_sigma = 0.9
    dog_large_sigma = 2.2
    uv_patch_gain = 0.95
    opponent_gain = 0.30
    red_kill = 0.25
    base_soft_sigma = 0.25
    clarity_sigma = 0.9
    clarity_amount = 0.24
    fovea_radius = 0.38
    fovea_softness = 10.0
    periph_blur_sigma = 2.2
    periph_vignette_strength = 0.22
    scan_row_freq = 22.0
    scan_row_gain = 0.08
    scan_soften = 0.9
    spots = ((0.50, 0.52), (0.57, 0.48))
    spot_sigma = 0.08
    spot_gain = 0.20

    def _band_specs(self):
        return [(320.0, 400.0), (500.0, 570.0), (430.0, 500.0), (600.0, 680.0)]

    def _spots_mask(self, h: int, w: int) -> np.ndarray:
        yy = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
        xx = np.linspace(0.0, 1.0, w, dtype=np.float32)[None, :]
        mask = np.zeros((h, w), np.float32)
        s2 = max(self.spot_sigma, 1e-4) ** 2
        for yc, xc in self.spots:
            mask += np.exp(-((yy - yc) ** 2 + (xx - xc) ** 2) / (2.0 * s2))
        m95 = max(1e-8, float(np.percentile(mask, 95.0)))
        return np.clip(mask / m95, 0.0, 1.0).astype(np.float32)

    def _render(self, baseline_lin, maps):
        h, w = int(baseline_lin.shape[0]), int(baseline_lin.shape[1])
        u = safe_norm(safe_norm(maps[..., 0]))
        gv = safe_norm(maps[..., 1])
        bv = safe_norm(maps[..., 2])

        render = jnp.concatenate(
            [
                jnp.clip(baseline_lin[..., 0:1] * (1.0 - self.red_kill), 0.0, 1.0),
                baseline_lin[..., 1:3],
            ],
            axis=-1,
        )
        render = blur.gaussian_blur_uv(render, self.base_soft_sigma)

        uv_dog = jnp.clip(
            blur.gaussian_blur_uv(u, self.dog_small_sigma)
            - blur.gaussian_blur_uv(u, self.dog_large_sigma),
            0.0,
            1.0,
        )
        uv_patch = jnp.clip(uv_dog / (percentile(uv_dog, 95.0) + 1e-8), 0.0, 1.0)

        opp = gv - u
        opp = jnp.clip(opp / (percentile(jnp.abs(opp), 95.0) + 1e-8), -1.0, 1.0)
        g_boost = jnp.clip(opp, 0.0, 1.0) * self.opponent_gain
        u_boost = jnp.clip(-opp, 0.0, 1.0) * self.opponent_gain
        render = jnp.stack(
            [
                jnp.clip(render[..., 0] + 0.12 * u_boost * u, 0.0, 1.0),
                jnp.clip(render[..., 1] + 0.40 * g_boost, 0.0, 1.0),
                jnp.clip(render[..., 2] + 0.30 * u_boost * bv, 0.0, 1.0),
            ],
            axis=-1,
        )

        blurred = blur.gaussian_blur_uv(render, self.clarity_sigma)
        high = jnp.clip(render - blurred, -1.0, 1.0)
        render = jnp.clip(
            render + (self.clarity_amount * self.uv_patch_gain * uv_patch[..., None]) * high,
            0.0,
            1.0,
        )

        # scanlines: row-constant blur folds to a trace-time 1-D profile
        # (core.blur.blur_profile_1d) — no runtime full-res blur.
        y = np.linspace(0.0, 1.0, h, dtype=np.float32)
        prof = (0.5 + 0.5 * np.sin(2.0 * np.pi * self.scan_row_freq * y)).astype(
            np.float32
        )
        rows_j = blur.blur_profile_1d(prof, self.scan_soften)[:, None]
        render = jnp.clip(render * jnp.asarray(1.0 + self.scan_row_gain * (rows_j - 0.5))[..., None], 0.0, 1.0)

        # attention spots
        spots = jnp.asarray(self._spots_mask(h, w))[..., None]
        render = jnp.clip(render + self.spot_gain * spots, 0.0, 1.0)
        sblur = blur.gaussian_blur_uv(render, 0.8)
        sharp = jnp.clip(render + 0.25 * jnp.clip(render - sblur, -1.0, 1.0), 0.0, 1.0)
        render = jnp.clip((1.0 - 0.6 * spots) * render + (0.6 * spots) * sharp, 0.0, 1.0)

        # foveation: strong peripheral blur + vignette
        yy = np.linspace(-1.0, 1.0, h, dtype=np.float32)[:, None]
        xx = np.linspace(-1.0, 1.0, w, dtype=np.float32)[None, :]
        r = np.sqrt(xx * xx + yy * yy)
        edge_w = jnp.asarray(
            (1.0 / (1.0 + np.exp(-self.fovea_softness * (r - self.fovea_radius)))).astype(
                np.float32
            )
        )
        periph = blur.gaussian_blur_uv(render, self.periph_blur_sigma)
        render = (1.0 - edge_w[..., None]) * render + edge_w[..., None] * periph
        vign = 1.0 - self.periph_vignette_strength * edge_w
        return jnp.clip(render * vign[..., None], 0.0, 1.0)
