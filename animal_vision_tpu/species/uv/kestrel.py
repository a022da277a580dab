"""Kestrel — UV vole-trail detection over a sky/ground split.

Parity: animals/kestrel.py (234 LoC). Sky mask = sigmoid(0.6*vertical prior
+ 0.4*blue dominance, blurred 3.0, p98); structure-tensor ridge "trailness"
on UV (sigma 3); sky cool tint+haze, ground warm tint+contrast; ground-only
magenta UV overlay (0.60,0.12,0.70) @ 0.55; trailness-gated unsharp;
peripheral blur 0.7 @ 0.82/7; panorama 1.10."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur, bucketctx, effects, gradients
from animal_vision_tpu.core.stats import percentile, safe_norm
from animal_vision_tpu.species.uv.common import UVAnimal


class Kestrel(UVAnimal):
    bucketable = True
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    hsi_scale = 0.25
    panorama_scale = 1.10

    sky_cool_tint = np.array([0.95, 0.98, 1.03], np.float32)
    sky_haze = 0.10
    ground_warm_tint = np.array([1.02, 1.01, 0.99], np.float32)
    ground_contrast = 0.08
    uv_overlay_strength = 0.55
    uv_magenta = np.array([0.60, 0.12, 0.70], np.float32)
    ridge_sigma = 3.0
    ridge_gain = 1.0
    unsharp_sigma = 1.0
    unsharp_amount = 0.30
    periph_blur_sigma = 0.7
    periph_radius = 0.82
    periph_softness = 7.0

    def _band_specs(self):
        return [(320.0, 400.0), (440.0, 500.0), (500.0, 570.0), (600.0, 680.0)]

    def _ridge(self, u):
        # structure_tensor carries the padded-bucket gxy sign fix
        gxx, gxy, gyy = gradients.structure_tensor(u, self.ridge_sigma)
        trace = gxx + gyy
        root = jnp.sqrt(jnp.maximum((0.5 * (gxx - gyy)) ** 2 + gxy * gxy, 0.0))
        lam1 = 0.5 * trace + root
        lam2 = 0.5 * trace - root
        coh = (lam1 - lam2) / (lam1 + lam2 + 1e-8)
        energy = jnp.clip(trace, 0.0, None)
        energy = energy / (percentile(energy, 95.0) + 1e-8)
        return jnp.clip(coh * energy, 0.0, 1.0)

    def _render(self, baseline_lin, maps):
        h, w = int(baseline_lin.shape[0]), int(baseline_lin.shape[1])
        u = safe_norm(safe_norm(maps[..., 0]))
        bv = safe_norm(maps[..., 1])
        gv = safe_norm(maps[..., 2])

        ctx = bucketctx.current()
        if ctx is not None and (h, w) == (ctx.bh, ctx.bw):
            # linspace(1, 0, h)[i] == 1 - i/(h-1), at the reflected real-row
            # coordinate so the padding mirrors the frame content.
            hr = ctx.hr.astype(jnp.float32)
            vert_prior = (1.0 - ctx.refl_rows() / jnp.maximum(hr - 1.0, 1.0))[:, None]
        else:
            vert_prior = jnp.asarray(np.linspace(1.0, 0.0, h, dtype=np.float32))[:, None]
        blue_dom = jnp.clip(bv - 0.6 * gv, 0.0, 1.0)
        sky_score = blur.gaussian_blur_uv(0.6 * vert_prior + 0.4 * blue_dom, 3.0)
        sky_score = jnp.clip(sky_score / (percentile(sky_score, 98.0) + 1e-8), 0.0, 1.0)
        sky_w = 1.0 / (1.0 + jnp.exp(-6.0 * (sky_score - 0.45)))
        sky3 = sky_w[..., None]
        ground3 = (1.0 - sky_w)[..., None]

        trailness = jnp.clip(self.ridge_gain * self._ridge(u) * (1.0 - sky_w), 0.0, 1.0)

        render = baseline_lin
        a = float(np.clip(self.sky_haze, 0.0, 1.0))
        sky_tinted = jnp.clip(render * jnp.asarray(self.sky_cool_tint)[None, None, :], 0.0, 1.0)
        haze_col = jnp.asarray(np.array([0.90, 0.97, 1.00], np.float32))
        render = sky3 * ((1.0 - a) * sky_tinted + a * haze_col[None, None, :]) + ground3 * render

        ground_part = jnp.clip(render * jnp.asarray(self.ground_warm_tint)[None, None, :], 0.0, 1.0)
        blurred = blur.gaussian_blur_uv(ground_part, 1.2)
        ground_part = jnp.clip(ground_part + self.ground_contrast * (ground_part - blurred), 0.0, 1.0)
        render = sky3 * render + ground3 * ground_part

        u95 = jnp.clip(u / (percentile(u, 95.0) + 1e-8), 0.0, 1.0)
        uv_rgb = u95[..., None] * jnp.asarray(self.uv_magenta)[None, None, :]
        s = self.uv_overlay_strength
        render = jnp.clip((1.0 - s * ground3) * render + (s * ground3) * uv_rgb, 0.0, 1.0)

        blurred = blur.gaussian_blur_uv(render, self.unsharp_sigma)
        high = jnp.clip(render - blurred, -1.0, 1.0)
        render = jnp.clip(render + (self.unsharp_amount * trailness[..., None]) * high, 0.0, 1.0)

        return effects.peripheral_blur(
            render, self.periph_blur_sigma, self.periph_radius, self.periph_softness
        )
