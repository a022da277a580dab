"""Pieris butterfly — UV nectar-guide warm-white lift + foliage opponent.

Parity: animals/pieris.py (124 LoC). UV guide map (blur 1.2, p95) lifts
[0.35, 0.35+0.08, 0.25] * 0.75; foliage opponent G-0.5(U+B) adds +G 0.25;
clarity unsharp 0.22 @ 0.8; center attention *(1+0.12*(1-t)); panorama
1.05."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur, effects
from animal_vision_tpu.core.stats import percentile, safe_norm
from animal_vision_tpu.species.uv.common import UVAnimal


class Pieris(UVAnimal):
    lambdas = np.linspace(300.0, 700.0, 81)
    hsi_scale = 0.25
    panorama_scale = 1.05

    guide_sigma = 1.2
    guide_gain = 0.75
    foliage_opponent_gain = 0.25
    petal_warmth = 0.08
    clarity_unsharp_sigma = 0.8
    clarity_amount = 0.22
    center_bias = 0.12
    bias_radius = 0.80
    bias_softness = 7.0

    def _band_specs(self):
        return [(320.0, 400.0), (430.0, 500.0), (500.0, 570.0)]

    def _render(self, baseline_lin, maps):
        u = safe_norm(safe_norm(maps[..., 0]))
        bv = safe_norm(maps[..., 1])
        gv = safe_norm(maps[..., 2])

        u_s = blur.gaussian_blur_uv(u, self.guide_sigma)
        u_s = jnp.clip(u_s / (percentile(u_s, 95.0) + 1e-8), 0.0, 1.0)

        guide = (self.guide_gain * u_s)[..., None]
        lift = jnp.asarray(
            np.array([0.35, 0.35 + self.petal_warmth, 0.25], np.float32)
        )
        render = jnp.clip(baseline_lin + guide * lift[None, None, :], 0.0, 1.0)

        foliage = jnp.clip(gv - 0.5 * (u + bv), 0.0, 1.0)
        render = jnp.concatenate(
            [
                render[..., 0:1],
                jnp.clip(render[..., 1] + self.foliage_opponent_gain * foliage, 0.0, 1.0)[
                    ..., None
                ],
                render[..., 2:3],
            ],
            axis=-1,
        )

        blurred = blur.gaussian_blur_uv(render, self.clarity_unsharp_sigma)
        render = jnp.clip(render + self.clarity_amount * (render - blurred), 0.0, 1.0)

        h, w = int(render.shape[0]), int(render.shape[1])
        t = effects.radial_sigmoid_mask((h, w), self.bias_radius, self.bias_softness)
        att = jnp.asarray(1.0 + self.center_bias * (1.0 - t))
        return jnp.clip(render * att[..., None], 0.0, 1.0)
