"""Reindeer — UV saliency boost with snow-glare control.

Parity: animals/reindeer.py (135 LoC). UV band 300-410 boosted 3.5x against
a 420-680 visible backdrop, soft-knee snow-glare compression 0.55, winter
scatter blur 1.2 + blue bias 0.08, panorama 1.3, hsi_scale 0.25."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import effects
from animal_vision_tpu.core.stats import safe_norm
from animal_vision_tpu.species.uv.common import UVAnimal


class Reindeer(UVAnimal):
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    hsi_scale = 0.25
    panorama_scale = 1.3

    uv_boost = 3.5
    snow_glare_compression = 0.55
    winter_mode = True
    scatter_sigma = 1.2
    blue_bias = 0.08

    def _band_specs(self):
        return [(300.0, 410.0), (420.0, 680.0)]

    def _render(self, baseline_lin, maps):
        uv_map = safe_norm(maps[..., 0])
        vis_map = safe_norm(maps[..., 1])
        uv_sal = safe_norm(uv_map / (1e-6 + 0.6 * vis_map))

        render = jnp.stack(
            [
                baseline_lin[..., 0],
                jnp.clip(baseline_lin[..., 1] + self.uv_boost * 0.15 * uv_sal, 0.0, 1.0),
                jnp.clip(baseline_lin[..., 2] + self.uv_boost * 0.35 * uv_sal, 0.0, 1.0),
            ],
            axis=-1,
        )
        render = effects.snow_glare_tone_compress(
            render, strength=self.snow_glare_compression
        )
        if self.winter_mode:
            render = effects.scatter_and_blue_bias(
                render, sigma=self.scatter_sigma, blue_bias=self.blue_bias
            )
        return render
