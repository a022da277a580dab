"""RatUV — UV-aware rat with day/night auto mode.

Parity: animals/rat_uv.py (214 LoC). 129 float64 bands 320-700 nm (its own
no-cast scaled converter, rat_uv.py:114-128), UV 330-400 / B 400-500 /
G 500-600, falsecolor proxy (same weights as map_falsecolor) composited
alpha=0.55 with the baseline, day/night selected by median luma < 0.12
(rat_uv.py:100-104), scatter blur + blue bias, day soft-knee 0.82/0.65 or
night midtone lift +0.18, ground-focus vignette, panorama 1.45,
hsi_scale 0.55.

The day/night branch is data-dependent; under jit both branches are computed
and selected per the scalar condition (two small blurs instead of one — the
reference's "auto" semantics preserved exactly).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import effects
from animal_vision_tpu.core.stats import percentile, safe_norm
from animal_vision_tpu.species.uv.common import UVAnimal


class RatUV(UVAnimal):
    lambdas = np.linspace(320.0, 700.0, 129, dtype=np.float64)
    hsi_scale = 0.55
    panorama_scale = 1.45

    uv_boost_alpha = 0.55
    day_blur_sigma = 0.8
    night_blur_sigma = 1.25
    blue_bias_day = 0.03
    blue_bias_night = 0.05
    tone_knee = 0.82
    tone_strength = 0.65
    ground_vignette_day = 0.10
    ground_vignette_night = 0.14
    mode = "auto"  # "auto" | "day" | "night"

    def _band_specs(self):
        return [(330.0, 400.0), (400.0, 500.0), (500.0, 600.0)]

    def _render_mode(self, composited, night: bool):
        sigma = self.night_blur_sigma if night else self.day_blur_sigma
        bias = self.blue_bias_night if night else self.blue_bias_day
        render = effects.scatter_and_blue_bias(composited, sigma=sigma, blue_bias=bias)
        if night:
            y = (
                0.2126 * render[..., 0]
                + 0.7152 * render[..., 1]
                + 0.0722 * render[..., 2]
            )
            gain = (y + 0.18) / (y + 1e-6)
            render = jnp.clip(render * gain[..., None], 0.0, 1.0)
            gv = self.ground_vignette_night
        else:
            render = effects.snow_glare_tone_compress(
                render, strength=self.tone_strength, knee=self.tone_knee
            )
            gv = self.ground_vignette_day
        # ground-focus vignette (rat_uv.py:106-112): gain 1 at bottom,
        # (1-amount) at top.
        h = int(render.shape[0])
        yy = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
        gain_v = 1.0 - gv * yy  # 1-amount*(1-mask), mask=1-yy
        return jnp.clip(render * jnp.asarray(gain_v)[..., None], 0.0, 1.0)

    def _render(self, baseline_lin, maps):
        u = safe_norm(maps[..., 0])
        b = maps[..., 1]
        g = maps[..., 2]

        def n95(x):
            return x / jnp.maximum(1e-8, percentile(x, 95.0))

        un, bn, gn = n95(u), n95(b), n95(g)
        false = jnp.stack(
            [
                jnp.clip(0.85 * un + 0.10 * gn, 0.0, 1.0),
                jnp.clip(0.80 * gn + 0.20 * bn, 0.0, 1.0),
                jnp.clip(0.70 * bn + 0.40 * un, 0.0, 1.0),
            ],
            axis=2,
        )
        a = self.uv_boost_alpha
        comp = jnp.clip((1.0 - a) * baseline_lin + a * false, 0.0, 1.0)

        if self.mode == "day":
            return self._render_mode(comp, night=False)
        if self.mode == "night":
            return self._render_mode(comp, night=True)
        # auto: median luma of the *pre-warp* img01 decides; we stash it on
        # the instance via _build_program's closure (see below).
        is_night = self._auto_night
        return jnp.where(is_night, self._render_mode(comp, True), self._render_mode(comp, False))

    def _build_program(self, shape, dtype):
        base_fn = super()._build_program(shape, dtype)
        if self.mode != "auto":
            return base_fn

        from animal_vision_tpu.core import color

        def fn(image):
            img01 = color.to_float01(image)
            y = 0.2126 * img01[..., 0] + 0.7152 * img01[..., 1] + 0.0722 * img01[..., 2]
            self._auto_night = jnp.median(y) < 0.12
            try:
                return base_fn(image)
            finally:
                self._auto_night = None

        return fn
