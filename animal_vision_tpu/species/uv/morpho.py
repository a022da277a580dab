"""Morpho butterfly — structural blue iridescence + ommatidial mosaic.

Parity: animals/morpho.py (154 LoC). Orientation of the blue-band texture
drives a cyan<->deep-blue shift; UV gloss sheen [0.10,0.25,0.45] * 0.55;
ommatidial mosaic (area down x0.35, NEAREST up); center-clarity inverse
vignette (unsharp 0.22, sigma 1.0, radius 0.82, softness 7); panorama 1.05."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur, effects, geometry, gradients
from animal_vision_tpu.core.stats import percentile, safe_norm
from animal_vision_tpu.species.uv.common import UVAnimal


class Morpho(UVAnimal):
    lambdas = np.linspace(300.0, 700.0, 81)
    hsi_scale = 0.25
    panorama_scale = 1.05

    sheen_strength = 0.55
    hue_shift_strength = 0.45
    gloss_sigma = 1.0
    mosaic_downscale = 0.35
    center_clarity = 0.25
    vignette_softness = 7.0
    vignette_radius = 0.82
    #: Reference parity (animals/morpho.py:120-135) derives the hue shift
    #: from atan2 of Sobel gradients with NO magnitude gate, so on flat
    #: regions the orientation is the arctangent of numerical noise
    #: (PARITY.md "Chaotic sensitivity"). Setting a gate (e.g. 1e-3)
    #: softens the shift toward its neutral midpoint where the local
    #: gradient energy is below it — deterministic on flat images, visually
    #: identical on textured ones. None keeps exact reference behavior.
    orientation_gate: float | None = None

    def _band_specs(self):
        return [(320.0, 400.0), (440.0, 500.0), (500.0, 570.0)]

    def _render(self, baseline_lin, maps):
        u = safe_norm(safe_norm(maps[..., 0]))
        bv = safe_norm(maps[..., 1])

        gx = gradients.sobel_x(bv)
        gy = gradients.sobel_y(bv)
        ori = jnp.arctan2(gy, gx)
        align = 0.5 * (1.0 + jnp.cos(2.0 * ori))
        if self.orientation_gate is not None:
            # safe_norm amplifies ANY texture (even numerical noise) to full
            # scale, so the gate must read the RAW band's dynamic range:
            # genuinely flat frames fade the hue shift to its neutral
            # midpoint instead of amplifying noise orientations.
            raw_range = jnp.max(maps[..., 1]) - jnp.min(maps[..., 1])
            gate = jnp.clip(raw_range / self.orientation_gate, 0.0, 1.0)
            align = 0.5 + gate * (align - 0.5)

        gloss = blur.gaussian_blur_uv(u, self.gloss_sigma)
        gloss = jnp.clip(gloss / (percentile(gloss, 95.0) + 1e-8), 0.0, 1.0)
        if self.orientation_gate is not None:
            # same raw-range principle for the UV gloss: no real UV texture
            # -> no noise-driven sheen (safe_norm would amplify it).
            u_range = jnp.max(maps[..., 0]) - jnp.min(maps[..., 0])
            gloss = gloss * jnp.clip(u_range / self.orientation_gate, 0.0, 1.0)

        shift_cyan = self.hue_shift_strength * align
        shift_deep = self.hue_shift_strength * (1.0 - align)
        render = jnp.stack(
            [
                baseline_lin[..., 0],
                jnp.clip(baseline_lin[..., 1] + 0.35 * shift_cyan, 0.0, 1.0),
                jnp.clip(
                    baseline_lin[..., 2] + 0.40 * shift_deep + 0.25 * shift_cyan, 0.0, 1.0
                ),
            ],
            axis=-1,
        )
        sheen = jnp.asarray(np.array([0.10, 0.25, 0.45], np.float32))
        render = jnp.clip(
            render + self.sheen_strength * gloss[..., None] * sheen[None, None, :], 0.0, 1.0
        )

        # ommatidial mosaic: area down, nearest up
        h, w = int(render.shape[0]), int(render.shape[1])
        hs = max(1, int(round(h * self.mosaic_downscale)))
        ws = max(1, int(round(w * self.mosaic_downscale)))
        small = geometry.resize(render, (hs, ws), "area")
        render = geometry.resize(small, (h, w), "nearest")

        # center clarity (inverse vignette)
        t = jnp.asarray(
            effects.radial_sigmoid_mask((h, w), self.vignette_radius, self.vignette_softness)
        )[..., None]
        sharp = render + 0.22 * (render - blur.gaussian_blur_uv(render, 1.0))
        return jnp.clip((1.0 - t) * sharp + t * render, 0.0, 1.0)
