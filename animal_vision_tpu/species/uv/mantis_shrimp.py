"""Mantis shrimp — 10-band spectral barcode + linear/circular polarization.

Parity: animals/mantis_shrimp.py (279 LoC). Ten narrow bands -> N-hue HSV
LUT; winner-take-most argmax tint blended with the soft weighted mix (0.35);
saturation 1.40; linear + circular-ish polarization gains from the local
orientation of the broad energy (evec 30deg, mix 0.5); pol-guided unsharp;
barcode blend 0.55; midband scanlines (freq 26, gain 0.08, soften 0.8);
peripheral blur 0.7; panorama 1.12."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from animal_vision_tpu.core import blur, effects, gradients
from animal_vision_tpu.core.stats import luminance709, percentile
from animal_vision_tpu.species.uv.common import UVAnimal

BANDS = (
    (320.0, 360.0),
    (360.0, 400.0),
    (400.0, 430.0),
    (430.0, 460.0),
    (460.0, 490.0),
    (490.0, 520.0),
    (520.0, 550.0),
    (550.0, 580.0),
    (580.0, 610.0),
    (610.0, 680.0),
)


def _hue_lut(n: int, sat: float = 0.95) -> np.ndarray:
    """(N, 3) vivid hue circle (mantis_shrimp.py:175-197 hsv2rgb with v=1)."""
    h = np.arange(n, dtype=np.float32) / max(n, 1)
    i = np.floor(h * 6.0).astype(np.int32) % 6
    f = h * 6.0 - np.floor(h * 6.0)
    v = np.ones_like(h)
    p = v * (1.0 - sat)
    q = v * (1.0 - f * sat)
    t = v * (1.0 - (1.0 - f) * sat)
    r = np.select([i == k for k in range(6)], [v, q, p, p, t, v], default=v)
    g = np.select([i == k for k in range(6)], [t, v, v, q, p, p], default=v)
    b = np.select([i == k for k in range(6)], [p, p, t, v, v, q], default=v)
    return np.stack([r, g, b], axis=-1).astype(np.float32)


class MantisShrimp(UVAnimal):
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    hsi_scale = 0.25
    panorama_scale = 1.12

    red_kill = 0.18
    haze_strength = 0.03
    haze_tint = np.array([0.92, 0.98, 1.00], np.float32)
    pre_soft_sigma = 0.25
    unsharp_sigma = 1.0
    unsharp_amount = 0.32
    evec_angle_deg = 30.0
    pol_linear_strength = 0.55
    pol_linear_gamma = 1.2
    pol_circular_strength = 0.35
    orientation_mix = 0.5
    barcode_saturation = 0.40
    barcode_opacity = 0.55
    winner_take_most = 0.35
    scan_row_freq = 26.0
    scan_row_gain = 0.08
    scan_soften = 0.8
    periph_blur_sigma = 0.7
    periph_radius = 0.80
    periph_softness = 7.0

    def _band_specs(self):
        return list(BANDS)

    def _render(self, baseline_lin, maps):
        h, w = int(baseline_lin.shape[0]), int(baseline_lin.shape[1])
        n = maps.shape[-1]
        # safe_norm over every band in ONE fused pass (2n reductions over
        # the same (H, W, n) read) instead of n stacked two-pass calls —
        # bitwise-identical per band, ~n fewer full-res reads.
        mn = jnp.min(maps, axis=(0, 1))
        rng = jnp.max(maps, axis=(0, 1)) - mn
        s = jnp.where(
            rng < 1e-9, 0.0, (maps - mn) / jnp.where(rng < 1e-9, 1.0, rng)
        )

        lut = jnp.asarray(_hue_lut(n))
        s_norm = jnp.clip(s / (percentile(s, 95.0) + 1e-8), 0.0, 1.0)
        max_idx = jnp.argmax(s_norm, axis=2)
        weights = s_norm / (jnp.sum(s_norm, axis=2, keepdims=True) + 1e-8)
        # winner-take-most blend folded INTO the LUT contraction: by
        # linearity (1-wtm)*(weights@lut) + wtm*(onehot@lut) is one einsum
        # over the blended weights — halves the (H, W, n) matmul traffic.
        wtm = self.winner_take_most
        w_comb = (1.0 - wtm) * weights + wtm * jax.nn.one_hot(
            max_idx, n, dtype=jnp.float32
        )
        barcode = jnp.einsum("hwn,nc->hwc", w_comb, lut, precision="highest")
        yb = luminance709(barcode)[..., None]
        barcode = jnp.clip(yb + (barcode - yb) * (1.0 + self.barcode_saturation), 0.0, 1.0)

        render = jnp.concatenate(
            [
                jnp.clip(baseline_lin[..., 0:1] * (1.0 - self.red_kill), 0.0, 1.0),
                baseline_lin[..., 1:3],
            ],
            axis=-1,
        )
        a = float(np.clip(self.haze_strength, 0.0, 1.0))
        render = (1.0 - a) * render + a * jnp.asarray(self.haze_tint)[None, None, :]
        render = blur.gaussian_blur_uv(render, self.pre_soft_sigma)

        broad = jnp.mean(s_norm, axis=2)
        gx = gradients.sobel_x(broad)
        gy = gradients.sobel_y(broad)
        theta = jnp.arctan2(gy, gx)
        evec = float(np.deg2rad(self.evec_angle_deg))
        mix = self.orientation_mix
        cos2 = (1.0 - mix) * float(np.cos(2 * evec)) + mix * jnp.cos(2.0 * theta)
        sin2 = (1.0 - mix) * float(np.sin(2 * evec)) + mix * jnp.sin(2.0 * theta)
        align01 = jnp.clip(0.5 * (cos2 + 1.0), 0.0, 1.0) ** self.pol_linear_gamma
        align_circ = jnp.clip(0.5 * (sin2 + 1.0), 0.0, 1.0)
        pol_gain = (
            1.0
            + self.pol_linear_strength * align01
            + self.pol_circular_strength * align_circ
        )
        blurred = blur.gaussian_blur_uv(render, self.unsharp_sigma)
        high = jnp.clip(render - blurred, -1.0, 1.0)
        render = jnp.clip(render + (self.unsharp_amount * pol_gain[..., None]) * high, 0.0, 1.0)

        render = jnp.clip(
            (1.0 - self.barcode_opacity) * render + self.barcode_opacity * barcode, 0.0, 1.0
        )

        # midband scanlines: the (H, W) row-constant blur folds to a 1-D
        # trace-time profile (blur_profile_1d) — no runtime full-res blur.
        y = np.linspace(0.0, 1.0, h, dtype=np.float32)
        prof = (0.5 + 0.5 * np.sin(2.0 * np.pi * self.scan_row_freq * y)).astype(
            np.float32
        )
        rows_j = blur.blur_profile_1d(prof, self.scan_soften)[:, None]
        row_gain = 1.0 + self.scan_row_gain * (rows_j - 0.5)
        render = jnp.clip(render * jnp.asarray(row_gain)[..., None], 0.0, 1.0)

        return effects.peripheral_blur(
            render, self.periph_blur_sigma, self.periph_radius, self.periph_softness
        )
