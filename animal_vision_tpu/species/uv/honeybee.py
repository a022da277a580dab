"""Honeybee — full cone-catch model with von Kries adaptation.

Parity: animals/honeybee.py (192 LoC). 31 bands 400-700 nm (the 350 nm UV
cone is therefore sampled only by its >=400 nm tail — reference behavior),
reflectance x D65-like illuminant, log-normal cone curves (350/440/540 nm,
sigma 25/30/35, sum-normalized), white-patch adaptation, sigma=0.2 blur,
five mapping modes (default 'opponent'). Baseline = the unmodified input.

TPU fusion: illuminant and cone curves fold with the analytic lobe matrix
into one (3, 3) matrix — cone catches come straight from the linearized
frame. The converter input here is sRGB01 (honeybee.py:106,112 passes img01)
— single linearization, unlike the other UV species.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur, color
from animal_vision_tpu.species.base import Animal
from animal_vision_tpu.spectral import bands as sbands
from animal_vision_tpu.spectral import classic, mappers


def honeybee_cone_curves(lambdas: np.ndarray):
    """Log-normal-ish UV/Blue/Green curves, each sum-normalized
    (animals/honeybee.py:179-192 and 89-94)."""
    lam = np.asarray(lambdas, dtype=np.float64)

    def g(peak, sigma):
        return np.exp(-0.5 * ((lam - peak) / sigma) ** 2)

    curves = [g(350.0, 25.0), g(440.0, 30.0), g(540.0, 35.0)]
    out = []
    for c in curves:
        c = c.astype(np.float32)
        s = c.sum()
        out.append(c / s if s > 0 else c)
    return out


class HoneyBee(Animal):
    def __init__(
        self,
        hsi_band_centers_nm: Optional[np.ndarray] = None,
        adaptation: str | None = "white_patch",
        mapping_mode: str = "opponent",
        custom_matrix: Optional[np.ndarray] = None,
        blur_sigma_px: float = 0.2,
        assume_hsi_is_reflectance: bool = True,
        hsi_downsample: bool = False,
        hsi_scale: float = 0.1,
        hsi_provider=None,
    ):
        super().__init__()
        self.lambdas = (
            np.linspace(400.0, 700.0, 31, dtype=np.float32)
            if hsi_band_centers_nm is None
            else np.asarray(hsi_band_centers_nm, dtype=np.float32)
        )
        self.adaptation = adaptation
        self.mapping_mode = mapping_mode
        self.custom_matrix = custom_matrix
        self.blur_sigma_px = float(blur_sigma_px or 0.0)
        self.assume_hsi_is_reflectance = assume_hsi_is_reflectance
        self.hsi_downsample = bool(hsi_downsample)
        self.hsi_scale = float(hsi_scale)
        #: optional callable (img01) -> (H, W, B) reflectance cube (e.g. a
        #: Flax MST++ model) replacing the analytic upsampler — this wires
        #: the reference's dead `onnx_path` capability (honeybee.py:49,67).
        self.hsi_provider = hsi_provider

    def _catch_columns(self) -> np.ndarray:
        """(B, 3) columns: cone curve x illuminant, folding steps 2+3 of the
        reference pipeline (honeybee.py:126-135)."""
        curves = honeybee_cone_curves(self.lambdas)
        if self.assume_hsi_is_reflectance:
            e = sbands.d65_like(self.lambdas).astype(np.float64)
        else:
            e = np.ones_like(self.lambdas, dtype=np.float64)
        return np.stack([c.astype(np.float64) * e for c in curves], axis=1)

    def _catches(self, img01: jnp.ndarray):
        cols = self._catch_columns()
        if self.hsi_provider is not None:
            cube = self.hsi_provider(img01)
            cat = jnp.einsum(
                "...b,bn->...n", cube, jnp.asarray(cols, jnp.float32), precision="highest"
            )
            return cat[..., 0], cat[..., 1], cat[..., 2]
        m = classic.fused_band_matrix(self.lambdas, cols)  # (3, 3)
        h, w = int(img01.shape[0]), int(img01.shape[1])
        if self.hsi_downsample and 0.05 <= self.hsi_scale < 1.0:
            from animal_vision_tpu.core import geometry

            hs = max(1, int(round(h * self.hsi_scale)))
            ws = max(1, int(round(w * self.hsi_scale)))
            small = geometry.resize(img01, (hs, ws), "area")
            lin = color.srgb_to_linear(small)
            cat = jnp.einsum("...c,cn->...n", lin, jnp.asarray(m), precision="highest")
            cat = geometry.resize(cat, (h, w), "linear")
        else:
            lin = color.srgb_to_linear(img01)
            cat = jnp.einsum("...c,cn->...n", lin, jnp.asarray(m), precision="highest")
        return cat[..., 0], cat[..., 1], cat[..., 2]

    def _build_program(self, shape, dtype):
        def fn(image):
            img01 = color.to_float01(image)
            u, b, g = self._catches(img01)

            if self.adaptation == "white_patch":
                u, b, g = sbands.von_kries_white_patch(u, b, g)
            elif self.adaptation == "gray_world":
                u, b, g = sbands.von_kries_gray_world(u, b, g)

            if self.blur_sigma_px > 0:
                u = blur.gaussian_blur_uv(u, self.blur_sigma_px)
                b = blur.gaussian_blur_uv(b, self.blur_sigma_px)
                g = blur.gaussian_blur_uv(g, self.blur_sigma_px)

            if self.mapping_mode == "falsecolor":
                rgb = mappers.map_falsecolor(u, b, g)
            elif self.mapping_mode == "custom_matrix":
                assert self.custom_matrix is not None and np.shape(self.custom_matrix) == (3, 3)
                rgb = mappers.map_linear_matrix(u, b, g, self.custom_matrix)
            elif self.mapping_mode == "opponent":
                rgb = mappers.map_opponent(u, b, g)
            elif self.mapping_mode == "uv_purple_yellow":
                rgb = mappers.map_uv_purple_yellow_soft(u)
            elif self.mapping_mode == "falsecolor_uv_mixed":
                rgb = mappers.map_falsecolor_uv_mixed(u, b, g, alpha=0.45)
            else:
                raise ValueError(f"Unknown mapping_mode: {self.mapping_mode}")

            rgb = jnp.clip(rgb, 0.0, 1.0)
            out_srgb = color.linear_to_srgb(rgb)
            if np.issubdtype(np.dtype(dtype), np.integer):
                out = (out_srgb * 255.0 + 0.5).astype(dtype)
            else:
                out = out_srgb.astype(dtype)
            return image, out

        return fn
