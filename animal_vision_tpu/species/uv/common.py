"""Shared skeleton for the 16 UV species.

Reference shape (SURVEY.md §2.7, e.g. animals/goldfish.py:104-125):
to_float01 -> srgb_to_linear -> panorama_warp (baseline geometry; the
baseline output IS the warped original) -> RGB->HSI (downsample speed path)
-> band integrals -> species rendering in linear RGB -> linear_to_srgb ->
dtype restore.

TPU-first: the HSI cube never materializes. The analytic upsampler is a
(3, B) matmul and each band integral a (B,) contraction, so every species'
band stack folds to ONE (3, n_bands) matrix applied to the linearized frame
(spectral/classic.fused_band_matrix). The downsample speed path commutes:
area-downsample -> matmul -> bilinear-upsample equals the reference's
downsample -> cube -> upsample -> integrate, because every step is linear.
The reference's double linearization of already-linear input (SURVEY.md §0)
is preserved: the converter linearizes whatever it is given.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import color, geometry
from animal_vision_tpu.species.base import Animal
from animal_vision_tpu.spectral import bands as spectral_bands
from animal_vision_tpu.spectral import classic


def compute_band_maps(
    frame: jnp.ndarray,
    lambdas: np.ndarray,
    weight_columns: np.ndarray,
    hsi_scale: float,
) -> jnp.ndarray:
    """(H, W, n) raw band integrals of the analytic HSI of ``frame``.

    ``frame`` is whatever the reference feeds its converter (linear for most
    species — the double-linearization quirk — sRGB01 for honeybee).
    ``weight_columns`` is (B, n). ``hsi_scale`` < 1 runs the INTER_AREA-down /
    INTER_LINEAR-up speed path (uv_helpers.py:155-183).

    The cube's ``clamp_min(0)`` (classic_rgb_to_hsi.py:81) is NOT a no-op:
    the panorama warp's INTER_CUBIC overshoot feeds *negative* linear values
    into the converter, and several downstream maps are chaotically sensitive
    to them (safe_norm'ed saliency ratios). So the (3,B) lobe projection and
    the (B,n) band integral stay as two matmuls with a relu between — still
    tiny on the MXU at the downsampled resolution, and the cube only exists
    as a fused intermediate."""
    g = classic.lobe_matrix(tuple(float(v) for v in np.asarray(lambdas)))  # (3, B)
    wmat = np.asarray(weight_columns, dtype=np.float32)  # (B, n)

    def maps_of(x):
        lin = color.srgb_to_linear(x.astype(jnp.float32))
        cube = jnp.einsum("...c,cb->...b", lin, jnp.asarray(g), precision="highest")
        cube = jnp.maximum(cube, 0.0)
        return jnp.einsum("...b,bn->...n", cube, jnp.asarray(wmat), precision="highest")

    h, w = int(frame.shape[0]), int(frame.shape[1])
    if 0.0 < hsi_scale < 1.0:
        hs = max(1, int(round(h * hsi_scale)))
        ws = max(1, int(round(w * hsi_scale)))
        small = geometry.resize(frame, (hs, ws), "area")
        return geometry.resize(maps_of(small), (h, w), "linear")
    return maps_of(frame)


def band_weight_columns(lambdas: np.ndarray, band_specs) -> np.ndarray:
    """(B, n) stack of raised-cosine band weights for (lo, hi) pairs."""
    lam = tuple(float(v) for v in np.asarray(lambdas))
    cols = [spectral_bands.bandpass_weights(lam, lo, hi) for lo, hi in band_specs]
    return np.stack(cols, axis=1)


class UVAnimal(Animal):
    """Base for UV species following the shared skeleton. Subclasses set
    ``lambdas``, ``hsi_scale``, ``panorama_scale``, declare ``_band_specs``
    (list of (lo, hi) nm pairs) and implement ``_render``.

    ``hsi_provider`` (optional) replaces the analytic upsampler with a model
    — e.g. Flax MST++ via models.providers.make_mst_hsi_provider — wiring
    the capability the reference left dead (honeybee.py:49,67's unused
    onnx_path; BASELINE.json config #4). The provider is called with the
    same frame the analytic converter would receive and must return an
    (H, W, len(lambdas)) cube on this species' wavelength grid."""

    lambdas: np.ndarray = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    hsi_scale: float = 0.25
    panorama_scale: float = 1.0
    hsi_provider = None

    def _band_specs(self) -> list[tuple[float, float]]:
        raise NotImplementedError

    def _render(self, baseline_lin: jnp.ndarray, band_maps: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def use_hsi_provider(self, provider, lambdas: np.ndarray | None = None) -> "UVAnimal":
        """Swap in a model-based RGB->HSI provider (and its band grid)."""
        self.hsi_provider = provider
        if lambdas is not None:
            self.lambdas = np.asarray(lambdas)
        self._programs.clear()
        return self

    def _build_program(self, shape, dtype):
        specs = self._band_specs()
        cols = band_weight_columns(self.lambdas, specs)

        def fn(image):
            img01 = color.to_float01(image)
            img_lin = color.srgb_to_linear(img01)
            if self.panorama_scale and abs(self.panorama_scale - 1.0) >= 1e-3:
                baseline_lin = geometry.panorama_warp(img_lin, self.panorama_scale)
            else:
                baseline_lin = img_lin
            baseline_srgb = color.linear_to_srgb(jnp.clip(baseline_lin, 0.0, 1.0))
            baseline_out = color.from_float01(baseline_srgb, dtype)

            if self.hsi_provider is not None:
                # Model-based HSI honors the same downsample speed path the
                # analytic converter uses (every UV species defaults to
                # hsi_scale 0.25, SURVEY.md §6) — band-integrate at the small
                # resolution and bilinearly upsample the few band maps.
                h, w = int(baseline_lin.shape[0]), int(baseline_lin.shape[1])
                if 0.0 < self.hsi_scale < 1.0:
                    hs = max(1, int(round(h * self.hsi_scale)))
                    ws = max(1, int(round(w * self.hsi_scale)))
                    small = geometry.resize(baseline_lin, (hs, ws), "area")
                    cube = self.hsi_provider(small)
                    maps_small = jnp.einsum(
                        "...b,bn->...n", cube, jnp.asarray(cols), precision="highest"
                    )
                    maps = geometry.resize(maps_small, (h, w), "linear")
                else:
                    cube = self.hsi_provider(baseline_lin)
                    maps = jnp.einsum(
                        "...b,bn->...n", cube, jnp.asarray(cols), precision="highest"
                    )
            else:
                maps = compute_band_maps(baseline_lin, self.lambdas, cols, self.hsi_scale)
            render = self._render(baseline_lin, maps)
            out = color.from_float01(
                color.linear_to_srgb(jnp.clip(render, 0.0, 1.0)), dtype
            )
            return baseline_out, out

        return fn
