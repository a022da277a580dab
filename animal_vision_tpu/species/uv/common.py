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

from animal_vision_tpu.core import bucketctx, color, geometry
from animal_vision_tpu.species.base import Animal
from animal_vision_tpu.spectral import bands as spectral_bands
from animal_vision_tpu.spectral import classic


def _mirror_rows(m: np.ndarray, real: int, total: int) -> np.ndarray:
    """Embed an (real, S) table into (total, S) with reflect-101 row fill:
    padded output row i reproduces real row 2(real-1)-i, so the table's
    output carries the mirror invariant ('padding = reflection of the real
    content') *exactly* — no in-program re-reflection pass is needed."""
    out = np.zeros((total, m.shape[1]), dtype=np.float32)
    out[:real] = m
    for i in range(real, total):
        out[i] = m[2 * real - 2 - i]
    return out


def _warp_cols_matrix(w: int, scale_x: float) -> np.ndarray:
    """(w, w) dense matrix of panorama_warp's width axis: cubic widen to
    round(w*scale) composed with the center crop (geometry.panorama_warp)."""
    new_w = max(2, int(np.round(w * scale_x)))
    m = geometry.dense_axis_matrix(w, new_w, "cubic")  # (new_w, w)
    if new_w == w:
        return m
    start = (new_w - w) // 2
    return m[start : start + w]


def _integrate_maps(lin: jnp.ndarray, g, wmat) -> jnp.ndarray:
    """relu(lin @ G) @ W — the analytic cube contracted to band maps.

    For large band counts the two einsums materialize the (H, W, B) cube in
    HBM (rat_uv: 129 bands at 0.55 scale ≈ 324 MB per direction). The planar
    form keeps the cube as an elementwise producer that XLA input-fuses into
    each map's reduction, so it is recomputed per map instead of
    round-tripping HBM (2.46 -> 1.47 ms at rat_uv's 594x1056 B=129 point,
    tools/exp_hsi_maps.py). Small cubes keep the matmuls (equal speed,
    bitwise-stable against the existing goldens)."""
    g = jnp.asarray(g)
    wmat = jnp.asarray(wmat)
    nb, nm = int(g.shape[1]), int(wmat.shape[1])
    if nb <= 100:
        cube = jnp.einsum("...c,cb->...b", lin, g, precision="highest")
        cube = jnp.maximum(cube, 0.0)
        return jnp.einsum("...b,bn->...n", cube, wmat, precision="highest")
    planes = jnp.moveaxis(lin, -1, 0)
    cube = jnp.maximum(
        g[0][:, None, None] * planes[0]
        + g[1][:, None, None] * planes[1]
        + g[2][:, None, None] * planes[2],
        0.0,
    )  # (B, H, W) — never materialized: fused into the reduces below
    maps = [jnp.sum(cube * wmat[:, n][:, None, None], axis=0) for n in range(nm)]
    return jnp.stack(maps, axis=-1)


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
        return _integrate_maps(lin, g, wmat)

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

    def _chain(self, dtype, warp_fn, down_fn, up_fn):
        """The shared species chain with the shape-dependent geometry
        injected: ``warp_fn`` (panorama or identity), ``down_fn``/``up_fn``
        (the HSI speed path's resizes, or None when hsi_scale >= 1)."""
        specs = self._band_specs()
        cols = band_weight_columns(self.lambdas, specs)
        g = classic.lobe_matrix(tuple(float(v) for v in np.asarray(self.lambdas)))

        def maps_of(x):
            lin = color.srgb_to_linear(x.astype(jnp.float32))
            return _integrate_maps(lin, g, cols)

        def fn(image):
            img01 = color.to_float01(image)
            img_lin = color.srgb_to_linear(img01)
            baseline_lin = warp_fn(img_lin)
            baseline_srgb = color.linear_to_srgb(jnp.clip(baseline_lin, 0.0, 1.0))
            baseline_out = color.from_float01(baseline_srgb, dtype)

            if self.hsi_provider is not None:
                # Model-based HSI honors the same downsample speed path the
                # analytic converter uses (every UV species defaults to
                # hsi_scale 0.25, SURVEY.md §6) — band-integrate at the small
                # resolution and bilinearly upsample the few band maps.
                if down_fn is not None:
                    small = down_fn(baseline_lin)
                    cube = self.hsi_provider(small)
                    maps_small = jnp.einsum(
                        "...b,bn->...n", cube, jnp.asarray(cols), precision="highest"
                    )
                    maps = up_fn(maps_small)
                else:
                    cube = self.hsi_provider(baseline_lin)
                    maps = jnp.einsum(
                        "...b,bn->...n", cube, jnp.asarray(cols), precision="highest"
                    )
            elif down_fn is not None:
                maps = up_fn(maps_of(down_fn(baseline_lin)))
            else:
                maps = maps_of(baseline_lin)
            render = self._render(baseline_lin, maps)
            out = color.from_float01(
                color.linear_to_srgb(jnp.clip(render, 0.0, 1.0)), dtype
            )
            return baseline_out, out

        return fn

    def _build_program(self, shape, dtype):
        h, w = int(shape[0]), int(shape[1])
        if self.panorama_scale and abs(self.panorama_scale - 1.0) >= 1e-3:
            warp_fn = lambda x: geometry.panorama_warp(x, self.panorama_scale)
        else:
            warp_fn = lambda x: x
        down_fn = up_fn = None
        if 0.0 < self.hsi_scale < 1.0:
            hs = max(1, int(round(h * self.hsi_scale)))
            ws = max(1, int(round(w * self.hsi_scale)))
            down_fn = lambda x: geometry.resize(x, (hs, ws), "area")
            up_fn = lambda x: geometry.resize(x, (h, w), "linear")
        return self._chain(dtype, warp_fn, down_fn, up_fn)

    # -- padded-bucket programs (SURVEY.md §7 hard-part 5) -----------------
    #: opt-in per species: the bucket path needs every shape-dependent
    #: construct of _render covered by core.bucketctx (global percentiles,
    #: radial masks, vertical priors). Audited species set it True.
    bucketable = False
    #: minimum padding rows/cols: in-program reflect-101 convs corrupt the
    #: mirror invariant inward from the BUCKET border by ~sum of kernel
    #: radii over the longest sequential conv chain; the pad must absorb
    #: that so the real interior stays exact.
    bucket_pad_min = 48

    def _small_dims(self, h: int, w: int) -> tuple[int, int]:
        return (
            max(1, int(round(h * self.hsi_scale))),
            max(1, int(round(w * self.hsi_scale))),
        )

    def _bucket_plan(self, shape, dtype):
        if not self.bucketable:
            return None
        h, w = int(shape[0]), int(shape[1])
        if h % 8 == 0 and w % 32 == 0:
            return None  # standard/aligned shapes keep the exact program
        if min(h, w) < 2 * self.bucket_pad_min:
            return None  # reflect mirrors need pad < dim: tiny frames exact

        def up(v):
            b = -(-v // 64) * 64
            while b - v < self.bucket_pad_min:
                b += 64
            return b

        bh, bw = up(h), up(w)
        if bh - h > h - 1 or bw - w > w - 1:
            return None  # reflect padding needs pad <= dim-1
        if 0.0 < self.hsi_scale < 1.0:
            hs, ws = self._small_dims(h, w)
            hs_b, ws_b = self._small_dims(bh, bw)
            # mirror table rows 2*real-2-i must stay in range
            if hs_b > 2 * hs - 1 or ws_b > 2 * ws - 1:
                return None
        return bh, bw

    def _bucket_aux(self, shape, bucket_shape):
        h, w = int(shape[0]), int(shape[1])
        bh, bw = int(bucket_shape[0]), int(bucket_shape[1])
        aux = {"hr": np.int32(h), "wr": np.int32(w)}
        if self.panorama_scale and abs(self.panorama_scale - 1.0) >= 1e-3:
            m = _warp_cols_matrix(w, self.panorama_scale)  # (w, w)
            mp = np.zeros((bw, bw), np.float32)
            mp[:w, :w] = m
            aux["warp"] = _mirror_rows(mp[:w], w, bw)
        if 0.0 < self.hsi_scale < 1.0:
            hs, ws = self._small_dims(h, w)
            hs_b, ws_b = self._small_dims(bh, bw)
            aux["hsr"] = np.int32(hs)
            aux["wsr"] = np.int32(ws)

            def table(src, dst, src_b, dst_b, interp):
                m = geometry.dense_axis_matrix(src, dst, interp)  # (dst, src)
                mp = np.zeros((dst, src_b), np.float32)
                mp[:, :src] = m
                return _mirror_rows(mp, dst, dst_b)

            aux["down_y"] = table(h, hs, bh, hs_b, "area")
            aux["down_x"] = table(w, ws, bw, ws_b, "area")
            aux["up_y"] = table(hs, h, hs_b, bh, "linear")
            aux["up_x"] = table(ws, w, ws_b, bw, "linear")
        return aux

    def _build_bucket_program(self, bucket_shape, dtype):
        bh, bw = int(bucket_shape[0]), int(bucket_shape[1])
        smallpath = 0.0 < self.hsi_scale < 1.0
        hs_b, ws_b = self._small_dims(bh, bw) if smallpath else (0, 0)
        pan = self.panorama_scale and abs(self.panorama_scale - 1.0) >= 1e-3

        def fn(image, aux):
            small = (aux["hsr"], aux["wsr"], hs_b, ws_b) if smallpath else None
            ctx = bucketctx.BucketCtx(aux["hr"], aux["wr"], bh, bw, small=small)
            warp_fn = (
                (lambda x: geometry.apply_dense(x, aux["warp"], axis=1))
                if pan
                else (lambda x: x)
            )
            down_fn = up_fn = None
            if smallpath:
                down_fn = lambda x: geometry.apply_dense(
                    geometry.apply_dense(x, aux["down_y"], 0), aux["down_x"], 1
                )
                up_fn = lambda x: geometry.apply_dense(
                    geometry.apply_dense(x, aux["up_y"], 0), aux["up_x"], 1
                )
            with bucketctx.active(ctx):
                return self._chain(dtype, warp_fn, down_fn, up_fn)(image)

        return fn
