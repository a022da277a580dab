"""The 20 non-UV dichromat mammals as declarative specs + one pipeline compiler.

The reference implements these as 20 near-identical files (shared 6-step
template, animals/dog.py:31-61; per-species constants, SURVEY.md §2.4). Here
each species is *data* — a ``NonUVSpec`` row — and ``_build_program`` folds
the whole chain (normalize -> sRGB->linear -> 3x3 dichromat matrix ->
post-effects -> encode -> dtype restore) into one jitted XLA program.

Parity decisions (documented reference defects, SURVEY.md §0):
- Pig discards its streak-blur and chroma results (animals/pig.py:35,38);
  we reproduce the matrix-only behavior and keep the effects available via
  ``enabled=False`` spec entries.
- Cat implements the *Tina-animals* merge-conflict branch
  (animals/cat.py:73-103): center-zoom human baseline + binocular FOV warp +
  explicit-LMS alpha=0.5 merge (NOT the collapse matrix — i.e. without the
  matrix path's transpose quirk) + sigma=1.0 blur.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.core import blur, color, effects, geometry
from animal_vision_tpu.species.base import Animal


@dataclass(frozen=True)
class Effect:
    kind: str  # 'blur' | 'streak' | 'chroma' | 'scone'
    params: tuple
    enabled: bool = True  # False = present in the reference but a no-op there


@dataclass(frozen=True)
class NonUVSpec:
    name: str
    alpha: float
    s_scale: float
    effects: tuple[Effect, ...] = field(default_factory=tuple)


def _apply_effect(img: jnp.ndarray, e: Effect) -> jnp.ndarray:
    if not e.enabled:
        return img
    if e.kind == "blur":
        return blur.gaussian_blur_hwc(img, e.params[0])
    if e.kind == "streak":
        return blur.streak_blur(img, *e.params)
    if e.kind == "chroma":
        return effects.chroma_compression(img, e.params[0])
    if e.kind == "scone":
        s_top, s_bottom, power, extra = e.params
        return effects.s_cone_vertical_gain(
            img, s_top=s_top, s_bottom=s_bottom, power=power, extra_boost=extra
        )
    raise ValueError(f"unknown effect kind {e.kind!r}")


# Per-species parameters; each row cites its reference file (SURVEY.md §2.4).
NONUV_SPECS: dict[str, NonUVSpec] = {
    spec.name: spec
    for spec in [
        # animals/dog.py:46,51
        NonUVSpec("dog", 0.58, 0.65, (Effect("blur", (3.5,)),)),
        # animals/sheep.py:30,35
        NonUVSpec("sheep", 0.74, 1.06, (Effect("streak", (0.48, 0.8, 2.2, 6.0)),)),
        # animals/pig.py:30,35,38 — both effects unassigned in the reference
        NonUVSpec(
            "pig",
            0.89,
            1.32,
            (
                Effect("streak", (0.5, 1.2, 2.5, 3.0), enabled=False),
                Effect("chroma", (0.55,), enabled=False),
            ),
        ),
        # animals/goat.py:29,34
        NonUVSpec("goat", 0.75, 1.06, (Effect("streak", (0.5, 0.8, 2.4, 8.0)),)),
        # animals/cow.py:29,34
        NonUVSpec("cow", 0.84, 1.07, (Effect("streak", (0.5, 0.9, 2.3, 6.5)),)),
        # animals/horse.py:29,34
        NonUVSpec("horse", 0.30, 1.02, (Effect("streak", (0.5, 0.8, 2.2, 6.0)),)),
        # animals/rabbit.py:29,34,37
        NonUVSpec(
            "rabbit",
            0.20,
            1.01,
            (Effect("streak", (0.52, 0.9, 2.5, 5.0)), Effect("chroma", (0.06,))),
        ),
        # animals/panda.py:29,34,37
        NonUVSpec(
            "panda",
            0.58,
            0.74,
            (Effect("streak", (0.52, 1.0, 2.1, 4.5)), Effect("chroma", (0.06,))),
        ),
        # animals/squirrel.py:29,34
        NonUVSpec("squirrel", 0.55, 1.05, (Effect("blur", (0.7,)),)),
        # animals/elephant.py:29,34
        NonUVSpec("elephant", 0.6, 0.95, (Effect("blur", (1.8,)),)),
        # animals/lion.py:29,34
        NonUVSpec("lion", 0.6, 0.95, (Effect("blur", (1.2,)),)),
        # animals/wolf.py:29,34
        NonUVSpec("wolf", 0.65, 0.95, (Effect("blur", (1.4,)),)),
        # animals/fox.py:29,34
        NonUVSpec("fox", 0.65, 0.98, (Effect("blur", (1.3,)),)),
        # animals/bear.py:29,34
        NonUVSpec("bear", 0.6, 0.95, (Effect("blur", (1.6,)),)),
        # animals/raccoon.py:29,34
        NonUVSpec("raccoon", 0.6, 0.98, (Effect("blur", (2.0,)),)),
        # animals/deer.py:29,34
        NonUVSpec("deer", 0.6, 0.95, (Effect("streak", (0.5, 0.8, 2.6, 8.0)),)),
        # animals/kangaroo.py:29,34
        NonUVSpec("kangaroo", 0.6, 0.98, (Effect("streak", (0.55, 0.8, 2.3, 8.0)),)),
        # animals/tiger.py:29,34
        NonUVSpec("tiger", 0.6, 0.95, (Effect("blur", (1.2,)),)),
        # animals/rat.py:29,34
        NonUVSpec("rat", 0.05, 0.86, (Effect("scone", (1.3, 0.5, 1.4, 0.25)),)),
    ]
}


class NonUVAnimal(Animal):
    """A spec-driven dichromat mammal. The compiled program returns
    (input frame unchanged, transformed frame) like the reference template.

    uint8 frames dispatch to the fused Pallas kernels (ops/fused_nonuv.py) —
    the whole chain in one HBM pass; float frames and unrecognized effect
    stacks use the XLA composition of core ops (same numerics)."""

    def __init__(self, spec: NonUVSpec):
        super().__init__()
        self.spec = spec

    def _fused_fn(self, dtype):
        """Return a fused (image)->(transformed) callable or None."""
        if np.dtype(dtype) != np.uint8:
            return None
        from animal_vision_tpu.ops import fused_nonuv as _fused

        spec = self.spec
        active = [e for e in spec.effects if e.enabled]
        kinds = tuple(e.kind for e in active)
        a, s = spec.alpha, spec.s_scale
        if kinds == ():
            return lambda img: _fused.fused_pointwise_u8(img, a, s)
        if kinds == ("scone",):
            return lambda img: _fused.fused_pointwise_u8(img, a, s, scone=active[0].params)
        if kinds == ("blur",):
            return lambda img: _fused.fused_iso_u8(img, a, s, active[0].params[0])
        if kinds == ("streak",):
            return lambda img: _fused.fused_streak_u8(img, a, s, active[0].params)
        if kinds == ("streak", "chroma"):
            return lambda img: _fused.fused_streak_u8(
                img, a, s, active[0].params, chroma=active[1].params[0]
            )
        return None

    # -- shape bucketing (SURVEY.md §7 hard-part 5) ------------------------
    # Standard video shapes (h%8==0, w%32==0: 1080p/720p/VGA/the test
    # fixtures) keep the exact path with tables folded as constants. Odd
    # shapes pad with host reflect-101 into 64-px buckets — exact for every
    # in-frame pixel because the pad is at least the blur radius (or the
    # blur has no vertical taps) — and share ONE compiled program per
    # bucket; the per-row tables (streak kernels, S-cone ramp) are computed
    # for the real height and passed as runtime operands.

    def _bucket_kinds(self):
        return tuple(e.kind for e in self.spec.effects if e.enabled)

    def _bucket_radii(self):
        """(ry, rx) minimum pad so padded-frame borders are exact, or None
        if this effect stack has no bucketable fused kernel."""
        from animal_vision_tpu.core import blur as _b
        from animal_vision_tpu.ops import fused_nonuv as _fused

        kinds = self._bucket_kinds()
        active = [e for e in self.spec.effects if e.enabled]
        if kinds in ((), ("scone",)):
            return 0, 0
        if kinds == ("blur",):
            r = _b.cv2_auto_ksize(float(active[0].params[0])) // 2
            return r, r
        if kinds in (("streak",), ("streak", "chroma")):
            # horizontal-only: rows are independent, no vertical radius
            return 0, _fused.streak_fixed_radius(active[0].params)
        return None

    def _bucket_plan(self, shape, dtype):
        if np.dtype(dtype) != np.uint8:
            return None
        h, w = int(shape[0]), int(shape[1])
        if h % 8 == 0 and w % 32 == 0:
            return None  # standard sizes: exact fast path
        radii = self._bucket_radii()
        if radii is None:
            return None
        ry, rx = radii

        def up(v, r):
            b = -(-v // 64) * 64
            if 0 < b - v < r:
                b += 64
            return b

        bh, bw = up(h, ry), up(w, rx)
        if bh - h > h - 1 or bw - w > w - 1:
            return None  # too small for reflect padding: exact path
        # The streak kernel's border stitch overwrites one whole 128-lane
        # block at each edge, so it needs 3*bw >= 256 interleaved lanes
        # (bw >= 86); stay on the exact/XLA path below that.
        if "streak" in self._bucket_kinds() and bw < 128:
            return None
        return bh, bw

    def _build_bucket_program(self, bucket_shape, dtype):
        from animal_vision_tpu.ops import fused_nonuv as _fused

        spec = self.spec
        active = [e for e in spec.effects if e.enabled]
        kinds = self._bucket_kinds()
        a, s = spec.alpha, spec.s_scale
        if kinds == ():
            return lambda img, aux: (img, _fused.fused_pointwise_u8(img, a, s))
        if kinds == ("scone",):
            return lambda img, aux: (img, _fused.fused_scone_tab_u8(img, aux[0], a, s))
        if kinds == ("blur",):
            sigma = active[0].params[0]
            return lambda img, aux: (img, _fused.fused_iso_u8(img, a, s, sigma))
        chroma = active[1].params[0] if kinds == ("streak", "chroma") else None
        return lambda img, aux: (
            img,
            _fused.fused_streak_tab_u8(img, aux[0], aux[1], chroma=chroma),
        )

    def _bucket_aux(self, shape, bucket_shape):
        from animal_vision_tpu.ops import fused_nonuv as _fused

        h, bh = int(shape[0]), int(bucket_shape[0])
        active = [e for e in self.spec.effects if e.enabled]
        kinds = self._bucket_kinds()
        if kinds == ("scone",):
            gain = _fused.scone_gain(h, active[0].params)
            return (np.pad(gain, ((0, bh - h), (0, 0))),)
        if kinds in (("streak",), ("streak", "chroma")):
            params = active[0].params
            tab, mix, _ = _fused.streak_tables(
                h, params, self.spec.alpha, self.spec.s_scale,
                r_fixed=_fused.streak_fixed_radius(params),
            )
            return (
                np.pad(tab, ((0, bh - h), (0, 0))),
                np.pad(mix, ((0, bh - h), (0, 0))),
            )
        return ()

    def _build_program(self, shape, dtype):
        spec = self.spec
        fused = self._fused_fn(dtype)
        # The streak kernel's in-VMEM reflect pad requires W > pad width;
        # tiny frames fall back to the XLA path (same numerics).
        if fused is not None and any(e.kind == "streak" for e in spec.effects if e.enabled):
            # The border stitch swaps a full 128-lane block at each edge, so
            # the row must carry 3*W >= 256 lanes (W >= 86); below that the
            # XLA path runs (same numerics).
            if shape[1] < 86:
                fused = None
        if fused is not None:
            return lambda image: (image, fused(image))

        matrix = color.collapse_lms_matrix(spec.alpha, spec.s_scale)

        def fn(image):
            norm = color.normalize_image(image)
            lin = color.srgb_to_linear(norm)
            out = color.apply_color_matrix(lin, matrix)
            for e in spec.effects:
                out = _apply_effect(out, e)
            return image, color.encode_output(out, dtype)

        return fn


class Cat(Animal):
    """Cat: center-zoomed human baseline + wide binocular cat view.

    Parity: the Tina-animals branch of animals/cat.py (lines 73-103, the
    intended conflict resolution per SURVEY.md §0): human branch is
    center_zoom(original) with zoom scale from the FOV ratio; cat branch is
    normalize -> binocular warp (in sRGB 0..1!) -> linear -> explicit LMS
    merge alpha=0.5 -> LMS->RGB -> blur sigma=1.0 -> encode.
    """

    CAMERA_HFOV_DEG = 100.0
    PER_EYE_HALF_FOV_DEG = 105.0
    OVERLAP_DEG = 40.0
    CAT_TO_HUMAN_RATIO = 1.30
    ENABLE_FOV_WARP = True

    #: explicit-LMS merge as one 3x3: pixels @ (A.T Dm.T B.T) == pixels @ M.T
    #: with M = B @ Dm @ A (A=RGB->LMS f32, B=LMS->RGB f64 — reference dtypes).
    @staticmethod
    def _merge_matrix() -> np.ndarray:
        d_merge = np.array(
            [[0.5, 0.5, 0.0], [0.5, 0.5, 0.0], [0.0, 0.0, 1.0]], dtype=np.float32
        )
        return color.M_LMS_TO_RGB @ d_merge @ color.M_RGB_TO_LMS

    def _build_program(self, shape, dtype):
        h, w = int(shape[0]), int(shape[1])
        scale = geometry.zoom_scale_from_fov_ratio(
            self.CAMERA_HFOV_DEG, self.PER_EYE_HALF_FOV_DEG, self.CAT_TO_HUMAN_RATIO
        )
        is_int = np.issubdtype(dtype, np.integer)

        # The warp's source columns and blend weights depend only on x, so
        # both geometry stages are exact column/row matrices applied on the
        # MXU (3-pass bf16 ~= f32) — gathers at 1080p cost ~100 ms on TPU.
        from animal_vision_tpu.core import linalg

        cw = max(1, int(np.round(w / scale)))
        ch = max(1, int(np.round(h / scale)))
        x0, y0 = (w - cw) // 2, (h - ch) // 2
        zoom_rows = geometry.resize_matrix(ch, h).T  # (H_out, ch)
        zoom_cols = geometry.resize_matrix(cw, w)  # (cw, W_out)
        warp_l, warp_r = geometry.binocular_warp_matrices(
            w, w, self.CAMERA_HFOV_DEG, self.PER_EYE_HALF_FOV_DEG, self.OVERLAP_DEG
        )
        merge = tuple(map(tuple, self._merge_matrix()))

        def fn(image):
            # Human branch: center zoom (crop + bilinear resize as matrices).
            # uint8 frames feed the first contraction directly (bf16-exact,
            # einsum_3pass skips the zero low half -> one fewer MXU pass).
            f = image if is_int else image.astype(jnp.float32)
            crop = f[y0 : y0 + ch, x0 : x0 + cw]
            zoomed = linalg.apply_w_matrix(linalg.apply_h_matrix(crop, zoom_rows), zoom_cols)
            if is_int:
                human = jnp.clip(zoomed + 0.5, 0, 255).astype(dtype)
            else:
                human = zoomed.astype(dtype)

            # Cat branch from the ORIGINAL frame. Per-eye banded matrices:
            # applying the combined matrix densely would contract the whole
            # gap between the eyes' source regions.
            if is_int and self.ENABLE_FOV_WARP:
                # normalize_image's clip is a no-op for integer frames and
                # its data-dependent 1/255 commutes past the linear warp:
                # warp the raw uint8 (exact 2-pass matmuls, no f32
                # normalize round-trip through HBM), scale after.
                scale = jnp.where(
                    jnp.max(image) > 1, jnp.float32(1.0 / 255.0), jnp.float32(1.0)
                )
                srgb01 = jnp.clip(
                    (
                        linalg.apply_w_matrix(image, warp_l)
                        + linalg.apply_w_matrix(image, warp_r)
                    )
                    * scale,
                    0.0,
                    1.0,
                )
            else:
                srgb01 = color.normalize_image(image)
                if self.ENABLE_FOV_WARP:
                    srgb01 = jnp.clip(
                        linalg.apply_w_matrix(srgb01, warp_l)
                        + linalg.apply_w_matrix(srgb01, warp_r),
                        0.0,
                        1.0,
                    )

            if np.dtype(dtype) == np.uint8:
                from animal_vision_tpu.ops import fused_nonuv as _fused

                out = _fused.fused_matrix_blur(srgb01, merge, 1.0, assume01=True)
                return human, out

            lin = color.srgb_to_linear(srgb01)
            out = color.apply_color_matrix(lin, self._merge_matrix().astype(np.float32))
            out = blur.gaussian_blur_hwc(out, 1.0)
            return human, color.encode_output(out, dtype)

        return fn
