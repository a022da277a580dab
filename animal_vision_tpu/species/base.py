"""The public Animal API and the jit-compilation machinery behind it.

Public contract parity (animals/animal.py:5-7):
    ``Animal.visualize(image) -> (baseline, transformed)``
with numpy in / numpy out, original dtype preserved (uint8 round trip is
``*255 + 0.5``), baseline = the input frame unless the species transforms
geometry (cat / UV panorama species).

TPU-first design: every species compiles to a single jitted program per
(shape, dtype) — the whole chain (normalize -> linear -> color matrix ->
effects -> encode) fuses into a few XLA kernels over HBM-resident tiles.
``visualize_batch`` vmaps the same program over a leading frame axis for the
streaming pipeline, and ``transform`` exposes the raw jittable function so
callers (bench, pipeline executor, multi-chip sharding) can compose it.
"""

from __future__ import annotations

import abc
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


class _CropView:
    """Lazy crop of a (possibly batched) padded device array: converts to a
    host array only when consumed (np.asarray), so visualize_batch_device
    keeps its no-sync contract under shape bucketing."""

    def __init__(self, dev, h: int, w: int):
        self._dev, self._h, self._w = dev, h, w

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self._dev)[..., : self._h, : self._w, :]
        return a.astype(dtype) if dtype is not None else a


def _max_pixels() -> int | None:
    """Optional pixel budget (ANIMAL_VISION_MAX_PIXELS): frames above it
    take the degradation ladder up front instead of risking a device OOM."""
    import os

    v = os.environ.get("ANIMAL_VISION_MAX_PIXELS")
    return int(v) if v else None


def _is_oom(e: Exception) -> bool:
    s = str(e)
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s or "out of memory" in s


def _host_resize(img: np.ndarray, h: int, w: int, interp: str) -> np.ndarray:
    """cv2-exact host resize (INTER_AREA down / INTER_LINEAR up — the
    reference ladder's pair, predict_torch.py:214,236); dtype preserved."""
    try:
        import cv2

        flag = cv2.INTER_AREA if interp == "area" else cv2.INTER_LINEAR
        out = cv2.resize(img, (w, h), interpolation=flag)
        return out if out.ndim == 3 else out[..., None]
    except ImportError:
        from animal_vision_tpu.core import geometry

        # This runs from the OOM degradation ladder: pin the computation to
        # the host CPU backend so recovery never allocates on the exhausted
        # accelerator (jax ships a CPU backend on every platform).
        with jax.default_device(jax.devices("cpu")[0]):
            dev = geometry.resize(jnp.asarray(img, jnp.float32), (h, w), interp)
            out = np.asarray(dev)
        if img.dtype == np.uint8:
            out = np.clip(out + 0.5, 0, 255).astype(np.uint8)
        return out.astype(img.dtype, copy=False)


class Animal(abc.ABC):
    """Base class for all species simulators."""

    #: set by subclasses: builds (baseline_fn, transform_fn) given static
    #: (shape, dtype); see _build_program.

    def __init__(self) -> None:
        self._programs: dict = {}
        self._aux_cache: dict = {}

    # -- to be provided by subclasses ------------------------------------
    @abc.abstractmethod
    def _build_program(
        self, shape: tuple[int, ...], dtype: np.dtype
    ) -> Callable[[jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]]:
        """Return a function (device image) -> (baseline, transformed) for the
        given static input shape/dtype. The returned function must be pure and
        jittable."""

    # -- shape bucketing (SURVEY.md §7 hard-part 5) ------------------------
    # Species that support it override _bucket_plan/_build_bucket_program/
    # _bucket_aux; the default is exact per-shape compilation.
    def _bucket_plan(self, shape, dtype):
        """Return (bucket_h, bucket_w) for a frame shape that should share a
        padded-bucket program, or None for exact per-shape compilation."""
        return None

    def _build_bucket_program(self, bucket_shape, dtype):
        """Return fn(padded_image, aux) -> (baseline, out) for the bucket
        shape; ``aux`` is the pytree from _bucket_aux (host tables computed
        for the REAL shape, padded to the bucket)."""
        raise NotImplementedError

    def _bucket_aux(self, shape, bucket_shape):
        return ()

    def _bucket_call(self, images: np.ndarray, batched: bool):
        """Pad to the bucket with reflect-101 (exact for the conv borders of
        every in-frame output pixel), run the shared bucket program, return
        (device result, real_h, real_w)."""
        shape = images.shape[1:] if batched else images.shape
        bh, bw = self._bucket_plan(shape, images.dtype)
        h, w = shape[0], shape[1]
        spatial = ((0, bh - h), (0, bw - w), (0, 0))
        pad = (((0, 0),) + spatial) if batched else spatial
        padded = np.pad(images, pad, mode="reflect")

        key = ("bucket", (bh, bw, 3), np.dtype(images.dtype).str, batched)
        prog = self._programs.get(key)
        if prog is None:
            fn = self._build_bucket_program((bh, bw, 3), np.dtype(images.dtype))
            if batched:
                fn = jax.vmap(fn, in_axes=(0, None))
            prog = jax.jit(fn)
            self._programs[key] = prog

        akey = (tuple(shape), bh, bw)
        aux = self._aux_cache.get(akey)
        if aux is None:
            aux = jax.tree.map(jnp.asarray, self._bucket_aux(shape, (bh, bw, 3)))
            self._aux_cache[akey] = aux
        return prog(jnp.asarray(padded), aux), h, w

    # -- public API -------------------------------------------------------
    def _program(self, shape: tuple[int, ...], dtype: np.dtype, batched: bool):
        key = (shape, np.dtype(dtype).str, batched)
        prog = self._programs.get(key)
        if prog is None:
            fn = self._build_program(shape, np.dtype(dtype))
            if batched:
                fn = jax.vmap(fn)
            prog = jax.jit(fn)
            self._programs[key] = prog
        return prog

    def visualize(self, image: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Simulate this species' vision. numpy in -> numpy out.

        Frames over the HBM plan degrade gracefully instead of failing: on a
        device OOM (or above ``ANIMAL_VISION_MAX_PIXELS``) the frame runs
        the reference's resolution ladder — downscale to the largest rung
        that fits, process, upscale the result
        (predict_torch.py:199-242's capability under XLA's static planning)."""
        assert isinstance(image, np.ndarray), "Input must be a numpy ndarray."
        assert image.ndim == 3 and image.shape[2] == 3, "Input must be HxWx3 RGB."
        budget = _max_pixels()
        if budget and image.shape[0] * image.shape[1] > budget:
            return self._visualize_degraded(image, budget)
        try:
            return self._visualize_exact(image)
        except Exception as e:  # noqa: BLE001 — only OOMs are retried
            if not _is_oom(e):
                raise
            return self._visualize_degraded(image, budget)

    def _visualize_exact(self, image: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if self._bucket_plan(image.shape, image.dtype) is not None:
            (baseline, out), h, w = self._bucket_call(image, batched=False)
            return np.asarray(baseline)[:h, :w], np.asarray(out)[:h, :w]
        prog = self._program(image.shape, image.dtype, batched=False)
        baseline, out = prog(jnp.asarray(image))
        return np.asarray(baseline), np.asarray(out)

    #: longest-side rungs of the degradation ladder (predict_torch.py:210).
    DEGRADE_LADDER = (1024, 768, 512, 384, 256)

    def _visualize_degraded(self, image: np.ndarray, budget: int | None):
        h, w = int(image.shape[0]), int(image.shape[1])
        for side in self.DEGRADE_LADDER:
            if side >= max(h, w):
                continue
            scale = side / max(h, w)
            sh = max(1, int(round(h * scale)))
            sw = max(1, int(round(w * scale)))
            if budget and sh * sw > budget:
                continue
            small = _host_resize(image, sh, sw, "area")
            try:
                base_s, out_s = self._visualize_exact(small)
            except Exception as e:  # noqa: BLE001
                if not _is_oom(e):
                    raise
                continue
            return (
                _host_resize(base_s, h, w, "linear"),
                _host_resize(out_s, h, w, "linear"),
            )
        raise MemoryError(
            f"frame {h}x{w} exceeds the HBM plan at every ladder rung "
            f"{self.DEGRADE_LADDER}"
        )

    def visualize_batch(self, images: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batched variant over (N, H, W, 3) frames (one compiled program)."""
        baseline, out = self.visualize_batch_device(images)
        return np.asarray(baseline), np.asarray(out)

    def visualize_batch_device(self, images: np.ndarray):
        """Like visualize_batch but returns device arrays without syncing —
        the streaming executor uses this so dispatch of batch i overlaps the
        host-side encode of batch i-1. Under shape bucketing the returned
        pair are lazy crop views (np.asarray-able, still unsynced)."""
        assert images.ndim == 4 and images.shape[3] == 3, "Input must be NxHxWx3."
        if self._bucket_plan(images.shape[1:], images.dtype) is not None:
            (baseline, out), h, w = self._bucket_call(images, batched=True)
            return _CropView(baseline, h, w), _CropView(out, h, w)
        prog = self._program(images.shape[1:], images.dtype, batched=True)
        return prog(jnp.asarray(images))

    def transform(self, shape: tuple[int, ...], dtype=np.uint8):
        """The raw jittable (image) -> (baseline, transformed) program for the
        given static shape — for composition into larger XLA programs."""
        return self._build_program(tuple(shape), np.dtype(dtype))
