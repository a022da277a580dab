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


class Animal(abc.ABC):
    """Base class for all species simulators."""

    #: set by subclasses: builds (baseline_fn, transform_fn) given static
    #: (shape, dtype); see _build_program.

    def __init__(self) -> None:
        self._programs: dict = {}

    # -- to be provided by subclasses ------------------------------------
    @abc.abstractmethod
    def _build_program(
        self, shape: tuple[int, ...], dtype: np.dtype
    ) -> Callable[[jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]]:
        """Return a function (device image) -> (baseline, transformed) for the
        given static input shape/dtype. The returned function must be pure and
        jittable."""

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
        """Simulate this species' vision. numpy in -> numpy out."""
        assert isinstance(image, np.ndarray), "Input must be a numpy ndarray."
        assert image.ndim == 3 and image.shape[2] == 3, "Input must be HxWx3 RGB."
        prog = self._program(image.shape, image.dtype, batched=False)
        baseline, out = prog(jnp.asarray(image))
        return np.asarray(baseline), np.asarray(out)

    def visualize_batch(self, images: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batched variant over (N, H, W, 3) frames (one compiled program)."""
        baseline, out = self.visualize_batch_device(images)
        return np.asarray(baseline), np.asarray(out)

    def visualize_batch_device(self, images: np.ndarray):
        """Like visualize_batch but returns device arrays without syncing —
        the streaming executor uses this so dispatch of batch i overlaps the
        host-side encode of batch i-1."""
        assert images.ndim == 4 and images.shape[3] == 3, "Input must be NxHxWx3."
        prog = self._program(images.shape[1:], images.dtype, batched=True)
        return prog(jnp.asarray(images))

    def transform(self, shape: tuple[int, ...], dtype=np.uint8):
        """The raw jittable (image) -> (baseline, transformed) program for the
        given static shape — for composition into larger XLA programs."""
        return self._build_program(tuple(shape), np.dtype(dtype))
