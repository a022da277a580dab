"""Graceful degradation for over-budget frames (VERDICT round-2 next #8).

The reference degrades by resolution on CUDA OOM
(predict_torch.py:199-242: try full frame, fall 1024 -> 768 -> ... -> 256
on the longest side). Under XLA's static HBM planning the trigger is a
compile/run RESOURCE_EXHAUSTED (or the explicit ANIMAL_VISION_MAX_PIXELS
budget); the response is the same ladder: INTER_AREA downscale, process,
INTER_LINEAR upscale.
"""

import numpy as np
import pytest

from animal_vision_tpu.species import get_animal


def _img(h, w, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_pixel_budget_takes_ladder(monkeypatch):
    """An absurd aspect ratio over the pixel budget completes via the
    ladder with full-size output and sane quality."""
    monkeypatch.setenv("ANIMAL_VISION_MAX_PIXELS", "200000")
    animal = get_animal("dog")
    img = _img(300, 4000)
    base, out = animal.visualize(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert base.shape == img.shape
    # no full-resolution program was compiled
    assert all(k[1][:2] != (300, 4000) if k[0] != "bucket" else True
               for k in animal._programs if isinstance(k[1], tuple))

    # quality: the ladder output approximates the exact full-res result
    monkeypatch.delenv("ANIMAL_VISION_MAX_PIXELS")
    exact = get_animal("dog")
    _, ref = exact.visualize(img)
    err = (out.astype(np.float64) - ref.astype(np.float64)) / 255.0
    psnr = 10 * np.log10(1.0 / max(float(np.mean(err * err)), 1e-12))
    assert psnr > 20.0, psnr


def test_oom_exception_takes_ladder(monkeypatch):
    """A RESOURCE_EXHAUSTED from the exact path falls down the ladder."""
    animal = get_animal("horse")
    orig = animal._visualize_exact

    def flaky(image):
        if image.shape[0] * image.shape[1] > 300_000:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory in HBM")
        return orig(image)

    # setattr via monkeypatch: the registry animal is a shared singleton,
    # so the patch must not leak into later tests.
    monkeypatch.setattr(animal, "_visualize_exact", flaky)
    img = _img(900, 1700, seed=5)
    base, out = animal.visualize(img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_exhausted_ladder_raises(monkeypatch):
    """When even the smallest rung exceeds the budget, fail loudly."""
    monkeypatch.setenv("ANIMAL_VISION_MAX_PIXELS", "100")
    animal = get_animal("dog")
    with pytest.raises(MemoryError):
        animal.visualize(_img(2000, 3000))


def test_non_oom_errors_propagate(monkeypatch):
    animal = get_animal("dog")

    def broken(image):
        raise ValueError("not an oom")

    monkeypatch.setattr(animal, "_visualize_exact", broken)
    with pytest.raises(ValueError):
        animal.visualize(_img(64, 96))
