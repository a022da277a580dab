"""Padded-bucket dynamic shapes for the UV + MST-provider paths (VERDICT
round-2 next #3; SURVEY.md §7 hard-part 5; mirrors the non-UV tests at
test_species_nonuv.py:95-125).

Exactness model: resize/warp tables carry reflect-101 mirror rows (table-
exact padding), global percentiles are masked to the real region
(core.bucketctx), and the per-species ``bucket_pad_min`` absorbs the
conv-border corruption growing inward from the bucket edge — so the
analytic UV species reproduce their exact-path output to <= 1 uint8 LSB.
The MST-provider path is the exception: spectral attention takes global
statistics over the padded frame, so its bucket output is a close
approximation (asserted >= 28 dB), not bit-parity.
"""

import numpy as np
import pytest

from animal_vision_tpu.species.uv.goldfish import Goldfish
from animal_vision_tpu.species.uv.kestrel import Kestrel

# two unaligned shapes that share one (192, 256) bucket under pad_min=48
SHAPES = [(107, 205, 3), (101, 197, 3)]


def _noise_img(shape, seed=7):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


def _exact(cls):
    a = cls()
    a.bucketable = False  # instance override: force per-shape compilation
    return a


@pytest.mark.parametrize("cls", [Goldfish, Kestrel])
def test_uv_bucketed_shapes_share_one_program(cls):
    animal = cls()
    exact = _exact(cls)
    for i, shape in enumerate(SHAPES):
        img = _noise_img(shape, seed=i)
        base, out = animal.visualize(img)
        base_ref, ref = exact.visualize(img)
        assert out.shape == ref.shape == shape
        assert np.abs(base.astype(int) - base_ref.astype(int)).max() <= 1, shape
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1, (cls.__name__, shape)
    bucket_keys = [k for k in animal._programs if k[0] == "bucket"]
    assert len(bucket_keys) == 1, bucket_keys
    assert len(animal._programs) == 1  # no exact program was compiled


def test_uv_aligned_shapes_keep_exact_path():
    """Standard shapes (h%8==0, w%32==0) never pad: exact per-shape program."""
    animal = Goldfish()
    img = _noise_img((64, 96, 3))
    animal.visualize(img)
    assert all(k[0] != "bucket" for k in animal._programs)


def test_uv_bucketed_executor_no_recompile():
    """A mid-stream resolution change reuses the compiled bucket program."""
    from animal_vision_tpu.pipeline.executor import StreamingExecutor

    animal = Goldfish()
    outs = []
    for i, shape in enumerate(SHAPES):
        ex = StreamingExecutor(animal, batch=2, split=False)
        frames = [_noise_img(shape, seed=10 + i + j) for j in range(3)]
        n = ex.run(iter(frames), outs.append)
        assert n == 3
    assert len([k for k in animal._programs if k[0] == "bucket"]) == 1
    assert outs[0].shape == SHAPES[0] and outs[-1].shape == SHAPES[1]


def test_mst_provider_bucketed():
    """attach_mst on a bucketable species: one program across two shapes;
    the model sees the padded small frame, so parity is approximate (its
    attention stats include the mirror padding) but high."""
    from animal_vision_tpu.models.providers import attach_mst

    animal = attach_mst(Goldfish())
    exact = attach_mst(_exact(Goldfish))
    psnrs = []
    for i, shape in enumerate(SHAPES):
        img = _noise_img(shape, seed=20 + i)
        _, out = animal.visualize(img)
        _, ref = exact.visualize(img)
        assert out.shape == ref.shape == shape
        err = (out.astype(np.float64) - ref.astype(np.float64)) / 255.0
        mse = float(np.mean(err * err))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    assert len([k for k in animal._programs if k[0] == "bucket"]) == 1
    assert min(psnrs) >= 28.0, psnrs
