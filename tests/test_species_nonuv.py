"""End-to-end golden tests: every non-UV species vs the reference oracle.

Acceptance per BASELINE.json: PSNR >= 40 dB vs the CPU reference. The fused
JAX pipelines actually land far tighter (sub-LSB for uint8)."""

import numpy as np
import pytest

import oracles
from animal_vision_tpu.species import NON_UV_NAMES, get_animal
from animal_vision_tpu.species.nonuv import NONUV_SPECS


def _spec_effects(spec):
    return [(e.kind, e.params) for e in spec.effects if e.enabled]


@pytest.mark.parametrize("name", sorted(NONUV_SPECS))
def test_nonuv_species_uint8_golden(name, img_u8, psnr_fn):
    spec = NONUV_SPECS[name]
    base_ref, out_ref = oracles.nonuv_pipeline(
        img_u8, spec.alpha, spec.s_scale, _spec_effects(spec)
    )
    animal = get_animal(name)
    base, out = animal.visualize(img_u8)
    np.testing.assert_array_equal(base, base_ref)  # baseline is the input
    assert out.dtype == np.uint8
    p = psnr_fn(out.astype(np.float64) / 255, out_ref.astype(np.float64) / 255)
    assert p > 40.0, f"{name}: PSNR {p:.2f} dB"
    # stronger: sub-LSB agreement
    assert np.abs(out.astype(int) - out_ref.astype(int)).max() <= 1, name


@pytest.mark.parametrize("name", ["dog", "horse", "rat", "pig"])
def test_nonuv_species_float_golden(name, img_f32, psnr_fn):
    spec = NONUV_SPECS[name]
    _, out_ref = oracles.nonuv_pipeline(
        img_f32, spec.alpha, spec.s_scale, _spec_effects(spec)
    )
    _, out = get_animal(name).visualize(img_f32)
    assert out.dtype == np.float32
    assert psnr_fn(out, out_ref) > 40.0
    np.testing.assert_allclose(out, out_ref, atol=1e-4)


def test_pig_is_matrix_only(img_u8):
    """Parity pin: pig's post-effects are no-ops in the reference."""
    spec = NONUV_SPECS["pig"]
    _, matrix_only = oracles.nonuv_pipeline(img_u8, spec.alpha, spec.s_scale, [])
    _, out = get_animal("pig").visualize(img_u8)
    assert np.abs(out.astype(int) - matrix_only.astype(int)).max() <= 1


def test_cat_golden(img_u8, psnr_fn):
    human_ref, cat_ref = oracles.cat_pipeline(img_u8)
    human, cat = get_animal("cat").visualize(img_u8)
    assert human.dtype == np.uint8 and cat.dtype == np.uint8
    p_h = psnr_fn(human.astype(np.float64) / 255, human_ref.astype(np.float64) / 255)
    p_c = psnr_fn(cat.astype(np.float64) / 255, cat_ref.astype(np.float64) / 255)
    assert p_h > 40.0, f"human branch PSNR {p_h:.2f}"
    assert p_c > 40.0, f"cat branch PSNR {p_c:.2f}"


def test_batched_matches_single(img_u8):
    animal = get_animal("dog")
    batch = np.stack([img_u8, img_u8[::-1].copy()])
    base_b, out_b = animal.visualize_batch(batch)
    _, out0 = animal.visualize(img_u8)
    _, out1 = animal.visualize(img_u8[::-1].copy())
    np.testing.assert_array_equal(out_b[0], out0)
    np.testing.assert_array_equal(out_b[1], out1)
    np.testing.assert_array_equal(base_b, batch)


def test_registry_covers_all_nonuv():
    assert len(NON_UV_NAMES) == 20
    for n in NON_UV_NAMES:
        assert get_animal(n) is get_animal(n)  # cached singleton


# -- shape bucketing (SURVEY.md §7 hard-part 5) ------------------------------


def _fresh(name):
    from animal_vision_tpu.species.nonuv import NonUVAnimal

    return NonUVAnimal(NONUV_SPECS[name])


def _noise_img(shape, seed=7):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("name", ["horse", "rabbit", "dog", "rat", "pig"])
def test_bucketed_shapes_share_one_program(name):
    """Two nearby unaligned shapes pad into ONE bucket program, and the
    output stays sub-LSB vs the cv2 oracle (the reflect-101 host pad makes
    every in-frame pixel's conv borders exact)."""
    animal = _fresh(name)
    spec = NONUV_SPECS[name]
    for i, shape in enumerate([(107, 205, 3), (101, 213, 3)]):
        img = _noise_img(shape, seed=i)
        base, out = animal.visualize(img)
        np.testing.assert_array_equal(base, img)
        _, ref = oracles.nonuv_pipeline(img, spec.alpha, spec.s_scale, _spec_effects(spec))
        assert out.shape == ref.shape
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1, (name, shape)
    bucket_keys = [k for k in animal._programs if k[0] == "bucket"]
    assert len(bucket_keys) == 1, bucket_keys
    assert len(animal._programs) == 1  # no exact program was compiled


def test_bucketed_executor_no_recompile():
    """A mid-stream resolution change reuses the compiled bucket program
    (the executor path goes through visualize_batch_device)."""
    from animal_vision_tpu.pipeline.executor import StreamingExecutor

    animal = _fresh("horse")
    outs = []
    for i, shape in enumerate([(107, 205, 3), (101, 213, 3)]):
        ex = StreamingExecutor(animal, batch=2, split=False)
        frames = [_noise_img(shape, seed=10 + i + j) for j in range(3)]
        n = ex.run(iter(frames), outs.append)
        assert n == 3
    assert len([k for k in animal._programs if k[0] == "bucket"]) == 1
    assert outs[0].shape == (107, 205, 3) and outs[-1].shape == (101, 213, 3)


@pytest.mark.parametrize("shape", [(64, 64, 3), (50, 50, 3), (64, 85, 3), (64, 86, 3), (48, 100, 3)])
def test_narrow_streak_frames(shape, psnr_fn):
    """Regression (round-2 advisor, medium): the streak kernel's border
    stitch needs 3*W >= 256 lanes; frames 64-85 px wide (or 33-63 px ones
    bucketed up to 64) used to crash at trace time. They must route to the
    XLA path below W=86 and stay sub-LSB on either path."""
    spec = NONUV_SPECS["horse"]
    img = _noise_img(shape)
    _, out_ref = oracles.nonuv_pipeline(img, spec.alpha, spec.s_scale, _spec_effects(spec))
    _, out = _fresh("horse").visualize(img)
    assert out.shape == shape
    assert np.abs(out.astype(int) - out_ref.astype(int)).max() <= 1


def test_aligned_shapes_keep_exact_path(img_u8):
    """Standard shapes (h%8==0, w%32==0 — the 64x96 fixture, 1080p, 720p)
    never pad: they compile the exact per-shape program."""
    animal = _fresh("horse")
    animal.visualize(img_u8)
    assert not [k for k in animal._programs if k[0] == "bucket"]
