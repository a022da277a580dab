"""Eval harness + export round trips (synthetic ARAD-style data)."""

import os

import numpy as np
import pytest


def test_mat_cube_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    from animal_vision_tpu.models.eval import load_mat_cube, save_mat_cube

    cube = np.random.default_rng(0).uniform(0, 1, (32, 48, 31)).astype(np.float32)
    p = str(tmp_path / "scene.mat")
    save_mat_cube(p, cube)
    back = load_mat_cube(p)
    np.testing.assert_allclose(back, cube, atol=1e-6)


def test_validate_perfect_prediction_is_inf_free(tmp_path):
    from animal_vision_tpu.models.eval import validate

    rng = np.random.default_rng(1)
    scenes = [
        (rng.uniform(0, 1, (40, 40, 3)).astype(np.float32),
         rng.uniform(0.1, 1, (40, 40, 31)).astype(np.float32))
        for _ in range(2)
    ]
    # identity-ish predictor: return gt -> zero error
    gts = iter([g for _, g in scenes])
    res = validate(lambda rgb: next(gts), scenes, crop=128)
    assert res["mrae"] == 0.0 and res["rmse"] == 0.0


def test_validate_known_error():
    from animal_vision_tpu.models.eval import validate

    gt = np.full((20, 20, 4), 0.5, np.float32)
    pred = np.full((20, 20, 4), 0.55, np.float32)
    res = validate(lambda rgb: pred, [(gt[..., :3], gt)], crop=128)
    assert abs(res["mrae"] - 0.1) < 1e-5          # |0.05|/0.5
    assert abs(res["rmse"] - 0.05) < 1e-5


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from animal_vision_tpu.models.export import load_checkpoint, save_checkpoint
    from animal_vision_tpu.models.zoo import model_generator

    module, variables = model_generator("mst_plus_plus")
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, variables)
    back = load_checkpoint(p, template=variables)
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_stablehlo_export_roundtrip():
    import jax.numpy as jnp

    from animal_vision_tpu.models.export import export_stablehlo, load_stablehlo
    from animal_vision_tpu.models.zoo import model_generator

    module, variables = model_generator("mst_plus_plus")
    blob = export_stablehlo(module, variables, (1, 32, 32, 3))
    assert len(blob) > 1000
    fn = load_stablehlo(blob)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    want = np.asarray(module.apply(variables, x))
    got = np.asarray(fn(x))
    # the deserialized artifact recompiles with its own fusion decisions;
    # agreement is float-reassociation-level, not bitwise
    np.testing.assert_allclose(got, want, atol=5e-3)
    assert np.mean((got - want) ** 2) < 1e-7
