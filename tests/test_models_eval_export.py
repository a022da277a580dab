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

    # MATLAB-v7.3 readability: 512-byte userblock with the \x00\x02IM
    # version/endian marker at offset 124, and MATLAB_class on the dataset
    with open(p, "rb") as f:
        head = f.read(512)
    assert head.startswith(b"MATLAB 7.3 MAT-file")
    assert head[124:128] == b"\x00\x02IM"
    with h5py.File(p, "r") as f:
        assert bytes(f["cube"].attrs["MATLAB_class"]) == b"single"


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


def test_validate_awan_protocol():
    """test.py:56-60 — AWAN compares pred[10:-10] of a [118:-118]-cropped
    input against target[128:-128]; a perfect predictor scores zero."""
    from animal_vision_tpu.models.eval import validate

    rng = np.random.default_rng(2)
    gt = rng.uniform(0.1, 1, (300, 300, 31)).astype(np.float32)
    rgb = rng.uniform(0, 1, (300, 300, 3)).astype(np.float32)

    def apply_fn(r):
        assert r.shape == (64, 64, 3)  # 300 - 2*118
        return gt[118:-118, 118:-118]

    res = validate(apply_fn, [(rgb, gt)], crop=128, awan_protocol=True)
    assert res["mrae"] == 0.0 and res["rmse"] == 0.0


def test_dataset_patch_grid_and_augment(tmp_path):
    """hsi_dataset.py parity: strided patch lattice, min-max RGB, inclusive
    rotTimes, Train_* folder layout for both splits."""
    h5py = pytest.importorskip("h5py")
    cv2 = pytest.importorskip("cv2")
    from animal_vision_tpu.models import data as mdata
    from animal_vision_tpu.models.eval import save_mat_cube

    root = tmp_path
    (root / "split_txt").mkdir()
    (root / "Train_RGB").mkdir()
    (root / "Train_Spec").mkdir()
    rng = np.random.default_rng(0)
    for stem in ("scene_a", "scene_b"):
        img = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "Train_RGB" / f"{stem}.jpg"), img)
        save_mat_cube(str(root / "Train_Spec" / f"{stem}.mat"),
                      rng.uniform(0, 1, (40, 48, 31)).astype(np.float32))
    (root / "split_txt" / "train_list.txt").write_text("scene_b\nscene_a\n")

    scenes = [s for _, s in mdata.iter_scenes(str(root), "train")]
    assert len(scenes) == 2
    assert 0.0 <= scenes[0].rgb.min() and scenes[0].rgb.max() <= 1.0

    # grid count parity: per_line=(W-crop)//stride+1, per_col likewise
    origins = list(mdata.patch_grid(40, 48, crop=16, stride=8))
    assert len(origins) == ((48 - 16) // 8 + 1) * ((40 - 16) // 8 + 1)

    batches = list(mdata.patch_batches(scenes, crop=16, stride=8, batch=4, seed=0))
    assert batches, "expected at least one batch"
    rb, hb = batches[0]
    assert rb.shape == (4, 16, 16, 3) and hb.shape == (4, 16, 16, 31)
    # one epoch covers the FULL strided grid — the tail partial batch is
    # yielded too, so total patches == 2 scenes x grid size
    total = sum(b[0].shape[0] for b in batches)
    assert total == 2 * len(origins)
    assert all(b[0].shape[0] == 4 for b in batches[:-1])

    # augmentation applies IDENTICAL geometry to rgb and cube: find the
    # (rot, vflip, hflip) that maps r->ra and check it also maps s->sa
    r = np.arange(16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    s = np.arange(16 * 16 * 2, dtype=np.float32).reshape(16, 16, 2)
    for seed in range(8):
        ra, sa = mdata.augment(r, s, np.random.default_rng(seed))
        found = False
        for k in range(4):
            for vf in (False, True):
                for hf in (False, True):
                    def tf(a):
                        a = np.rot90(a, k)
                        if vf:
                            a = a[:, ::-1]
                        if hf:
                            a = a[::-1]
                        return a
                    if np.array_equal(tf(r), ra):
                        assert np.array_equal(tf(s), sa)
                        found = True
        assert found


def test_forward_ensemble_semantics():
    """predict_code/test.py:52-80 — identity model must return the input
    exactly for both modes (all 8 inverse transforms must be exact), and
    the even-count median must pick the LOWER middle like torch.median."""
    import jax.numpy as jnp

    from animal_vision_tpu.models.ensemble import forward_ensemble

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 6, 8, 3)).astype(np.float32))
    for mode in ("mean", "median"):
        out = forward_ensemble(lambda t: t, x, mode)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-7)

    # biased model: adds a per-view marker via a global scalar; median of
    # eight values k=0..7 must be the 4th smallest (index 3), like torch
    calls = {"n": 0}

    def biased(t):
        calls["n"] += 1
        return t + float(calls["n"])

    out = forward_ensemble(biased, x, "median")
    want = np.asarray(x) + 4.0  # sorted biases 1..8 -> lower middle = 4
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_predict_image_ensemble(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from animal_vision_tpu.models.ensemble import predict_image

    p = str(tmp_path / "demo.jpg")
    cv2.imwrite(p, np.random.default_rng(0).integers(0, 255, (32, 40, 3), dtype=np.uint8))
    cube = predict_image(p, method="hscnn_plus", outf=str(tmp_path / "out"))
    assert cube.shape == (32, 40, 31)
    assert (tmp_path / "out" / "demo.mat").exists()
    assert cube.min() >= 0.0 and cube.max() <= 1.0


def test_model_summary():
    from animal_vision_tpu.models.summary import summarize

    s = summarize("mst_plus_plus", h=64, w=64)
    assert abs(s["params"] - 1_625_248) < 20_000  # ~1.62 M (BASELINE.md)
    assert s["flops"] > 1e8 or not np.isfinite(s["flops"])


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


def test_train_checkpoint_resume_eval_compose():
    """Convergence demo (VERDICT round-1 #5): small MST++ trained on
    synthetic analytic-HSI scenes gains >= +6 dB held-out PSNR over init,
    with an Orbax checkpoint + resume at the midpoint and the eval harness
    scoring the held-out scene — train/ckpt/eval compose end to end."""
    from animal_vision_tpu.models.train import convergence_demo

    out = convergence_demo(steps=40)
    assert out["resumed_step"] == 40  # step counter survived the restore
    assert out["loss_last"] < out["loss_first"] * 0.5
    gain = out["psnr_final"] - out["psnr_init"]
    assert gain >= 6.0, out


def test_fused_path_quality_at_trained_weights(monkeypatch):
    """Pin (VERDICT round-2 next #5b): the fused-MSAB path agrees with the
    f32 XLA path at >= 40 dB at weights that have actually TRAINED (not
    random init) — the quality_report's fused_vs_f32 metric as a test."""
    import jax

    from animal_vision_tpu.models.quality import fused_vs_f32_psnr
    from animal_vision_tpu.models.train import convergence_demo

    out = convergence_demo(steps=12, return_state=True)
    module, params = out["module"], out["state"].params
    monkeypatch.setenv("ANIMAL_VISION_FUSED_MSAB", "interpret")
    db = fused_vs_f32_psnr(module, params, hw=(48, 64))
    assert db >= 40.0, db
