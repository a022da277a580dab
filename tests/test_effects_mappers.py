"""Golden tests for the remaining ops: tapetum bloom, rod vision, the
UV mappers not covered by the honeybee modes, and tiled prediction."""

import cv2
import numpy as np
import jax.numpy as jnp

import oracles_uv
from animal_vision_tpu.core import effects
from animal_vision_tpu.spectral import mappers


def test_tapetum_bloom_matches_reference(img_f32):
    """animal_utils.py:183-204 behavior via cv2."""
    x = np.clip(img_f32, 0, 1)
    lum = 0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2]
    mask = np.clip((lum - 0.4) / 0.6, 0, 1)
    mask = cv2.GaussianBlur(mask, (0, 0), sigmaX=3.0, sigmaY=3.0)[..., None]
    blur = cv2.GaussianBlur(x, (0, 0), sigmaX=3.0, sigmaY=3.0)
    screen = 1.0 - (1.0 - x) * (1.0 - blur)
    want = np.clip(x + 0.12 * mask * (screen - x), 0, 1)
    got = np.asarray(effects.tapetum_bloom(jnp.asarray(img_f32), 0.12, 3.0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rod_vision_matches_reference(img_f32):
    """animal_utils.py:261-305 behavior via cv2."""
    x = np.clip(img_f32, 0, 1)
    lum = 0.1 * x[..., 0] + 0.8 * x[..., 1] + 0.1 * x[..., 2]
    lum = cv2.GaussianBlur(lum, (0, 0), sigmaX=1.2, sigmaY=1.2)
    gray = lum[..., None]
    y = gray * (1 - 0.08) + x * 0.08
    y = np.clip(y * 1.4, 0, 1) ** 0.8
    got = np.asarray(effects.rod_vision(jnp.asarray(img_f32)))
    np.testing.assert_allclose(got, y, atol=1e-5)


def test_map_uv_purple_yellow(img_f32, psnr_fn):
    u = img_f32[..., 0] * img_f32[..., 1]
    # oracle per uv_mappers.py:67-87
    denom = max(float(np.percentile(u, 99.0)), 1e-8)
    un = np.clip(u / denom, 0, 1) ** 0.85
    s2l = lambda v: np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4).astype(np.float32)
    c0 = s2l(np.array([128, 0, 150], np.float32) / 255)
    c1 = s2l(np.array([255, 225, 60], np.float32) / 255)
    want = np.clip((1 - un[..., None]) * c0 + un[..., None] * c1, 0, 1)
    got = np.asarray(mappers.map_uv_purple_yellow(jnp.asarray(u)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_map_linear_matrix(img_f32):
    u, b, g = img_f32[..., 0], img_f32[..., 1], img_f32[..., 2]
    m = np.array([[0.8, 0.1, 0.1], [0.2, 0.6, 0.2], [0.3, 0.3, 0.4]], np.float32)
    want = (np.stack([u, b, g], -1).reshape(-1, 3) @ m.T).reshape(img_f32.shape)
    got = np.asarray(mappers.map_linear_matrix(jnp.asarray(u), jnp.asarray(b), jnp.asarray(g), m))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hsv_to_rgb_matches_oracle(img_f32):
    hsv = np.stack([img_f32[..., 0], img_f32[..., 1] * 0.9, img_f32[..., 2]], -1)
    want = oracles_uv.hsv_to_rgb(hsv)
    got = np.asarray(mappers.hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_predict_tiled_hann_stitch():
    """Tiled prediction of a linear function must reproduce it exactly
    (feathered weights sum to the same combination everywhere)."""
    from animal_vision_tpu.models.tiling import predict_tiled

    rng = np.random.default_rng(0)
    frame = rng.uniform(0, 1, (100, 140, 3)).astype(np.float32)

    def apply_fn(tiles):  # (N,T,T,3) -> (N,T,T,4): a fixed linear map
        m = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
        return jnp.einsum("nhwc,cd->nhwd", tiles, m)

    out = predict_tiled(apply_fn, frame, tile=64, overlap=16, out_channels=4)
    want = frame @ np.arange(12, dtype=np.float32).reshape(3, 4)
    assert out.shape == (100, 140, 4)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_predict_tiled_small_frame():
    from animal_vision_tpu.models.tiling import predict_tiled

    frame = np.random.default_rng(1).uniform(0, 1, (40, 50, 3)).astype(np.float32)
    out = predict_tiled(lambda t: t[..., :2] * 2.0, frame, tile=64, overlap=16, out_channels=2)
    np.testing.assert_allclose(out, frame[..., :2] * 2.0, atol=1e-5)


def test_kth_order_stat_radix_exact():
    """The TPU radix-16 k-th order statistic (core.stats._kth_order_stat)
    is exact for duplicates, negatives, infs, and all k — the CPU test
    suite otherwise never exercises this path (percentile() branches to
    jnp.percentile on CPU)."""
    from animal_vision_tpu.core import stats

    rng = np.random.default_rng(7)
    cases = [
        rng.standard_normal(4097).astype(np.float32),
        np.repeat(rng.standard_normal(17).astype(np.float32), 241),
        np.concatenate([
            np.full(100, -np.inf, np.float32), np.zeros(50, np.float32),
            np.full(77, np.inf, np.float32), rng.standard_normal(500).astype(np.float32),
        ]),
        np.array([0.0, -0.0, 1e-38, -1e-38, 3.4e38, -3.4e38], np.float32),
    ]
    for x in cases:
        u = stats._f32_to_order(jnp.asarray(x))
        srt = np.sort(x)
        for k in [0, 1, len(x) // 3, len(x) - 2, len(x) - 1]:
            got = float(stats._order_to_f32(stats._kth_order_stat(u, k)))
            want = float(srt[k])
            assert got == want or (np.isnan(got) and np.isnan(want)), (k, got, want)


def test_percentile_tpu_branch_matches_numpy(monkeypatch):
    """Drive percentile()'s TPU composition (radix select + duplicate-aware
    interpolation) and _percentile_masked's TPU branch on CPU by patching
    the backend probe — np.percentile is the oracle."""
    from animal_vision_tpu.core import stats

    monkeypatch.setattr(stats.jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((41, 67)).astype(np.float32)
    dup = np.repeat(rng.standard_normal(37).astype(np.float32), 71).reshape(1, -1)
    for arr, q in [(x, 95.0), (x, 99.0), (x, 50.0), (dup, 95.0), (dup, 98.0)]:
        got = float(stats.percentile(jnp.asarray(arr), q))
        want = float(np.percentile(arr, q))
        assert abs(got - want) <= 2e-6 * max(1.0, abs(want)), (q, got, want)

    # masked: exact percentile over the valid subset with a traced count
    valid = np.zeros_like(x, dtype=bool)
    valid[:29, :53] = True
    got = float(
        stats._percentile_masked(
            jnp.asarray(x), jnp.asarray(valid), jnp.int32(int(valid.sum())), 95.0
        )
    )
    want = float(np.percentile(x[valid], 95.0))
    assert abs(got - want) <= 2e-6 * max(1.0, abs(want)), (got, want)
