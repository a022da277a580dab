"""Golden tests: UV species vs NumPy/cv2 oracles (PSNR >= 40 dB acceptance)."""

import numpy as np
import pytest

import oracles_uv
from animal_vision_tpu.species import get_animal


def _check(name, oracle_fn, img, psnr_fn, min_db=40.0, check_baseline=True):
    base_ref, out_ref = oracle_fn(img)
    base, out = get_animal(name).visualize(img)
    assert out.dtype == img.dtype
    pb = psnr_fn(base.astype(np.float64) / 255, base_ref.astype(np.float64) / 255)
    po = psnr_fn(out.astype(np.float64) / 255, out_ref.astype(np.float64) / 255)
    if check_baseline:
        assert pb > min_db, f"{name} baseline PSNR {pb:.2f} dB"
    assert po > min_db, f"{name} output PSNR {po:.2f} dB"
    return pb, po


def test_goldfish_golden(img_u8, psnr_fn):
    _check("goldfish", oracles_uv.goldfish_pipeline, img_u8, psnr_fn)


def test_reindeer_golden(img_u8, psnr_fn):
    _check("reindeer", oracles_uv.reindeer_pipeline, img_u8, psnr_fn)


def test_honeybee_golden(img_u8, psnr_fn):
    base_ref, out_ref = oracles_uv.honeybee_pipeline(img_u8)
    base, out = get_animal("honeybee").visualize(img_u8)
    np.testing.assert_array_equal(base, img_u8)  # baseline is the raw input
    po = psnr_fn(out.astype(np.float64) / 255, out_ref.astype(np.float64) / 255)
    assert po > 40.0, f"honeybee PSNR {po:.2f} dB"


@pytest.mark.parametrize("mode", ["falsecolor", "uv_purple_yellow", "falsecolor_uv_mixed"])
def test_honeybee_mapping_modes(img_u8, psnr_fn, mode):
    from animal_vision_tpu.species.uv.honeybee import HoneyBee

    _, out_ref = oracles_uv.honeybee_pipeline(img_u8, mapping_mode=mode)
    _, out = HoneyBee(mapping_mode=mode).visualize(img_u8)
    po = psnr_fn(out.astype(np.float64) / 255, out_ref.astype(np.float64) / 255)
    assert po > 40.0, f"honeybee[{mode}] PSNR {po:.2f} dB"


def test_classic_hsi_cube_matches_oracle(img_f32):
    import jax.numpy as jnp

    from animal_vision_tpu.spectral.classic import classic_rgb_to_hsi

    lam = np.linspace(400.0, 700.0, 31, dtype=np.float32)
    want = oracles_uv.classic_rgb_to_hsi(img_f32, lam)
    got = np.asarray(classic_rgb_to_hsi(jnp.asarray(img_f32), lam))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_fused_band_matrix_equals_cube_then_integrate(img_f32):
    import jax.numpy as jnp

    from animal_vision_tpu.species.uv.common import band_weight_columns, compute_band_maps

    lam = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    specs = [(320.0, 400.0), (500.0, 570.0)]
    maps = np.asarray(
        compute_band_maps(jnp.asarray(img_f32), lam, band_weight_columns(lam, specs), 0.0)
    )
    hsi = oracles_uv.classic_rgb_to_hsi(img_f32, lam)
    for i, (lo, hi) in enumerate(specs):
        want = oracles_uv.integrate_band(hsi, lam, lo, hi)
        np.testing.assert_allclose(maps[..., i], want, atol=1e-5)


def test_rat_uv_golden(img_u8, psnr_fn):
    _check("rat_uv", oracles_uv.rat_uv_pipeline, img_u8, psnr_fn)


def test_rat_uv_night_mode(img_u8, psnr_fn):
    from animal_vision_tpu.species.uv.rat_uv import RatUV

    dark = (img_u8 * 0.05).astype(np.uint8)  # forces median luma < 0.12
    _, out_ref = oracles_uv.rat_uv_pipeline(dark)
    _, out = get_animal("rat_uv").visualize(dark)
    po = psnr_fn(out.astype(np.float64) / 255, out_ref.astype(np.float64) / 255)
    assert po > 40.0, f"rat_uv night PSNR {po:.2f} dB"
    # explicit day/night instances agree with the forced-mode oracle
    day = RatUV(); day.mode = "day"
    _, out_ref_d = oracles_uv.rat_uv_pipeline(img_u8, mode="day")
    _, out_d = day.visualize(img_u8)
    assert psnr_fn(out_d.astype(np.float64) / 255, out_ref_d.astype(np.float64) / 255) > 40.0


def test_damselfish_golden(img_u8, psnr_fn):
    _check("damselfish", oracles_uv.damselfish_pipeline, img_u8, psnr_fn)


def test_goldfish_negative_overshoot_regression(psnr_fn):
    """The panorama warp's INTER_CUBIC overshoot makes *negative* linear
    values; the cube clamp_min(0) must be honored (it rescales the global
    saliency normalization). Black borders trigger the overshoot."""
    rng = np.random.default_rng(7)
    img = np.zeros((64, 96, 3), np.uint8)
    img[8:56, 12:84] = rng.integers(0, 256, (48, 72, 3), dtype=np.uint8)
    _, out_ref = oracles_uv.goldfish_pipeline(img)
    _, out = get_animal("goldfish").visualize(img)
    po = psnr_fn(out.astype(np.float64) / 255, out_ref.astype(np.float64) / 255)
    assert po > 40.0, f"goldfish overshoot-regression PSNR {po:.2f} dB"


def test_anableps_golden(img_u8, psnr_fn):
    _check("anableps", oracles_uv.anableps_pipeline, img_u8, psnr_fn)


def test_anchovy_golden(img_u8, psnr_fn):
    _check("anchovy", oracles_uv.anchovy_pipeline, img_u8, psnr_fn)


def test_guppy_golden(img_u8, psnr_fn):
    _check("guppy", oracles_uv.guppy_pipeline, img_u8, psnr_fn)


def test_morpho_golden(img_u8, psnr_fn):
    _check("morpho", oracles_uv.morpho_pipeline, img_u8, psnr_fn)


def test_heliconius_golden(img_u8, psnr_fn):
    _check("heliconius", oracles_uv.heliconius_pipeline, img_u8, psnr_fn)


def test_pieris_golden(img_u8, psnr_fn):
    _check("pieris", oracles_uv.pieris_pipeline, img_u8, psnr_fn)


def test_kestrel_golden(img_u8, psnr_fn):
    _check("kestrel", oracles_uv.kestrel_pipeline, img_u8, psnr_fn)


def test_mantis_shrimp_golden(img_u8, psnr_fn):
    _check("mantis_shrimp", oracles_uv.mantis_shrimp_pipeline, img_u8, psnr_fn)


def test_jumping_spider_golden(img_u8, psnr_fn):
    _check("jumping_spider", oracles_uv.jumping_spider_pipeline, img_u8, psnr_fn)


def test_dragonfly_golden(img_u8, psnr_fn):
    _check("dragonfly", oracles_uv.dragonfly_pipeline, img_u8, psnr_fn)


def test_hummingbird_golden(img_u8, psnr_fn):
    _check("hummingbird", oracles_uv.hummingbird_pipeline, img_u8, psnr_fn)


def test_registry_covers_all_36():
    from animal_vision_tpu.species import NON_UV_NAMES, UV_NAMES, UNIQUE_UV_NAMES, get_animal

    all_names = NON_UV_NAMES + UV_NAMES + UNIQUE_UV_NAMES
    assert len(all_names) == 36
    for n in all_names:
        assert get_animal(n) is not None


def test_morpho_orientation_gate_determinism(img_u8):
    """orientation_gate makes genuinely flat frames deterministic: the
    ungated reference path (PARITY.md "Chaotic sensitivity") amplifies
    sub-visible noise into arbitrary hue orientations because safe_norm
    rescales any texture to full range; the gate reads the RAW band's
    dynamic range and fades the shift to neutral on flat frames."""
    from animal_vision_tpu.species.uv.morpho import Morpho

    rng = np.random.default_rng(0)
    base = np.full((48, 64, 3), 0.5, np.float32)
    n1 = np.clip(base + rng.normal(0, 2e-4, base.shape), 0, 1).astype(np.float32)
    n2 = np.clip(base + rng.normal(0, 2e-4, base.shape), 0, 1).astype(np.float32)

    ungated = Morpho()
    _, a0 = ungated.visualize(n1)
    _, b0 = ungated.visualize(n2)
    d0 = float(np.abs(a0.astype(np.float64) - b0.astype(np.float64)).mean())

    gated = Morpho()
    gated.orientation_gate = 1e-2
    _, a1 = gated.visualize(n1)
    _, b1 = gated.visualize(n2)
    d1 = float(np.abs(a1.astype(np.float64) - b1.astype(np.float64)).mean())
    assert d1 < d0 * 0.2, (d0, d1)  # noise no longer steers the hue

    # textured input: gated ~= ungated (gate saturates open)
    _, t0 = ungated.visualize(img_u8)
    _, t1 = gated.visualize(img_u8)
    mse = np.mean((t0.astype(float) - t1.astype(float)) ** 2)
    p = 10 * np.log10(255**2 / max(1e-9, mse))
    assert p > 35.0, p
