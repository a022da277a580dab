"""Photometric post-effects shared by the species pipelines.

Each function reproduces one reference op (file:line cited per function) as a
pure JAX transform over linear-RGB float32 images; static ramps/masks are
precomputed host-side so the device work is broadcasted multiply-adds that
XLA fuses into the surrounding pipeline.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur as _blur
from animal_vision_tpu.core import stats as _stats


def chroma_compression(img: jnp.ndarray, strength: float = 0.4) -> jnp.ndarray:
    """Lerp toward the per-pixel channel mean (gray).
    Parity: apply_chroma_compression (animals/animal_utils.py:174-181)."""
    gray = jnp.mean(img, axis=-1, keepdims=True)
    return gray + (img - gray) * (1.0 - strength)


def tapetum_bloom(img: jnp.ndarray, strength: float = 0.12, sigma: float = 3.0) -> jnp.ndarray:
    """Luminance-masked screen-blend bloom in linear RGB.
    Parity: apply_tapetum_bloom (animals/animal_utils.py:183-204)."""
    x = jnp.clip(img.astype(jnp.float32), 0.0, 1.0)
    lum = _stats.luminance709(x)
    mask = jnp.clip((lum - 0.4) / 0.6, 0.0, 1.0)
    mask = _blur.gaussian_blur_hw(mask, sigma)[..., None]
    blurred = _blur.gaussian_blur_hwc(x, sigma)
    screen = 1.0 - (1.0 - x) * (1.0 - blurred)
    return jnp.clip(x + strength * mask * (screen - x), 0.0, 1.0)


def s_cone_vertical_gain(
    img: jnp.ndarray,
    s_top: float = 1.0,
    s_bottom: float = 0.6,
    power: float = 1.0,
    extra_boost: float = 0.0,
    band: tuple[float, float, float] | None = None,
    clamp: bool = True,
) -> jnp.ndarray:
    """Vertical ramp gain on the blue channel (rat's dorsal S-cone bias).
    Parity: apply_s_cone_vertical_gain (animals/animal_utils.py:206-259).
    The ramp is a static (H,) constant baked at trace time."""
    h = int(img.shape[0])
    w = np.linspace(s_top, s_bottom, h, dtype=np.float32)
    if power != 1.0:
        t = (w - s_bottom) / max(1e-8, s_top - s_bottom)
        t = np.clip(t, 0.0, 1.0) ** power
        w = s_bottom + (s_top - s_bottom) * t
    if extra_boost != 0.0:
        w = 1.0 + extra_boost * (w - 1.0)
    if band is not None:
        y_center, sigma, peak = band
        yy = np.linspace(0.0, 1.0, h, dtype=np.float32)
        w = w * (1.0 + peak * np.exp(-0.5 * ((yy - y_center) / max(1e-8, sigma)) ** 2))
    gain = jnp.asarray(w)[:, None]
    blue = img[..., 2] * gain
    if clamp:
        blue = jnp.clip(blue, 0.0, 1.0)
    return jnp.concatenate([img[..., :2], blue[..., None]], axis=-1)


def rod_vision(
    img: jnp.ndarray,
    chroma_scale: float = 0.08,
    luminance_boost: float = 1.4,
    gamma: float = 0.8,
) -> jnp.ndarray:
    """Scotopic (rod-dominant) rendering: scotopic luma, blur, desaturate,
    boost, gamma. Parity: apply_rod_vision (animals/animal_utils.py:261-305)."""
    x = jnp.clip(img.astype(jnp.float32), 0.0, 1.0)
    lum = 0.1 * x[..., 0] + 0.8 * x[..., 1] + 0.1 * x[..., 2]
    lum = _blur.gaussian_blur_hw(lum, 1.2)
    gray = lum[..., None]
    x = gray * (1.0 - chroma_scale) + x * chroma_scale
    x = jnp.clip(x * luminance_boost, 0.0, 1.0)
    return x**gamma


def scatter_and_blue_bias(img: jnp.ndarray, sigma: float, blue_bias: float) -> jnp.ndarray:
    """Blur (UV-helper kernel sizing) + additive blue bias, blue clipped.
    Parity: apply_scatter_and_blue_bias (uv_helpers.py:102-108)."""
    out = img
    if sigma > 0.15:
        out = _blur.gaussian_blur_uv(out, sigma)
    blue = jnp.clip(out[..., 2] + float(blue_bias), 0.0, 1.0)
    return jnp.concatenate([out[..., :2], blue[..., None]], axis=-1)


def snow_glare_tone_compress(img: jnp.ndarray, strength: float, knee: float = 0.8) -> jnp.ndarray:
    """Soft-knee highlight compression in linear light.
    Parity: snow_glare_tone_compress (uv_helpers.py:111-121)."""
    if strength <= 0.0:
        return img
    x = jnp.clip(img, 0.0, 1.0)
    t = (x - knee) / (1.0 - knee)
    compressed = knee + (1.0 - knee) * (t / (1.0 + strength * t))
    return jnp.where(x <= knee, x, compressed)


def unsharp_mask(img: jnp.ndarray, sigma: float, amount: jnp.ndarray | float) -> jnp.ndarray:
    """img + amount * (img - blur(img)) with the UV-helper blur kernel."""
    blurred = _blur.gaussian_blur_uv(img, sigma)
    return img + amount * (img - blurred)


def dog_bandpass(x: jnp.ndarray, sigma_lo: float, sigma_hi: float) -> jnp.ndarray:
    """Difference-of-Gaussians band-pass on a 2-D map (UV-helper blurs)."""
    return _blur.gaussian_blur_uv(x, sigma_lo) - _blur.gaussian_blur_uv(x, sigma_hi)


def radial_sigmoid_mask(
    shape_hw: tuple[int, int], radius: float, softness: float
) -> np.ndarray:
    """Static (H, W) mask 1/(1+exp(-softness*(r-radius))) on the [-1,1]^2 grid
    — the UV species' peripheral-blur mask (e.g. animals/goldfish.py:165-174)."""
    h, w = shape_hw
    yy = np.linspace(-1.0, 1.0, h, dtype=np.float32)[:, None]
    xx = np.linspace(-1.0, 1.0, w, dtype=np.float32)[None, :]
    r = np.sqrt(xx * xx + yy * yy)
    return (1.0 / (1.0 + np.exp(-softness * (r - radius)))).astype(np.float32)


def peripheral_blur(
    img: jnp.ndarray, sigma: float, radius: float, softness: float
) -> jnp.ndarray:
    """Radial blend with an extra-blurred copy (sharp center, soft edges).

    Under an active bucket context the mask comes from the REAL frame's
    reflected coordinates (core.bucketctx), so a padded-bucket program
    reproduces the exact geometry."""
    from animal_vision_tpu.core import bucketctx

    if sigma <= 0.0:
        return img
    soft = _blur.gaussian_blur_uv(img, sigma)
    ctx = bucketctx.current()
    if ctx is not None and (int(img.shape[0]), int(img.shape[1])) == (ctx.bh, ctx.bw):
        yy = ctx.norm_rows()[:, None]
        xx = ctx.norm_cols()[None, :]
        r = jnp.sqrt(xx * xx + yy * yy)
        t = 1.0 / (1.0 + jnp.exp(-softness * (r - radius)))
    else:
        t = jnp.asarray(
            radial_sigmoid_mask((int(img.shape[0]), int(img.shape[1])), radius, softness)
        )
    t = t[..., None]
    return (1.0 - t) * img + t * soft
