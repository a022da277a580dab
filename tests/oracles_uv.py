"""NumPy/OpenCV oracles for the UV pipelines (reference behavior).

The reference's UV species are unrunnable in this environment (the analytic
spectral path needs CUDA; the CPU path needs colour-science), so these
oracles reimplement the documented behavior (SURVEY.md §2.5-2.7 + direct
reading of each animals/*.py) with NumPy + cv2, including the quirks:
the analytic upsampler's BGR-named-but-RGB-fed channel reversal and the
double linearization of already-linear converter input.
"""

from __future__ import annotations

import cv2
import numpy as np

import oracles as base  # non-UV oracle helpers (srgb curves etc.)

EPS = 1e-8


# -------------------- uv_helpers parity --------------------

def to_float01(x):
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 255.0
    y = x.astype(np.float32)
    if y.max() > 1.001:
        y = np.clip(y / 255.0, 0.0, 1.0)
    return y


def from_float01(img01, dtype):
    if np.issubdtype(dtype, np.integer):
        return np.clip(img01 * 255.0 + 0.5, 0.0, 255.0).astype(dtype)
    return img01.astype(dtype)


def srgb_to_linear(s):
    return base.srgb_to_linear(s).astype(np.float32)


def linear_to_srgb(l):
    a = 0.055
    return np.where(
        l <= 0.0031308, l * 12.92, (1 + a) * np.power(np.clip(l, 0.0, None), 1 / 2.4) - a
    ).astype(np.float32)


def safe_norm(x):
    x = x.astype(np.float32)
    mn, mx = float(x.min()), float(x.max())
    if mx - mn < 1e-9:
        return np.zeros_like(x)
    return (x - mn) / (mx - mn)


def gaussian_blur(img, sigma):
    if sigma <= 0:
        return img
    k = int(2 * np.ceil(3 * sigma) + 1)
    return cv2.GaussianBlur(img, (k, k), sigmaX=sigma, sigmaY=sigma, borderType=cv2.BORDER_REFLECT101)


def panorama_warp(img_lin, scale_x):
    if abs(scale_x - 1.0) < 1e-3:
        return img_lin
    h, w = img_lin.shape[:2]
    new_w = max(2, int(round(w * scale_x)))
    widened = cv2.resize(img_lin, (new_w, h), interpolation=cv2.INTER_CUBIC)
    if new_w == w:
        return widened
    start = (new_w - w) // 2
    return widened[:, start : start + w]


def bandpass_weights(lambdas, lo, hi):
    wl = lambdas.astype(np.float32)
    w = np.zeros_like(wl)
    mask = (wl >= lo) & (wl <= hi)
    if not np.any(mask):
        return np.ones_like(wl) / wl.size
    x = (wl[mask] - lo) / (hi - lo)
    w[mask] = 0.5 * (1.0 - np.cos(2.0 * np.pi * x))
    s = float(w.sum())
    return w / s if s > 1e-12 else np.ones_like(wl) / wl.size


def integrate_band(hsi, lambdas, lo, hi):
    return np.tensordot(hsi, bandpass_weights(lambdas, lo, hi), axes=([2], [0])).astype(np.float32)


def integrate_uv(hsi, lambdas, lo, hi):
    return safe_norm(integrate_band(hsi, lambdas, lo, hi))


def snow_glare_tone_compress(img, strength, knee=0.8):
    if strength <= 0:
        return img
    x = np.clip(img, 0.0, 1.0)
    below = x <= knee
    y = np.empty_like(x)
    y[below] = x[below]
    t = (x[~below] - knee) / (1.0 - knee)
    y[~below] = knee + (1.0 - knee) * (t / (1.0 + strength * t))
    return y


def apply_scatter_and_blue_bias(img, sigma, blue_bias):
    out = img.copy()
    if sigma > 0.15:
        out = gaussian_blur(out, sigma)
    out[..., 2] = np.clip(out[..., 2] + blue_bias, 0.0, 1.0)
    return out


def d65_like(lam):
    x = (lam - 560.0) / 50.0
    b = np.exp(-0.5 * x**2) + 0.3 * np.exp(-0.5 * ((lam - 450.0) / 35.0) ** 2)
    return (b / b.mean()).astype(np.float32)


# -------------------- analytic RGB->HSI (GPU-path behavior) --------------------

def classic_rgb_to_hsi(frame, wavelengths):
    """The CUDA analytic path's math (classic_rgb_to_hsi.py:47-82) in NumPy:
    linearize, three Gaussian lobes with the BGR-named channel assignment
    (channel 0 -> 460 nm, channel 2 -> 610 nm), mean-normalized, clamped."""
    wl = wavelengths.astype(np.float32)
    t = srgb_to_linear(frame.astype(np.float32))
    c0, c1, c2 = t[..., 0], t[..., 1], t[..., 2]
    g_r = np.exp(-0.5 * ((wl - 610.0) / 60.0) ** 2)
    g_g = np.exp(-0.5 * ((wl - 545.0) / 60.0) ** 2)
    g_b = np.exp(-0.5 * ((wl - 460.0) / 55.0) ** 2)
    spec = (
        g_r[None, None, :] * c2[..., None]
        + g_g[None, None, :] * c1[..., None]
        + g_b[None, None, :] * c0[..., None]
    )
    denom = (g_r + g_g + g_b).mean()
    spec = spec / (denom + 1e-8)
    return np.maximum(spec, 0.0).astype(np.float32)


def _resize_multichannel(arr, size_wh, interp):
    """cv2.resize for arbitrary channel counts (OpenCV 5 caps channels; the
    reference ran on OpenCV 4 where 81/129-channel resize worked directly).
    Resizing channel chunks is numerically identical (per-channel op)."""
    if arr.ndim == 2 or arr.shape[2] <= 4:
        return cv2.resize(arr, size_wh, interpolation=interp)
    chunks = [
        cv2.resize(arr[..., i : i + 4], size_wh, interpolation=interp)
        for i in range(0, arr.shape[2], 4)
    ]
    chunks = [c if c.ndim == 3 else c[..., None] for c in chunks]
    return np.concatenate(chunks, axis=2)


def classic_rgb_to_hsi_scaled(rgb01, wavelengths, scale):
    h, w = rgb01.shape[:2]
    hs = max(1, int(round(h * scale)))
    ws = max(1, int(round(w * scale)))
    small = cv2.resize(rgb01.astype(np.float32), (ws, hs), interpolation=cv2.INTER_AREA)
    hsi_small = classic_rgb_to_hsi(small, wavelengths)
    return _resize_multichannel(hsi_small, (w, h), cv2.INTER_LINEAR)


def hsi_for(frame_lin, lambdas, hsi_scale):
    if 0.0 < hsi_scale < 1.0:
        return classic_rgb_to_hsi_scaled(frame_lin, lambdas, hsi_scale)
    return classic_rgb_to_hsi(frame_lin, lambdas)


# -------------------- uv_mappers parity --------------------

def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = np.floor(h * 6.0).astype(np.int32)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    im = i % 6
    r = np.select([im == k for k in range(6)], [v, q, p, p, t, v], default=0)
    g = np.select([im == k for k in range(6)], [t, v, v, q, p, p], default=0)
    b = np.select([im == k for k in range(6)], [p, p, t, v, v, q], default=0)
    return np.stack([r, g, b], axis=2)


def map_falsecolor(u, b, g):
    n95 = lambda x: x / max(float(np.percentile(x, 95.0)), EPS)
    un, bn, gn = n95(u), n95(b), n95(g)
    return np.clip(
        np.stack([0.85 * un + 0.10 * gn, 0.80 * gn + 0.20 * bn, 0.70 * bn + 0.40 * un], axis=2),
        0.0,
        1.0,
    ).astype(np.float32)


def map_opponent(u, b, g):
    o1, o2 = g - b, b - u
    lum = (u + b + g) / 3.0
    hue = (np.arctan2(o2, o1) + np.pi) / (2 * np.pi)
    radius = np.sqrt(o1 * o1 + o2 * o2)
    sat = radius / (np.percentile(radius, 95.0) + EPS)
    val = lum / (np.percentile(lum, 95.0) + EPS)
    return hsv_to_rgb(np.stack([hue, np.clip(sat, 0, 1), np.clip(val, 0, 1)], axis=2)).astype(np.float32)


def map_uv_purple_yellow_soft(u, u_gamma=0.90, accent_gamma=0.85, accent_strength=0.05):
    denom = max(float(np.percentile(u, 98.0)), EPS)
    un = np.clip(u / denom, 0.0, 1.0) ** u_gamma
    s2l = lambda v: base.srgb_to_linear(v).astype(np.float32)
    c0 = s2l(np.array([176, 124, 232], np.float32) / 255.0)
    c1 = s2l(np.array([255, 211, 138], np.float32) / 255.0)
    rgb = (1.0 - un[..., None]) * c0 + un[..., None] * c1
    gray = np.array([0.5, 0.5, 0.5], np.float32)
    if accent_strength > 0:
        rgb = rgb + accent_strength * (un**accent_gamma)[..., None] * (c0 - gray)
    y = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2] + EPS
    gain = np.clip((np.clip(0.22 + 0.55 * un, 0, 1) / y)[..., None], 0.6, 1.6)
    rgb = rgb * gain
    rgb = rgb / (1.0 + 0.6 * rgb)
    return np.clip(rgb, 0.0, 1.0).astype(np.float32)


def map_falsecolor_uv_mixed(u, b, g, alpha=0.35):
    mixed = (1 - alpha) * map_falsecolor(u, b, g) + alpha * map_uv_purple_yellow_soft(u)
    p99 = float(np.percentile(mixed, 99.0))
    if p99 > EPS:
        mixed = mixed / max(1.0, p99)
    return np.clip(mixed.astype(np.float32), 0.0, 1.0)


# -------------------- species pipelines --------------------

def goldfish_pipeline(image):
    """animals/goldfish.py:87-180 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.45)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    u = integrate_uv(hsi, lambdas, 320.0, 400.0)
    bv = safe_norm(integrate_band(hsi, lambdas, 430.0, 500.0))
    gv = safe_norm(integrate_band(hsi, lambdas, 500.0, 570.0))
    rv = safe_norm(integrate_band(hsi, lambdas, 600.0, 680.0))
    uv_sal = safe_norm(u / (1e-6 + 0.45 * gv + 0.35 * bv + 0.15 * rv))
    render = baseline_lin.copy()
    render[..., 0] = np.clip(render[..., 0] * (1.0 - 0.55), 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 0.12, 0, 1)
    render[..., 2] = np.clip(render[..., 2] + 0.06, 0, 1)
    tint = np.array([0.78, 0.92, 1.0], np.float32)
    render = (1 - 0.12) * render + 0.12 * tint[None, None, :]
    render = gaussian_blur(render, 0.8)
    render[..., 0] = np.clip(render[..., 0] + 3.0 * 0.42 * uv_sal, 0, 1)
    render[..., 2] = np.clip(render[..., 2] + 3.0 * 0.35 * uv_sal, 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 3.0 * 0.12 * uv_sal, 0, 1)
    render[..., 2] = np.clip(render[..., 2] + 0.22 * bv, 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 0.30 * gv, 0, 1)
    periph = gaussian_blur(render, 1.8)
    h, w = render.shape[:2]
    yy = np.linspace(-1, 1, h, dtype=np.float32)[:, None]
    xx = np.linspace(-1, 1, w, dtype=np.float32)[None, :]
    r = np.sqrt(xx * xx + yy * yy)
    t = (1.0 / (1.0 + np.exp(-6.0 * (r - 0.65))))[..., None]
    render = (1 - t) * render + t * periph
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def reindeer_pipeline(image):
    """animals/reindeer.py:70-135 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.3)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    uv_map = integrate_uv(hsi, lambdas, 300.0, 410.0)
    vis_map = safe_norm(integrate_band(hsi, lambdas, 420.0, 680.0))
    uv_sal = safe_norm(uv_map / (1e-6 + 0.6 * vis_map))
    render = baseline_lin.copy()
    render[..., 2] = np.clip(render[..., 2] + 3.5 * 0.35 * uv_sal, 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 3.5 * 0.15 * uv_sal, 0, 1)
    render = snow_glare_tone_compress(render, 0.55)
    render = apply_scatter_and_blue_bias(render, 1.2, 0.08)
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def honeybee_pipeline(image, mapping_mode="opponent"):
    """animals/honeybee.py:99-175 behavior (analytic HSI, full-res)."""
    lambdas = np.linspace(400.0, 700.0, 31, dtype=np.float32)
    dtype = image.dtype
    img01 = to_float01(image)
    hsi = classic_rgb_to_hsi(img01, lambdas)

    def logn(peak, sigma):
        return np.exp(-0.5 * ((lambdas - peak) / sigma) ** 2).astype(np.float32)

    curves = [logn(350.0, 25.0), logn(440.0, 30.0), logn(540.0, 35.0)]
    curves = [c / c.sum() if c.sum() > 0 else c for c in curves]
    e = d65_like(lambdas).astype(hsi.dtype)
    radiance = hsi * e[None, None, :]
    u = np.tensordot(radiance, curves[0], axes=([2], [0]))
    b = np.tensordot(radiance, curves[1], axes=([2], [0]))
    g = np.tensordot(radiance, curves[2], axes=([2], [0]))
    u, b, g = u / max(u.max(), EPS), b / max(b.max(), EPS), g / max(g.max(), EPS)
    u, b, g = gaussian_blur(u, 0.2), gaussian_blur(b, 0.2), gaussian_blur(g, 0.2)
    if mapping_mode == "opponent":
        rgb = map_opponent(u, b, g)
    elif mapping_mode == "falsecolor":
        rgb = map_falsecolor(u, b, g)
    elif mapping_mode == "uv_purple_yellow":
        rgb = map_uv_purple_yellow_soft(u)
    elif mapping_mode == "falsecolor_uv_mixed":
        rgb = map_falsecolor_uv_mixed(u, b, g, alpha=0.45)
    rgb = np.clip(rgb, 0.0, 1.0)
    out_srgb = linear_to_srgb(rgb)
    if np.issubdtype(dtype, np.integer):
        out = (out_srgb * 255.0 + 0.5).astype(dtype)
    else:
        out = out_srgb.astype(dtype)
    return image, out


def rat_uv_pipeline(image, mode="auto"):
    """animals/rat_uv.py:131-214 behavior (float64 grid, no-cast converter)."""
    lambdas = np.linspace(320.0, 700.0, 129, dtype=np.float64)
    dtype = image.dtype
    img01 = to_float01(image)
    img_lin = srgb_to_linear(img01)
    baseline_lin = panorama_warp(img_lin, 1.45)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    # no-cast scaled converter (hsi_scale 0.55)
    h, w = baseline_lin.shape[:2]
    hs, ws = max(1, int(round(h * 0.55))), max(1, int(round(w * 0.55)))
    small = cv2.resize(baseline_lin.astype(np.float32), (ws, hs), interpolation=cv2.INTER_AREA)
    hsi_small = classic_rgb_to_hsi(small, lambdas)
    hsi = _resize_multichannel(hsi_small.astype(np.float32), (w, h), cv2.INTER_LINEAR)
    u = integrate_uv(hsi, lambdas, 330.0, 400.0)
    b = integrate_band(hsi, lambdas, 400.0, 500.0)
    g = integrate_band(hsi, lambdas, 500.0, 600.0)
    n95 = lambda x: x / max(1e-8, float(np.percentile(x, 95.0)))
    un, bn, gn = n95(u), n95(b), n95(g)
    false = np.stack(
        [
            np.clip(0.85 * un + 0.10 * gn, 0, 1),
            np.clip(0.80 * gn + 0.20 * bn, 0, 1),
            np.clip(0.70 * bn + 0.40 * un, 0, 1),
        ],
        axis=2,
    ).astype(np.float32)
    a = 0.55
    render = np.clip((1 - a) * baseline_lin + a * false, 0, 1)
    if mode == "auto":
        y0 = 0.2126 * img01[..., 0] + 0.7152 * img01[..., 1] + 0.0722 * img01[..., 2]
        mode = "night" if float(np.median(y0)) < 0.12 else "day"
    sigma = 1.25 if mode == "night" else 0.8
    bias = 0.05 if mode == "night" else 0.03
    render = apply_scatter_and_blue_bias(render, sigma, bias)
    if mode == "day":
        render = snow_glare_tone_compress(render, 0.65, knee=0.82)
        gv = 0.10
    else:
        y = 0.2126 * render[..., 0] + 0.7152 * render[..., 1] + 0.0722 * render[..., 2]
        gain = (y + 0.18) / (y + 1e-6)
        render = np.clip(render * gain[..., None], 0, 1)
        gv = 0.14
    hh = render.shape[0]
    yy = np.linspace(0.0, 1.0, hh, dtype=np.float32)[:, None]
    gain_v = 1.0 - gv * (1.0 - np.clip(1.0 - yy, 0, 1))
    render = np.clip(render * gain_v[..., None], 0, 1)
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def damselfish_pipeline(image):
    """animals/damselfish.py:85-181 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.25)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    u = integrate_uv(hsi, lambdas, 320.0, 400.0)
    bn = safe_norm(integrate_band(hsi, lambdas, 440.0, 500.0))
    yn = safe_norm(integrate_band(hsi, lambdas, 560.0, 600.0))
    un = safe_norm(u)
    render = baseline_lin.copy()
    render[..., 0] = np.clip(render[..., 0] * (1.0 - 0.35), 0, 1)
    render = gaussian_blur(render, 0.35)
    blurred = gaussian_blur(render, 1.2)
    highpass = np.clip(render - blurred, -1, 1)
    render = np.clip(render + (1.0 + 0.45 * un[..., None]) * highpass, 0, 1)
    lift = 0.30 * un
    render[..., 2] = np.clip(render[..., 2] + 0.60 * lift, 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 0.30 * lift, 0, 1)
    render[..., 0] = np.clip(render[..., 0] + 0.15 * lift, 0, 1)
    render[..., 2] = np.clip(render[..., 2] + 0.22 * bn, 0, 1)
    yb = 0.28 * yn
    render[..., 1] = np.clip(render[..., 1] + 0.65 * yb, 0, 1)
    render[..., 0] = np.clip(render[..., 0] + 0.35 * yb, 0, 1)
    periph = gaussian_blur(render, 0.8)
    hh, ww = render.shape[:2]
    yy = np.linspace(-1, 1, hh, dtype=np.float32)[:, None]
    xx = np.linspace(-1, 1, ww, dtype=np.float32)[None, :]
    r = np.sqrt(xx * xx + yy * yy)
    t = (1.0 / (1.0 + np.exp(-7.0 * (r - 0.70))))[..., None]
    render = (1 - t) * render + t * periph
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def anableps_pipeline(image):
    """animals/anableps.py:124-255 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.20)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    u = integrate_uv(hsi, lambdas, 320.0, 400.0)
    bv = safe_norm(integrate_band(hsi, lambdas, 430.0, 500.0))
    gv = safe_norm(integrate_band(hsi, lambdas, 500.0, 570.0))
    un = safe_norm(u)
    h, w = baseline_lin.shape[:2]
    y0 = int(np.clip(0.44 * h, 0, h - 1))
    x = np.linspace(0, 2.0 * np.pi * 2.5, w, dtype=np.float32)
    ripple = (6.0 * np.sin(x)).astype(np.float32)
    yy = np.arange(h, dtype=np.float32)[:, None]
    seam = 8.0
    horizon = y0 + ripple[None, :]
    dist = yy - horizon
    air_w = 1.0 / (1.0 + np.exp(+dist / seam))
    air = np.clip(baseline_lin * np.array([1.06, 1.03, 0.99], np.float32)[None, None, :], 0, 1)
    blurA = gaussian_blur(air, 1.0)
    air = np.clip(air + 0.35 * np.clip(air - blurA, -1, 1), 0, 1)
    water = baseline_lin.copy()
    water[..., 0] = np.clip(water[..., 0] * (1.0 - 0.55), 0, 1)
    water[..., 1] = np.clip(water[..., 1] + 0.12, 0, 1)
    water[..., 2] = np.clip(water[..., 2] + 0.08, 0, 1)
    tint = np.array([0.80, 0.92, 1.00], np.float32)
    water = (1 - 0.10) * water + 0.10 * tint[None, None, :]
    water = gaussian_blur(water, 0.7)
    water[..., 0] = np.clip(water[..., 0] + 3.4 * 0.36 * un, 0, 1)
    water[..., 1] = np.clip(water[..., 1] + 3.4 * 0.18 * un, 0, 1)
    water[..., 2] = np.clip(water[..., 2] + 3.4 * 0.42 * un, 0, 1)
    water[..., 2] = np.clip(water[..., 2] + 0.20 * bv, 0, 1)
    water[..., 1] = np.clip(water[..., 1] + 0.26 * gv, 0, 1)
    y_idx = np.repeat(np.arange(h, dtype=np.float32)[:, None], w, axis=1)
    x_idx = np.repeat(np.arange(w, dtype=np.float32)[None, :], h, axis=0)
    below = np.maximum(y_idx - horizon, 0.0)
    push = 3.0 * np.exp(-below / (2.5 * seam))
    map_y = np.clip(y_idx + push, 0, h - 1).astype(np.float32)
    water = cv2.remap(water.astype(np.float32), x_idx.astype(np.float32), map_y,
                      interpolation=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT101)
    render = air * air_w[..., None] + water * (1.0 - air_w)[..., None]
    periph = gaussian_blur(render, 1.2)
    yyn = np.linspace(-1, 1, h, dtype=np.float32)[:, None]
    xxn = np.linspace(-1, 1, w, dtype=np.float32)[None, :]
    r = np.sqrt(xxn * xxn + yyn * yyn)
    t = (1.0 / (1.0 + np.exp(-6.0 * (r - 0.70))))[..., None]
    render = (1 - t) * render + t * periph
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def anchovy_pipeline(image):
    """animals/anchovy.py:130-253 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.20)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    un = safe_norm(integrate_uv(hsi, lambdas, 320.0, 400.0))
    bn = safe_norm(integrate_band(hsi, lambdas, 440.0, 500.0))
    gn = safe_norm(integrate_band(hsi, lambdas, 500.0, 570.0))
    gx = cv2.Sobel(un.astype(np.float32), cv2.CV_32F, 1, 0, ksize=3, borderType=cv2.BORDER_REFLECT101)
    gy = cv2.Sobel(un.astype(np.float32), cv2.CV_32F, 0, 1, ksize=3, borderType=cv2.BORDER_REFLECT101)
    theta = np.arctan2(gy, gx).astype(np.float32)
    mix = 0.35
    cos2 = (1 - mix) * 1.0 + mix * np.cos(2 * theta)  # evec angle 0
    align01 = np.clip(0.5 * (cos2 + 1.0), 0, 1) ** 1.2
    uv_mag = np.sqrt(gx * gx + gy * gy)
    uv_mag = np.clip(uv_mag / (np.percentile(uv_mag, 95.0) + 1e-8), 0, 1)
    pol_gain = 1.0 + 0.55 * (align01 * un * uv_mag)
    render = baseline_lin.copy()
    render[..., 0] = np.clip(render[..., 0] * (1.0 - 0.25), 0, 1)
    tint = np.array([0.90, 0.97, 1.00], np.float32)
    render = (1 - 0.04) * render + 0.04 * tint[None, None, :]
    render = gaussian_blur(render, 0.30)
    blurred = gaussian_blur(render, 1.0)
    high = np.clip(render - blurred, -1, 1)
    render = np.clip(render + (0.35 * pol_gain[..., None]) * high, 0, 1)
    gloss = 0.28 * (align01 * un)
    render[..., 2] = np.clip(render[..., 2] + 0.70 * gloss, 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 0.30 * gloss, 0, 1)
    render[..., 2] = np.clip(render[..., 2] + 0.18 * (bn * un), 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 0.10 * (gn * un), 0, 1)
    periph = gaussian_blur(render, 0.6)
    h, w = render.shape[:2]
    yy = np.linspace(-1, 1, h, dtype=np.float32)[:, None]
    xx = np.linspace(-1, 1, w, dtype=np.float32)[None, :]
    r = np.sqrt(xx * xx + yy * yy)
    t = (1.0 / (1.0 + np.exp(-7.0 * (r - 0.78))))[..., None]
    render = (1 - t) * render + t * periph
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def guppy_pipeline(image):
    """animals/guppy.py:136-240 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.22)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    un = safe_norm(integrate_uv(hsi, lambdas, 320.0, 400.0))
    bn = safe_norm(integrate_band(hsi, lambdas, 430.0, 500.0))
    gn = safe_norm(integrate_band(hsi, lambdas, 500.0, 570.0))
    render = baseline_lin.copy()
    render[..., 0] = np.clip(render[..., 0] * (1.0 - 0.28), 0, 1)
    tint = np.array([0.92, 0.98, 1.00], np.float32)
    render = (1 - 0.06) * render + 0.06 * tint[None, None, :]
    render = np.clip(render * np.array([1.03, 1.01, 0.99], np.float32)[None, None, :], 0, 1)
    render = gaussian_blur(render, 0.35)
    uv_dog = np.clip(gaussian_blur(un, 0.8) - gaussian_blur(un, 2.4), 0, 1)
    uv_spot = np.clip(uv_dog / (np.percentile(uv_dog, 95.0) + 1e-8), 0, 1)
    blurred = gaussian_blur(render, 0.9)
    high = np.clip(render - blurred, -1, 1)
    render = np.clip(render + (0.28 * uv_spot[..., None]) * high, 0, 1)
    lift = 0.40 * uv_spot
    render[..., 2] = np.clip(render[..., 2] + 0.55 * lift * bn, 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 0.35 * lift * gn, 0, 1)
    render[..., 0] = np.clip(render[..., 0] + 0.12 * lift * un, 0, 1)
    y = (0.2126 * render[..., 0] + 0.7152 * render[..., 1] + 0.0722 * render[..., 2]).astype(np.float32)
    mean_chroma = np.mean(np.abs(render - y[..., None]), axis=2)
    sat = (mean_chroma / (np.percentile(mean_chroma, 95.0) + 1e-8)).astype(np.float32)
    desat = 1.0 - 0.18 * (1.0 - un) * (1.0 - sat)
    render = np.clip(y[..., None] + (render - y[..., None]) * desat[..., None], 0, 1)
    h, w = render.shape[:2]
    yy = np.linspace(-1, 1, h, dtype=np.float32)[:, None]
    xx = np.linspace(-1, 1, w, dtype=np.float32)[None, :]
    r = np.sqrt(xx * xx + yy * yy)
    t = 1.0 / (1.0 + np.exp(-7.0 * (r - 0.78)))
    vign = 1.0 - 0.12 * t
    render = np.clip(render * vign[..., None], 0, 1)
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def morpho_pipeline(image):
    """animals/morpho.py:94-154 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.05)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    u = safe_norm(integrate_uv(hsi, lambdas, 320.0, 400.0))
    bv = safe_norm(integrate_band(hsi, lambdas, 440.0, 500.0))
    gx = cv2.Sobel(bv.astype(np.float32), cv2.CV_32F, 1, 0, ksize=3, borderType=cv2.BORDER_REFLECT101)
    gy = cv2.Sobel(bv.astype(np.float32), cv2.CV_32F, 0, 1, ksize=3, borderType=cv2.BORDER_REFLECT101)
    ori = np.arctan2(gy, gx).astype(np.float32)
    align = 0.5 * (1.0 + np.cos(2.0 * ori))
    gloss = gaussian_blur(u, 1.0)
    gloss = np.clip(gloss / (np.percentile(gloss, 95.0) + 1e-8), 0, 1)
    render = baseline_lin.copy()
    sc = 0.45 * align
    sd = 0.45 * (1.0 - align)
    render[..., 2] = np.clip(render[..., 2] + 0.40 * sd + 0.25 * sc, 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 0.35 * sc, 0, 1)
    render = np.clip(render + 0.55 * gloss[..., None] * np.array([0.10, 0.25, 0.45], np.float32), 0, 1)
    h, w = render.shape[:2]
    hs, ws = max(1, int(round(h * 0.35))), max(1, int(round(w * 0.35)))
    small = cv2.resize(render, (ws, hs), interpolation=cv2.INTER_AREA)
    render = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    yy = np.linspace(-1, 1, h, dtype=np.float32)[:, None]
    xx = np.linspace(-1, 1, w, dtype=np.float32)[None, :]
    r = np.sqrt(xx * xx + yy * yy)
    t = (1.0 / (1.0 + np.exp(-7.0 * (r - 0.82))))[..., None]
    sharp = render + 0.22 * (render - gaussian_blur(render, 1.0))
    render = np.clip((1.0 - t) * sharp + t * render, 0, 1)
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def heliconius_pipeline(image):
    """animals/heliconius.py:81-136 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.05)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    u = safe_norm(integrate_uv(hsi, lambdas, 320.0, 400.0))
    rb = safe_norm(integrate_band(hsi, lambdas, 600.0, 680.0))
    uv_dog = np.clip(gaussian_blur(u, 0.8) - gaussian_blur(u, 2.2), 0, 1)
    r_dog = np.clip(gaussian_blur(rb, 0.8) - gaussian_blur(rb, 2.2), 0, 1)
    conj = uv_dog * r_dog
    conj = np.clip(conj / (np.percentile(conj, 95.0) + 1e-8), 0, 1)
    render = gaussian_blur(baseline_lin.copy(), 0.30)
    bg_w = 1.0 - conj
    render[..., 2] = np.clip(render[..., 2] + 0.04 * bg_w, 0, 1)
    lum = lambda x: (0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2]).astype(np.float32)
    sat_apply = lambda lin, s: np.clip(lum(lin)[..., None] + (lin - lum(lin)[..., None]) * s[..., None], 0, 1)
    render = sat_apply(render, (1.0 - 0.20 * bg_w).astype(np.float32))
    blurred = gaussian_blur(render, 1.0)
    render = np.clip(render + (0.25 * conj[..., None]) * (render - blurred), 0, 1)
    render[..., 0] = np.clip(render[..., 0] + 0.40 * conj, 0, 1)
    render = sat_apply(render, (1.0 + 0.45 * conj).astype(np.float32))
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def pieris_pipeline(image):
    """animals/pieris.py:72-125 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.05)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    u = safe_norm(integrate_uv(hsi, lambdas, 320.0, 400.0))
    bv = safe_norm(integrate_band(hsi, lambdas, 430.0, 500.0))
    gv = safe_norm(integrate_band(hsi, lambdas, 500.0, 570.0))
    render = baseline_lin.copy()
    u_s = gaussian_blur(u, 1.2)
    u_s = np.clip(u_s / (np.percentile(u_s, 95.0) + 1e-8), 0, 1)
    guide = (0.75 * u_s)[..., None]
    render = np.clip(render + guide * np.array([0.35, 0.43, 0.25], np.float32), 0, 1)
    foliage = np.clip(gv - 0.5 * (u + bv), 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 0.25 * foliage, 0, 1)
    blurred = gaussian_blur(render, 0.8)
    render = np.clip(render + 0.22 * (render - blurred), 0, 1)
    h, w = render.shape[:2]
    yy = np.linspace(-1, 1, h, dtype=np.float32)[:, None]
    xx = np.linspace(-1, 1, w, dtype=np.float32)[None, :]
    r = np.sqrt(xx * xx + yy * yy)
    t = 1.0 / (1.0 + np.exp(-7.0 * (r - 0.80)))
    att = 1.0 + 0.12 * (1.0 - t)
    render = np.clip(render * att[..., None], 0, 1)
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def _sobel3(x):
    gx = cv2.Sobel(x.astype(np.float32), cv2.CV_32F, 1, 0, ksize=3, borderType=cv2.BORDER_REFLECT101)
    gy = cv2.Sobel(x.astype(np.float32), cv2.CV_32F, 0, 1, ksize=3, borderType=cv2.BORDER_REFLECT101)
    return gx, gy


def _lum(x):
    return (0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2]).astype(np.float32)


def _periph(render, sigma, radius, soft):
    periph = gaussian_blur(render, sigma)
    h, w = render.shape[:2]
    yy = np.linspace(-1, 1, h, dtype=np.float32)[:, None]
    xx = np.linspace(-1, 1, w, dtype=np.float32)[None, :]
    r = np.sqrt(xx * xx + yy * yy)
    t = (1.0 / (1.0 + np.exp(-soft * (r - radius))))[..., None]
    return (1 - t) * render + t * periph


def kestrel_pipeline(image):
    """animals/kestrel.py:139-234 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.10)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    u = safe_norm(integrate_uv(hsi, lambdas, 320.0, 400.0))
    bv = safe_norm(integrate_band(hsi, lambdas, 440.0, 500.0))
    gv = safe_norm(integrate_band(hsi, lambdas, 500.0, 570.0))
    h, w = baseline_lin.shape[:2]
    vert = np.linspace(1.0, 0.0, h, dtype=np.float32)[:, None]
    blue_dom = np.clip(bv - 0.6 * gv, 0, 1)
    sky = gaussian_blur(0.6 * vert + 0.4 * blue_dom, 3.0)
    sky = np.clip(sky / (np.percentile(sky, 98.0) + 1e-8), 0, 1)
    sky_w = 1.0 / (1.0 + np.exp(-6.0 * (sky - 0.45)))
    g_w = 1.0 - sky_w
    gx, gy = _sobel3(u)
    gxx = gaussian_blur(gx * gx, 3.0); gyy = gaussian_blur(gy * gy, 3.0); gxy = gaussian_blur(gx * gy, 3.0)
    trace = gxx + gyy
    root = np.sqrt(np.maximum((0.5 * (gxx - gyy)) ** 2 + gxy * gxy, 0.0))
    coh = ((0.5 * trace + root) - (0.5 * trace - root)) / (trace + 1e-8)
    energy = np.clip(trace, 0, None); energy /= np.percentile(energy, 95.0) + 1e-8
    trail = np.clip(np.clip(coh * energy, 0, 1) * g_w, 0, 1)
    render = baseline_lin.copy()
    sky_t = np.clip(render * np.array([0.95, 0.98, 1.03], np.float32)[None, None, :], 0, 1)
    render = sky_w[..., None] * ((1 - 0.10) * sky_t + 0.10 * np.array([0.90, 0.97, 1.00], np.float32)) + g_w[..., None] * render
    gp = np.clip(render * np.array([1.02, 1.01, 0.99], np.float32)[None, None, :], 0, 1)
    gp = np.clip(gp + 0.08 * (gp - gaussian_blur(gp, 1.2)), 0, 1)
    render = sky_w[..., None] * render + g_w[..., None] * gp
    u95 = np.clip(u / (np.percentile(u, 95.0) + 1e-8), 0, 1)
    uv_rgb = u95[..., None] * np.array([0.60, 0.12, 0.70], np.float32)[None, None, :]
    render = np.clip((1 - 0.55 * g_w[..., None]) * render + 0.55 * g_w[..., None] * uv_rgb, 0, 1)
    b = gaussian_blur(render, 1.0)
    render = np.clip(render + (0.30 * trail[..., None]) * np.clip(render - b, -1, 1), 0, 1)
    render = _periph(render, 0.7, 0.82, 7.0)
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def mantis_shrimp_pipeline(image):
    """animals/mantis_shrimp.py:143-279 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.12)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    bands = [(320.,360.),(360.,400.),(400.,430.),(430.,460.),(460.,490.),
             (490.,520.),(520.,550.),(550.,580.),(580.,610.),(610.,680.)]
    S = np.stack([safe_norm(integrate_band(hsi, lambdas, lo, hi)) for lo, hi in bands], axis=2)
    n = S.shape[2]
    hue = np.arange(n, dtype=np.float32) / n
    i = np.floor(hue * 6).astype(np.int32) % 6
    f = hue * 6 - np.floor(hue * 6)
    v = np.ones_like(hue); s_ = np.full_like(hue, 0.95)
    p = v * (1 - s_); q = v * (1 - f * s_); t_ = v * (1 - (1 - f) * s_)
    lut = np.stack([
        np.select([i == k for k in range(6)], [v, q, p, p, t_, v], default=v),
        np.select([i == k for k in range(6)], [t_, v, v, q, p, p], default=v),
        np.select([i == k for k in range(6)], [p, p, t_, v, v, q], default=v)], axis=-1).astype(np.float32)
    Sn = np.clip(S / (np.percentile(S, 95.0) + 1e-8), 0, 1)
    mi = np.argmax(Sn, axis=2)
    weights = Sn / (Sn.sum(axis=2, keepdims=True) + 1e-8)
    soft = weights @ lut
    hard = lut[mi]
    bc = (1 - 0.35) * soft + 0.35 * hard
    yb = _lum(bc)[..., None]
    bc = np.clip(yb + (bc - yb) * 1.40, 0, 1)
    render = baseline_lin.copy()
    render[..., 0] = np.clip(render[..., 0] * (1 - 0.18), 0, 1)
    render = (1 - 0.03) * render + 0.03 * np.array([0.92, 0.98, 1.00], np.float32)[None, None, :]
    render = gaussian_blur(render, 0.25)
    broad = np.mean(Sn, axis=2).astype(np.float32)
    gx, gy = _sobel3(broad)
    theta = np.arctan2(gy, gx).astype(np.float32)
    ev = np.deg2rad(30.0)
    c2 = 0.5 * np.cos(2 * ev) + 0.5 * np.cos(2 * theta)
    s2 = 0.5 * np.sin(2 * ev) + 0.5 * np.sin(2 * theta)
    a01 = np.clip(0.5 * (c2 + 1), 0, 1) ** 1.2
    ac = np.clip(0.5 * (s2 + 1), 0, 1)
    pol = 1.0 + 0.55 * a01 + 0.35 * ac
    b = gaussian_blur(render, 1.0)
    render = np.clip(render + (0.32 * pol[..., None]) * np.clip(render - b, -1, 1), 0, 1)
    render = np.clip((1 - 0.55) * render + 0.55 * bc, 0, 1)
    h, w = render.shape[:2]
    y = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    rows = (0.5 + 0.5 * np.sin(2 * np.pi * 26.0 * y)) * np.ones((1, w), np.float32)
    rows = gaussian_blur(rows, 0.8)
    render = np.clip(render * (1.0 + 0.08 * (rows - 0.5))[..., None], 0, 1)
    render = _periph(render, 0.7, 0.80, 7.0)
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def jumping_spider_pipeline(image):
    """animals/jumping_spider.py:135-236 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.02)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    u = safe_norm(integrate_uv(hsi, lambdas, 320.0, 400.0))
    gv = safe_norm(integrate_band(hsi, lambdas, 500.0, 570.0))
    bv = safe_norm(integrate_band(hsi, lambdas, 430.0, 500.0))
    render = baseline_lin.copy()
    render[..., 0] = np.clip(render[..., 0] * (1 - 0.25), 0, 1)
    render = gaussian_blur(render, 0.25)
    uv_dog = np.clip(gaussian_blur(u, 0.9) - gaussian_blur(u, 2.2), 0, 1)
    uv_patch = np.clip(uv_dog / (np.percentile(uv_dog, 95.0) + 1e-8), 0, 1)
    opp = gv - u
    opp = np.clip(opp / (np.percentile(np.abs(opp), 95.0) + 1e-8), -1, 1)
    gb = np.clip(opp, 0, 1) * 0.30
    ub = np.clip(-opp, 0, 1) * 0.30
    render[..., 1] = np.clip(render[..., 1] + 0.40 * gb, 0, 1)
    render[..., 2] = np.clip(render[..., 2] + 0.30 * ub * bv, 0, 1)
    render[..., 0] = np.clip(render[..., 0] + 0.12 * ub * u, 0, 1)
    b = gaussian_blur(render, 0.9)
    render = np.clip(render + (0.24 * 0.95 * uv_patch[..., None]) * np.clip(render - b, -1, 1), 0, 1)
    h, w = render.shape[:2]
    y = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    rows = (0.5 + 0.5 * np.sin(2 * np.pi * 22.0 * y)) * np.ones((1, w), np.float32)
    rows = gaussian_blur(rows, 0.9)
    render = np.clip(render * (1.0 + 0.08 * (rows - 0.5))[..., None], 0, 1)
    yy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    xx = np.linspace(0, 1, w, dtype=np.float32)[None, :]
    mask = np.zeros((h, w), np.float32)
    for yc, xc in ((0.50, 0.52), (0.57, 0.48)):
        mask += np.exp(-((yy - yc) ** 2 + (xx - xc) ** 2) / (2 * 0.08 ** 2))
    mask = np.clip(mask / max(1e-8, float(np.percentile(mask, 95.0))), 0, 1)
    render = np.clip(render + 0.20 * mask[..., None], 0, 1)
    sb = gaussian_blur(render, 0.8)
    sharp = np.clip(render + 0.25 * np.clip(render - sb, -1, 1), 0, 1)
    render = np.clip((1 - 0.6 * mask[..., None]) * render + 0.6 * mask[..., None] * sharp, 0, 1)
    yy2 = np.linspace(-1, 1, h, dtype=np.float32)[:, None]
    xx2 = np.linspace(-1, 1, w, dtype=np.float32)[None, :]
    r = np.sqrt(xx2 * xx2 + yy2 * yy2)
    edge = 1.0 / (1.0 + np.exp(-10.0 * (r - 0.38)))
    periph = gaussian_blur(render, 2.2)
    render = (1 - edge[..., None]) * render + edge[..., None] * periph
    render = np.clip(render * (1.0 - 0.22 * edge)[..., None], 0, 1)
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def dragonfly_pipeline(image):
    """animals/dragonfly.py:146-251 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.15)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    u = safe_norm(integrate_uv(hsi, lambdas, 320.0, 400.0))
    bv = safe_norm(integrate_band(hsi, lambdas, 440.0, 500.0))
    gv = safe_norm(integrate_band(hsi, lambdas, 500.0, 570.0))
    h, w = baseline_lin.shape[:2]
    vert = np.linspace(1.0, 0.0, h, dtype=np.float32)[:, None]
    score = gaussian_blur(0.6 * vert + 0.4 * np.clip(bv - 0.6 * gv, 0, 1), 2.5)
    score = score / (np.percentile(score, 98.0) + 1e-8)
    sky_w = 1.0 / (1.0 + np.exp(-6.0 * (score - 0.46)))
    g_w = 1.0 - sky_w
    ub = 0.6 * bv + 0.4 * u
    gx, gy = _sobel3(ub)
    theta = np.arctan2(gy, gx).astype(np.float32)
    c2l, s2l_ = np.cos(2 * theta), np.sin(2 * theta)
    yn = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    evec = np.deg2rad(90.0) + np.deg2rad(-45.0) * yn
    a_sky = np.clip(0.5 * (c2l * np.cos(2 * evec) + s2l_ * np.sin(2 * evec) + 1), 0, 1) ** 1.3
    a_wat = np.clip(0.5 * (c2l + 1), 0, 1) ** 1.2
    render = baseline_lin.copy()
    render[..., 0] = np.clip(render[..., 0] * (1 - 0.22), 0, 1)
    render = gaussian_blur(render, 0.30)
    sky_gain = (1.0 + 0.65 * (a_sky * sky_w))[..., None]
    render = np.clip(render * (0.95 + 0.05 * sky_w)[..., None], 0, 1)
    render[..., 2] = np.clip(render[..., 2] + 0.20 * (bv * sky_w * a_sky), 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 0.10 * (u * sky_w * a_sky), 0, 1)
    render = np.clip(render * sky_gain, 0, 1)
    water_gain = (1.0 + 0.55 * (a_wat * g_w))[..., None]
    render[..., 2] = np.clip(render[..., 2] + 0.24 * (bv * g_w * a_wat), 0, 1)
    render[..., 2] = np.clip(render[..., 2] + 0.30 * (u * g_w * a_wat), 0, 1)
    render[..., 1] = np.clip(render[..., 1] + 0.12 * (gv * g_w), 0, 1)
    render = np.clip(render * water_gain, 0, 1)
    b = gaussian_blur(render, 1.0)
    render = np.clip(render + 0.30 * np.clip(render - b, -1, 1), 0, 1)
    render = snow_glare_tone_compress(render, 0.35, knee=0.85)
    render = _periph(render, 0.7, 0.80, 7.0)
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)


def hummingbird_pipeline(image):
    """animals/hummingbird.py:128-227 behavior."""
    lambdas = np.linspace(300.0, 700.0, 81, dtype=np.float32)
    dtype = image.dtype
    img_lin = srgb_to_linear(to_float01(image))
    baseline_lin = panorama_warp(img_lin, 1.05)
    baseline_out = from_float01(linear_to_srgb(np.clip(baseline_lin, 0, 1)), dtype)
    hsi = hsi_for(baseline_lin, lambdas, 0.25)
    u = safe_norm(integrate_uv(hsi, lambdas, 320.0, 400.0))
    bv = safe_norm(integrate_band(hsi, lambdas, 430.0, 500.0))
    gv = safe_norm(integrate_band(hsi, lambdas, 500.0, 570.0))
    rv = safe_norm(integrate_band(hsi, lambdas, 600.0, 680.0))
    def bp(m):
        d = np.clip(gaussian_blur(m, 0.8) - gaussian_blur(m, 2.0), 0, 1)
        return np.clip(d / (np.percentile(d, 95.0) + 1e-8), 0, 1)
    uxb, uxg, uxr = bp(safe_norm(u * bv)), bp(safe_norm(u * gv)), bp(safe_norm(u * rv))
    render = baseline_lin.copy()
    render[..., 0] = np.clip(render[..., 0] * (1 - 0.10), 0, 1)
    render = gaussian_blur(render, 0.25)
    cm = np.maximum.reduce([uxb, uxg, uxr])
    b = gaussian_blur(render, 0.9)
    render = np.clip(render + (0.24 * cm[..., None]) * np.clip(render - b, -1, 1), 0, 1)
    sheen = (0.55 * uxb + 0.65 * uxg + 0.75 * uxr)[..., None]
    render = np.clip(render + 0.28 * sheen, 0, 1)
    s2lf = lambda rgb: base.srgb_to_linear(np.array(rgb, np.float32) / 255.0).astype(np.float32)
    ws = uxb + uxg + uxr + 1e-8
    tint = ((uxb / ws)[..., None] * s2lf((120, 150, 255)) +
            (uxg / ws)[..., None] * s2lf((110, 255, 170)) +
            (uxr / ws)[..., None] * s2lf((255, 110, 210))).astype(np.float32)
    y = _lum(tint)[..., None]
    tint = np.clip(y + (tint - y) * 1.45, 0, 1)
    render = np.clip((1 - 0.55) * render + 0.55 * tint, 0, 1)
    us = gaussian_blur(u, 1.0)
    us = np.clip(us / (np.percentile(us, 95.0) + 1e-8), 0, 1)
    render = np.clip(render + 0.25 * us[..., None] * np.array([0.20, 0.25, 0.10], np.float32), 0, 1)
    render = _periph(render, 0.6, 0.82, 7.0)
    return baseline_out, from_float01(linear_to_srgb(np.clip(render, 0, 1)), dtype)
