"""NumPy/OpenCV oracles reproducing the reference pipelines' behavior.

These are clean-room reimplementations (from SURVEY.md's behavioral spec and
direct cv2 calls) used only as golden-test ground truth for the JAX
framework. Each function cites the reference behavior it mirrors.
"""

from __future__ import annotations

import cv2
import numpy as np

A = 0.055


def srgb_to_linear(x):
    return np.where(x <= 0.04045, x / 12.92, ((x + A) / (1 + A)) ** 2.4)


def linear_to_srgb(x):
    return np.where(
        x <= 0.0031308, 12.92 * x, (1 + A) * np.clip(x, 0, None) ** (1 / 2.4) - A
    )


M_RGB_TO_LMS = np.array(
    [
        [0.31399022, 0.63951294, 0.04649755],
        [0.15537241, 0.75789446, 0.08670142],
        [0.01775239, 0.10944209, 0.87256922],
    ],
    dtype=np.float32,
)
M_LMS_TO_RGB = np.array(
    [
        [5.472213, -4.6419606, 0.16963711],
        [-1.125242, 2.2931712, -0.16789523],
        [0.02980164, -0.19318072, 1.1636479],
    ]
)


def collapse_lms_matrix(alpha, s_scale):
    """animals/animal_utils.py:88-119 construction (incl. dtype mixing)."""
    e = np.eye(3, dtype=np.float32)
    lms = e @ M_RGB_TO_LMS.T
    d = np.array(
        [[alpha, 1 - alpha, 0.0], [alpha, 1 - alpha, 0.0], [0.0, 0.0, s_scale]],
        dtype=np.float32,
    )
    return ((lms @ d.T) @ M_LMS_TO_RGB.T).astype(np.float32)


def normalize_image(image):
    out = image.astype(np.float32)
    if out.max() > 1.0:
        out /= 255.0
    return np.clip(out, 0.0, 1.0)


def streak_blur(image, y_center, sigma_streak, sigma_far, falloff):
    """The reference's exact per-row OpenCV loop (animal_utils.py:147-172)."""
    h = image.shape[0]
    yy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    d = np.abs(yy - y_center)
    smap = sigma_streak + (sigma_far - sigma_streak) * (1.0 - np.exp(-falloff * d**2))
    sx = np.maximum(0.4, 0.5 * smap)
    out = image.astype(np.float32, copy=True)
    tmp = np.empty_like(out)
    for y in range(h):
        tmp[y] = cv2.GaussianBlur(out[y], (0, 0), sigmaX=float(sx[y, 0]), sigmaY=0.0)
    for y in range(h):
        out[y] = cv2.GaussianBlur(tmp[y], (0, 0), sigmaX=1e-16, sigmaY=float(smap[y, 0]))
    return out


def chroma_compression(image, strength):
    gray = image.mean(axis=2, keepdims=True)
    return gray + (image - gray) * (1 - strength)


def s_cone_vertical_gain(image, s_top, s_bottom, power, extra_boost):
    """animal_utils.py:206-259 with band=None, clamp=True."""
    out = image.astype(np.float32, copy=True)
    h = out.shape[0]
    w = np.linspace(s_top, s_bottom, h, dtype=np.float32)
    if power != 1.0:
        t = (w - s_bottom) / max(1e-8, s_top - s_bottom)
        t = np.clip(t, 0.0, 1.0) ** power
        w = s_bottom + (s_top - s_bottom) * t
    if extra_boost != 0.0:
        w = 1.0 + extra_boost * (w - 1.0)
    out[..., 2] = np.clip(out[..., 2] * w[:, None], 0.0, 1.0)
    return out


def nonuv_pipeline(image, alpha, s_scale, effects):
    """The shared 6-step template (animals/dog.py:31-61)."""
    orig_dtype = image.dtype
    norm = normalize_image(image)
    lin = srgb_to_linear(norm).astype(np.float32)
    m = collapse_lms_matrix(alpha, s_scale)
    out = (lin.reshape(-1, 3) @ m.T).reshape(lin.shape)
    for kind, params in effects:
        if kind == "blur":
            out = cv2.GaussianBlur(out, (0, 0), sigmaX=params[0], sigmaY=params[0])
        elif kind == "streak":
            out = streak_blur(out, *params)
        elif kind == "chroma":
            out = chroma_compression(out, params[0])
        elif kind == "scone":
            out = s_cone_vertical_gain(out, *params)
    srgb = np.clip(linear_to_srgb(np.clip(out, 0.0, 1.0)), 0.0, 1.0)
    if np.issubdtype(orig_dtype, np.integer):
        return image, (srgb * 255.0 + 0.5).astype(orig_dtype)
    return image, srgb.astype(orig_dtype)


def binocular_warp(img01, fov_in_deg, per_eye_half_fov_deg, overlap_deg):
    """animals/animal_utils2.py:52-105 behavior via cv2."""
    h_in, w_in, _ = img01.shape
    out_w, out_h = w_in, h_in
    phi = np.deg2rad(per_eye_half_fov_deg)
    psi = np.deg2rad(fov_in_deg * 0.5)
    ov = np.deg2rad(overlap_deg)
    al = max(0.0, phi - 0.5 * ov)
    u = np.linspace(-1.0, 1.0, out_w, dtype=np.float32)
    v = np.linspace(0.0, float(out_h - 1), out_h, dtype=np.float32)
    uu, _ = np.meshgrid(u, v)
    theta = uu * phi
    xs = lambda g: ((g / psi) * (w_in * 0.5) + (w_in * 0.5)).astype(np.float32)
    ymap = np.repeat(np.linspace(0, h_in - 1, out_h, dtype=np.float32)[:, None], out_w, 1)
    vl = (np.abs(theta - al) <= psi).astype(np.float32)
    vr = (np.abs(theta + al) <= psi).astype(np.float32)
    left = cv2.remap(img01, xs(theta - al), ymap, cv2.INTER_LINEAR, borderMode=0, borderValue=0)
    right = cv2.remap(img01, xs(theta + al), ymap, cv2.INTER_LINEAR, borderMode=0, borderValue=0)
    w = np.cos(0.5 * np.pi * (theta / phi)) ** 2
    wl = w.astype(np.float32) * vl
    wr = w.astype(np.float32) * vr
    out = (left * wl[..., None] + right * wr[..., None]) / (wl + wr + 1e-8)[..., None]
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def cat_pipeline(image):
    """The Tina-animals branch of animals/cat.py (73-114)."""
    import math

    orig_dtype = image.dtype
    h, w = image.shape[:2]
    phi = 105.0
    eff = min(100.0, 2.0 * phi)
    ratio = max(1.01, 1.30)
    scale = math.tan(math.radians(100.0) * 0.5) / max(
        math.tan(math.radians(eff / ratio) * 0.5), 1e-6
    )
    cw = max(1, int(round(w / scale)))
    ch = max(1, int(round(h / scale)))
    x0, y0 = (w - cw) // 2, (h - ch) // 2
    crop = image[y0 : y0 + ch, x0 : x0 + cw]
    human_zoomed = cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR)

    srgb01 = normalize_image(image)
    srgb01 = binocular_warp(srgb01.astype(np.float32), 100.0, 105.0, 40.0)
    lin = srgb_to_linear(srgb01)
    vec = lin.reshape(-1, 3)
    lms = vec @ M_RGB_TO_LMS.T
    lm = 0.5 * lms[:, 0] + 0.5 * lms[:, 1]
    merged = np.stack([lm, lm, lms[:, 2]], axis=1)
    lin_rgb = (merged @ M_LMS_TO_RGB.T).reshape(h, w, 3)
    lin_rgb = cv2.GaussianBlur(lin_rgb.astype(np.float32), (0, 0), sigmaX=1.0, sigmaY=1.0)
    cat_srgb = np.clip(linear_to_srgb(np.clip(lin_rgb, 0.0, 1.0)), 0.0, 1.0)
    if np.issubdtype(orig_dtype, np.integer):
        human_out = human_zoomed if np.issubdtype(human_zoomed.dtype, np.integer) else (
            np.clip(human_zoomed, 0, 1) * 255.0 + 0.5
        ).astype(orig_dtype)
        cat_out = (cat_srgb * 255.0 + 0.5).astype(orig_dtype)
    else:
        human_out = human_zoomed.astype(orig_dtype)
        cat_out = cat_srgb.astype(orig_dtype)
    return human_out, cat_out
