"""(U, B, G) cone-catch -> displayable linear RGB mappings (uv_mappers parity)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.core.stats import percentile

EPS_DEFAULT = 1e-8


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """Minimal HSV->RGB; values in [0,1], treated as linear RGB.
    Parity: uv_mappers.hsv_to_rgb (uv_mappers.py:14-26) including the
    np.select(default=0) behavior for out-of-range sector indices (h<0 or
    h>=1 after floor can yield i_mod outside handled cases only via NaN)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0).astype(jnp.int32)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i_mod = jnp.mod(i, 6)
    zeros = jnp.zeros_like(v)

    def sel(options):
        out = zeros
        for idx, val in enumerate(options):
            out = jnp.where(i_mod == idx, val, out)
        return out

    r = sel([v, q, p, p, t, v])
    g = sel([t, v, v, q, p, p])
    b = sel([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=2)


def map_falsecolor(u, b, g, eps: float = EPS_DEFAULT) -> jnp.ndarray:
    """UV->magenta, blue->blue/cyan, green->green/yellow
    (uv_mappers.py:29-42, p95 normalization)."""
    u_n = u / jnp.maximum(percentile(u, 95.0), eps)
    b_n = b / jnp.maximum(percentile(b, 95.0), eps)
    g_n = g / jnp.maximum(percentile(g, 95.0), eps)
    r = 0.85 * u_n + 0.10 * g_n
    gc = 0.80 * g_n + 0.20 * b_n
    bl = 0.70 * b_n + 0.40 * u_n
    return jnp.clip(jnp.stack([r, gc, bl], axis=2), 0.0, 1.0)


def map_linear_matrix(u, b, g, m: np.ndarray) -> jnp.ndarray:
    """sRGB_linear = M . [U,B,G]^T (uv_mappers.py:45-50)."""
    c = jnp.stack([u, b, g], axis=-1)
    return jnp.einsum("...j,ij->...i", c, jnp.asarray(m, jnp.float32), precision="highest")


def map_opponent(u, b, g, eps: float = EPS_DEFAULT) -> jnp.ndarray:
    """Opponent (HSV-like) mapping (uv_mappers.py:53-64)."""
    o1 = g - b
    o2 = b - u
    lum = (u + b + g) / 3.0
    angle = jnp.arctan2(o2, o1)
    hue = (angle + jnp.pi) / (2 * jnp.pi)
    radius = jnp.sqrt(o1 * o1 + o2 * o2)
    sat = radius / (percentile(radius, 95.0) + eps)
    val = lum / (percentile(lum, 95.0) + eps)
    hsv = jnp.stack([hue, jnp.clip(sat, 0, 1), jnp.clip(val, 0, 1)], axis=2)
    return hsv_to_rgb(hsv)


def _s2l(v: np.ndarray) -> np.ndarray:
    a = 0.055
    return np.where(v <= 0.04045, v / 12.92, ((v + a) / (1 + a)) ** 2.4).astype(np.float32)


def map_uv_purple_yellow(u, eps: float = EPS_DEFAULT) -> jnp.ndarray:
    """UV-only purple<->yellow (uv_mappers.py:67-87; p99, gamma 0.85)."""
    if u.ndim == 3:
        u = u[..., 0]
    denom = jnp.maximum(percentile(u, 99.0), eps)
    un = jnp.clip(u / denom, 0.0, 1.0) ** 0.85
    c0 = _s2l(np.array([128, 0, 150], np.float32) / 255.0)
    c1 = _s2l(np.array([255, 225, 60], np.float32) / 255.0)
    rgb = (1.0 - un[..., None]) * c0 + un[..., None] * c1
    return jnp.clip(rgb, 0.0, 1.0)


def map_uv_purple_yellow_soft(
    u,
    u_gamma: float = 0.90,
    accent_gamma: float = 0.85,
    accent_strength: float = 0.05,
    eps: float = EPS_DEFAULT,
) -> jnp.ndarray:
    """Pastel UV-only mapping with luminance retarget and Reinhard compression
    (uv_mappers.py:90-132; p98)."""
    if u.ndim == 3:
        u = u[..., 0]
    denom = jnp.maximum(percentile(u, 98.0), eps)
    un = jnp.clip(u / denom, 0.0, 1.0) ** u_gamma
    c0 = _s2l(np.array([176, 124, 232], np.float32) / 255.0)
    c1 = _s2l(np.array([255, 211, 138], np.float32) / 255.0)
    rgb = (1.0 - un[..., None]) * c0 + un[..., None] * c1
    gray = np.array([0.5, 0.5, 0.5], np.float32)
    if accent_strength > 0:
        w = (un**accent_gamma)[..., None]
        rgb = rgb + accent_strength * w * (c0 - gray)
    y = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2] + eps
    y_target = jnp.clip(0.22 + 0.55 * un, 0.0, 1.0)
    gain = jnp.clip((y_target / y)[..., None], 0.6, 1.6)
    rgb = rgb * gain
    rgb = rgb / (1.0 + 0.6 * rgb)
    return jnp.clip(rgb, 0.0, 1.0)


def map_falsecolor_uv_mixed(u, b, g, alpha: float = 0.35) -> jnp.ndarray:
    """Blend falsecolor with the soft UV tint, p99-renormalized
    (uv_mappers.py:135-144)."""
    base = map_falsecolor(u, b, g)
    tint = map_uv_purple_yellow_soft(u)
    alpha = float(np.clip(alpha, 0.0, 1.0))
    mixed = (1.0 - alpha) * base + alpha * tint
    p99 = percentile(mixed, 99.0)
    mixed = jnp.where(p99 > EPS_DEFAULT, mixed / jnp.maximum(1.0, p99), mixed)
    return jnp.clip(mixed, 0.0, 1.0)
