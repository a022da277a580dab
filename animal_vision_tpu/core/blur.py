"""Gaussian blurs with OpenCV-matched semantics, as fusable JAX ops.

The reference leans on ``cv2.GaussianBlur`` in two conventions:

1. Auto kernel size from sigma (``ksize=(0,0)``) — used by the non-UV ops
   (animals/animal_utils.py:144,168-171,195-198,295). For non-uint8 images
   OpenCV picks ``ksize = round(sigma*4*2 + 1) | 1`` per axis and uses
   BORDER_REFLECT_101.
2. Explicit ``k = 2*ceil(3*sigma)+1`` with BORDER_REFLECT101 — the UV helper
   (uv_helpers.py:67-73).

Both reduce to separable 1-D convolutions with an OpenCV ``getGaussianKernel``
kernel. Here each 1-D pass is a static weighted sum of shifted slices — XLA
fuses the whole chain into a handful of VPU passes over HBM tiles, which is
exactly what we want for the >=1000 fps/chip non-UV budget.

The per-row variable-sigma "visual streak" blur
(animals/animal_utils.py:147-172) is reproduced *including its quirks*: the
reference iterates rows and calls ``cv2.GaussianBlur`` on each ``(W, 3)`` row
array, which OpenCV interprets as a Wx3 single-channel image. Consequently:
  - pass 1 blurs along W with sigmaX[y] AND mixes the 3 channels with the same
    kernel (reflect-101 over the 3-length channel axis);
  - pass 2 blurs along W with sigmaY[y] (channel kernel size is 1);
  - there is NO vertical blur at all.
We collapse the reference's 2*H sequential OpenCV calls into one vectorized
pass with per-row kernel weight tables (a single fused TPU program).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np



def cv2_auto_ksize(sigma: float, uint8_depth: bool = False) -> int:
    """OpenCV's automatic Gaussian kernel size for ``ksize=(0,0)``.

    ``ksize = round(sigma * (3 if 8U else 4) * 2 + 1) | 1`` with banker's
    rounding (cvRound). All reference call sites pass float32 images.
    """
    factor = 3 if uint8_depth else 4
    k = int(np.round(sigma * factor * 2 + 1)) | 1
    return max(k, 1)


def uv_ksize(sigma: float) -> int:
    """The UV helper's explicit kernel size ``2*ceil(3*sigma)+1``
    (uv_helpers.py:72)."""
    return int(2 * math.ceil(3 * sigma) + 1)


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """OpenCV ``getGaussianKernel``: exp taps computed in float64, normalized
    to sum 1, then cast to float32 (the kernel dtype OpenCV uses when
    filtering float32 images)."""
    if ksize == 1:
        return np.ones((1,), dtype=np.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def blur_profile_1d(profile: np.ndarray, sigma: float) -> np.ndarray:
    """Trace-time 1-D UV-convention blur (k=2*ceil(3*sigma)+1, reflect-101)
    of a per-row profile, in NumPy.

    Used for the scanline row gains (mantis_shrimp.py:252-265,
    jumping_spider scanlines): the reference Gaussian-blurs an (H, W)
    row-constant image, but the x pass of a separable blur over constant
    rows is the identity (the kernel sums to 1) and the y pass is this 1-D
    convolution of the profile — so the whole (H, W) runtime blur folds to
    an (H,) constant computed at trace time. Sub-ulp equal to the 2-D path
    (the only deviation is the f32 kernel sum's ~2^-24 off-unity)."""
    if sigma <= 0:
        return profile.astype(np.float32)
    k = uv_ksize(sigma)
    kern = gaussian_kernel_1d(k, sigma).astype(np.float32)
    r = k // 2
    n = profile.shape[0]
    idx = reflect101_index(np.arange(-r, n + r), n)
    padded = profile.astype(np.float32)[idx]
    out = np.zeros(n, dtype=np.float32)
    for t in range(k):
        out += kern[t] * padded[t : t + n]
    return out


def reflect101_index(p: np.ndarray | int, n: int) -> np.ndarray | int:
    """Map (possibly out-of-range) coordinates onto [0, n) with
    BORDER_REFLECT_101 semantics (``gfedcb|abcdefgh|gfedcba``), supporting
    arbitrarily wide borders via the period-2(n-1) reflection."""
    if n == 1:
        return np.zeros_like(np.asarray(p))
    period = 2 * (n - 1)
    m = np.mod(p, period)
    return np.where(m < n, m, period - m)


def _pad_reflect101(img: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    """Pad ``img`` along ``axis`` by ``pad`` on both sides with reflect-101."""
    if pad == 0:
        return img
    n = img.shape[axis]
    idx = reflect101_index(np.arange(-pad, n + pad), n).astype(np.int32)
    return jnp.take(img, jnp.asarray(idx), axis=axis)


def conv1d_axis(img: jnp.ndarray, kernel: np.ndarray, axis: int) -> jnp.ndarray:
    """Correlate ``img`` with a 1-D ``kernel`` along ``axis`` using
    reflect-101 borders. Static weighted sum of shifted slices (XLA fuses)."""
    k = int(kernel.shape[0])
    if k == 1:
        return img * float(kernel[0])
    pad = k // 2
    padded = _pad_reflect101(img, pad, axis)
    n = img.shape[axis]
    out = None
    for t in range(k):
        sl = [slice(None)] * padded.ndim
        sl[axis] = slice(t, t + n)
        term = padded[tuple(sl)] * float(kernel[t])
        out = term if out is None else out + term
    return out


def gaussian_blur(
    img: jnp.ndarray,
    sigma_x: float,
    sigma_y: float | None = None,
    ksize: tuple[int, int] | None = None,
    axes: tuple[int, int] = (-2, -3),
) -> jnp.ndarray:
    """Separable Gaussian blur with OpenCV auto kernel sizing by default.

    ``axes`` is (x_axis, y_axis) of the image; defaults fit (..., H, W, C)
    and (H, W) layouts alike when C is last: x=W is axis -2 for HWC.  For a
    2-D (H, W) array pass ``axes=(-1, -2)``.
    Matches ``cv2.GaussianBlur(img, ksize or (0,0), sigmaX, sigmaY)`` on
    float32 images (BORDER_REFLECT_101). If ``sigma_y`` is None or 0 it
    defaults to ``sigma_x`` (OpenCV semantics).
    """
    if sigma_y is None or sigma_y <= 0:
        sigma_y = sigma_x
    if ksize is None:
        kx = cv2_auto_ksize(sigma_x)
        ky = cv2_auto_ksize(sigma_y)
    else:
        kx, ky = ksize
        if kx <= 0:
            kx = cv2_auto_ksize(sigma_x)
        if ky <= 0:
            ky = cv2_auto_ksize(sigma_y)
    out = conv1d_axis(img, gaussian_kernel_1d(kx, float(sigma_x)), axes[0])
    out = conv1d_axis(out, gaussian_kernel_1d(ky, float(sigma_y)), axes[1])
    return out


def gaussian_blur_hwc(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Auto-ksize isotropic blur for (H, W, C) images.
    Parity: apply_acuity_blur (animals/animal_utils.py:121-145)."""
    return gaussian_blur(img, sigma, sigma, axes=(-2, -3))


def gaussian_blur_hw(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Auto-ksize isotropic blur for 2-D (H, W) arrays."""
    return gaussian_blur(img, sigma, sigma, axes=(-1, -2))


def _use_pallas_blur(img) -> bool:
    """Route TPU executions of f32 image blurs to the fused Pallas kernel
    (one HBM pass vs one pass per tap); CPU keeps the XLA taps (fast eager,
    used by the parity tests). Traced arrays can't be dispatched on —
    pipelines jit whole programs, where shapes are concrete."""
    import jax

    if jax.default_backend() == "cpu":
        return False
    if img.ndim not in (2, 3) or (img.ndim == 3 and img.shape[-1] > 8):
        return False
    return img.shape[0] >= 16 and img.shape[1] >= 16 and img.dtype == jnp.float32


def gaussian_blur_uv(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """UV-helper blur: explicit ``k=2*ceil(3*sigma)+1`` kernel, reflect-101.
    Works on (H, W) or (H, W, C). Parity: uv_helpers.py:67-73."""
    if sigma <= 0:
        return img
    k = uv_ksize(sigma)
    if _use_pallas_blur(img):
        from animal_vision_tpu.ops.fused_blur import fused_gaussian_blur

        return fused_gaussian_blur(img, float(sigma), ksize=k)
    if img.ndim == 2:
        return gaussian_blur(img, sigma, sigma, ksize=(k, k), axes=(-1, -2))
    return gaussian_blur(img, sigma, sigma, ksize=(k, k), axes=(-2, -3))


def _channel_mix_matrix(ksize: int, sigma: float, channels: int = 3) -> np.ndarray:
    """Fold a 1-D Gaussian kernel applied over a tiny ``channels``-length axis
    (with reflect-101 multireflection) into a channels x channels matrix."""
    kern = gaussian_kernel_1d(ksize, sigma).astype(np.float64)
    r = ksize // 2
    m = np.zeros((channels, channels), dtype=np.float64)
    for c in range(channels):
        for t in range(ksize):
            src = reflect101_index(c + t - r, channels)
            m[c, int(src)] += kern[t]
    return m.astype(np.float32)


def streak_sigma_map(
    height: int,
    y_center: float,
    sigma_streak: float,
    sigma_far: float,
    falloff: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (sigmaX, sigmaY) of the visual-streak blur
    (animals/animal_utils.py:156-162): sigma rises smoothly away from the
    streak row; sigmaX = max(0.4, 0.5*sigma)."""
    yy = np.linspace(0.0, 1.0, height, dtype=np.float32)
    d = np.abs(yy - y_center)
    smap = sigma_streak + (sigma_far - sigma_streak) * (1.0 - np.exp(-falloff * d * d))
    return np.maximum(0.4, 0.5 * smap), smap


def _row_kernel_table(sigmas: np.ndarray) -> tuple[np.ndarray, int]:
    """Stack per-row auto-ksize Gaussian kernels into an (H, Kmax) table,
    zero-padded and center-aligned."""
    ks = [cv2_auto_ksize(float(s)) for s in sigmas]
    kmax = max(ks)
    table = np.zeros((len(sigmas), kmax), dtype=np.float32)
    for y, (s, k) in enumerate(zip(sigmas, ks)):
        kern = gaussian_kernel_1d(k, float(s))
        off = (kmax - k) // 2
        table[y, off : off + k] = kern
    return table, kmax


def _rowwise_conv_w(img: jnp.ndarray, table: np.ndarray, kmax: int) -> jnp.ndarray:
    """Per-row 1-D convolution along W of an (H, W, C) image, kernels from an
    (H, Kmax) table, reflect-101 border along W."""
    h, w = img.shape[0], img.shape[1]
    pad = kmax // 2
    padded = _pad_reflect101(img, pad, axis=1)
    tab = jnp.asarray(table)
    out = None
    for t in range(kmax):
        term = padded[:, t : t + w, :] * tab[:, t][:, None, None]
        out = term if out is None else out + term
    return out


def streak_blur(
    img: jnp.ndarray,
    y_center: float = 0.5,
    sigma_streak: float = 0.8,
    sigma_far: float = 2.2,
    falloff: float = 6.0,
) -> jnp.ndarray:
    """Anisotropic acuity blur with a sharp horizontal "visual streak".

    Bit-behavior parity with apply_anisotropic_acuity_blur_with_streak
    (animals/animal_utils.py:147-172) including its row-slice quirk (see
    module docstring): for each row y,
      pass 1: blur along W with sigmaX[y] AND mix channels with the same
              kernel folded over the 3-length axis (reflect-101);
      pass 2: blur along W with sigmaY[y] (channel kernel width 1).
    The reference runs 2*H sequential OpenCV calls; here both passes are two
    vectorized shifted-sum convolutions plus one per-row 3x3 channel matmul.
    """
    h = img.shape[0]
    sx, sy = streak_sigma_map(h, y_center, sigma_streak, sigma_far, falloff)

    # Pass 1: horizontal blur with sigmaX per row + channel mixing.
    tab1, kmax1 = _row_kernel_table(sx)
    out = _rowwise_conv_w(img, tab1, kmax1)
    mix = np.stack(
        [_channel_mix_matrix(cv2_auto_ksize(float(s)), float(s)) for s in sx], axis=0
    )  # (H, 3, 3)
    # precision='highest': the default matmul precision truncates to bf16 on
    # TPU, which costs ~3e-3 absolute error — fatal for the 40 dB parity
    # budget. These matrices are 3x3; full precision is free.
    out = jnp.einsum("hij,hwj->hwi", jnp.asarray(mix), out, precision="highest")

    # Pass 2: horizontal blur with sigmaY per row (channel kernel = 1 tap).
    tab2, kmax2 = _row_kernel_table(sy)
    out = _rowwise_conv_w(out, tab2, kmax2)
    return out
