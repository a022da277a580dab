"""HSI reconstruction quality metrics.

Parity: ml/MST_plus_plus/test_develop_code/utils.py:26-61 (Loss_MRAE,
Loss_RMSE, Loss_PSNR). The reference's PSNR variant averages per-image MSE
over a data_range of 255 after scaling; we reproduce both the standard and
the reference formulations.
"""

from __future__ import annotations

import jax.numpy as jnp


def mrae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean relative absolute error: mean(|pred-target| / target)."""
    return jnp.mean(jnp.abs(pred - target) / target)


def rmse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean((pred - target) ** 2))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """Reference Loss_PSNR semantics: clamp both to [0,1], scale to
    [0, data_range], per-image mean over (C,H,W) of MSE, then
    10*log10(dr^2/mse), averaged (utils.py:47-61 clamps im_true and
    im_fake before .mul_(data_range))."""
    p = jnp.clip(pred, 0.0, 1.0) * data_range
    t = jnp.clip(target, 0.0, 1.0) * data_range
    mse = jnp.mean((p - t) ** 2, axis=tuple(range(1, pred.ndim)))
    return jnp.mean(10.0 * jnp.log10((data_range**2) / mse))
