"""Tiled full-resolution inference with Hann-feathered stitching.

Parity: predict_code/predict_static.py:66-196 — fixed tiles with 64-px
overlap, 2-D Hann-window weighted accumulation, normalize, crop. On TPU the
preferred full-res path is simply jitting the whole frame (HBM planning is
static; SURVEY.md §5.7), and spatial sharding gives exact halos — but the
tiled mode remains useful to bound compile shapes (one compiled program
serves any frame size) and as the compatibility-mode equivalent of the
reference's ONNX static-batch predictor.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def hann2d(size: int) -> np.ndarray:
    """2-D Hann window (outer product of 1-D Hann, +eps so weights never
    vanish at tile corners; predict_static.py:6-9 behavior)."""
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(size) / max(size - 1, 1))
    return (np.outer(w, w) + 1e-3).astype(np.float32)


def _tile_starts(extent: int, tile: int, stride: int) -> list[int]:
    if extent <= tile:
        return [0]
    starts = list(range(0, extent - tile + 1, stride))
    if starts[-1] != extent - tile:
        starts.append(extent - tile)
    return starts


def predict_tiled(
    apply_fn,
    frame: np.ndarray,
    tile: int = 256,
    overlap: int = 64,
    out_channels: int = 31,
) -> np.ndarray:
    """Run ``apply_fn`` ((T,T,3) -> (T,T,C)) over overlapping tiles of an
    (H, W, 3) frame with Hann-feathered accumulation. Frames smaller than
    ``tile`` are reflect-padded up (the reference reflect-pads to tile
    cover, predict_static.py:100-115)."""
    h, w = frame.shape[:2]
    ph, pw = max(0, tile - h), max(0, tile - w)
    if ph or pw:
        frame = np.pad(frame, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    fh, fw = frame.shape[:2]
    stride = tile - overlap
    win = hann2d(tile)[..., None]
    acc = np.zeros((fh, fw, out_channels), np.float32)
    norm = np.zeros((fh, fw, 1), np.float32)
    # batch all tiles through one compiled program
    starts = [(y, x) for y in _tile_starts(fh, tile, stride) for x in _tile_starts(fw, tile, stride)]
    tiles = np.stack([frame[y : y + tile, x : x + tile] for y, x in starts])
    outs = np.asarray(apply_fn(jnp.asarray(tiles)))
    for (y, x), out in zip(starts, outs):
        acc[y : y + tile, x : x + tile] += out * win
        norm[y : y + tile, x : x + tile] += win
    return (acc / norm)[:h, :w]
