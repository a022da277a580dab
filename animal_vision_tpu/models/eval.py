"""ARAD_1K evaluation harness: MRAE / RMSE / PSNR over validation scenes.

Parity: ml/MST_plus_plus/test_develop_code/test.py:46-86 — per-scene RGB ->
model -> compare against the ground-truth 'cube' on the 128-px center crop
(crop: [128:-128, 128:-128]), averaged with AverageMeter semantics; plus the
dataset loaders' normalization (hsi_dataset.py:68-122: RGB min-max
normalized per scene, float32). .mat cubes are read with h5py (MATLAB v7.3,
the ARAD format) or scipy.io for older files.

Usage:
    python -m animal_vision_tpu.models.eval --data-root <dir> \
        [--method mst_plus_plus] [--ckpt model.pth] [--split-txt valid_list.txt]

Expects <dir>/Valid_RGB/*.jpg and <dir>/Valid_Spec/*.mat (ARAD layout).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_mat_cube(path: str, key: str = "cube") -> np.ndarray:
    """(H, W, B) float32 cube from a MATLAB file (v7.3 via h5py or legacy
    via scipy.io)."""
    try:
        import h5py

        with h5py.File(path, "r") as f:
            arr = np.asarray(f[key])  # v7.3 stores transposed (B, W, H)
        return np.transpose(arr, (2, 1, 0)).astype(np.float32)
    except OSError:
        from scipy.io import loadmat

        return np.asarray(loadmat(path)[key], dtype=np.float32)


def save_mat_cube(path: str, cube: np.ndarray, key: str = "cube") -> None:
    """Save (H, W, B) as a MATLAB-v7.3-readable file (the reference saves
    outputs via hdf5storage's save_matv73, test.py:80-85).

    MATLAB v7.3 is HDF5 plus (a) a 512-byte userblock whose bytes 124-127
    are the version/endian marker ``\\x00\\x02IM`` and (b) a per-dataset
    ``MATLAB_class`` attribute; both are written here so MATLAB's ``load``
    accepts the file (plain h5py output without them is rejected)."""
    import h5py

    data = np.transpose(cube, (2, 1, 0))
    mat_class = {"float32": b"single", "float64": b"double"}.get(
        str(data.dtype), b"double"
    )
    with h5py.File(path, "w", userblock_size=512) as f:
        ds = f.create_dataset(key, data=data)
        ds.attrs.create("MATLAB_class", np.bytes_(mat_class))
    header = (
        b"MATLAB 7.3 MAT-file, Platform: posix, "
        b"Created by: animal_vision_tpu "
        b"HDF5 schema 1.00 ."
    )[:116].ljust(116) + b" " * 8 + b"\x00\x02IM"
    with open(path, "r+b") as f:
        f.write(header.ljust(512, b"\x00"))


def load_rgb_minmax(path: str) -> np.ndarray:
    """Scene RGB, per-scene min-max normalized float32
    (hsi_dataset.py:96-104 ValidDataset behavior)."""
    import cv2

    bgr = cv2.imread(path)
    if bgr is None:
        raise FileNotFoundError(path)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32)
    rgb = (rgb - rgb.min()) / max(rgb.max() - rgb.min(), 1e-8)
    return rgb


def validate(
    apply_fn,
    scenes: list[tuple[np.ndarray, np.ndarray]],
    crop: int = 128,
    awan_protocol: bool = False,
):
    """Average MRAE/RMSE/PSNR of ``apply_fn(rgb)->cube`` over (rgb, gt)
    scenes with the reference's center-crop protocol. ``awan_protocol``
    reproduces test.py:56-60: the INPUT is pre-cropped [118:-118] (memory
    workaround) and the output loses a further [10:-10], comparing against
    target[128:-128] — the same region as everyone else."""
    import jax.numpy as jnp

    from animal_vision_tpu.models import metrics

    sums = {"mrae": 0.0, "rmse": 0.0, "psnr": 0.0}
    for rgb, gt in scenes:
        if awan_protocol and min(rgb.shape[:2]) > 2 * crop:
            pred = np.asarray(apply_fn(rgb[118:-118, 118:-118]))
            p = pred[10:-10, 10:-10]
            g = gt[crop:-crop, crop:-crop]
            pj, gj = jnp.asarray(p[None]), jnp.asarray(g[None])
            sums["mrae"] += float(metrics.mrae(pj, gj))
            sums["rmse"] += float(metrics.rmse(pj, gj))
            sums["psnr"] += float(metrics.psnr(pj, gj, data_range=255.0))
            continue
        pred = np.asarray(apply_fn(rgb))
        # crop=0 must mean "no crop" ([0:-0] would slice to empty)
        p = pred[crop:-crop, crop:-crop] if 0 < 2 * crop < min(pred.shape[:2]) else pred
        g = gt[crop:-crop, crop:-crop] if 0 < 2 * crop < min(gt.shape[:2]) else gt
        pj, gj = jnp.asarray(p[None]), jnp.asarray(g[None])
        sums["mrae"] += float(metrics.mrae(pj, gj))
        sums["rmse"] += float(metrics.rmse(pj, gj))
        sums["psnr"] += float(metrics.psnr(pj, gj, data_range=255.0))
    n = max(1, len(scenes))
    return {k: v / n for k, v in sums.items()}


def iter_dataset(data_root: str, split_txt: str | None = None):
    """Yield (name, rgb, gt) per validation scene (ARAD layout)."""
    rgb_dir = os.path.join(data_root, "Valid_RGB")
    spec_dir = os.path.join(data_root, "Valid_Spec")
    if split_txt and os.path.exists(split_txt):
        names = [l.strip() for l in open(split_txt) if l.strip()]
    else:
        names = sorted(os.path.splitext(f)[0] for f in os.listdir(spec_dir) if f.endswith(".mat"))
    for name in names:
        rgb = load_rgb_minmax(os.path.join(rgb_dir, name + ".jpg"))
        gt = load_mat_cube(os.path.join(spec_dir, name + ".mat"))
        yield name, rgb, gt


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="ARAD_1K HSI reconstruction eval")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--method", default="mst_plus_plus")
    ap.add_argument("--ckpt", default=None, help="torch .pth to convert, else random init")
    ap.add_argument("--split-txt", default=None)
    ap.add_argument("--save-dir", default=None, help="save predictions as v7.3 .mat")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from animal_vision_tpu.models.zoo import model_generator

    module, variables = model_generator(args.method, args.ckpt)

    def apply_fn(rgb):
        return module.apply(variables, jnp.asarray(rgb)[None])[0]

    named = list(iter_dataset(args.data_root, args.split_txt))
    if args.save_dir:
        # test.py:80-85 parity: every per-scene prediction cube is saved as
        # a MATLAB-v7.3 .mat, clipped to [0, 1].
        os.makedirs(args.save_dir, exist_ok=True)
        for name, rgb, _ in named:
            pred = np.clip(np.asarray(apply_fn(rgb), dtype=np.float32), 0.0, 1.0)
            save_mat_cube(os.path.join(args.save_dir, name + ".mat"), pred)
    scenes = [(rgb, gt) for _, rgb, gt in named]
    result = validate(apply_fn, scenes, awan_protocol=(args.method == "awan"))
    print(
        f"{args.method}: MRAE {result['mrae']:.4f}  RMSE {result['rmse']:.4f}  "
        f"PSNR {result['psnr']:.2f} dB over {len(scenes)} scenes"
    )


if __name__ == "__main__":
    main()
