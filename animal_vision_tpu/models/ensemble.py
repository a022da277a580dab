"""8-way self-ensemble inference + single-image demo tool.

Parity: predict_code/test.py — forward_ensemble (:52-80) runs the model on
all (xflip, yflip, transpose) combinations, inverts each transform, and
reduces by mean or median; test() (:30-49) min-max-normalizes one RGB,
reconstructs, clamps to [0,1], and saves a v7.3 .mat 'cube'.

Notes: torch.flip dims [3]/[2] on NCHW are W/H -> NHWC axes 2/1; for the
even (8-way) stack, ``torch.median`` returns the LOWER middle element, not
the average — reproduced via sort + index (n-1)//2.
"""

from __future__ import annotations

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _transform(data, xflip, yflip, transpose, reverse=False):
    if not reverse:
        if xflip:
            data = data[:, :, ::-1, :]
        if yflip:
            data = data[:, ::-1, :, :]
        if transpose:
            data = jnp.swapaxes(data, 1, 2)
    else:
        if transpose:
            data = jnp.swapaxes(data, 1, 2)
        if yflip:
            data = data[:, ::-1, :, :]
        if xflip:
            data = data[:, :, ::-1, :]
    return data


def forward_ensemble(apply_fn, x, ensemble_mode: str = "mean"):
    """x: (B, H, W, 3). Returns the 8-view ensembled (B, H, W, 31)."""
    outputs = []
    for xflip, yflip, transpose in itertools.product((False, True), repeat=3):
        data = _transform(x, xflip, yflip, transpose)
        data = apply_fn(data)
        outputs.append(_transform(data, xflip, yflip, transpose, reverse=True))
    stack = jnp.stack(outputs, axis=0)
    if ensemble_mode == "mean":
        return jnp.mean(stack, axis=0)
    if ensemble_mode == "median":
        # torch.median on even counts picks the lower middle element
        return jnp.sort(stack, axis=0)[(stack.shape[0] - 1) // 2]
    raise ValueError(ensemble_mode)


def predict_image(
    rgb_path: str,
    method: str = "mst_plus_plus",
    pretrained_model_path: str | None = None,
    outf: str | None = None,
    ensemble_mode: str = "mean",
) -> np.ndarray:
    """Reconstruct one RGB image with the self-ensemble and optionally save
    the clamped cube as v7.3 .mat (predict_code/test.py:30-49)."""
    from animal_vision_tpu.models.eval import load_rgb_minmax, save_mat_cube
    from animal_vision_tpu.models.zoo import model_generator

    module, variables = model_generator(method, pretrained_model_path)
    rgb = load_rgb_minmax(rgb_path)
    fn = jax.jit(lambda v, a: forward_ensemble(
        lambda t: module.apply(v, t), a, ensemble_mode))
    cube = np.asarray(fn(variables, jnp.asarray(rgb)[None])[0])
    cube = np.clip(cube, 0.0, 1.0)
    if outf:
        os.makedirs(outf, exist_ok=True)
        stem = os.path.splitext(os.path.basename(rgb_path))[0]
        save_mat_cube(os.path.join(outf, stem + ".mat"), cube)
    return cube


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="self-ensemble HSI reconstruction")
    ap.add_argument("--rgb-path", required=True)
    ap.add_argument("--method", default="mst_plus_plus")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--outf", default=None)
    ap.add_argument("--ensemble-mode", default="mean", choices=("mean", "median"))
    args = ap.parse_args(argv)
    cube = predict_image(args.rgb_path, args.method, args.ckpt, args.outf, args.ensemble_mode)
    print(f"{args.method} {args.ensemble_mode}-ensemble cube: {cube.shape} "
          f"range [{cube.min():.4f}, {cube.max():.4f}]")


if __name__ == "__main__":
    main()
