"""Model packaging: checkpoints and compiled-artifact export, TPU-native.

The reference's compile.py exports torch models to ONNX (opset 17, optional
dynamic axes) for onnxruntime serving. The TPU-native equivalents:

- **Orbax checkpoints**: save/restore the flax param tree (replaces .pth;
  the torch->flax converter in models/mst_plus_plus.py covers importing
  reference .pth files).
- **StableHLO export**: serialize the jitted forward at a fixed input shape
  via jax.export — the portable compiled-artifact analogue of the ONNX
  file (loadable and executable by any StableHLO consumer, and
  ahead-of-time compilable for TPU serving).

Usage:
    python -m animal_vision_tpu.models.export --out dir \
        [--method mst_plus_plus] [--ckpt model.pth] [--height 256 --width 256]
"""

from __future__ import annotations

import argparse
import os


def save_checkpoint(path: str, variables) -> None:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), variables, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(path: str, template=None):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), target=template)


def export_stablehlo(module, variables, shape=(1, 256, 256, 3)) -> bytes:
    """Serialize the jitted forward (weights baked in) to portable
    StableHLO bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    fn = jax.jit(lambda x: module.apply(variables, x))
    exported = jexport.export(fn)(jax.ShapeDtypeStruct(shape, jnp.float32))
    return exported.serialize()


def load_stablehlo(data: bytes):
    """Deserialize an exported StableHLO artifact back to a callable."""
    from jax import export as jexport

    return jexport.deserialize(data).call


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="export checkpoints / StableHLO")
    ap.add_argument("--out", required=True)
    ap.add_argument("--method", default="mst_plus_plus")
    ap.add_argument("--ckpt", default=None, help="torch .pth to convert first")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument(
        "--to-torch",
        action="store_true",
        help="also save a reference-layout torch .pth (mst_plus_plus only) — "
        "loads into the reference model and through its ONNX export CLI "
        "(predict_code/compile.py, opset 17); the onnx package itself is "
        "not available in this environment",
    )
    args = ap.parse_args(argv)

    from animal_vision_tpu.models.zoo import model_generator

    module, variables = model_generator(args.method, args.ckpt)
    os.makedirs(args.out, exist_ok=True)
    save_checkpoint(os.path.join(args.out, f"{args.method}_orbax"), variables)
    blob = export_stablehlo(module, variables, (1, args.height, args.width, 3))
    hlo_path = os.path.join(args.out, f"{args.method}_{args.height}x{args.width}.stablehlo")
    with open(hlo_path, "wb") as f:
        f.write(blob)
    extra = ""
    if args.to_torch:
        import torch

        from animal_vision_tpu.models.mst_plus_plus import export_torch_state

        sd = {
            k: torch.from_numpy(v.copy())
            for k, v in export_torch_state(variables).items()
        }
        pth = os.path.join(args.out, f"{args.method}.pth")
        torch.save({"state_dict": sd}, pth)
        extra = f" + torch state_dict {pth}"
    print(f"saved orbax checkpoint + {len(blob)} bytes StableHLO -> {args.out}{extra}")


if __name__ == "__main__":
    main()
