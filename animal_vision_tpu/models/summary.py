"""Model param/FLOP summary.

Parity: test_develop_code/utils.py:63-70 ``my_summary`` — fvcore
FlopCountAnalysis at (N, C, 256, 256) plus a parameter count. Here XLA's
own cost analysis of the jitted forward provides the FLOP count (no
external dependency, and it reflects what actually runs on the chip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def summarize(method: str, h: int = 256, w: int = 256):
    from animal_vision_tpu.models.zoo import model_generator

    module, variables = model_generator(method)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    lowered = jax.jit(lambda v, a: module.apply(v, a)).lower(
        variables, jnp.zeros((1, h, w, 3), jnp.float32)
    )
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", float("nan"))) if cost else float("nan")
    return {"method": method, "params": int(n_params), "flops": flops}


def main(argv=None) -> None:
    import argparse

    from animal_vision_tpu.models.zoo import available_models

    ap = argparse.ArgumentParser(description="params/FLOPs per zoo model")
    ap.add_argument("--method", default=None, help="default: all")
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args(argv)
    methods = [args.method] if args.method else available_models()
    for m in methods:
        try:
            s = summarize(m, args.size, args.size)
            gmac = s["flops"] / 2 / (1024**3) if np.isfinite(s["flops"]) else float("nan")
            print(f"{m:16s} params {s['params']/1e6:8.2f} M   "
                  f"flops {s['flops']/1e9:10.2f} G ({gmac:.2f} GMac) @ {args.size}x{args.size}")
        except Exception as e:  # some archs need more memory at 256
            print(f"{m:16s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
