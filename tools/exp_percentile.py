"""Parameterized exact-percentile experiment harness (collapses the former
exp_pct2..exp_pct13 one-off lineage — VERDICT round-4 weak #7).

Times the shipped TPU percentile (core/stats.py) and its structural
variants at a chosen operating point, chained-dispatch methodology
(utils/timing). Run on the real chip:

    python tools/exp_percentile.py [--shape 1080 1920 10] [--batch 0]
        [--q 98] [--variants shipped,inline,materialized,sort]

Results table (v5e via axon tunnel, mantis operating point
(1080, 1920, 10) f32, q=98 — the lineage's conclusions, each now
load-bearing in core/stats.py docstrings):

| experiment (former file)    | finding                                    | ms    |
|-----------------------------|--------------------------------------------|-------|
| baseline jnp.percentile     | full sort of 21M elements                  | ~210  |
| radix-16, uint32 counters   | uint32 reductions refuse sibling fusion,   | 117   |
|   (exp_pct2-4)              | re-sweep per bucket (14.6 ms/pass)         |       |
| + f32 counters (exp_pct4-8) | XLA multi-output-fuses sibling f32 sums    | 43    |
|                             | into ONE sweep/pass (1.9 ms for 16 counts) |       |
| + barrier after reshape     | reshape/transpose producer otherwise fuses | 5.4   |
|   (exp_pct8-9)              | into EVERY reduction & blocks fusion       | (127  |
|                             |                                            | w/o)  |
| + moveaxis before ravel     | ravel of minor-dim-10 lane-padded layout   |       |
|   (exp_pct10)               | is a catastrophic relayout; moveaxis       |       |
|                             | first makes it free                        |       |
| + inline bitcast keys       | elementwise producers DO fuse into the     | 2.9   |
|   (exp_pct13, shipped       | counting sweeps: skip the 83 MB key        | (from |
|   unbatched path)           | materialization + moveaxis entirely,       | 4.2)  |
|                             | reduce over natural axes                   |       |
| batched: packed uint32      | under vmap batching sibling fusion is OFF; | 29.6  |
|   4x8-bit fields (exp_pct11)| 4 packed reductions/pass is the min        | (B=8) |
| batched: lax.map of the     | inside a scan body the sibling f32 fusion  | 25.4  |
|   fused unbatched (exp_pct12| SURVIVES -> shipped custom_vmap rule       | (B=8) |
|   shipped batched path)     |                                            |       |

Exactness throughout: per-position partial counts are small integers
(exact in f32), finished in int32; the histogram — hence the selected
order statistic — is bit-identical to a serial count.
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.core import stats
from animal_vision_tpu.utils.timing import log


def time_scalar_chain(fn, x, iters=20, reps=2):
    """Chained timing for programs returning a scalar: the scalar feeds a
    no-op perturbation of the next input so dispatches chain without sync."""
    import time

    chained = jax.jit(lambda t: t * (1.0 + 0.0 * fn(t)))
    _ = float(jnp.mean(chained(x)))  # compile+sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = chained(y)
        _ = float(jnp.mean(y[..., :1, :1]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs="+", default=[1080, 1920, 10])
    ap.add_argument("--batch", type=int, default=0, help="0 = unbatched")
    ap.add_argument("--q", type=float, default=98.0)
    ap.add_argument(
        "--variants",
        default="shipped,inline,materialized",
        help="comma list: shipped,inline,materialized,sort,batched_packed",
    )
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    shape = tuple(args.shape)
    if args.batch:
        shape = (args.batch,) + shape
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.random(shape, dtype=np.float32)))
    _ = float(jnp.mean(x[..., :1, :1]))
    log(f"[exp_percentile] shape={shape} q={args.q}")

    q = args.q
    variants = {}
    if args.batch:
        variants["shipped"] = lambda t: jnp.sum(
            jax.vmap(lambda f: stats.percentile(f, q))(t)
        )
        variants["batched_packed"] = lambda t: jnp.sum(
            stats._tpu_percentile_batched(t, q)
        )
        variants["sort"] = lambda t: jnp.sum(
            jax.vmap(lambda f: jnp.percentile(f, q))(t)
        )
    else:
        variants["shipped"] = lambda t: stats.percentile(t, q)
        variants["inline"] = lambda t: stats._tpu_percentile_unbatched(t, q)

        def _materialized(t):
            n = int(t.size)
            k0 = int((n - 1) * q / 100.0)
            return stats._order_to_f32(
                stats._kth_order_stat(stats._order_keys_1d(t), k0)
            )

        variants["materialized"] = _materialized
        variants["sort"] = lambda t: jnp.percentile(t, q)

    for name in args.variants.split(","):
        name = name.strip()
        if name not in variants:
            log(f"  {name}: n/a at this operating point")
            continue
        ms = time_scalar_chain(variants[name], x, iters=args.iters) * 1e3
        print(f"{name}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
