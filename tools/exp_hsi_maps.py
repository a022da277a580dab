"""Measure band-map formulations for the analytic HSI path (rat_uv case:
129 bands at 0.55 scale -> the relu-sandwiched double matmul materializes a
~324 MB cube in HBM). Candidates:

- matmul: the current einsum -> relu -> einsum (cube in HBM).
- planar: per-band broadcast producer fused into per-map reduces (cube is
  recomputed inside each reduce's fusion; never materialized).
- scan: lax.scan over band chunks accumulating the maps (cube chunk-local).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(fn, *args, iters=20):
    y = fn(*args)
    _ = float(jnp.sum(y[:1, :2, :2]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        _ = float(jnp.sum(y[:1, :2, :2]))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    rng = np.random.default_rng(0)
    # rat_uv operating point: 0.55 scale of 1080p, 129 bands, 3 maps
    for tag, (h, w, nb, nm) in {
        "rat_uv 594x1056 B=129 n=3": (594, 1056, 129, 3),
        "mantis 270x480 B=81 n=10": (270, 480, 81, 10),
    }.items():
        x = jnp.asarray(rng.standard_normal((h, w, 3)).astype(np.float32) * 0.5)
        g = jnp.asarray(np.abs(rng.standard_normal((3, nb))).astype(np.float32))
        wm = jnp.asarray(rng.standard_normal((nb, nm)).astype(np.float32))

        @jax.jit
        def f_matmul(x, g=g, wm=wm):
            cube = jnp.einsum("hwc,cb->hwb", x, g, precision="highest")
            cube = jnp.maximum(cube, 0.0)
            return jnp.einsum("hwb,bn->hwn", cube, wm, precision="highest")

        @jax.jit
        def f_planar(x, g=g, wm=wm):
            planes = jnp.moveaxis(x, -1, 0)  # (3, H, W)
            cube = jnp.maximum(
                g[0][:, None, None] * planes[0]
                + g[1][:, None, None] * planes[1]
                + g[2][:, None, None] * planes[2],
                0.0,
            )  # (B, H, W) — fused into each reduce below
            maps = [jnp.sum(cube * wm[:, n][:, None, None], axis=0) for n in range(nm)]
            return jnp.stack(maps, axis=-1)

        @jax.jit
        def f_scan(x, g=g, wm=wm):
            nchunk = 16
            pad = (-nb) % nchunk
            gp = jnp.pad(g, ((0, 0), (0, pad))).reshape(3, -1, nchunk)
            wp = jnp.pad(wm, ((0, pad), (0, 0))).reshape(-1, nchunk, nm)

            def step(acc, args):
                gc, wc = args  # (3, nchunk), (nchunk, nm)
                cube = jnp.maximum(jnp.einsum("hwc,ck->hwk", x, gc), 0.0)
                return acc + jnp.einsum("hwk,kn->hwn", cube, wc), None

            acc0 = jnp.zeros((h, w, nm), jnp.float32)
            out, _ = jax.lax.scan(step, acc0, (jnp.moveaxis(gp, 1, 0), wp))
            return out

        y0 = f_matmul(x)
        for name, fn in [("matmul", f_matmul), ("planar", f_planar), ("scan", f_scan)]:
            ms = timeit(fn, x)
            err = float(jnp.max(jnp.abs(fn(x) - y0)))
            print(f"{tag} {name}: {ms:.3f} ms  maxerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
