"""Scratch: time the fused MSAB passes at each level, plus the XLA convs
between blocks, to see where full-res MST++ time goes."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timeit(fn, *args, iters=20):
    y = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0][:1, :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0][:1, :1]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from animal_vision_tpu.ops import fused_msab as F

    rng = np.random.default_rng(0)
    for name, H, W, heads in [("L0", 1088, 1920, 1), ("L1", 544, 960, 2), ("L2", 272, 480, 4)]:
        C = 31 * heads
        x = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32) * 0.3)
        def mk(*s, scale=0.2):
            return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)
        wq, wk, wv, wp = mk(C, C), mk(C, C), mk(C, C), mk(C, C)
        bp, pk0, pk2 = mk(1, C), mk(9, C), mk(9, C)
        lns, lnb = jnp.ones((1, C)), jnp.zeros((1, C))
        w0, dwk, w4 = mk(C, 4 * C), mk(9, 4 * C), mk(4 * C, C)
        abd = mk(C, C)
        t = F._pick_t(H, C)

        f_stats = jax.jit(lambda a, b, c_: F._attn_stats(a, b, c_, t=t))
        f_apply = jax.jit(lambda *a: F._apply(*a, t=t))
        ta = timeit(f_stats, x, wq, wk)
        tb = timeit(f_apply, x, abd, wv, wp, bp, pk0, pk2, lns, lnb, w0, dwk, w4)
        gb = x.size * 4 / 1e9
        print(f"{name} ({H}x{W}x{C}, t={t}): passA {ta:.2f} ms  passB {tb:.2f} ms  "
              f"(x = {gb*1e3:.0f} MB; passB eff bw {(2*gb)/(tb/1e3):.0f} GB/s)")

    # XLA conv3x3 31->31 at full-res for comparison
    x = jnp.asarray(rng.standard_normal((1, 1088, 1920, 31)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((3, 3, 31, 31)).astype(np.float32) * 0.1)
    conv = jax.jit(lambda v: jax.lax.conv_general_dilated(
        v, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    print(f"XLA conv3x3 31->31 @L0: {timeit(conv, x):.2f} ms")
    k2 = jnp.asarray(rng.standard_normal((4, 4, 31, 62)).astype(np.float32) * 0.1)
    down = jax.jit(lambda v: jax.lax.conv_general_dilated(
        v, k2, (2, 2), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")))
    print(f"XLA conv4x4s2 31->62 @L0: {timeit(down, x):.2f} ms")


if __name__ == "__main__":
    main()
