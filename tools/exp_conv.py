"""Scratch: why is XLA conv3x3 31->31 at 1088x1920 10 ms? Try C padded to
32, NCHW, and shift-add formulations."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
H, W = 1088, 1920


def timeit(fn, *args, iters=20):
    y = fn(*args)
    _ = float(jnp.sum(y[:1, :1, :1, :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    _ = float(jnp.sum(y[:1, :1, :1, :1]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    for cin, cout, label in [(31, 31, "31->31"), (32, 32, "32->32 (padded)")]:
        x = jnp.asarray(rng.standard_normal((1, H, W, cin)).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1)
        conv = jax.jit(lambda v, kk: jax.lax.conv_general_dilated(
            v, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
        print(f"conv3x3 {label} NHWC: {timeit(conv, x, k):.2f} ms")

    cin = cout = 31
    x = jnp.asarray(rng.standard_normal((1, H, W, cin)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1)

    def shift_add(v, kk):
        xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                piece = jnp.einsum(
                    "bhwc,cd->bhwd", xp[:, dy : dy + H, dx : dx + W], kk[dy, dx]
                )
                out = piece if out is None else out + piece
        return out

    print(f"conv3x3 shift-add einsum: {timeit(jax.jit(shift_add), x, k):.2f} ms")

    # NCHW layout
    xn = jnp.asarray(rng.standard_normal((1, 31, H, W)).astype(np.float32) * 0.3)
    kn = jnp.asarray(rng.standard_normal((31, 31, 3, 3)).astype(np.float32) * 0.1)
    convn = jax.jit(lambda v, kk: jax.lax.conv_general_dilated(
        v, kk, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")))
    print(f"conv3x3 NCHW: {timeit(convn, xn, kn):.2f} ms")

    # f32 vs default precision conv
    convh = jax.jit(lambda v, kk: jax.lax.conv_general_dilated(
        v, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST))
    print(f"conv3x3 NHWC HIGHEST: {timeit(convh, x, k):.2f} ms")

    # bf16 conv
    xb = x.astype(jnp.bfloat16); kb = k.astype(jnp.bfloat16)
    convb = jax.jit(lambda v, kk: jax.lax.conv_general_dilated(
        v, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32))
    print(f"conv3x3 NHWC bf16-in: {timeit(convb, xb, kb):.2f} ms")


if __name__ == "__main__":
    main()
