"""Scratch: probe Mosaic support for the ops the MSAB megakernel needs:
3D blocks, leading-dim reshape, matmul on flattened rows, dot_general with
dim-0 contraction, erf, middle-dim shifts, accumulation across grid steps."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 256, 512, 31
T = 16
N = H // T


def _erf(x):
    # Abramowitz-Stegun 7.1.26 (|abs err| <= 1.5e-7); Mosaic has no erf.
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def k_probe(x_ref, w_ref, o_ref, g_ref):
    i = pl.program_id(0)
    x = x_ref[...]  # (T, W, C)
    flat = x.reshape(T * W, C)
    y = jnp.dot(flat, w_ref[...], preferred_element_type=jnp.float32)  # (T*W, C)
    y = _erf(y)
    y3 = y.reshape(T, W, C)
    # middle-dim zero shift (horizontal dwconv tap)
    left = jnp.concatenate([y3[:, 1:, :], jnp.zeros((T, 1, C), jnp.float32)], axis=1)
    right = jnp.concatenate([jnp.zeros((T, 1, C), jnp.float32), y3[:, :-1, :]], axis=1)
    o_ref[...] = y3 + 0.25 * left + 0.25 * right
    # pass-A style: G += y^T y contracting dim 0
    g = jax.lax.dot_general(
        flat, flat, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == 0)
    def _():
        g_ref[...] = jnp.zeros_like(g_ref)

    g_ref[...] += g


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((H, W, C), dtype=np.float32))
    w = jnp.asarray(rng.random((C, C), dtype=np.float32) * 0.1)

    fn = pl.pallas_call(
        k_probe,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((T, W, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((T, W, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    out, g = jax.jit(fn)(x, w)

    # reference
    y = jax.lax.erf(x.reshape(-1, C) @ w).reshape(H, W, C)
    left = jnp.pad(y, ((0, 0), (0, 1), (0, 0)))[:, 1:]
    right = jnp.pad(y, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    ref = y + 0.25 * left + 0.25 * right
    gref = x.reshape(-1, C).T @ x.reshape(-1, C)
    print("out maxerr:", float(jnp.abs(out - ref).max()))
    print("G maxerr:", float(jnp.abs(g - gref).max()), "rel:", float(jnp.abs((g - gref) / gref).max()))


if __name__ == "__main__":
    main()
