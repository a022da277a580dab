"""Pipeline parallelism (pp) over a device mesh.

The reference has no model parallelism of any kind (SURVEY.md §2.9); on TPU
the natural pipeline decomposition of MST++ is its cascade of identical MST
stages (MST_Plus_Plus.py:279-293 runs them sequentially on one GPU). Here
each mesh slot along the ``pp`` axis holds ONE stage's parameters and
microbatches stream through a GPipe schedule: at every tick each device
applies its stage and hands the activation to the next device over ICI via
``ppermute``. Bubble fraction is (pp-1)/(n_micro+pp-1) as usual.

The schedule is expressed with `shard_map`, so the same code runs on a real
TPU slice or the 8-virtual-device CPU mesh the tests use. Stages are padded
with identity slots (a 0/1 flag lerps the stage output with its input) when
the pp axis is longer than the stage count, keeping power-of-two meshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_pp_mesh(n_devices: int | None = None, axis: str = "pp") -> Mesh:
    devs = np.array(jax.devices()[: n_devices or len(jax.devices())])
    return Mesh(devs, (axis,))


def pipeline_apply(stage_fn, stacked_params, real_flags, microbatches, mesh, axis="pp"):
    """Run ``stage_fn(params_i, x)`` as a pp-pipeline over ``mesh[axis]``.

    stacked_params: pytree with a leading stage axis of length pp (sharded
    over ``axis``); real_flags: (pp,) float 1.0 for real stages, 0.0 for
    identity padding; microbatches: (n_micro, ...) replicated. Returns the
    (n_micro, ...) outputs of the last real stage.
    """
    npp = mesh.shape[axis]
    n_micro = microbatches.shape[0]
    ticks = n_micro + npp - 1

    def spmd(params_local, flag_local, xm):
        idx = jax.lax.axis_index(axis)
        p = jax.tree_util.tree_map(lambda a: a[0], params_local)
        flag = flag_local[0]

        def body(t, carry):
            buf_in, outs = carry
            inp = jnp.where(
                idx == 0,
                xm[jnp.clip(t, 0, n_micro - 1)],
                buf_in,
            )
            out = flag * stage_fn(p, inp) + (1.0 - flag) * inp
            nxt = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % npp) for i in range(npp)]
            )
            widx = t - (npp - 1)
            updated = jax.lax.dynamic_update_slice(
                outs,
                out[None],
                (jnp.clip(widx, 0, n_micro - 1),) + (0,) * out.ndim,
            )
            valid = (idx == npp - 1) & (widx >= 0) & (widx < n_micro)
            outs = jnp.where(valid, updated, outs)
            return nxt, outs

        buf0 = jnp.zeros_like(xm[0])
        outs0 = jnp.zeros_like(xm)
        _, outs = jax.lax.fori_loop(0, ticks, body, (buf0, outs0))
        # only the last pipeline slot holds the results; replicate them
        return jax.lax.psum(jnp.where(idx == npp - 1, outs, 0.0), axis)

    import inspect

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    kwargs = {}
    sig = inspect.signature(shard_map).parameters
    if "check_rep" in sig:
        kwargs["check_rep"] = False
    elif "check_vma" in sig:
        kwargs["check_vma"] = False
    return shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(),
        **kwargs,
    )(stacked_params, jnp.asarray(real_flags, jnp.float32), microbatches)


def mst_stage_params(variables, n_stages: int = 3, pp: int | None = None):
    """Stack MSTPlusPlus's body_i MST subtrees along a stage axis, padding
    with copies of stage 0 (flagged 0.0 = identity) up to ``pp`` slots."""
    params = variables["params"]
    trees = [params[f"body_{i}"] for i in range(n_stages)]
    pp = pp or n_stages
    flags = [1.0] * n_stages + [0.0] * (pp - n_stages)
    while len(trees) < pp:
        trees.append(trees[0])
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
    return stacked, np.asarray(flags, np.float32)


def mst_plus_plus_pp_forward(module, variables, mesh, x, n_micro: int = 4, axis="pp"):
    """MST++ forward with its 3 MST stages pipelined over ``mesh[axis]``.

    conv_in / conv_out / the global residual are tiny and run replicated;
    the batch is split into ``n_micro`` microbatches that stream through
    the stage pipeline.
    """
    from animal_vision_tpu.models.mst_plus_plus import MST, no_fused_ffn

    params = variables["params"]
    b, h_inp, w_inp, _ = x.shape
    assert b % n_micro == 0, "batch must divide into microbatches"
    pad_h = (8 - h_inp % 8) % 8
    pad_w = (8 - w_inp % 8) % 8
    xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")

    feat = jax.lax.conv_general_dilated(
        xp, params["conv_in"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    stage = MST(dim=31, stage=2, num_blocks=(1, 1, 1))
    stage_fn = lambda p, t: stage.apply({"params": p}, t)

    stacked, flags = mst_stage_params(variables, n_stages=3, pp=mesh.shape[axis])
    micro = feat.reshape((n_micro, b // n_micro) + feat.shape[1:])
    with no_fused_ffn():  # Pallas kernels are not shard_map-partitionable
        body = pipeline_apply(stage_fn, stacked, flags, micro, mesh, axis)
    body = body.reshape(feat.shape)

    out = jax.lax.conv_general_dilated(
        body, params["conv_out"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out + feat
    return out[:, :h_inp, :w_inp, :]
