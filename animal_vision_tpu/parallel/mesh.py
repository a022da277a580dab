"""Mesh construction and sharding layouts.

The reference has NO distributed machinery (SURVEY.md §2.9: no NCCL/MPI,
no DP/TP/PP/SP; its only "sharding" is spatial tiling of one image with
Hann-feathered overlap). The TPU-native equivalents here:

- **dp** (frame/batch parallelism): frames round-robin across chips —
  replaces nothing in the reference (it is single-threaded) but is the
  first-class scaling axis for the streaming pipeline.
- **sp** (spatial parallelism): shard H across chips. For convolutional
  stages GSPMD inserts the halo exchanges over ICI automatically — the
  exact-halo replacement for the reference's overlap+Hann-window tile
  stitching (predict_static.py:115-194).
- **tp** (tensor parallelism): shard the wide FFN hidden channels of MST++
  across chips (124 channels at stage-2 dims; useful at larger n_feat).

Pipeline (pp) and expert (ep) axes do not apply to this model family (no
layer pipeline deep enough to amortize bubbles at 3 stages; no MoE) —
documented rather than faked.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices=None, dp: int | None = None, sp: int = 1, tp: int = 1
) -> Mesh:
    """Build an ('dp','sp','tp') mesh over the given (or all) devices.
    ``dp`` defaults to whatever is left after sp*tp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (sp * tp) == 0, (n, sp, tp)
        dp = n // (sp * tp)
    assert dp * sp * tp == n, f"{dp}*{sp}*{tp} != {n}"
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def activation_spec() -> P:
    """(B, H, W, C) activations: batch over dp, rows over sp."""
    return P("dp", "sp", None, None)


def shard_batch(mesh: Mesh, batch: jax.Array) -> jax.Array:
    """Place a (B, H, W, C) frame batch with dp x sp sharding."""
    return jax.device_put(batch, NamedSharding(mesh, activation_spec()))


def param_specs(params) -> dict:
    """tp sharding for MST++ params: shard the FFN hidden (4x) channels on
    the output axis of net_0 / input axis of net_4; everything else
    replicated. Returns a pytree of PartitionSpecs matching ``params``."""

    def spec_for(path: tuple, leaf) -> P:
        names = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(names)
        if "net_0" in joined and names[-1] == "kernel":
            return P(None, None, None, "tp")  # (1,1,in,hidden)
        if "net_2" in joined and names[-1] == "kernel":
            return P(None, None, None, "tp")  # depthwise (3,3,1,hidden)
        if "net_4" in joined and names[-1] == "kernel":
            return P(None, None, "tp", None)  # (1,1,hidden,out)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def sharded_inference_fn(mesh: Mesh, module, variables):
    """Sharded inference on the mesh.

    For MSTPlusPlus-shaped inputs the fused Pallas megakernel pipeline runs
    per H-band under shard_map with halo recompute and psum'd attention
    stats (parallel/fused_shard.py) — the packed pipeline's full-res speedup
    survives sharding. Frames whose shapes don't band-split (or non-MST
    modules) take the GSPMD path: dp x sp activation sharding + tp param
    sharding, XLA inserting the ICI collectives (conv halos, psums)."""
    from animal_vision_tpu.models.mst_plus_plus import MSTPlusPlus, _use_fused_msab
    from animal_vision_tpu.parallel import fused_shard

    fused_capable = (
        isinstance(module, MSTPlusPlus)
        and module.n_feat == 31
        and module.out_channels == 31
        and module.in_channels == 3
    )

    xla_run = _xla_sharded_inference_fn(mesh, module, variables)

    def run(x):
        b, h, w = int(x.shape[0]), int(x.shape[1]), int(x.shape[2])
        if (
            fused_capable
            and _use_fused_msab(h * w)
            and fused_shard.supports(mesh, b, h, w)
        ):
            return fused_shard.fused_sharded_forward(mesh, variables, x)
        return xla_run(x)

    return run


def _xla_sharded_inference_fn(mesh: Mesh, module, variables):
    """GSPMD fallback: the fused kernels are single-device Pallas programs
    GSPMD cannot partition, so this trace disables them (no_fused_ffn) and
    lets XLA shard the plain composition."""
    from jax.sharding import NamedSharding

    var_specs = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        param_specs(variables),
        is_leaf=lambda x: isinstance(x, P),
    )
    placed = jax.device_put(variables, var_specs)
    act = NamedSharding(mesh, activation_spec())

    @jax.jit
    def run(x):
        from animal_vision_tpu.models.mst_plus_plus import no_fused_ffn

        with no_fused_ffn():
            return module.apply(placed, x)

    return lambda x: run(jax.device_put(x, act))
