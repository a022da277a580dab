"""Species-fleet parallelism — the ep (expert-parallel) analogue.

This model family has no MoE layers; its natural "experts" are the 36
species programs themselves (the reference renders galleries strictly
sequentially on one device, main.py:182-200). Here each species program is
dispatched on a device chosen round-robin: JAX computation follows
committed input placement, and dispatch is async, so all devices render
their species concurrently — an all-species gallery or an all-species
video pipeline scales linearly with chips on one host.
"""

from __future__ import annotations

import jax
import numpy as np


def assign_devices(names, devices=None):
    """Round-robin species -> device map."""
    devices = list(devices or jax.devices())
    return {name: devices[i % len(devices)] for i, name in enumerate(names)}


def render_fleet(frame: np.ndarray, names, devices=None):
    """Render ``frame`` through every named species, each on its assigned
    device, dispatching all programs before syncing any (the async
    dispatch overlaps the per-species work across the mesh).

    Returns {name: (baseline, transformed)} as host numpy arrays.
    """
    from animal_vision_tpu.species import get_animal

    placement = assign_devices(names, devices)
    pending = {}
    for name in names:
        animal = get_animal(name)
        prog = animal._program(frame.shape, frame.dtype, batched=False)
        local = jax.device_put(frame, placement[name])
        pending[name] = prog(local)  # async dispatch on that device
    return {
        name: (np.asarray(base), np.asarray(out))
        for name, (base, out) in pending.items()
    }
