"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp


def test_mesh_factoring():
    from animal_vision_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices(), sp=2, tp=2)
    assert mesh.shape == {"dp": 2, "sp": 2, "tp": 2}


def test_sharded_inference_matches_single_device():
    from animal_vision_tpu.models.zoo import model_generator
    from animal_vision_tpu.parallel import make_mesh, sharded_inference_fn

    module, variables = model_generator("mst_plus_plus")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    want = np.asarray(module.apply(variables, x))

    mesh = make_mesh(jax.devices(), sp=2, tp=2)
    with mesh:
        run = sharded_inference_fn(mesh, module, variables)
        got = np.asarray(run(x))
    # GSPMD halo exchange for the spatially-sharded convs must be exact up
    # to reduction-order noise.
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pipeline_parallel_matches_sequential():
    """GPipe pp schedule over the MST stages == plain MST++ forward."""
    from animal_vision_tpu.models.zoo import model_generator
    from animal_vision_tpu.parallel.pipeline import make_pp_mesh, mst_plus_plus_pp_forward

    module, variables = model_generator("mst_plus_plus")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32))
    want = np.asarray(module.apply(variables, x))

    mesh = make_pp_mesh(4)  # 3 MST stages + 1 identity slot
    got = np.asarray(mst_plus_plus_pp_forward(module, variables, mesh, x, n_micro=4))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pipeline_generic_schedule():
    """Toy 2-stage pipeline: out = (x*2)+3 for every microbatch."""
    from animal_vision_tpu.parallel.pipeline import make_pp_mesh, pipeline_apply

    mesh = make_pp_mesh(2)
    stacked = {"a": jnp.asarray([2.0, 1.0]), "b": jnp.asarray([0.0, 3.0])}
    flags = np.asarray([1.0, 1.0], np.float32)
    micro = jnp.asarray(np.random.default_rng(0).normal(0, 1, (5, 3, 4)).astype(np.float32))

    def stage(p, t):
        return t * p["a"] + p["b"]

    out = pipeline_apply(stage, stacked, flags, micro, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(micro) * 2.0 + 3.0, atol=1e-6)


def test_fleet_renders_species_across_devices():
    from animal_vision_tpu.parallel.fleet import assign_devices, render_fleet
    from animal_vision_tpu.species import get_animal

    names = ["dog", "pig", "rat", "lion"]
    placement = assign_devices(names)
    assert len({str(d) for d in placement.values()}) == min(4, len(jax.devices()))

    frame = np.random.default_rng(0).integers(0, 255, (48, 64, 3), dtype=np.uint8)
    outs = render_fleet(frame, names)
    for name in names:
        base, out = outs[name]
        assert out.shape == frame.shape and out.dtype == np.uint8
        ref = get_animal(name).visualize(frame)[1]
        np.testing.assert_array_equal(out, ref)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 128, 128, 31)


def test_fused_sharded_inference_matches_xla(monkeypatch):
    """parallel/fused_shard.py: the fused megakernel pipeline under
    shard_map (halo-recompute bands + psum'd attention stats) must match
    the unsharded XLA composition. sp=2 x tp=2 exercises the tp-folds-
    into-spatial-axis path (4 H-bands) and dp=2 batches."""
    monkeypatch.setenv("ANIMAL_VISION_FUSED_MSAB", "interpret")
    from animal_vision_tpu.models.mst_plus_plus import no_fused_ffn
    from animal_vision_tpu.models.zoo import model_generator
    from animal_vision_tpu.parallel import make_mesh
    from animal_vision_tpu.parallel.fused_shard import fused_sharded_forward, supports

    module, variables = model_generator("mst_plus_plus")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 48, 3)).astype(np.float32))
    mesh = make_mesh(jax.devices(), sp=2, tp=2)
    assert supports(mesh, 2, 32, 48)
    got = np.asarray(fused_sharded_forward(mesh, variables, x))
    with no_fused_ffn():
        want = np.asarray(module.apply(variables, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)
