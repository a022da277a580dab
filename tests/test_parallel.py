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


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 128, 128, 31)
