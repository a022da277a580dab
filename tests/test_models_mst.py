"""Golden tests: Flax MST++ vs the reference torch implementation.

The reference torch module (predict_code/architecture/MST_Plus_Plus.py) is
imported directly as the oracle: random-initialize it, convert the weights,
and require ~1e-4 output agreement. Skipped if the reference tree or torch
is unavailable."""

import sys

import numpy as np
import pytest

REF = "/root/reference/ml/MST_plus_plus/predict_code/architecture"


def _load_reference_mst():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_mst_plus_plus", f"{REF}/MST_Plus_Plus.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch_ref():
    torch = pytest.importorskip("torch")
    try:
        mod = _load_reference_mst()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference torch model unavailable: {e}")
    torch.manual_seed(0)
    model = mod.MST_Plus_Plus(in_channels=3, out_channels=31, n_feat=31, stage=3)
    model.eval()
    return torch, model


def test_flax_matches_torch_reference(torch_ref, psnr_fn):
    torch, model = torch_ref
    import jax.numpy as jnp

    from animal_vision_tpu.models.mst_plus_plus import MSTPlusPlus, convert_torch_state

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    variables = convert_torch_state(sd)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 48, 40, 3)).astype(np.float32)  # non-x8 W pads
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    want = want.transpose(0, 2, 3, 1)

    flax_model = MSTPlusPlus()
    got = np.asarray(flax_model.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 48, 40, 31)
    diff = np.abs(got - want).max()
    assert diff < 5e-4, f"max diff {diff}"
    assert psnr_fn(got, want) > 60.0


def test_param_count_matches_published():
    """MST++ is published at 1.62 M params (BASELINE.md)."""
    import jax

    from animal_vision_tpu.models.zoo import model_generator

    module, variables = model_generator("mst_plus_plus")
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables))
    assert 1_500_000 < n < 1_700_000, n


def test_find_state_dict_unwraps():
    from animal_vision_tpu.models.zoo import find_state_dict

    sd = {"module.conv_in.weight": 1}
    assert find_state_dict({"state_dict": sd}) == {"conv_in.weight": 1}


def test_mst_provider_drives_uv_species(img_u8):
    """BASELINE config #4: MST++ inference feeding kestrel / mantis shrimp."""
    from animal_vision_tpu.models.providers import attach_mst, MST_LAMBDAS
    from animal_vision_tpu.models.zoo import model_generator
    from animal_vision_tpu.species.uv.kestrel import Kestrel
    from animal_vision_tpu.species.uv.mantis_shrimp import MantisShrimp

    module, variables = model_generator("mst_plus_plus")
    for cls in (Kestrel, MantisShrimp):
        animal = attach_mst(cls(), module, variables)
        assert np.allclose(animal.lambdas, MST_LAMBDAS)
        base, out = animal.visualize(img_u8)
        assert out.shape == img_u8.shape and out.dtype == np.uint8
        assert out.std() > 0  # nontrivial render


def test_attach_model_any_architecture(img_u8):
    """Any zoo method can drive a UV species (predict_code method parity)."""
    from animal_vision_tpu.models.providers import attach_model
    from animal_vision_tpu.species.uv.goldfish import Goldfish

    animal = attach_model(Goldfish(), "hscnn_plus")
    _, out = animal.visualize(img_u8)
    assert out.shape == img_u8.shape and out.dtype == np.uint8
    assert out.std() > 0


def test_honeybee_with_mst_provider(img_u8):
    from animal_vision_tpu.models.providers import make_mst_hsi_provider
    from animal_vision_tpu.species.uv.honeybee import HoneyBee

    bee = HoneyBee(hsi_provider=make_mst_hsi_provider())
    _, out = bee.visualize(img_u8)
    assert out.shape == img_u8.shape and out.dtype == np.uint8


def test_train_step_decreases_loss():
    import jax.numpy as jnp

    from animal_vision_tpu.models import train as mtrain
    from animal_vision_tpu.models.mst_plus_plus import MSTPlusPlus

    module = MSTPlusPlus()
    opt = mtrain.make_optimizer(lr=1e-3, total_steps=50, warmup=1)
    state = mtrain.init_state(module, opt, sample_shape=(1, 32, 32, 3))
    step = mtrain.make_train_step(module, opt)
    import jax

    step = jax.jit(step)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    hsi = jnp.asarray(rng.uniform(0.05, 1, (2, 32, 32, 31)).astype(np.float32))
    losses = []
    for _ in range(5):
        state, m = step(state, rgb, hsi)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_metrics_match_reference_formulas():
    import jax.numpy as jnp

    from animal_vision_tpu.models import metrics

    rng = np.random.default_rng(1)
    a = rng.uniform(0.1, 1, (2, 8, 8, 4)).astype(np.float32)
    b = rng.uniform(0.1, 1, (2, 8, 8, 4)).astype(np.float32)
    np.testing.assert_allclose(
        float(metrics.mrae(jnp.asarray(a), jnp.asarray(b))),
        np.mean(np.abs(a - b) / b), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(metrics.rmse(jnp.asarray(a), jnp.asarray(b))),
        np.sqrt(np.mean((a - b) ** 2)), rtol=1e-5,
    )


def _ref_module(name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(f"ref_{name}", f"{REF}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize(
    "ref_file,ref_cls,kwargs,flax_name,atol",
    [
        ("HSCNN_Plus", "HSCNN_Plus", dict(num_blocks=4), "hscnn_small", 1e-4),
        ("edsr", "EDSR", {}, "edsr", 2e-3),
        ("MST", "MST", dict(dim=31, stage=2, num_blocks=[1, 1, 1]), "mst_small", 1e-3),
        ("hinet", "HINet", dict(depth=4), "hinet", 1e-4),
    ],
)
def test_zoo_archs_match_torch(ref_file, ref_cls, kwargs, flax_name, atol, psnr_fn):
    torch = pytest.importorskip("torch")
    try:
        mod = _ref_module(ref_file)
    except Exception as e:
        pytest.skip(f"reference unavailable: {e}")
    torch.manual_seed(0)
    ref = getattr(mod, ref_cls)(**kwargs)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    import jax.numpy as jnp

    if flax_name == "hscnn_small":
        from animal_vision_tpu.models.simple_nets import HSCNNPlus, convert_hscnn_state

        module, variables = HSCNNPlus(num_blocks=4), convert_hscnn_state(sd)
    elif flax_name == "edsr":
        from animal_vision_tpu.models.simple_nets import EDSR, convert_edsr_state

        module, variables = EDSR(), convert_edsr_state(sd)
    elif flax_name == "hinet":
        from animal_vision_tpu.models.hinet import HINet, convert_torch_state

        module, variables = HINet(depth=4), convert_torch_state(sd)
    else:
        from animal_vision_tpu.models.mst import MSTModel, convert_torch_state

        module = MSTModel(dim=31, stage=2, num_blocks=(1, 1, 1))
        variables = convert_torch_state(sd, stage=2, num_blocks=(1, 1, 1))

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 32, 40, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(module.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape
    diff = np.abs(got - want).max()
    assert diff < atol, f"{flax_name}: max diff {diff}"


def test_zoo_registry_lists_models():
    from animal_vision_tpu.models.zoo import available_models

    assert set(available_models()) >= {
        "mst_plus_plus", "mst", "hscnn_plus", "edsr", "hinet", "awan",
        "restormer", "mprnet", "hdnet", "mirnet", "hrnet",
    }


def test_awan_matches_torch(psnr_fn):
    torch = pytest.importorskip("torch")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_awan",
        "/root/reference/ml/MST_plus_plus/test_develop_code/architecture/AWAN.py",
    )
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"reference unavailable: {e}")
    import jax.numpy as jnp

    from animal_vision_tpu.models.awan import AWAN, convert_torch_state

    torch.manual_seed(0)
    ref = mod.AWAN(n_DRBs=2)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_state(sd, n_drbs=2)
    x = np.random.default_rng(0).uniform(0, 1, (1, 32, 40, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(AWAN(n_drbs=2).apply(variables, jnp.asarray(x)))
    assert np.abs(got - want).max() < 1e-4


def test_fused_msab_ffn_matches_reference_ops():
    """ops/fused_mst.py (interpret mode on CPU) vs the plain composition."""
    import jax
    import jax.numpy as jnp

    from animal_vision_tpu.models.mst_plus_plus import _dw_shift, _gelu, _layernorm
    from animal_vision_tpu.ops.fused_mst import fused_msab_ffn

    rng = np.random.default_rng(3)
    b, h, w, c, hidden = 2, 24, 40, 31, 124
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(1, 0.2, (c,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.2, (c,)).astype(np.float32))
    w0 = jnp.asarray(rng.normal(0, 0.2, (c, hidden)).astype(np.float32))
    dwk = jnp.asarray(rng.normal(0, 0.3, (3, 3, hidden)).astype(np.float32))
    w4 = jnp.asarray(rng.normal(0, 0.2, (hidden, c)).astype(np.float32))

    got = np.asarray(fused_msab_ffn(x, gamma, beta, w0, dwk, w4, h=h, w=w))
    y = _layernorm(x, gamma, beta)
    y = _gelu(jnp.einsum("...c,cd->...d", y, w0))
    y = _dw_shift(y, dwk[:, :, None, :])
    y = _gelu(y)
    want = np.asarray(jnp.einsum("...c,cd->...d", y, w4) + x)
    assert np.abs(got - want).max() < 2e-5


def test_sgn_matches_torch():
    torch = pytest.importorskip("torch")
    try:
        mod = _ref_module("hrnet")
    except Exception as e:
        pytest.skip(f"reference unavailable: {e}")
    import jax.numpy as jnp

    from animal_vision_tpu.models.sgn import SGN, convert_torch_state

    torch.manual_seed(0)
    ref = mod.SGN()
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_state(sd)
    x = np.random.default_rng(0).uniform(0, 1, (1, 32, 40, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(SGN().apply(variables, jnp.asarray(x)))
    assert np.abs(got - want).max() < 1e-4


def test_mirnet_matches_torch():
    torch = pytest.importorskip("torch")
    try:
        mod = _ref_module("MIRNet")
    except Exception as e:
        pytest.skip(f"reference unavailable: {e}")
    import jax.numpy as jnp

    from animal_vision_tpu.models.mirnet import MIRNet, convert_torch_state

    torch.manual_seed(0)
    ref = mod.MIRNet(n_RRG=3, n_MSRB=1, height=3, width=1)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_state(sd)
    x = np.random.default_rng(0).uniform(0, 1, (1, 32, 40, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(MIRNet().apply(variables, jnp.asarray(x)))
    assert np.abs(got - want).max() < 1e-4


def test_hdnet_matches_torch():
    torch = pytest.importorskip("torch")
    try:
        mod = _ref_module("HDNet")
    except Exception as e:
        pytest.skip(f"reference unavailable: {e}")
    import jax.numpy as jnp

    from animal_vision_tpu.models.hdnet import HDNet, convert_torch_state

    torch.manual_seed(0)
    ref = mod.HDNet()
    ref.eval()
    # randomize BN running stats so the inference-BN conversion is exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_state(sd)
    x = np.random.default_rng(0).uniform(0, 1, (1, 16, 20, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(HDNet().apply(variables, jnp.asarray(x)))
    assert np.abs(got - want).max() < 1e-4


def test_mprnet_matches_torch():
    torch = pytest.importorskip("torch")
    try:
        mod = _ref_module("MPRNet")
    except Exception as e:
        pytest.skip(f"reference unavailable: {e}")
    import jax.numpy as jnp

    from animal_vision_tpu.models.mprnet import MPRNet, convert_torch_state

    torch.manual_seed(0)
    ref = mod.MPRNet(num_cab=2)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_state(sd, num_cab=2)
    mine = MPRNet(num_cab=2)
    x = np.random.default_rng(0).uniform(0, 1, (1, 32, 40, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(mine.apply(variables, jnp.asarray(x)))
    assert np.abs(got - want).max() < 1e-4


def test_restormer_matches_torch():
    torch = pytest.importorskip("torch")
    try:
        mod = _ref_module("Restormer")
    except Exception as e:
        pytest.skip(f"reference unavailable: {e}")
    import jax.numpy as jnp

    from animal_vision_tpu.models.restormer import Restormer, convert_torch_state

    torch.manual_seed(0)
    ref = mod.Restormer(num_blocks=[1, 1, 1, 1], num_refinement_blocks=1)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_state(sd, num_blocks=(1, 1, 1, 1), num_refinement=1)
    mine = Restormer(num_blocks=(1, 1, 1, 1), num_refinement=1)
    x = np.random.default_rng(0).uniform(0, 1, (1, 32, 40, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(mine.apply(variables, jnp.asarray(x)))
    assert np.abs(got - want).max() < 1e-4


def test_fused_msab_megakernel_matches_xla_path(monkeypatch):
    """ops/fused_msab.py (interpret mode on CPU) vs the module's XLA path,
    through the full 3-stage model (exercises heads 1/2/4 at the three
    U-net levels) and at an odd shape (partial-tail row bands)."""
    import jax
    import jax.numpy as jnp

    from animal_vision_tpu.models.mst_plus_plus import MSTPlusPlus

    rng = np.random.default_rng(11)
    m = MSTPlusPlus()
    for shape in [(1, 24, 40, 3), (2, 21, 37, 3)]:
        x = jnp.asarray(rng.random(shape, dtype=np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("ANIMAL_VISION_FUSED_MSAB", "0")
        ref = m.apply(params, x)
        monkeypatch.setenv("ANIMAL_VISION_FUSED_MSAB", "interpret")
        got = m.apply(params, x)
        assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 5e-4, shape


def test_export_torch_state_roundtrip(torch_ref):
    """flax -> torch state_dict -> flax roundtrips exactly, and the
    exported dict strict-loads into the reference torch module — the
    bridge to the reference's own ONNX export CLI (compile.py:127-151),
    since no onnx package exists in this env."""
    import jax
    import jax.numpy as jnp

    from animal_vision_tpu.models.mst_plus_plus import (
        MSTPlusPlus,
        convert_torch_state,
        export_torch_state,
    )

    m = MSTPlusPlus()
    variables = m.init(jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 3)))
    sd = export_torch_state(variables)
    back = convert_torch_state({k: np.asarray(v) for k, v in sd.items()})
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(back)}
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_b[ks]), rtol=0, atol=0, err_msg=ks)

    torch, ref = torch_ref
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, strict=False
    )
    assert not unexpected, unexpected
    assert not missing, missing


def test_packed_conv_kernels_match_lax_conv():
    """ops/fused_msab.py packed 3x3 and 4x4-stride-2 convs (interpret mode)
    vs lax.conv on the unpacked layout."""
    import jax
    import jax.numpy as jnp

    from animal_vision_tpu.ops import fused_msab as F

    rng = np.random.default_rng(5)
    for C, P in [(31, 4), (62, 2)]:
        H, W = 24, 8 * P
        x = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32) * 0.5)
        xp = x.reshape(H, W // P, P * C)

        w3 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.2)
        got = F.packed_conv3x3(xp, w3, C, P).reshape(H, W, C)
        ref = jax.lax.conv_general_dilated(
            x[None], w3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )[0]
        assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-4, (C, "conv3")

        w4 = jnp.asarray(rng.standard_normal((4, 4, C, 2 * C)).astype(np.float32) * 0.2)
        got = F.packed_down4x4(xp, w4, C, P).reshape(H // 2, W // 2, 2 * C)
        ref = jax.lax.conv_general_dilated(
            x[None], w4, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-4, (C, "down4")
