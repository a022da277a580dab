"""Model registry: name -> (flax module, torch->flax converter).

Parity: predict_code/architecture/__init__.py:13-41 `model_generator` — the
reference instantiates a torch net and strict-loads a .pth; here we build
the Flax module and (optionally) convert a torch checkpoint's state_dict.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from animal_vision_tpu.models import mst_plus_plus as _mst


def _mst_standalone():
    from animal_vision_tpu.models.mst import MSTModel

    return MSTModel(dim=31, stage=2, num_blocks=(4, 7, 5))


def _convert_mst_standalone(sd):
    from animal_vision_tpu.models.mst import convert_torch_state

    return convert_torch_state(sd)


def _hscnn():
    from animal_vision_tpu.models.simple_nets import HSCNNPlus

    return HSCNNPlus()


def _convert_hscnn(sd):
    from animal_vision_tpu.models.simple_nets import convert_hscnn_state

    return convert_hscnn_state(sd)


def _edsr():
    from animal_vision_tpu.models.simple_nets import EDSR

    return EDSR()


def _convert_edsr(sd):
    from animal_vision_tpu.models.simple_nets import convert_edsr_state

    return convert_edsr_state(sd)


def _restormer():
    from animal_vision_tpu.models.restormer import Restormer

    return Restormer()


def _convert_restormer(sd):
    from animal_vision_tpu.models.restormer import convert_torch_state

    return convert_torch_state(sd)


def _awan():
    from animal_vision_tpu.models.awan import AWAN

    return AWAN(n_drbs=8)


def _convert_awan(sd):
    from animal_vision_tpu.models.awan import convert_torch_state

    return convert_torch_state(sd)


def _mirnet():
    from animal_vision_tpu.models.mirnet import MIRNet

    return MIRNet(n_rrg=3, n_msrb=1, height=3, width=1)


def _convert_mirnet(sd):
    from animal_vision_tpu.models.mirnet import convert_torch_state

    return convert_torch_state(sd)


def _hrnet():
    from animal_vision_tpu.models.sgn import SGN

    return SGN()


def _convert_hrnet(sd):
    from animal_vision_tpu.models.sgn import convert_torch_state

    return convert_torch_state(sd)


def _hdnet():
    from animal_vision_tpu.models.hdnet import HDNet

    return HDNet()


def _convert_hdnet(sd):
    from animal_vision_tpu.models.hdnet import convert_torch_state

    return convert_torch_state(sd)


def _mprnet():
    from animal_vision_tpu.models.mprnet import MPRNet

    return MPRNet(num_cab=4)


def _convert_mprnet(sd):
    from animal_vision_tpu.models.mprnet import convert_torch_state

    return convert_torch_state(sd)


def _hinet():
    from animal_vision_tpu.models.hinet import HINet

    return HINet(depth=4)


def _convert_hinet(sd):
    from animal_vision_tpu.models.hinet import convert_torch_state

    return convert_torch_state(sd)


_REGISTRY = {
    "mst_plus_plus": (
        lambda: _mst.MSTPlusPlus(in_channels=3, out_channels=31, n_feat=31, stage=3),
        _mst.convert_torch_state,
    ),
    # 'hinet' config parity: HINet(depth=4) (architecture/__init__.py:23-24)
    "hinet": (_hinet, _convert_hinet),
    # AWAN lives in the reference's eval-side zoo (test_develop_code)
    "awan": (_awan, _convert_awan),
    "restormer": (_restormer, _convert_restormer),
    # 'mprnet' config parity: MPRNet(num_cab=4) (architecture/__init__.py:22-23)
    "mprnet": (_mprnet, _convert_mprnet),
    # 'hdnet' config parity: HDNet() (architecture/__init__.py:28-29)
    "hdnet": (_hdnet, _convert_hdnet),
    # 'mirnet' config parity: MIRNet(n_RRG=3, n_MSRB=1, height=3, width=1)
    # (architecture/__init__.py:14-15)
    "mirnet": (_mirnet, _convert_mirnet),
    # 'hrnet' config parity: SGN() (architecture/__init__.py:30-31)
    "hrnet": (_hrnet, _convert_hrnet),
    # 'mst' config parity: MST(dim=31, stage=2, num_blocks=[4,7,5])
    # (architecture/__init__.py:21-22)
    "mst": (_mst_standalone, _convert_mst_standalone),
    "hscnn_plus": (_hscnn, _convert_hscnn),
    "edsr": (_edsr, _convert_edsr),
}


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def find_state_dict(obj: Any) -> dict:
    """Unwrap common checkpoint containers and strip DataParallel's
    ``module.`` prefix. Parity: predict_code/compile.py:39-68."""
    sd = obj
    if isinstance(sd, dict):
        for key in ("state_dict", "model_state_dict", "net", "model", "params"):
            if key in sd and isinstance(sd[key], dict):
                sd = sd[key]
                break
    out = {}
    for k, v in sd.items():
        out[k[len("module.") :] if k.startswith("module.") else k] = v
    return out


def model_generator(method: str, pretrained_model_path: str | None = None):
    """Build (module, variables). When ``pretrained_model_path`` is given,
    loads the torch .pth (CPU) and converts the weights; otherwise returns
    randomly initialized variables for a 64x64 probe shape."""
    import jax

    if method not in _REGISTRY:
        raise ValueError(f"unknown method {method!r}; available: {available_models()}")
    build, convert = _REGISTRY[method]
    module = build()
    if pretrained_model_path:
        import torch

        ckpt = torch.load(pretrained_model_path, map_location="cpu", weights_only=False)
        sd = find_state_dict(ckpt)
        variables = jax.tree_util.tree_map(
            np.asarray, convert({k: v.numpy() for k, v in sd.items()})
        )
    else:
        import jax.numpy as jnp

        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return module, variables
