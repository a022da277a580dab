"""Model-backed HSI providers for the UV species pipelines.

This wires the reference's dead capability: its HoneyBee ctor takes an
onnx_path to an MST++ exporter but no animal ever invokes the model
(SURVEY.md §0); the MST++ predictors exist only as offline tools
(predict_code/predict*.py). Here any UV species can swap the analytic
upsampler for MST++ inference (BASELINE.json config #4: "MST++ RGB->31-band
hyperspectral inference + kestrel/mantis-shrimp UV rendering").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

#: the MST++ band grid (31 bands, 400-700 nm — the ARAD_1K convention)
MST_LAMBDAS = np.linspace(400.0, 700.0, 31, dtype=np.float32)


def make_mst_hsi_provider(
    module=None,
    variables=None,
    pretrained_path: str | None = None,
    dtype=None,
    method: str = "mst_plus_plus",
    precision: str | None = None,
    input_encoding: str | None = None,
):
    """Return a callable (H, W, 3) frame -> (H, W, 31) reflectance cube.

    ``method`` picks any zoo architecture (predict_code supports every
    registry method as the RGB->HSI reconstructor; architecture/__init__.py).
    The cube is clamped to >= 0 (physical reflectance; the reference's
    analytic path clamps identically, classic_rgb_to_hsi.py:81).
    ``dtype=jnp.bfloat16`` runs inference in bf16 (params + activations,
    output cast back to f32) — the model is bandwidth-bound at C=31, so
    this is ~2x on TPU at negligible quality cost.
    ``precision="float32"`` forces exact MXU matmuls: ~130 dB agreement
    with the f32 CPU reference instead of the default bf16 passes' ~51 dB,
    at ~1.6x the latency (PARITY.md, "TPU matmul precision").

    ``input_encoding`` names what the model expects to see. UV species feed
    providers LINEAR-light RGB (UVAnimal._build_program's double-linearize
    convention), but real ARAD checkpoints are trained on gamma-encoded
    per-scene min-max RGB (hsi_dataset.py:43) — so when a pretrained
    checkpoint is attached the default re-encodes linear -> sRGB before
    ``module.apply``; random-init analytic use keeps the raw linear input.
    Pass ``"linear"`` / ``"srgb"`` to override either default."""
    import jax

    if module is None:
        from animal_vision_tpu.models.zoo import model_generator

        module, variables = model_generator(method, pretrained_path)
    if dtype is not None:
        variables = jax.tree_util.tree_map(lambda p: jnp.asarray(p, dtype), variables)
    if input_encoding is None:
        input_encoding = "srgb" if pretrained_path is not None else "linear"
    if input_encoding not in ("linear", "srgb"):
        raise ValueError(f"input_encoding must be 'linear' or 'srgb', got {input_encoding!r}")

    def provider(frame01: jnp.ndarray) -> jnp.ndarray:
        x = jnp.clip(frame01.astype(jnp.float32), 0.0, 1.0)[None]
        if input_encoding == "srgb":
            from animal_vision_tpu.core.color import linear_to_srgb

            x = linear_to_srgb(x)
        if dtype is not None:
            x = x.astype(dtype)
        if precision is not None:
            with jax.default_matmul_precision(precision):
                cube = module.apply(variables, x)[0].astype(jnp.float32)
        else:
            cube = module.apply(variables, x)[0].astype(jnp.float32)
        return jnp.maximum(cube, 0.0)

    return provider


def attach_mst(animal, module=None, variables=None, pretrained_path: str | None = None):
    """Attach an MST++ HSI provider (and its 31-band grid) to a UV animal."""
    provider = make_mst_hsi_provider(module, variables, pretrained_path)
    return animal.use_hsi_provider(provider, lambdas=MST_LAMBDAS)


def attach_model(animal, method: str, pretrained_path: str | None = None, dtype=None):
    """Attach any zoo architecture as a UV animal's HSI provider
    (e.g. ``attach_model(Kestrel(), "restormer")``). All zoo methods emit
    the same 31-band 400-700 nm grid."""
    provider = make_mst_hsi_provider(
        pretrained_path=pretrained_path, dtype=dtype, method=method
    )
    return animal.use_hsi_provider(provider, lambdas=MST_LAMBDAS)
