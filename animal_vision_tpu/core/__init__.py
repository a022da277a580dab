"""Core JAX image primitives, numerically matched to OpenCV/NumPy reference."""

from animal_vision_tpu.core import blur, color, effects, geometry, gradients, stats  # noqa: F401
