"""RGB -> hyperspectral reconstruction and photoreceptor-band integration."""

from animal_vision_tpu.spectral import bands, classic, mappers  # noqa: F401
