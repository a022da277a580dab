"""Flax ports of the reference's RGB->HSI model zoo (SURVEY.md §2.6)."""

from animal_vision_tpu.models.zoo import model_generator  # noqa: F401
