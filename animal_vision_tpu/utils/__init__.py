"""Observability utilities (the reference has print statements only,
SURVEY.md §5.5)."""

from animal_vision_tpu.utils.profiling import stage_timer, trace  # noqa: F401
