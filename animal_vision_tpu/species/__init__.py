"""Species registry: name -> Animal factory.

Mirrors the reference registry surface (utils.py:52-130 eagerly builds all 36
animals; we construct lazily and cache). Display names match the reference's
``animal_choices`` menu; lookup keys are lowercase slugs.
"""

from __future__ import annotations

from typing import Callable

from animal_vision_tpu.species.base import Animal
from animal_vision_tpu.species.nonuv import NONUV_SPECS, Cat, NonUVAnimal

_FACTORIES: dict[str, Callable[[], Animal]] = {}
_DISPLAY: dict[str, str] = {}
_CACHE: dict[str, Animal] = {}


def register(name: str, display: str, factory: Callable[[], Animal]) -> None:
    _FACTORIES[name] = factory
    _DISPLAY[name] = display


def get_animal(name: str) -> Animal:
    """Lookup (and cache) an animal by registry slug (case-insensitive)."""
    key = name.lower().replace(" ", "_")
    if key not in _FACTORIES:
        raise KeyError(f"unknown animal {name!r}; known: {sorted(_FACTORIES)}")
    if key not in _CACHE:
        _CACHE[key] = _FACTORIES[key]()
    return _CACHE[key]


def animal_names() -> list[str]:
    return sorted(_FACTORIES)


def display_name(name: str) -> str:
    return _DISPLAY.get(name, name)


# ---- non-UV (20) -----------------------------------------------------------
register("cat", "Cat", Cat)
for _slug, _spec in NONUV_SPECS.items():
    register(_slug, _slug.capitalize(), (lambda s=_spec: NonUVAnimal(s)))

# ---- UV (16) — registered by the uv subpackage on import -------------------
try:  # pragma: no cover - exercised once the uv species land
    from animal_vision_tpu.species import uv as _uv  # noqa: F401
except ImportError:
    pass

# Category lists (parity: main.py:98-139 NON_UV_NAMES / UV_NAMES /
# UNIQUE_UV_NAMES gallery groupings).
NON_UV_NAMES = ["cat"] + sorted(NONUV_SPECS)
UV_NAMES = [
    "honeybee",
    "reindeer",
    "rat_uv",
    "goldfish",
    "damselfish",
    "anableps",
    "anchovy",
    "guppy",
    "morpho",
    "heliconius",
    "pieris",
]
UNIQUE_UV_NAMES = ["mantis_shrimp", "kestrel", "jumping_spider", "dragonfly", "hummingbird"]
