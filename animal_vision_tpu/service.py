"""Serving adapters: bytes/data-URL in -> data-URI out.

Parity surface: utils.py:133-336 (processimage / processsplitimage), minus
the reference's temp-file round trips (utils.py:138-141,193-199 writes
temp.jpg / tempexport.jpg to disk per request): decode and encode happen
in memory here.

Channel-order parity note (SURVEY.md §3.4): the reference's server feeds
**BGR** frames into visualize (its cvtColor is commented out), unlike the
CLI renderers which convert to RGB. ``assume_bgr=True`` reproduces that
server behavior; pass False for the corrected path.
"""

from __future__ import annotations

import base64

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from animal_vision_tpu.io.renderer import compose_split
from animal_vision_tpu.species import animal_names, get_animal


def _decode_jpeg(data: bytes) -> np.ndarray:
    arr = np.frombuffer(data, np.uint8)
    img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("could not decode image bytes")
    return img  # BGR, matching the reference server's (unconverted) feed


def _encode_data_uri(img: np.ndarray, fmt: str = ".jpg") -> str:
    ok, buf = cv2.imencode(fmt, img)
    assert ok
    mime = "image/jpeg" if fmt == ".jpg" else "image/png"
    return f"data:{mime};base64," + base64.b64encode(buf.tobytes()).decode()


def resolve_animal(name: str):
    key = name.lower().replace(" ", "_").replace("-", "_")
    aliases = {"ratuv": "rat_uv", "mantisshrimp": "mantis_shrimp",
               "jumpingspider": "jumping_spider"}
    key = aliases.get(key, key)
    if key not in animal_names():
        raise KeyError(f"unknown animal {name!r}")
    return get_animal(key)


def processimage(imagedata: bytes, animal: str, assume_bgr: bool = True) -> str:
    """Raw image bytes -> transformed frame as a base64 data URI.
    Parity: utils.py:133-199 (in-memory instead of temp.jpg round trips)."""
    frame = _decode_jpeg(imagedata)
    if not assume_bgr:
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    _, out = resolve_animal(animal).visualize(frame)
    if not assume_bgr:
        out = cv2.cvtColor(out, cv2.COLOR_RGB2BGR)
    return _encode_data_uri(out)


def processsplitimage(image_data_url: str, animal: str, assume_bgr: bool = True) -> str:
    """Data-URL -> half/half split comparison frame as a data URI.
    Parity: utils.py:202-336 via VideoRenderer.make_split_frame."""
    payload = image_data_url.split(",", 1)[1] if "," in image_data_url else image_data_url
    frame = _decode_jpeg(base64.b64decode(payload))
    if not assume_bgr:
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    baseline, out = resolve_animal(animal).visualize(frame)
    split = compose_split(baseline, out)
    if not assume_bgr:
        split = cv2.cvtColor(split, cv2.COLOR_RGB2BGR)
    return _encode_data_uri(split, ".png")


def processframe(image_data_url: str, animal: str, assume_bgr: bool = True) -> str:
    """Data-URL -> full transformed frame as a data URI (the live-video
    flow: ui/src/Video.tsx sends a JPEG frame every 200 ms and draws the
    returned image; server-side this is utils.py processimage semantics)."""
    payload = image_data_url.split(",", 1)[1] if "," in image_data_url else image_data_url
    return processimage(base64.b64decode(payload), animal, assume_bgr=assume_bgr)


def animal_choices() -> list[dict]:
    """Menu entries (display name + slug), mirroring utils.py:91-130."""
    from animal_vision_tpu.species import display_name

    return [{"name": display_name(n), "value": n} for n in animal_names()]


def species_categories() -> dict[str, list[str]]:
    """Category -> species slugs, the gallery groupings (main.py:98-139)."""
    from animal_vision_tpu.species import NON_UV_NAMES, UNIQUE_UV_NAMES, UV_NAMES

    return {"nonuv": NON_UV_NAMES, "uv": UV_NAMES, "unique_uv": UNIQUE_UV_NAMES}


def processgallery(
    image_data_url: str,
    category: str = "nonuv",
    animals: list[str] | None = None,
    assume_bgr: bool = True,
) -> str:
    """Data-URL -> labeled species-grid PNG data URI for one category
    (the web analogue of ``python -m main gallery``, main.py:204-278;
    per-species failures are skipped like the CLI's try/except). ``animals``
    optionally overrides the category's species list (subset rendering)."""
    from animal_vision_tpu.io.gallery import build_labeled_grid
    from animal_vision_tpu.species import display_name

    names = animals if animals else species_categories()[category]
    payload = image_data_url.split(",", 1)[1] if "," in image_data_url else image_data_url
    frame = _decode_jpeg(base64.b64decode(payload))
    if not assume_bgr:
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    tiles, labels = [], []
    for name in names:
        try:
            _, out = resolve_animal(name).visualize(frame)
        except Exception:  # noqa: BLE001 — gallery skips failing species
            continue
        tiles.append(out)
        labels.append(display_name(name))
    if not tiles:
        raise ValueError(f"no species of category {category!r} succeeded")
    grid = build_labeled_grid(tiles, labels)
    if not assume_bgr:
        grid = cv2.cvtColor(grid, cv2.COLOR_RGB2BGR)
    return _encode_data_uri(grid, ".png")
