"""End-to-end tests for renderers, pipeline executor, CLI, service, server."""

import base64
import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture()
def tmp_image(tmp_path, img_u8):
    p = tmp_path / "in.png"
    cv2.imwrite(str(p), cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR))
    return str(p)


@pytest.fixture()
def tmp_video(tmp_path, img_u8):
    p = tmp_path / "in.mp4"
    w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64))
    for i in range(8):
        frame = np.roll(img_u8, i * 3, axis=1)
        w.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    w.release()
    return str(p)


def test_image_renderer_roundtrip(tmp_image, tmp_path, img_u8):
    from animal_vision_tpu.io import ImageRenderer

    out = str(tmp_path / "out.png")
    r = ImageRenderer(tmp_image, show_window=False, save_to=out)
    r.open()
    img = r.get_image()
    np.testing.assert_array_equal(img, img_u8)  # png round trip is lossless
    r.render_split_compare(img, img[::-1].copy())
    r.close()
    assert os.path.exists(out)
    saved = cv2.imread(out)
    assert saved.shape == (64, 96, 3)


def test_video_renderer_and_executor(tmp_video, tmp_path):
    from animal_vision_tpu.io import VideoRenderer
    from animal_vision_tpu.pipeline import StreamingExecutor
    from animal_vision_tpu.species import get_animal

    src = VideoRenderer(tmp_video)
    src.open()
    out = str(tmp_path / "out.mp4")
    sink = VideoRenderer(save_to=out, fps=src.fps, show_window=False)
    ex = StreamingExecutor(get_animal("dog"), batch=3, split=True)
    n = ex.run(src.frames(), sink.render)
    src.close(); sink.close()
    assert n == 8
    check = cv2.VideoCapture(out)
    assert int(check.get(cv2.CAP_PROP_FRAME_COUNT)) == 8
    check.release()


def test_cli_image_noninteractive(tmp_image, tmp_path):
    from animal_vision_tpu.cli import main

    out = str(tmp_path / "cli_out.png")
    main(["image", "--input", tmp_image, "--output", out, "--animal", "dog", "--no-show"])
    assert os.path.exists(out)


def test_cli_video_noninteractive(tmp_video, tmp_path):
    from animal_vision_tpu.cli import main

    out = str(tmp_path / "cli_out.mp4")
    main(["video", "--input", tmp_video, "--output", out, "--animal", "rat",
          "--no-show", "--batch", "3"])
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 8
    cap.release()


def test_cli_gallery(tmp_image, tmp_path, monkeypatch):
    from animal_vision_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    main(["gallery", "--input", tmp_image, "--group", "nonuv", "--tile-height", "48",
          "--max-side", "96"])
    grid = cv2.imread(str(tmp_path / "output" / "gallery_NonUV.png"))
    assert grid is not None and grid.shape[0] > 48


def test_service_processimage(img_u8):
    from animal_vision_tpu.service import processimage

    ok, buf = cv2.imencode(".jpg", cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR))
    uri = processimage(buf.tobytes(), "Dog")
    assert uri.startswith("data:image/jpeg;base64,")
    decoded = cv2.imdecode(
        np.frombuffer(base64.b64decode(uri.split(",", 1)[1]), np.uint8), cv2.IMREAD_COLOR
    )
    assert decoded.shape == img_u8.shape


def test_service_processsplitimage(img_u8):
    from animal_vision_tpu.service import processsplitimage

    ok, buf = cv2.imencode(".png", cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR))
    url = "data:image/png;base64," + base64.b64encode(buf.tobytes()).decode()
    uri = processsplitimage(url, "GoldFish")
    assert uri.startswith("data:image/png;base64,")


def test_service_unknown_animal(img_u8):
    from animal_vision_tpu.service import processimage

    ok, buf = cv2.imencode(".jpg", img_u8)
    with pytest.raises(KeyError):
        processimage(buf.tobytes(), "unicorn")


def test_stdlib_server_handler(img_u8):
    from animal_vision_tpu.server.app import _StdlibHandler

    ok, buf = cv2.imencode(".png", cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR))
    url = "data:image/png;base64," + base64.b64encode(buf.tobytes()).decode()
    code, payload = _StdlibHandler.handle(
        "/getpic", json.dumps({"image": url, "animal": "dog"}).encode()
    )
    assert code == 200 and payload["image"].startswith("data:image/png")
    code, payload = _StdlibHandler.handle("/gettip", json.dumps({"animal": "dog"}).encode())
    assert code == 200 and payload["tip"] == ""  # disabled parity
    code, _ = _StdlibHandler.handle("/nope", b"{}")
    assert code == 404


def test_gallery_grid_shapes():
    from animal_vision_tpu.io.gallery import build_labeled_grid

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (40 + i, 60, 3), dtype=np.uint8).astype(np.uint8) for i in range(5)]
    grid = build_labeled_grid(list(imgs), [f"a{i}" for i in range(5)], tile_height=32)
    assert grid.ndim == 3 and grid.shape[2] == 3


def test_ui_page_lists_animals():
    from animal_vision_tpu.server.app import _ui_asset, ui_page

    html = ui_page()
    assert "mantis_shrimp" in html and "<html" in html
    # the shell now serves from static files (server/ui/); the app logic
    # (Picture /getpic, live-video /getframe + /ws via getUserMedia — the
    # reference ui/src/{Picture,Video}.tsx flows) lives in app.js, and the
    # gallery route/category tabs are present in both
    assert '/ui/app.js' in html and '/ui/app.css' in html
    assert "page-gallery" in html and "nav-gallery" in html
    js = _ui_asset("app.js")
    assert "/getpic" in js and "/getframe" in js and "getUserMedia" in js
    assert "/ws" in js and "/getgallery" in js and "CATEGORIES" in js


def test_stdlib_server_getframe(img_u8):
    from animal_vision_tpu.server.app import _StdlibHandler

    ok, buf = cv2.imencode(".jpg", cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR))
    url = "data:image/jpeg;base64," + base64.b64encode(buf.tobytes()).decode()
    code, payload = _StdlibHandler.handle(
        "/getframe", json.dumps({"image": url, "animal": "lion"}).encode()
    )
    assert code == 200 and payload["image"].startswith("data:image/jpeg")


def test_server_getgallery(img_u8):
    """/getgallery renders the CLI gallery's labeled category grid
    (main.py:204-278 -> service.processgallery); the optional ``animals``
    subset keeps the test to two species."""
    from animal_vision_tpu.server.app import _StdlibHandler

    ok, buf = cv2.imencode(".png", cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR))
    url = "data:image/png;base64," + base64.b64encode(buf.tobytes()).decode()
    code, payload = _StdlibHandler.handle(
        "/getgallery",
        json.dumps({"image": url, "category": "nonuv", "animals": ["dog", "rat"]}).encode(),
    )
    assert code == 200 and payload["image"].startswith("data:image/png")
    grid = cv2.imdecode(
        np.frombuffer(base64.b64decode(payload["image"].split(",", 1)[1]), np.uint8),
        cv2.IMREAD_COLOR,
    )
    assert grid is not None and grid.shape[0] > img_u8.shape[0]  # label strips


def test_stream_hub_queue_and_drain():
    """The Socket.IO sendimage->getimage core (server.py:28-68) without
    socketio installed: per-sid bounded queues, round-robin drain, error
    frames survive, disconnect drops the queue."""
    import asyncio

    from animal_vision_tpu.server.app import StreamHub

    calls = []

    def fake_process(image, animal):
        if animal == "boom":
            raise ValueError("bad frame")
        return f"uri:{image}:{animal}"

    hub = StreamHub(maxlen=3, process=fake_process)
    emitted = []

    async def emit(event, payload, sid):
        emitted.append((event, payload, sid))

    async def scenario():
        hub.connect("a")
        hub.enqueue("a", "f1", "dog")
        hub.enqueue("a", "f2", "boom")
        hub.enqueue("b", "f3", "cat")  # lazy-create (reference parity)
        # bounded queue: overflow drops oldest
        for i in range(5):
            hub.enqueue("c", f"x{i}", "dog")
        assert len(hub.conns["c"]) == 3
        assert await hub.drain_once(emit) is True   # one frame per client
        assert await hub.drain_once(emit) is True
        while await hub.drain_once(emit):
            pass
        assert await hub.drain_once(emit) is False  # idle
        hub.disconnect("a")
        assert "a" not in hub.conns

    asyncio.run(scenario())
    events = [(e, s) for e, _, s in emitted]
    assert ("getimage", "a") in events
    assert ("error", "a") in events          # boom frame survived the loop
    assert ("getimage", "b") in events
    assert events.count(("getimage", "c")) == 3  # oldest two dropped
    by_sid_a = [p for e, p, s in emitted if s == "a" and e == "getimage"]
    assert by_sid_a[0]["image"] == "uri:f1:dog"


def test_pwa_manifest_sw_and_rotation_hooks():
    """PWA parity (ui/vite.config.ts + ui/src/Video.tsx:23-51): manifest +
    service worker routes exist and the UI registers/rotates."""
    import json as _json

    from animal_vision_tpu.server.app import MANIFEST_JSON, _ui_asset, ui_page

    man = _json.loads(MANIFEST_JSON)
    assert man["display"] == "standalone" and man["start_url"] == "/ui"
    assert man["icons"]
    sw = _ui_asset("sw.js")
    assert "caches.open" in sw and "fetch" in sw and "/ui/app.js" in sw
    page = ui_page()
    assert 'rel="manifest"' in page
    js = _ui_asset("app.js")
    assert "serviceWorker" in js and "/sw.js" in js
    assert "screen.orientation" in js and "rotate(" in js


def test_fuzzy_filter_and_menu(monkeypatch, capsys):
    """Dependency-free fuzzy picker (parity: InquirerPy fuzzy prompts,
    utils.py:339-438)."""
    from animal_vision_tpu.cli import _menu, fuzzy_filter

    opts = ["dog", "goldfish", "dragonfly", "jumping_spider", "goat"]
    assert fuzzy_filter("dg", opts)[0] == "dog"  # in-order subsequence
    assert "dragonfly" in fuzzy_filter("dg", opts)
    assert fuzzy_filter("gf", opts) == ["goldfish", "dragonfly"]
    assert fuzzy_filter("zzz", opts) == []

    # 'dgf' uniquely matches dragonfly -> auto-pick
    feed = iter(["dgf"])
    monkeypatch.setattr("builtins.input", lambda *a: next(feed))
    assert _menu("t", opts) == "dragonfly"

    # 'gf' narrows to two, then number picks from the FILTERED list
    feed = iter(["gf", "2"])
    monkeypatch.setattr("builtins.input", lambda *a: next(feed))
    assert _menu("t", opts) == "dragonfly"

    # exact name always wins
    feed = iter(["goat"])
    monkeypatch.setattr("builtins.input", lambda *a: next(feed))
    assert _menu("t", opts) == "goat"


def test_cli_morpho_gate_flag(tmp_image, tmp_path, monkeypatch):
    """--morpho-gate wires through env to the constructed Morpho instance
    (VERDICT round-2 next #9): flat frames render deterministically."""
    import animal_vision_tpu.species as sp
    from animal_vision_tpu.cli import main

    monkeypatch.delenv("ANIMAL_VISION_MORPHO_GATE", raising=False)
    sp._CACHE.pop("morpho", None)
    out = str(tmp_path / "morpho.png")
    main(["--morpho-gate", "1e-2", "image", "--input", tmp_image,
          "--output", out, "--animal", "morpho", "--no-show"])
    assert os.path.exists(out)
    assert sp._CACHE["morpho"].orientation_gate == pytest.approx(1e-2)
    # a constant frame is bit-deterministic under the gate
    flat = np.full((40, 64, 3), 128, np.uint8)
    _, a = sp._CACHE["morpho"].visualize(flat)
    _, b = sp._CACHE["morpho"].visualize(flat + 0)
    assert np.array_equal(a, b)
    sp._CACHE.pop("morpho", None)
    monkeypatch.delenv("ANIMAL_VISION_MORPHO_GATE", raising=False)
