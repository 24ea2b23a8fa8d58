"""Minimal HTTP front door for :class:`~radar_tpu.serving.server.
RadarServer` — stdlib-only (no web framework in the image), thread-per-
connection; every handler thread just enqueues into the server's
batcher and blocks on its Future, so concurrency turns directly into
dynamic batch size on the device.

Endpoints:

- ``POST /generate`` — JSON body::

      {"image": {"b64": "<base64 float32 little-endian>",
                 "shape": [H, W, 3]},          # or "data": nested lists
       "clinical_context": "Indication: ...",
       "verify_grounding": false}

  → 200 with the pipeline result dict (numpy scalars JSON-ified);
  400 on malformed requests, 503 while shutting down.
- ``GET /stats`` — the batcher's serving counters.
- ``GET /healthz`` — liveness (200 "ok").

Usage::

    http_server = RadarHTTPServer(server, port=8000)   # starts a thread
    ...
    http_server.close()
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..core.logging import get_logger
from .server import QueueFull

logger = get_logger("radar_tpu.serving.http")

_MAX_BODY = 256 * 1024 * 1024


def _decode_image(spec) -> np.ndarray:
    """JSON image spec → image array.

    ``b64`` + ``shape`` is the compact wire format.  ``dtype`` selects
    it: ``"uint8"`` is raw pixels (1 B/pixel — the production format;
    the pipeline resizes+normalizes ON DEVICE via its fused
    preprocessing program, and the relay upload is 1/4 the bytes of
    float32), ``"float32"`` (default) is pre-normalized model input.
    ``data`` nested lists are the debuggable fallback."""
    if not isinstance(spec, dict):
        raise ValueError("image must be an object with b64+shape or data")
    if "b64" in spec:
        shape = spec.get("shape")
        if not (isinstance(shape, list) and
                all(isinstance(d, int) and d > 0 for d in shape)):
            raise ValueError("image.shape must be a list of positive ints")
        dtype = spec.get("dtype", "float32")
        if dtype not in ("float32", "uint8"):
            raise ValueError(f"image.dtype must be float32 or uint8, "
                             f"got {dtype!r}")
        wire = np.uint8 if dtype == "uint8" else np.dtype("<f4")
        buf = np.frombuffer(base64.b64decode(spec["b64"]), dtype=wire)
        if buf.size != int(np.prod(shape)):
            raise ValueError(f"image payload has {buf.size} elements, "
                             f"shape {shape} needs {int(np.prod(shape))}")
        arr = buf.reshape(shape)
        return arr if dtype == "uint8" else arr.astype(np.float32)
    if "data" in spec:
        return np.asarray(spec["data"], np.float32)
    raise ValueError("image needs either b64+shape or data")


def _jsonable(obj):
    """Result dicts carry numpy scalars/arrays; make them JSON-safe."""
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple, set)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


class _Handler(BaseHTTPRequestHandler):
    # set by RadarHTTPServer
    radar = None
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):      # route to our logger
        logger.debug("%s " + fmt, self.address_string(), *args)

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _check_shape(self, image: np.ndarray) -> np.ndarray:
        """Reject wrong-shaped images at the door (400) rather than
        failing the whole batch on device (500) — a bad request must
        never cost its batch-mates their decode."""
        size = self.radar.pipeline.config.vision.image_size
        if image.shape != (size, size, 3):
            raise ValueError(f"image shape {list(image.shape)} != "
                             f"expected [{size}, {size}, 3]")
        return image

    def do_GET(self):                        # noqa: N802 (stdlib API)
        if self.path == "/healthz":
            self._reply(200, {"status": "ok"})
        elif self.path == "/stats":
            self._reply(200, self.radar.stats())
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):                       # noqa: N802
        if self.path != "/generate":
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            if not 0 < length <= _MAX_BODY:
                raise ValueError(f"bad Content-Length {length}")
            req = json.loads(self.rfile.read(length))
            image = self._check_shape(_decode_image(req["image"]))
            context = req["clinical_context"]
            if not isinstance(context, str):
                raise ValueError("clinical_context must be a string")
            kw = {}
            if req.get("reference_text") is not None:
                kw["reference_text"] = str(req["reference_text"])
            if req.get("prior_image") is not None:
                kw["prior_image"] = self._check_shape(
                    _decode_image(req["prior_image"]))
            kw["verify_grounding"] = bool(req.get("verify_grounding",
                                                  False))
            fut = self.radar.submit(image, context, **kw)
        except QueueFull as e:               # backpressure: shed load
            self._reply(429, {"error": str(e)})
            return
        except RuntimeError as e:            # server shut down
            self._reply(503, {"error": str(e)})
            return
        except (KeyError, ValueError, TypeError,
                json.JSONDecodeError, OverflowError) as e:
            self._reply(400, {"error": str(e)})
            return
        try:
            self._reply(200, _jsonable(fut.result()))
        except Exception as e:               # noqa: BLE001 — batch failed
            self._reply(500, {"error": f"{type(e).__name__}: {e}"})


class RadarHTTPServer:
    """Threaded HTTP wrapper; serves on a daemon thread from
    construction until :meth:`close`.  ``port=0`` picks a free port
    (read it back from ``.port``)."""

    def __init__(self, radar_server, host: str = "127.0.0.1",
                 port: int = 0):
        handler = type("BoundHandler", (_Handler,),
                       {"radar": radar_server})
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._httpd.daemon_threads = True
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True,
            name="radar-http")
        self._thread.start()
        logger.info("serving on http://%s:%d", self.host, self.port)

    def close(self) -> None:
        """Stop accepting connections (does not shut down the
        underlying RadarServer)."""
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join()
