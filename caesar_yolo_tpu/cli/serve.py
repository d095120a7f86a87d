"""Detection server: serve a frozen artifact over HTTP.

    python -m caesar_yolo_tpu.cli.serve --artifact=det.cyx [--port=8080]

Loads a `cli.export` artifact (deploy.load_detector — no model code, no
weights) and answers detection requests:

  POST /detect   body: raw little-endian float32 tile batch, shape given
                 by the artifact (B, H, W, C); or a .npy file of that
                 shape.  Response: JSON {"detections": [per-tile
                 {boxes, scores, class_ids}], "tile_ok": [...],
                 "n_dropped": [...]}.
  GET  /healthz  liveness + the artifact's expected input shape.

The reference has no serving story at all (README "Run": reinstall
ultralytics+torch per host); this is the TPU-native equivalent of a
saved-model server, built on the stdlib only.  Single-threaded by
design: one TPU program, requests are serialized (the batch dimension
is the throughput lever, not concurrency).
"""

from __future__ import annotations

import argparse
import io
import json
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

from caesar_yolo_tpu import logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="caesar-yolo-tpu serving daemon")
    p.add_argument("--artifact", required=True,
                   help="cli.export artifact file (.cyx)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    return p.parse_args(argv)


def make_handler(det, in_shape):
    import jax  # deferred like the rest of the CLI (fast --help startup)
    batch, h, w, c = in_shape
    n_bytes = int(np.prod(in_shape)) * 4

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # route through package logger
            logger.debug("serve: " + fmt, *args)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "input_shape": list(in_shape),
                                  "dtype": "float32"})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/detect":
                self._reply(404, {"error": "unknown path"})
                return
            length = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(length)
            try:
                if raw[:6] == b"\x93NUMPY":
                    tiles = np.load(io.BytesIO(raw))
                else:
                    if len(raw) != n_bytes:
                        raise ValueError(
                            f"expected {n_bytes} raw f32 bytes for shape "
                            f"{in_shape}, got {len(raw)}")
                    tiles = np.frombuffer(raw, "<f4").reshape(in_shape)
                if tuple(tiles.shape) != tuple(in_shape):
                    raise ValueError(f"tile shape {tiles.shape} != "
                                     f"artifact shape {in_shape}")
            except Exception as e:
                self._reply(400, {"error": str(e)})
                return
            boxes, scores, cls, valid, tile_ok, ndrop = jax.device_get(
                det(tiles.astype(np.float32)))
            dets = []
            for i in range(batch):
                v = valid[i]
                dets.append({
                    "boxes": boxes[i][v].astype(float).tolist(),
                    "scores": scores[i][v].astype(float).tolist(),
                    "class_ids": cls[i][v].astype(int).tolist(),
                })
            self._reply(200, {"detections": dets,
                              "tile_ok": tile_ok.astype(bool).tolist(),
                              "n_dropped": ndrop.astype(int).tolist()})

    return Handler


def build_server(artifact_path: str, host: str, port: int) -> HTTPServer:
    """Load the artifact, warm it once, and return a ready HTTPServer
    (serve_forever() to run; tests drive it from a thread)."""
    import jax
    from jax import export as jax_export

    blob = open(artifact_path, "rb").read()
    exp = jax_export.deserialize(blob)
    (spec,) = exp.in_avals
    in_shape = tuple(int(d) for d in spec.shape)
    # reuse the deserialized export (load_detector would parse the
    # whole weights-embedded blob a second time)
    det = jax.jit(exp.call)
    warm = np.zeros(in_shape, np.float32)
    _ = [np.asarray(o) for o in det(warm)]          # compile before serving
    logger.info("Serving %s (input %s) on %s:%d",
                artifact_path, in_shape, host, port)
    return HTTPServer((host, port), make_handler(det, in_shape))


def main(argv=None) -> int:
    args = parse_args(argv)
    server = build_server(args.artifact, args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("Shutting down")
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
