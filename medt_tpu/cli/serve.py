"""Serve CLI — HTTP segmentation endpoint over the batched engine.

The reference has no deployment story; this is the production-serving
front end for the framework. Stdlib-only (no server deps):

    python -m medt_tpu.cli.serve --modelname MedT --imgsize 128 \
        --loaddirec ./results/final_model --port 8900 --batch_size 16

Endpoints:
  POST /predict   body = PNG (any size; >=imgsize tiles via sliding window)
                  response = PNG mask (0/255), 200
                  optional ``X-Priority: <int>`` header — lower is served
                  first (engine priority queue); default 0
  GET  /healthz   {"status": "ok", ...engine counters...}

Concurrent requests are coalesced into full TPU batches by the engine's
dynamic micro-batcher (serving/engine.py) — a threading HTTP server feeds
the queue, the single jitted executable serves everyone.
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..config import parse_config
from ..serving import InferenceEngine, QueueFullError


def make_handler(engine: InferenceEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; counters via /healthz
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps({"status": "ok", **engine.stats()}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/predict":
                self.send_error(404)
                return
            try:
                from PIL import Image

                n = int(self.headers.get("Content-Length", 0))
                img = np.asarray(Image.open(io.BytesIO(self.rfile.read(n))))
                if img.ndim == 3 and img.shape[-1] == 4:
                    img = img[..., :3]
                s = engine.imgsize
                if img.shape[:2] == (s, s):
                    prio = int(self.headers.get("X-Priority", 0))
                    mask = engine.submit(img, priority=prio).result()
                else:
                    mask = engine.predict(img)  # sliding window
                buf = io.BytesIO()
                Image.fromarray((mask * 255).astype(np.uint8)).save(
                    buf, format="PNG")
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except QueueFullError as e:  # backpressure -> retry later
                msg = str(e).encode()
                self.send_response(503)
                self.send_header("Retry-After", "1")
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)
            except Exception as e:  # report the failure, keep serving
                msg = str(e).encode()[:1000]
                self.send_response(400)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

    return Handler


def make_server(engine: InferenceEngine, port: int, host: str = "127.0.0.1"):
    """Build (started engine, HTTP server); caller runs serve_forever."""
    engine.start()
    return ThreadingHTTPServer((host, port), make_handler(engine))


def main(argv=None):
    cfg = parse_config(argv, description="medt_tpu serve")
    if not cfg.loaddirec:
        raise SystemExit("--loaddirec is required")
    mesh = None
    if cfg.dp and cfg.dp > 1:
        # data-parallel serving: shard each compiled batch over the first
        # --dp devices (params replicated, scales linearly over ICI)
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < cfg.dp:
            raise SystemExit(
                f"--dp {cfg.dp} but only {len(devs)} devices visible")
        mesh = Mesh(np.asarray(devs[:cfg.dp]), ("data",))
    engine = InferenceEngine(
        cfg.modelname, cfg.imgsize, loaddirec=cfg.loaddirec,
        batch_size=cfg.batch_size, gray=cfg.gray == "yes",
        use_fused=cfg.use_pallas == "yes", decision=cfg.pred_mode,
        mesh=mesh)
    engine.warmup()
    server = make_server(engine, cfg.port)
    print(f"serving {cfg.modelname}@{cfg.imgsize} on :{cfg.port} "
          f"(batch {cfg.batch_size}"
          + (f", dp={cfg.dp}" if mesh is not None else "") + ")", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.stop()


if __name__ == "__main__":
    main()
