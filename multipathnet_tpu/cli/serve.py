"""HTTP detection service over a serving bundle — the deployment daemon.

    python -m multipathnet_tpu.cli.serve --bundle /path/to/bundle --port 8000

No reference counterpart (the 2016 repo stopped at a Lua demo script); this
is the "large-scale serving" surface the TPU build targets. Stdlib-only
(http.server + a thread pool is deliberately NOT used: requests serialize
through the single jitted graph anyway — JAX dispatch is the real queue, and
a threaded front would only reorder identical work).

Protocol (JSON in, JSON out):

  POST /detect
    {"images": [[...HxWx3 uint8...], ...],          # per-image nested lists
     "proposals": [[[x1,y1,x2,y2], ...], ...]}      # per-image box lists
  -> {"detections": [{"boxes": [[x1,y1,x2,y2]...],
                      "scores": [...], "classes": [...]}, ...],
      "batch_ms": float}

  GET /healthz -> {"ok": true, "config": "<preset name>", ...}

Images may be any size up to the bundle's canvas; each request is padded to
the serving batch/proposal shapes (static shapes keep ONE compiled graph —
the first request pays the compile, the rest are steady-state; start the
server with --warmup to pay it before accepting traffic).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


class DetectionService:
    """Bundle -> padded-batch detection callable (one compiled graph)."""

    def __init__(self, bundle_dir: str, batch_size: int = 0):
        import numpy as np

        from multipathnet_tpu.eval.serving import load_bundle

        self.np = np
        cfg, model, params = load_bundle(bundle_dir)
        if batch_size:
            import dataclasses

            cfg = cfg.replace(train=dataclasses.replace(
                cfg.train, batch_size=batch_size))
        from multipathnet_tpu.eval.detect import Detector

        self.cfg = cfg
        self.batch = max(cfg.train.batch_size, 1)
        self.canvas = cfg.data.image_size
        self.max_proposals = cfg.data.max_proposals
        self.detector = Detector(model, params, cfg)

    def warmup(self) -> float:
        np = self.np
        t0 = time.time()
        self(np.zeros((1, 16, 16, 3), np.uint8), [[[0.0, 0.0, 8.0, 8.0]]])
        return time.time() - t0

    def __call__(self, images, proposals_per_image):
        """images: list/array of HxWx3 uint8 (H, W <= canvas); proposals:
        list of (Pi <= max_proposals, 4) float lists. Pads to the compiled
        (batch, canvas, max_proposals) shapes; splits requests larger than
        the batch. Raises ValueError (-> HTTP 400) on inputs exceeding the
        compiled shapes — never silently truncates."""
        np = self.np
        n = len(images)
        if n != len(proposals_per_image):
            raise ValueError(f"{n} images but "
                             f"{len(proposals_per_image)} proposal lists")
        ch, cw = self.canvas
        out = []
        for lo in range(0, n, self.batch):
            hi = min(lo + self.batch, n)
            k = hi - lo
            imgs = np.zeros((self.batch, ch, cw, 3), np.uint8)
            hws = np.ones((self.batch, 2), np.float32)
            props = np.zeros((self.batch, self.max_proposals, 4), np.float32)
            mask = np.zeros((self.batch, self.max_proposals), bool)
            for i in range(k):
                im = np.asarray(images[lo + i], np.uint8)
                h, w = im.shape[:2]
                if h > ch or w > cw:
                    raise ValueError(
                        f"image {h}x{w} exceeds serving canvas {ch}x{cw}")
                imgs[i, :h, :w] = im
                hws[i] = (h, w)
                p = np.asarray(proposals_per_image[lo + i],
                               np.float32).reshape(-1, 4)
                if len(p) > self.max_proposals:
                    raise ValueError(
                        f"{len(p)} proposals exceed the bundle's "
                        f"max_proposals={self.max_proposals}; re-export the "
                        f"bundle with a larger data.max_proposals or send "
                        f"the top-{self.max_proposals}")
                props[i, :len(p)] = p
                mask[i, :len(p)] = True
            res = self.detector(imgs, hws, props, mask)
            for i in range(k):
                valid = res["valid"][i].astype(bool)
                out.append({
                    "boxes": res["boxes"][i][valid].round(2).tolist(),
                    "scores": res["scores"][i][valid].round(4).tolist(),
                    "classes": res["classes"][i][valid].astype(int).tolist(),
                })
        return out


def make_handler(service: DetectionService):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):  # route access logs to stderr
            log(f"serve: {fmt % a}")

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "unknown path"})
            self._reply(200, {
                "ok": True, "config": service.cfg.name,
                "backbone": service.cfg.model.backbone,
                "head_quant": service.cfg.model.head_quant,
                "batch": service.batch,
                "canvas": list(service.canvas),
                "max_proposals": service.max_proposals,
            })

        def do_POST(self):
            if self.path != "/detect":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n))
                t0 = time.time()
                dets = service(req["images"], req["proposals"])
                self._reply(200, {"detections": dets,
                                  "batch_ms": round(
                                      (time.time() - t0) * 1e3, 2)})
            except Exception as e:  # surface the error to the client
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bundle", required=True, help="serving bundle directory")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=0,
                   help="override the bundle's serving batch size")
    p.add_argument("--warmup", action="store_true",
                   help="compile the graph before accepting traffic")
    args = p.parse_args(argv)

    from multipathnet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    service = DetectionService(args.bundle, batch_size=args.batch_size)
    if args.warmup:
        log(f"serve: warmup (compiles the graph)...")
        log(f"serve: warm in {service.warmup():.1f}s")

    from http.server import HTTPServer

    httpd = HTTPServer((args.host, args.port), make_handler(service))
    log(f"serve: listening on {args.host}:{httpd.server_address[1]} "
        f"(batch {service.batch}, canvas {service.canvas}, "
        f"head_quant={service.cfg.model.head_quant})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
