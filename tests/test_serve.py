"""HTTP detection service (cli/serve.py) over a serving bundle."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from multipathnet_tpu.cli.serve import DetectionService, make_handler

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.eval.serving import save_bundle
    from multipathnet_tpu.models.multipath import build_model

    cfg = preset("tiny")
    model = build_model(cfg.model)
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    rois = jnp.asarray(RNG.uniform(5, 40, (2, 8, 4)), jnp.float32)
    rois = rois.at[..., 2:].add(12.0)
    params = model.init(jax.random.key(3), images, rois)
    out = str(tmp_path_factory.mktemp("bundle") / "b")
    save_bundle(out, cfg, params, quant="int8")
    return out


def _images_and_props(n, hw=48):
    images = [RNG.integers(0, 255, (hw, hw, 3)).astype(np.uint8)
              for _ in range(n)]
    props = [[[2.0, 2.0, 30.0, 30.0], [10.0, 8.0, 44.0, 40.0]]
             for _ in range(n)]
    return images, props


def test_service_pads_and_splits(bundle):
    svc = DetectionService(bundle)  # tiny preset: batch 2
    assert svc.batch == 2
    # 3 images -> two padded device batches; variable image sizes
    images, props = _images_and_props(3)
    images[1] = images[1][:32, :40]  # smaller image exercises hw padding
    dets = svc(images, props)
    assert len(dets) == 3
    for d in dets:
        assert set(d) == {"boxes", "scores", "classes"}
        assert len(d["boxes"]) == len(d["scores"]) == len(d["classes"])
        assert np.isfinite(np.asarray(d["scores"], np.float32)).all()
    # detections (if any) stay inside each image's true extent
    for b in dets[1]["boxes"]:
        assert b[2] <= 40.0 + 1e-3 and b[3] <= 32.0 + 1e-3


def test_service_rejects_oversized_inputs(bundle):
    svc = DetectionService(bundle)
    images = [RNG.integers(0, 255, (100, 100, 3)).astype(np.uint8)]
    with pytest.raises(ValueError, match="exceeds serving canvas"):
        svc(images, [[[0.0, 0.0, 8.0, 8.0]]])
    ok = [RNG.integers(0, 255, (32, 32, 3)).astype(np.uint8)]
    with pytest.raises(ValueError, match="max_proposals"):
        svc(ok, [[[0.0, 0.0, 8.0, 8.0]] * 33])  # bundle compiled for 32
    with pytest.raises(ValueError, match="proposal lists"):
        svc(ok, [])


def test_http_endpoints(bundle):
    from http.server import HTTPServer

    svc = DetectionService(bundle)
    httpd = HTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["head_quant"] == "int8"
        assert health["canvas"] == [64, 64]

        images, props = _images_and_props(2)
        body = json.dumps({"images": [im.tolist() for im in images],
                           "proposals": props}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["detections"]) == 2 and out["batch_ms"] > 0

        # malformed request -> 400 with an error message, server stays up
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=b'{"images": [[1]]}',
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "error" in json.loads(e.read())
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"]
    finally:
        httpd.shutdown()
