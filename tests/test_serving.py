"""Serving bundles (eval/serving.py + cli/export_serving.py): the deployment
artifact analog of the reference's released `.t7` model files."""

import dataclasses
import os

import numpy as np
import pytest

from multipathnet_tpu.core.config import Config, preset
from multipathnet_tpu.eval.serving import load_bundle, load_detector, save_bundle
from multipathnet_tpu.models.multipath import build_model

RNG = np.random.default_rng(23)


def test_config_json_roundtrip():
    for name in ("tiny", "multipath_vgg16_int8", "multipath_vgg16_reference"):
        cfg = preset(name)
        back = Config.from_json(cfg.to_json())
        assert back == cfg, name
    # unknown future field is ignored (forward compat)
    import json

    raw = json.loads(preset("tiny").to_json())
    raw["model"]["some_future_knob"] = 7
    assert Config.from_json(json.dumps(raw)) == preset("tiny")


def _tiny_setup(head_quant="none"):
    import jax
    import jax.numpy as jnp

    cfg = preset("tiny")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                head_quant=head_quant))
    model = build_model(
        dataclasses.replace(cfg.model, head_quant="none"))
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    rois = jnp.asarray(RNG.uniform(5, 40, (2, 8, 4)), jnp.float32)
    rois = rois.at[..., 2:].add(12.0)
    params = model.init(jax.random.key(2), images, rois)
    return cfg, params


def _detect_inputs(b=2, p=16, s=64):
    images = RNG.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
    hws = np.full((b, 2), float(s), np.float32)
    x1 = RNG.uniform(0, 30, (b, p)).astype(np.float32)
    y1 = RNG.uniform(0, 30, (b, p)).astype(np.float32)
    props = np.stack([x1, y1, x1 + 22, y1 + 22], -1)
    return images, hws, props, np.ones((b, p), bool)


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_bundle_roundtrip_matches_live_detector(tmp_path, quant):
    """save -> load -> detect must be BIT-equal to the in-process Detector
    on the same (quantized) weights: serialization is exact (f32/int8)."""
    from multipathnet_tpu.eval.detect import Detector

    cfg, params = _tiny_setup(head_quant=quant)
    bundle = str(tmp_path / f"bundle_{quant}")
    save_bundle(bundle, cfg, params, quant=quant)
    assert os.path.exists(os.path.join(bundle, "config.json"))
    assert os.path.exists(os.path.join(bundle, "params.msgpack"))

    lcfg, lmodel, lparams = load_bundle(bundle)
    assert lcfg.model.head_quant == quant
    if quant == "int8":
        import jax

        paths = [str(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(lparams)]
        assert any("kernel_i8" in p for p in paths)  # exported pre-quantized

    inputs = _detect_inputs()
    live = Detector(build_model(cfg.model), params, cfg)(*inputs)
    loaded = load_detector(bundle)(*inputs)
    for k in live:
        np.testing.assert_array_equal(live[k], loaded[k], err_msg=k)


def test_save_bundle_rejects_float_config_over_int8_params(tmp_path):
    """No dequantize path exists — exporting int8 params under a float
    config must fail AT EXPORT, not at first apply after deployment."""
    from multipathnet_tpu.ops import quant

    cfg, params = _tiny_setup(head_quant="int8")
    qparams = quant.quantize_head_params(params)
    with pytest.raises(ValueError, match="re-export"):
        save_bundle(str(tmp_path / "bad"), cfg, qparams, quant="none")


def test_export_serving_cli_random_init(tmp_path, capsys):
    """CLI smoke test: random init (no ckpt) exports a loadable bundle."""
    from multipathnet_tpu.cli import export_serving

    out = str(tmp_path / "bundle")
    export_serving.main(["--preset", "tiny", "--out", out, "--quant", "int8"])
    assert "bundle written" in capsys.readouterr().out
    det = load_detector(out)
    o = det(*_detect_inputs())
    assert np.isfinite(o["scores"]).all()
