"""CLI entry points, in-process (conftest pins CPU): train -> eval -> demo."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli")


def _ensure_run1(workdir) -> str:
    """Train the 6-step run1 checkpoint once per module; every consumer
    (train-assert, eval, demo tests) calls this, so no test depends on
    another having run first (e.g. under -m 'not slow')."""
    ckpt_dir = str(workdir / "run1")
    if os.path.exists(os.path.join(ckpt_dir, "metrics.jsonl")):
        return ckpt_dir
    from multipathnet_tpu.cli import train as train_cli

    train_cli.main([
        "--preset", "tiny", "--synthetic",
        "--dataset-root", str(workdir / "ds"),
        "--steps", "6", "--no-final-eval",
        "--set", f"train.checkpoint_dir={ckpt_dir}",
        "--set", "train.checkpoint_every=3",
        "--set", "train.log_every=2",
    ])
    return ckpt_dir


@pytest.mark.slow
def test_train_cli_runs_and_checkpoints(workdir):
    ckpt_dir = _ensure_run1(workdir)
    assert os.path.exists(os.path.join(ckpt_dir, "config.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "metrics.jsonl"))
    rows = [json.loads(l) for l in
            open(os.path.join(ckpt_dir, "metrics.jsonl"))]
    assert any("loss" in r for r in rows)
    cfg = json.load(open(os.path.join(ckpt_dir, "config.json")))
    assert cfg["model"]["num_classes"] == 5  # adopted from dataset (4 fg + bg)


@pytest.mark.slow
def test_train_cli_resume(workdir):
    from multipathnet_tpu.cli import train as train_cli

    ckpt_dir = _ensure_run1(workdir)
    train_cli.main([
        "--preset", "tiny", "--synthetic",
        "--dataset-root", str(workdir / "ds"),
        "--steps", "9", "--resume", "--no-final-eval",
        "--set", f"train.checkpoint_dir={ckpt_dir}",
        "--set", "train.checkpoint_every=3",
    ])
    from multipathnet_tpu.train.checkpoint import Checkpointer

    ck = Checkpointer(os.path.join(ckpt_dir, "ckpt"))
    assert ck.latest_step() == 9


def test_eval_cli_with_checkpoint(workdir, capsys):
    from multipathnet_tpu.cli import eval as eval_cli

    eval_cli.main([
        "--preset", "tiny", "--synthetic",
        "--dataset-root", str(workdir / "ds"),
        "--checkpoint-dir", _ensure_run1(workdir),
        "--json",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert "AP" in metrics and "AP50" in metrics


def test_eval_cli_int8_serving_config(workdir, capsys):
    """--set model.head_quant=int8 must restore the FLOAT checkpoint and
    quantize at load (cli/eval routes through a float Trainer + quant
    Detector); AP stays within quantization noise of the float eval."""
    from multipathnet_tpu.cli import eval as eval_cli

    results = {}
    for hq in ("none", "int8"):
        eval_cli.main([
            "--preset", "tiny", "--synthetic",
            "--dataset-root", str(workdir / "ds"),
            "--checkpoint-dir", _ensure_run1(workdir),
            "--set", f"model.head_quant={hq}",
            "--json",
        ])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        results[hq] = json.loads(out)
    assert abs(results["int8"]["AP50"] - results["none"]["AP50"]) <= 0.1


def test_trainer_rejects_quantized_config():
    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.train.loop import Trainer

    with pytest.raises(ValueError, match="float-only"):
        Trainer(preset("multipath_vgg16_int8"))


def test_demo_cli_writes_image(workdir):
    from multipathnet_tpu.cli import demo as demo_cli

    out_path = str(workdir / "demo.png")
    demo_cli.main([
        "--preset", "tiny", "--synthetic",
        "--dataset-root", str(workdir / "ds"),
        "--checkpoint-dir", _ensure_run1(workdir),
        "--index", "1", "--output", out_path,
        "--score-threshold", "0.0",
    ])
    from PIL import Image

    img = Image.open(out_path)
    assert img.size == (64, 64)


def test_config_override_errors():
    from multipathnet_tpu.cli.common import apply_overrides
    from multipathnet_tpu.core.config import preset

    with pytest.raises(SystemExit):
        apply_overrides(preset("tiny"), ["bogus.field=1"])
    with pytest.raises(SystemExit):
        apply_overrides(preset("tiny"), ["train.lr"])
    cfg = apply_overrides(preset("tiny"), [
        "train.lr=0.5", "model.foveal_scales=1.0,2.0",
        "data.image_size=32,32"])
    assert cfg.train.lr == 0.5
    assert cfg.model.foveal_scales == (1.0, 2.0)
    assert cfg.data.image_size == (32, 32)


@pytest.mark.slow
def test_train_proposal_net_cli_feeds_export(workdir, capsys):
    """The full offline-proposal workflow at CLI level: train the SharpMask
    net (--proposal-net), then export proposals FROM that checkpoint —
    the reference's DeepMask-sibling train entry + .t7 proposal files."""
    from multipathnet_tpu.cli import export_proposals as ep_cli
    from multipathnet_tpu.cli import train as train_cli

    ckpt_dir = str(workdir / "smrun")
    train_cli.main([
        "--preset", "tiny", "--synthetic",
        "--dataset-root", str(workdir / "ds"),
        "--proposal-net", "--steps", "8",
        "--set", f"train.checkpoint_dir={ckpt_dir}",
        "--set", "train.checkpoint_every=4",
        "--set", "train.log_every=2",
    ])
    assert os.path.exists(os.path.join(ckpt_dir, "metrics.jsonl"))
    rows = [json.loads(l) for l in
            open(os.path.join(ckpt_dir, "metrics.jsonl"))]
    assert any("loss" in r for r in rows)
    final = [r for r in rows if r.get("tag") == "final"]
    assert final and "proposal_recall@0.5" in final[-1]

    out_npz = str(workdir / "sm_props.npz")
    ep_cli.main([
        "--preset", "tiny", "--synthetic",
        "--dataset-root", str(workdir / "ds"),
        "--proposal-checkpoint-dir", ckpt_dir,
        "--output", out_npz, "--top-k", "8", "--batch-size", "4",
        "--with-masks",
    ])
    from multipathnet_tpu.data import rle as rle_codec
    from multipathnet_tpu.data.proposals import ProposalStore

    ps = ProposalStore.load(out_npz)
    assert len(ps) == 16 and ps.for_index(0)[0].shape == (8, 4)
    # --with-masks: the exported artifact carries one RLE per proposal in
    # the image frame (the reference's DeepMask proposal-file shape), and
    # they survive the npz round trip as decodable masks
    assert ps.rles is not None and len(ps.rles) == 16 * 8
    some = ps.rles_for_image_id(int(ps.image_ids[0]))
    assert len(some) == 8
    m = rle_codec.decode(some[0])
    assert m.shape == tuple(some[0]["size"])


@pytest.mark.slow
def test_export_proposals_cli_and_override(workdir, capsys):
    from multipathnet_tpu.cli import export_proposals as ep_cli
    from multipathnet_tpu.cli import eval as eval_cli
    import json

    out_npz = str(workdir / "gen_props.npz")
    ep_cli.main([
        "--preset", "tiny", "--synthetic",
        "--dataset-root", str(workdir / "ds"),
        "--output", out_npz, "--top-k", "8", "--batch-size", "4",
    ])
    assert os.path.exists(out_npz)
    from multipathnet_tpu.data.proposals import ProposalStore

    ps = ProposalStore.load(out_npz)
    assert len(ps) == 16
    b, s = ps.for_index(0)
    assert b.shape == (8, 4)

    # --proposals must override the synthetic default
    eval_cli.main([
        "--preset", "tiny", "--synthetic",
        "--dataset-root", str(workdir / "ds"),
        "--proposals", out_npz,
        "--checkpoint-dir", _ensure_run1(workdir), "--json",
    ])
    m_gen = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    eval_cli.main([
        "--preset", "tiny", "--synthetic",
        "--dataset-root", str(workdir / "ds"),
        "--checkpoint-dir", _ensure_run1(workdir), "--json",
    ])
    m_file = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m_gen != m_file  # different proposal sources -> different APs
