"""End-to-end pipeline test: train CLI -> PNG dumps + checkpoints ->
test CLI -> metrics -> best-checkpoint sweep. Mirrors the reference's full
workflow (train.py -> test.py -> performancemetrics_*.m) on a tiny synthetic
dataset."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from medt_tpu.data.synthetic import make_png_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    train = make_png_dataset(str(root / "train"), n=6, img_size=32, seed=0)
    val = make_png_dataset(str(root / "val"), n=3, img_size=32, seed=1)
    return train, val


def test_train_test_sweep_pipeline(dataset, tmp_path):
    train_dir, val_dir = dataset
    out = str(tmp_path / "run")

    from medt_tpu.cli.train import main as train_main
    train_main([
        "--train_dataset", train_dir, "--val_dataset", val_dir,
        "--modelname", "axialunet", "--imgsize", "32", "--batch_size", "3",
        "--epochs", "2", "--save_freq", "1", "--learning_rate", "1e-3",
        "--direc", out, "--workers", "2",
        "--dp", "8", "--sp", "1", "--tp", "1",
    ])

    # training artifacts: JSONL + CSV logs, per-epoch PNG dumps, checkpoints
    assert os.path.exists(os.path.join(out, "train_log.jsonl"))
    assert os.path.exists(os.path.join(out, "train_log.csv"))
    for ep in (0, 1):
        dump_dir = os.path.join(out, str(ep))
        pngs = [f for f in os.listdir(dump_dir) if f.endswith(".png")]
        assert len(pngs) == 3, dump_dir
        assert os.path.isdir(os.path.join(out, str(ep), "ckpt"))
    assert os.path.isdir(os.path.join(out, "final_model", "ckpt"))

    # test CLI restores the final checkpoint and writes metrics
    pred_dir = str(tmp_path / "preds")
    from medt_tpu.cli.test import main as test_main
    test_main([
        "--val_dataset", val_dir, "--modelname", "axialunet",
        "--imgsize", "32", "--loaddirec", os.path.join(out, "final_model"),
        "--direc", pred_dir, "--workers", "0",
        "--dp", "8", "--sp", "1", "--tp", "1",
    ])
    metrics = json.load(open(os.path.join(pred_dir, "metrics.json")))
    assert metrics["images"] == 3
    assert 0.0 <= metrics["mean_f1"] <= 1.0

    # sweep over the epoch grid selects a best epoch
    from medt_tpu.evaluation import sweep_checkpoint_grid
    sweep = sweep_checkpoint_grid(out, os.path.join(val_dir, "labelcol"))
    assert sweep["best_epoch"] in (0, 1)


def test_resume_training(dataset, tmp_path):
    train_dir, val_dir = dataset
    out = str(tmp_path / "resume_run")
    from medt_tpu.cli.train import main as train_main
    args = [
        "--train_dataset", train_dir, "--modelname", "axialunet",
        "--imgsize", "32", "--batch_size", "3", "--epochs", "1",
        "--save_freq", "1", "--direc", out, "--workers", "0",
        "--dp", "8", "--sp", "1", "--tp", "1",
    ]
    train_main(args)
    # resume continues past epoch 0 without error
    train_main(args + ["--epochs", "2", "--resume"])
    assert os.path.isdir(os.path.join(out, "1", "ckpt"))
