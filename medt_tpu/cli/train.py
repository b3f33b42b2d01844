"""Train CLI.

Usage mirrors the reference (reference train.py / cmd.txt):

    python -m medt_tpu.cli.train --train_dataset <dir> --val_dataset <dir> \
        --modelname MedT --imgsize 128 --batch_size 4 --epochs 400 \
        --learning_rate 1e-3 --save_freq 50 --direc ./results --gray no
"""
from __future__ import annotations

from ..config import parse_config
from ..training.trainer import run_training


def main(argv=None):
    cfg = parse_config(argv, description="medt_tpu train")
    if not cfg.train_dataset:
        raise SystemExit("--train_dataset is required")
    run_training(cfg)


if __name__ == "__main__":
    main()
