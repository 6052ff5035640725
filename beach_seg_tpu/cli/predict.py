"""Prompt-tuned inference CLI (ref /root/reference/src/predict.py):

    python -m beach_seg_tpu.cli.predict data=/data/BorderField \
        train_run_dir=/results/beach_seg/train/00000 batch_size=8
"""

from __future__ import annotations

import sys

from beach_seg_tpu.config import PredictionConfig
from beach_seg_tpu.infer.predict import run_predict
from beach_seg_tpu.parallel.distributed import maybe_initialize
from beach_seg_tpu.utils.confix import parse_cli


def main(argv: list[str] | None = None) -> None:
    conf = parse_cli(PredictionConfig, sys.argv[1:] if argv is None else argv)
    maybe_initialize(conf.world_size, conf.platform)
    print(run_predict(conf))


if __name__ == "__main__":
    main()
