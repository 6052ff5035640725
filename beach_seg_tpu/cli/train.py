"""Training CLI (ref /root/reference/src/train.py): dotlist overrides, e.g.

    python -m beach_seg_tpu.cli.train data=/data/BorderField epochs=4 \
        checkpoint=/ckpts/seggpt.npz compute_dtype=bfloat16
"""

from __future__ import annotations

import sys

from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.train.loop import run_training
from beach_seg_tpu.parallel.distributed import maybe_initialize
from beach_seg_tpu.utils.confix import parse_cli


def main(argv: list[str] | None = None) -> None:
    conf = parse_cli(BeachSegConfig, sys.argv[1:] if argv is None else argv)
    maybe_initialize(conf.world_size, conf.platform)
    run_dir = run_training(conf)
    print(run_dir)


if __name__ == "__main__":
    main()
