"""Zero-shot ensemble inference CLI (ref /root/reference/src/predict_no_prompt.py):

    python -m beach_seg_tpu.cli.predict_no_prompt data=/data/BorderField \
        prediction_root=/results checkpoint=/ckpts/seggpt.npz n_prompts=2
"""

from __future__ import annotations

import sys

from beach_seg_tpu.config import PredConfig
from beach_seg_tpu.infer.zero_shot import run_zero_shot
from beach_seg_tpu.parallel.distributed import maybe_initialize
from beach_seg_tpu.utils.confix import parse_cli


def main(argv: list[str] | None = None) -> None:
    conf = parse_cli(PredConfig, sys.argv[1:] if argv is None else argv)
    maybe_initialize(conf.world_size, conf.platform)
    print(run_zero_shot(conf))


if __name__ == "__main__":
    main()
