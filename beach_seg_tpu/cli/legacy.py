"""Legacy ensemble inference CLI (ref /root/reference/src/old/beach_seg.py):

    python -m beach_seg_tpu.cli.legacy data=/data/BorderField \
        prompt_ckpt=/results/.../prompt_batch_tuned.npz crop_size=224
"""

from __future__ import annotations

import sys

from beach_seg_tpu.config import LegacyConfig
from beach_seg_tpu.infer.legacy import run_legacy
from beach_seg_tpu.parallel.distributed import maybe_initialize
from beach_seg_tpu.utils.confix import parse_cli


def main(argv: list[str] | None = None) -> None:
    conf = parse_cli(LegacyConfig, sys.argv[1:] if argv is None else argv)
    maybe_initialize(conf.world_size, conf.platform)
    print(run_legacy(conf))


if __name__ == "__main__":
    main()
