"""beach_seg_tpu — TPU-native few-shot coastal segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
kyle-dorman/beach_seg (see SURVEY.md for the layer map and README.md for the
architecture). Public surface:

    beach_seg_tpu.config          structured configs (BeachSegConfig, …)
    beach_seg_tpu.geo             host geo/raster data plane (native codec)
    beach_seg_tpu.models.seggpt   Flax SegGPT + torch checkpoint conversion
    beach_seg_tpu.ops             resize/attention kernels (XLA + Pallas)
    beach_seg_tpu.transforms      palettes + batched augmentations
    beach_seg_tpu.data            scene → fixed-shape device batches
    beach_seg_tpu.train           PromptTuner, metrics, checkpoints, loggers
    beach_seg_tpu.parallel        device mesh + shardings
    beach_seg_tpu.infer           predict / zero-shot / legacy engines
    beach_seg_tpu.cli             command-line entry points
"""

__version__ = "0.1.0"

from beach_seg_tpu.config import (  # noqa: F401
    CLASSES,
    BeachSegConfig,
    LegacyConfig,
    PredConfig,
    PredictionConfig,
)
