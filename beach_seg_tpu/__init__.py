"""beach_seg_tpu — TPU-native few-shot coastal segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``kyle-dorman/beach_seg`` (reference: /root/reference): prompt-tuned SegGPT
in-context segmentation of Planet Dove / SuperDove satellite imagery into
(nodata, sand, water, veg) classes, plus the full geo data plane
(GeoTIFF/shapefile I/O, rasterization, shoreline extraction, crop pipelines,
vote mosaics) that the reference delegated to rasterio/geopandas/shapely.

Layers (see SURVEY.md):
  config     — structured config + dotlist CLI merge (ref: src/config.py)
  geo        — host-side raster/vector data plane (ref: src/util/geo_util.py)
  models     — Flax SegGPT (ref: HF transformers.models.seggpt, rebuilt)
  ops        — jit/Pallas compute kernels (attention, palette, resize, votes)
  transforms — device-side preprocessing & augmentations (ref: kornia usage)
  data       — dataset/crop pipeline (ref: src/data.py)
  train      — prompt-tuning loop (ref: src/train.py, src/model.py)
  infer      — sliding-window engines (ref: src/predict*.py)
  parallel   — mesh/sharding utilities (TPU-native DP/FSDP/TP)
"""

__version__ = "0.1.0"

CLASSES = ("nodata", "sand", "water", "veg")
