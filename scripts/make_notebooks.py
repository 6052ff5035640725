"""Generate the executable notebook surface (ports of the reference's three
notebooks onto this framework + the synthetic scene; ref
/root/reference/notebooks/{train,beach_seg,beach}.ipynb).

Run: python scripts/make_notebooks.py   (writes notebooks/*.ipynb)
Execute-check: BEACH_SEG_RUN_SLOW=1 pytest tests/test_notebooks.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import nbformat as nbf

REPO = Path(__file__).resolve().parents[1]

BOOT = """\
# Boot: run on CPU, locate the repo, build a synthetic scene to walk through.
import sys, tempfile
from pathlib import Path
REPO = Path.cwd().resolve()
if not (REPO / "beach_seg_tpu").exists():
    REPO = REPO.parent
sys.path[:0] = [str(REPO)]
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import matplotlib.pyplot as plt
from tests.synthetic_scene import build_scene, MASK_DATE, OTHER_DATES
DATA = build_scene(Path(tempfile.mkdtemp(prefix="nb_scene_")))
print("scene at", DATA)
"""


def nb(cells) -> nbf.NotebookNode:
    out = nbf.v4.new_notebook()
    out.cells = [
        nbf.v4.new_markdown_cell(src) if kind == "md" else nbf.v4.new_code_cell(src)
        for kind, src in cells
    ]
    out.metadata["kernelspec"] = {"name": "python3", "display_name": "Python 3", "language": "python"}
    return out


# ---------------------------------------------------------------- notebook 1

pipeline = nb([
    ("md", "# Pipeline walkthrough\n"
           "Port of the reference's `train.ipynb`: step through the geo data plane —\n"
           "mask discovery, date grouping, raster extent, label rasterization,\n"
           "shoreline extraction, crop generation, mosaic merge — using\n"
           "`beach_seg_tpu.geo` on a synthetic scene."),
    ("code", BOOT),
    ("md", "## 1. Masks and dates (ref train.ipynb cells 2-3)"),
    ("code", """\
from beach_seg_tpu.geo.extent import get_masks, group_images_by_date, infer_date
mask_dir = DATA / "Masks"
veg_masks = get_masks(mask_dir, "Mask_*.shp")
water_masks = get_masks(mask_dir, "WaterMask_*.shp")
mask_date = infer_date(veg_masks + water_masks)
groups = group_images_by_date(list((DATA / "SatelliteImagery").glob("*/*.tif")))
print("mask date:", mask_date)
print("imagery dates:", {d: len(p) for d, p in sorted(groups.items())})"""),
    ("md", "## 2. Raster extent + label rasterization (cells 4-5)"),
    ("code", """\
from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.data.dataset import load_labels
from beach_seg_tpu.geo.extent import compute_raster_extent
conf = BeachSegConfig(data=DATA, crop_size=32, inpt_size=64)
out_transform, out_shape, crs = compute_raster_extent(groups[mask_date])
merged_mask, water_mask, veg_mask, full_no_data = load_labels(conf, out_shape, out_transform)
print("grid:", out_shape, "crs:", crs)
plt.imshow(merged_mask); plt.title("rasterized labels (0=nodata 1=sand 2=water 3=veg)"); plt.colorbar(); plt.show()"""),
    ("md", "## 3. Shoreline extraction + crops (cells 6, 8-9)"),
    ("code", """\
from beach_seg_tpu.geo.contours import extract_linestring
from beach_seg_tpu.geo.geometry import generate_square_crops_along_line
from beach_seg_tpu.geo.notebook_utils import plot_crops, plot_line
water_line = extract_linestring(water_mask, full_no_data)
crops = generate_square_crops_along_line(water_line, conf.crop_size, 0)
fig, ax = plt.subplots(figsize=(8, 6))
ax.imshow(merged_mask)
plot_line(water_line, "red", ax, linewidth=2)
plot_crops(crops, "yellow", ax)
ax.set_title(f"shoreline + {len(crops)} crops"); plt.show()"""),
    ("md", "## 4. Mosaic merge + display (cell 7)"),
    ("code", """\
from beach_seg_tpu.geo.mosaic import merge_tifs
merged_img, merged_nodata = merge_tifs(groups[mask_date], out_shape, out_transform, crs)
plt.figure(figsize=(8, 6)); plt.imshow(merged_img); plt.title("merged reference mosaic"); plt.show()"""),
    ("md", "## 5. Prompt crops (cells 10-11)"),
    ("code", """\
from beach_seg_tpu.data.dataset import create_scene, materialize_prompts
scene = create_scene(conf, train=True)
prompts = materialize_prompts(scene, conf)
cols = min(5, len(scene.crops))
fig, axes = plt.subplots(2, cols, figsize=(2 * cols, 4))
for i in range(cols):
    axes[0, i].imshow(prompts["pixels"][i]); axes[0, i].axis("off")
    axes[1, i].imshow(prompts["masks"][i]); axes[1, i].axis("off")
axes[0, 0].set_ylabel("image"); axes[1, 0].set_ylabel("mask")
plt.suptitle("prompt crops (image / label)"); plt.show()
print("prompt tensors:", {k: getattr(v, "shape", None) for k, v in prompts.items()})"""),
    ("md", "## 6. Config + palette (cells 12-14)"),
    ("code", """\
from beach_seg_tpu.utils.confix import to_dict
from beach_seg_tpu.transforms import build_palette
for k, v in list(to_dict(conf).items())[:12]:
    print(f"{k} = {v}")
pal = build_palette(len(conf.classes) - 1)
plt.imshow(pal[None].repeat(8, 0)); plt.title("painter palette (class colors)"); plt.yticks([]); plt.show()"""),
])

# ---------------------------------------------------------------- notebook 2

inspection = nb([
    ("md", "# Prediction inspection\n"
           "Port of the reference's `beach_seg.ipynb`: run zero-shot inference over\n"
           "the time series, then reload the exported shoreline shapefiles, invert\n"
           "the geo transform back to pixel space (cell 7), and overlay everything."),
    ("code", BOOT),
    ("md", "## 1. Zero-shot inference over all dates (cells 5-6)"),
    ("code", """\
from beach_seg_tpu.config import PredConfig
from beach_seg_tpu.infer.zero_shot import run_zero_shot
conf = PredConfig(
    data=DATA, model_training_root=DATA / "out", prediction_root=DATA / "out",
    zero_shot_crop_size=48, n_prompts=2, batch_size=2, debug=True,
    checkpoint="random", mesh_data=1, mesh_model=1,
)
out_dir = run_zero_shot(conf)
print("outputs:", sorted(p.name for p in out_dir.iterdir()))"""),
    ("md", "## 2. Reload exported lines → pixel space (cell 7)\n"
           "The run exports per-class shoreline shapefiles in WORLD coordinates;\n"
           "invert the affine transform to overlay them on the pixel grid."),
    ("code", """\
from beach_seg_tpu.data.dataset import create_scene
from beach_seg_tpu.geo.shapefile import read_shapefile
from beach_seg_tpu.geo.geometry import LineString, MultiLineString
from beach_seg_tpu.geo.notebook_utils import plot_line
from beach_seg_tpu.geo.tiff import read as read_tiff
import dataclasses
scene = create_scene(dataclasses.replace(conf, crop_size=conf.zero_shot_crop_size), train=True)
inv = ~scene.out_transform  # world → pixel

def to_pixel(geom):
    def tx(coords):
        return np.stack([inv * (x, y) for x, y in coords])
    if isinstance(geom, MultiLineString):
        return MultiLineString([LineString(tx(p.coords)) for p in geom.geoms])
    return LineString(tx(geom.coords))

date = OTHER_DATES[0]
r = read_tiff(out_dir / "tif" / f"{date}.tif")
fig, ax = plt.subplots(figsize=(8, 6))
ax.imshow(r.data[0])
for shp in sorted((out_dir / "lines").glob(f"*_{date}.shp")) or sorted((out_dir / "lines").glob("*.shp")):
    geoms, _ = read_shapefile(shp)
    for g in geoms:
        plot_line(to_pixel(g), "red", ax, linewidth=2)
ax.set_title(f"{date}: predicted classes + reloaded lines (pixel space)"); plt.show()"""),
    ("md", "## 3. Per-date masks (cell 7 tail)"),
    ("code", """\
from PIL import Image
fig, axes = plt.subplots(1, len(OTHER_DATES), figsize=(6 * len(OTHER_DATES), 5))
for ax, date in zip(np.atleast_1d(axes), OTHER_DATES):
    ax.imshow(np.asarray(Image.open(out_dir / "masks" / f"{date}.png")))
    ax.set_title(date)
plt.show()"""),
])

# ---------------------------------------------------------------- notebook 3

evaluation = nb([
    ("md", "# Shoreline evaluation\n"
           "Port of the reference's `beach.ipynb`: multispectral display recipes,\n"
           "rotated-bbox scene alignment (cell 5), and Average Symmetric Distance /\n"
           "Hausdorff evaluation of predicted shorelines against labels (cell 10)."),
    ("code", BOOT),
    ("md", "## 1. Multispectral display recipes (cells 2-4)"),
    ("code", """\
from beach_seg_tpu.geo.display import broad_band, rgb_log_image, tif_image
from beach_seg_tpu.geo.tiff import read as read_tiff
tif = sorted((DATA / "SatelliteImagery").glob("*/*.tif"))[0]
r = read_tiff(tif)
nodata = (r.data == 0).all(axis=0)
plt.figure(figsize=(8, 5)); plt.imshow(tif_image(r.data, nodata)); plt.title("tif_image (4-band log recipe)"); plt.show()"""),
    ("md", "## 2. Rotated-bbox alignment (cell 5)"),
    ("code", """\
from beach_seg_tpu.geo.notebook_utils import compute_rotation_matrix_for_mask, rotate_array
mask = np.zeros((96, 128), bool)
yy, xx = np.mgrid[:96, :128]
mask[(yy + 2 * xx > 80) & (yy + 2 * xx < 180)] = True  # a slanted strip
rot, (nw, nh), angle = compute_rotation_matrix_for_mask(mask)
print(f"rotation angle {angle:.1f} deg, output {nw}x{nh}")
fig, axes = plt.subplots(1, 2, figsize=(10, 4))
axes[0].imshow(mask); axes[0].set_title("valid mask")
axes[1].imshow(rotate_array(mask.astype(np.uint8), rot, (nw, nh))); axes[1].set_title("aligned")
plt.show()"""),
    ("md", "## 3. Predicted vs label shorelines: ASD + Hausdorff (cell 10)"),
    ("code", """\
from beach_seg_tpu.config import BeachSegConfig
from beach_seg_tpu.data.dataset import create_scene
from beach_seg_tpu.geo.contours import extract_linestring
from beach_seg_tpu.geo.line_metrics import average_symmetric_distance, hausdorff_distance
from beach_seg_tpu.geo.notebook_utils import plot_line
conf = BeachSegConfig(data=DATA, crop_size=32, inpt_size=64)
scene = create_scene(conf, train=False)  # all predict dates
label_scene = create_scene(conf, train=True)
label_line = extract_linestring(
    label_scene.date_masks[MASK_DATE] == conf.classes.index("water"),
    (label_scene.date_masks[MASK_DATE] == 0),
)
rows = []
fig, ax = plt.subplots(figsize=(8, 6))
ax.imshow(label_scene.date_masks[MASK_DATE])
plot_line(label_line, "white", ax, linewidth=2)
for date, (img, nodata) in sorted(scene.date_merged_imgs.items()):
    # synthetic 'prediction': per-date water = dark-NIR threshold
    water = (img[..., 2] < 80) & ~nodata
    pred_line = extract_linestring(water, nodata)
    if pred_line is None:
        continue
    asd = average_symmetric_distance(pred_line, label_line)
    hd = hausdorff_distance(pred_line, label_line)
    rows.append((date, asd, hd))
    plot_line(pred_line, "red", ax, linewidth=1)
ax.set_title("label (white) vs per-date predicted shorelines (red)"); plt.show()
print(f"{'date':10} {'ASD(px)':>8} {'Hausdorff(px)':>14}")
for date, asd, hd in rows:
    print(f"{date:10} {asd:8.2f} {hd:14.2f}")"""),
])


def main() -> None:
    out = REPO / "notebooks"
    out.mkdir(exist_ok=True)
    for name, book in [
        ("pipeline_walkthrough", pipeline),
        ("prediction_inspection", inspection),
        ("shoreline_eval", evaluation),
    ]:
        nbf.write(book, out / f"{name}.ipynb")
        print("wrote", out / f"{name}.ipynb")


if __name__ == "__main__":
    main()
