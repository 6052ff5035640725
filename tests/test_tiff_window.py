"""Windowed native reads (striped + tiled TIFFs) == full-read slices."""

import struct

import numpy as np
import pytest

from beach_seg_tpu.geo.affine import Affine
from beach_seg_tpu.geo.tiff import read, read_window, write


def test_read_window_striped(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 4000, (4, 200, 150)).astype(np.uint16)
    t = Affine.from_origin(100.0, 700.0, 3.0, 3.0)
    p = tmp_path / "s.tif"
    write(p, data, t, crs=32611, nodata=0, compress="lzw")
    full = read(p)
    for x0, y0, w, h in [(0, 0, 150, 200), (10, 20, 50, 60), (140, 190, 10, 10), (0, 100, 150, 1)]:
        r = read_window(p, (x0, y0, w, h))
        assert np.array_equal(r.data, full.data[:, y0 : y0 + h, x0 : x0 + w]), (x0, y0, w, h)
        # transform shifted to the window origin
        assert r.transform.apply(0, 0) == full.transform.apply(x0, y0)
        assert r.crs == "EPSG:32611" and r.nodata == 0
    with pytest.raises(OSError):
        read_window(p, (100, 100, 100, 100))  # exceeds the image


def _write_tiled_tiff(path, data_hwc: np.ndarray, tile: int = 64):
    """Minimal little-endian uncompressed TILED TIFF (the writer is striped,
    so tiled reading needs a hand-built fixture)."""
    h, w, c = data_hwc.shape
    assert data_hwc.dtype == np.uint8
    tx = -(-w // tile)
    ty = -(-h // tile)
    tiles = []
    padded = np.zeros((ty * tile, tx * tile, c), np.uint8)
    padded[:h, :w] = data_hwc
    for j in range(ty):
        for i in range(tx):
            tiles.append(padded[j * tile : (j + 1) * tile, i * tile : (i + 1) * tile].tobytes())

    entries = []  # (tag, type, count, value_or_offset_marker)
    def short(tag, *vals):
        entries.append((tag, 3, len(vals), list(vals)))
    def long(tag, *vals):
        entries.append((tag, 4, len(vals), list(vals)))

    short(256, w)      # width (SHORT is fine for small)
    short(257, h)
    short(258, *([8] * c))
    short(259, 1)      # no compression
    short(262, 2 if c >= 3 else 1)
    short(277, c)
    short(284, 1)
    short(322, tile)
    short(323, tile)
    long(324, *([0] * len(tiles)))  # offsets patched below
    long(325, *[len(b) for b in tiles])
    entries.sort(key=lambda e: e[0])

    out = bytearray(b"II" + struct.pack("<HI", 42, 8))
    out += struct.pack("<H", len(entries))
    entry_pos = len(out)
    out += b"\x00" * (12 * len(entries)) + struct.pack("<I", 0)

    payload_off = {}
    for idx, (tag, typ, cnt, vals) in enumerate(entries):
        size = (2 if typ == 3 else 4) * cnt
        if size > 4:
            payload_off[idx] = len(out)
            fmt = "<" + ("H" if typ == 3 else "I") * cnt
            out += struct.pack(fmt, *vals)

    tile_offsets = []
    for b in tiles:
        tile_offsets.append(len(out))
        out += b

    for idx, (tag, typ, cnt, vals) in enumerate(entries):
        if tag == 324:
            vals = tile_offsets
        pos = entry_pos + idx * 12
        struct.pack_into("<HHI", out, pos, tag, typ, cnt)
        size = (2 if typ == 3 else 4) * cnt
        if size <= 4:
            fmt = "<" + ("H" if typ == 3 else "I") * cnt
            struct.pack_into(fmt, out, pos + 8, *vals)
        else:
            off = payload_off[idx]
            if tag == 324:  # rewrite payload with real offsets
                struct.pack_into("<" + "I" * cnt, out, off, *vals)
            struct.pack_into("<I", out, pos + 8, off)
    path.write_bytes(bytes(out))


def test_read_window_tiled(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.integers(0, 255, (150, 130, 3)).astype(np.uint8)
    p = tmp_path / "tiled.tif"
    _write_tiled_tiff(p, data, tile=64)
    full = read(p)
    assert np.array_equal(full.data.transpose(1, 2, 0), data)
    for x0, y0, w, h in [(0, 0, 130, 150), (60, 60, 20, 20), (100, 120, 30, 30), (63, 63, 3, 3)]:
        r = read_window(p, (x0, y0, w, h))
        assert np.array_equal(r.data.transpose(1, 2, 0), data[y0 : y0 + h, x0 : x0 + w]), (x0, y0)
