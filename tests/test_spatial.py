"""Spatial extension tests: Morton keys and the grid-bucketed bbox
join (operators/spatial.py, functions/geometry.py:zorder_key)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from geosparql_etl_spark.functions.geometry import zorder_key
from geosparql_etl_spark.operators.spatial import bbox_spatial_join, covered_cells


def _z_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_python_reference(spark):
    rows = [
        (x, y)
        for x in [0, 1, 2, 3, 255, 4097, 65535]
        for y in [0, 1, 5, 1023, 65535]
    ]
    got = spark.createDataFrame(rows, ["x", "y"]).select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    for r in got.collect():
        assert r["z"] == _z_ref(r["x"], r["y"])


def test_zorder_locality_prefix():
    """Points in the same 2^k-aligned tile share the z-key high bits —
    the property range partitioning relies on."""
    # 16x16 tile at (32, 48): all 256 points fall in one 256-key z range
    keys = [_z_ref(32 + dx, 48 + dy) for dx in range(16) for dy in range(16)]
    assert max(keys) - min(keys) == 255
    assert {k >> 8 for k in keys} == {keys[0] >> 8}


def test_covered_cells_spans(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 10.0, 10.0), (95.0, 40.0, 105.0, 61.0)],
        ["minx", "miny", "maxx", "maxy"],
    ).select(
        covered_cells(
            F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), 50.0
        ).alias("cells")
    )
    got = [sorted((c["cx"], c["cy"]) for c in r["cells"]) for r in df.collect()]
    assert got[0] == [(0, 0)]
    assert got[1] == [(1, 0), (1, 1), (2, 0), (2, 1)]


def _brute_pairs(boxes):
    out = set()
    for i, (ida, ax0, ay0, ax1, ay1) in enumerate(boxes):
        for idb, bx0, by0, bx1, by1 in boxes[i + 1 :]:
            if ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1:
                out.add((min(ida, idb), max(ida, idb)))
    return out


def test_bbox_spatial_join_matches_bruteforce(spark):
    rng = random.Random(17)
    boxes = []
    for i in range(120):
        cx, cy = rng.uniform(0, 500), rng.uniform(0, 500)
        w, h = rng.uniform(1, 80), rng.uniform(1, 80)  # many cross cells
        boxes.append((i, cx - w, cy - h, cx + w, cy + h))
    df = spark.createDataFrame(boxes, ["box_id", "minx", "miny", "maxx", "maxy"])
    got = {
        (r["id_a"], r["id_b"])
        for r in bbox_spatial_join(df, cell=50.0).collect()
    }
    assert got == _brute_pairs(boxes) and len(got) > 100


def test_bbox_spatial_join_touching_edges_count(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 10.0, 10.0), (2, 10.0, 0.0, 20.0, 10.0), (3, 30.0, 30.0, 40.0, 40.0)],
        ["box_id", "minx", "miny", "maxx", "maxy"],
    )
    got = {
        (r["id_a"], r["id_b"]) for r in bbox_spatial_join(df, cell=7.0).collect()
    }
    assert got == {(1, 2)}


def test_bbox_spatial_join_hot_cell_cap(spark):
    """A dense cell above max_cell is dropped; pairs that share only
    that cell disappear, pairs connected through other cells survive."""
    # 30 boxes stacked in cell (0,0); 2 boxes overlapping in cell (2,2)
    dense = [(i, 1.0, 1.0, 5.0, 5.0) for i in range(30)]
    sparse = [(100, 110.0, 110.0, 120.0, 120.0), (101, 115.0, 115.0, 125.0, 125.0)]
    df = spark.createDataFrame(
        dense + sparse, ["box_id", "minx", "miny", "maxx", "maxy"]
    )
    capped = {
        (r["id_a"], r["id_b"])
        for r in bbox_spatial_join(df, cell=50.0, max_cell=10).collect()
    }
    assert capped == {(100, 101)}
    # uncapped finds all 435 dense pairs too
    full = bbox_spatial_join(df, cell=50.0).count()
    assert full == 435 + 1
