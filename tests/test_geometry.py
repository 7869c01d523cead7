"""Geometry expression tests (G1-G13): parity with the reference's
string outputs and shapely-equivalent math (SURVEY.md §2.7)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from geosparql_etl_spark.functions import geometry as G
from geosparql_etl_spark.schemas import COORDINATES

RING = [[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]]  # open 4x3 rectangle

_FIELD_TYPES = {
    "coords": COORDINATES,
    "c": COORDINATES,
    "t": T.StringType(),
    "p": T.StringType(),
    "dummy": T.IntegerType(),
}


def _one(spark, col, **data):
    schema = T.StructType(
        [T.StructField(k, _FIELD_TYPES[k]) for k in data]
    )
    df = spark.createDataFrame([tuple(data.values())], schema)
    return df.select(col.alias("out")).first()["out"]


def test_polygon_wkt_no_close_raw_floats(spark):
    # G1 does NOT close the ring and renders raw float repr (json-etl:27-42)
    out = _one(spark, G.polygon_wkt(F.col("coords")), coords=[RING])
    assert out == "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 3.0, 0.0 3.0))"


def test_polygon_wkt_empty_is_null(spark):
    assert _one(spark, G.polygon_wkt(F.col("coords")), coords=[[]]) is None
    assert _one(spark, G.polygon_wkt(F.col("coords")), coords=[]) is None


def test_parse_polygon_string_closes_ring(spark):
    # G2 closes the ring and preserves coordinate text verbatim
    out = _one(spark, G.parse_polygon_string_wkt(F.col("p")), p="[1:2:3:4:5:6]")
    assert out == "POLYGON ((1 2, 3 4, 5 6, 1 2))"


def test_parse_polygon_string_drops_odd_tail(spark):
    out = _one(spark, G.parse_polygon_string_wkt(F.col("p")), p="[1:2:3:4:9]")
    assert out == "POLYGON ((1 2, 3 4, 1 2))"


def test_parse_polygon_string_already_closed(spark):
    out = _one(spark, G.parse_polygon_string_wkt(F.col("p")), p="[1:2:3:4:1:2]")
    assert out == "POLYGON ((1 2, 3 4, 1 2))"


def test_parse_polygon_string_empty_null(spark):
    assert _one(spark, G.parse_polygon_string_wkt(F.col("p")), p="") is None


def test_denormalized_wkt_formats_and_closes(spark):
    # G3: x0.5,y0.5 over 100x200 -> '50.00 100.00', ring closed, %.2f
    out = _one(
        spark,
        G.denormalized_polygon_wkt(
            F.col("t"), F.col("coords"), F.lit(100.0), F.lit(200.0)
        ),
        t="Polygon",
        coords=[[[0.5, 0.5], [1.0, 0.5], [1.0, 1.0]]],
    )
    assert out == "POLYGON ((50.00 100.00, 100.00 100.00, 100.00 200.00, 50.00 100.00))"


def test_denormalized_wkt_requires_polygon_type(spark):
    out = _one(
        spark,
        G.denormalized_polygon_wkt(
            F.col("t"), F.col("coords"), F.lit(100.0), F.lit(100.0)
        ),
        t="Point",
        coords=[[[0.5, 0.5]]],
    )
    assert out is None


def test_shoelace_area_rectangle(spark):
    assert _one(spark, G.polygon_area(F.col("c")), c=[RING]) == 12.0


def test_shoelace_area_triangle_closed_ring(spark):
    tri = [[0.0, 0.0], [4.0, 0.0], [0.0, 3.0], [0.0, 0.0]]
    assert _one(spark, G.polygon_area(F.col("c")), c=[tri]) == 6.0


def test_perimeter_rectangle(spark):
    assert _one(spark, G.polygon_perimeter(F.col("c")), c=[RING]) == 14.0


def test_bounds(spark):
    b = _one(spark, G.polygon_bounds(F.col("c")), c=[RING])
    assert (b["minx"], b["miny"], b["maxx"], b["maxy"]) == (0.0, 0.0, 4.0, 3.0)


def test_is_valid_polygon(spark):
    ok = _one(
        spark, G.is_valid_polygon(F.col("t"), F.col("c")), t="Polygon", c=[RING]
    )
    assert ok is True
    degenerate = [[0.0, 0.0], [1.0, 1.0]]
    bad = _one(
        spark,
        G.is_valid_polygon(F.col("t"), F.col("c")),
        t="Polygon",
        c=[degenerate],
    )
    assert bad is False


def test_ring_self_intersects_classes(spark):
    """D8 closure: simple rings (open or GeoJSON-closed) pass, bowtie
    crossings / repeated vertices / vertex-on-edge touches fail."""
    cases = [
        ("square_open", [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]], False),
        ("square_closed",
         [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]], False),
        ("triangle", [[0.0, 0.0], [3.0, 0.0], [0.0, 3.0]], False),
        ("bowtie", [[0.0, 0.0], [4.0, 4.0], [4.0, 0.0], [0.0, 4.0]], True),
        ("asym_bowtie",
         [[0.0, 0.0], [4.0, 4.0], [4.0, 0.0], [0.0, 2.0]], True),
        ("dup_vertex", [[0.0, 0.0], [4.0, 0.0], [4.0, 0.0], [0.0, 4.0]], True),
        ("vertex_on_edge",
         [[0.0, 0.0], [6.0, 0.0], [6.0, 6.0], [3.0, 0.0], [0.0, 6.0]], True),
    ]
    df = spark.createDataFrame(
        [(n, r) for n, r, _ in cases], "name string, ring array<array<double>>"
    )
    got = {
        r["name"]: r["si"]
        for r in df.select(
            "name", G.ring_self_intersects(F.col("ring")).alias("si")
        ).collect()
    }
    assert got == {n: want for n, _, want in cases}


def test_is_valid_polygon_rejects_self_intersection(spark):
    """The asymmetric bowtie passes every structural check (4 distinct
    points, |shoelace| area 4 > 0) — only the D8 simplicity test can
    reject it."""
    bowtie = [[0.0, 0.0], [4.0, 4.0], [4.0, 0.0], [0.0, 2.0]]
    assert G is not None
    assert _one(
        spark, G.ring_area(F.col("c")[0]), c=[bowtie]
    ) == 4.0
    assert _one(
        spark,
        G.is_valid_polygon(F.col("t"), F.col("c")),
        t="Polygon",
        c=[bowtie],
    ) is False


def test_image_bbox_wkt(spark):
    out = _one(
        spark, G.image_bbox_wkt(F.lit(40000), F.lit(30000)), dummy=1
    )
    assert out == "POLYGON ((0 0, 40000 0, 40000 30000, 0 30000, 0 0))"


def test_safe_polygon_wkt_default(spark):
    assert _one(spark, G.safe_polygon_wkt(F.col("c")), c=[]) == "POINT EMPTY"


def test_point_in_ring_nonconvex(spark):
    """Even-odd ray casting on a U-shaped (non-convex) ring: the notch
    between the arms is OUTSIDE even though the bbox contains it."""
    from pyspark.sql import functions as F

    from geosparql_etl_spark.functions.geometry import point_in_ring

    # U shape: arms at x in [0,1] and [3,4], base y in [0,1], height 3
    u = [
        (0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (3.0, 3.0),
        (3.0, 1.0), (1.0, 1.0), (1.0, 3.0), (0.0, 3.0),
    ]
    ring = F.array(*[F.array(F.lit(x), F.lit(y)) for x, y in u])
    probes = [
        (0.5, 2.0, True),   # left arm
        (3.5, 2.0, True),   # right arm
        (2.0, 0.5, True),   # base
        (2.0, 2.0, False),  # the notch: inside bbox, outside ring
        (5.0, 0.5, False),  # fully outside
    ]
    df = spark.range(1)
    for px, py, want in probes:
        got = df.select(
            point_in_ring(ring, F.lit(px), F.lit(py)).alias("r")
        ).first()["r"]
        assert got == want, (px, py, got)


# --- interior rings (round 13: D8 full closure) --------------------------

DONUT = [
    [[0.0, 0.0], [6.0, 0.0], [6.0, 6.0], [0.0, 6.0]],
    [[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]],
    [[4.0, 4.0], [5.0, 4.0], [5.0, 5.0], [4.0, 5.0]],
]


def test_polygon_area_perimeter_holes(spark):
    # hand-computed shoelace: 36 - 4 - 1; boundary 24 + 8 + 4
    assert _one(
        spark, G.polygon_area_holes(F.col("coords")), coords=DONUT
    ) == 31.0
    assert _one(
        spark, G.polygon_perimeter_holes(F.col("coords")), coords=DONUT
    ) == 36.0
    # no holes: degrades to the single-ring measures
    assert _one(
        spark, G.polygon_area_holes(F.col("coords")), coords=[DONUT[0]]
    ) == 36.0


def test_point_in_polygon_holes(spark):
    for px, py, want in [
        (0.5, 0.5, True),    # between outer and holes
        (2.0, 2.0, False),   # inside hole 1
        (4.5, 4.5, False),   # inside hole 2
        (3.5, 3.5, True),    # between the holes
        (7.0, 7.0, False),   # outside the outer ring
    ]:
        got = _one(
            spark,
            G.point_in_polygon_holes(
                F.col("coords"), F.lit(px), F.lit(py)
            ),
            coords=DONUT,
        )
        assert got == want, (px, py, got)


def test_multi_ring_wkt_render_and_parse(spark):
    wkt = _one(spark, G.polygon_wkt_rings(F.col("coords")), coords=DONUT)
    assert wkt == (
        "POLYGON ((0.0 0.0, 6.0 0.0, 6.0 6.0, 0.0 6.0, 0.0 0.0), "
        "(1.0 1.0, 3.0 1.0, 3.0 3.0, 1.0 3.0, 1.0 1.0), "
        "(4.0 4.0, 5.0 4.0, 5.0 5.0, 4.0 5.0, 4.0 4.0))"
    )
    # parse drops the closing repeats and returns the canonical form
    rt = _one(
        spark,
        G.wkt_polygon_rings(G.polygon_wkt_rings(F.col("coords"))),
        coords=DONUT,
    )
    assert [[list(p) for p in ring] for ring in rt] == DONUT
    # single-ring WKT parses to a one-ring coordinates array
    one = _one(
        spark,
        G.wkt_polygon_rings(F.lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")),
        dummy=1,
    )
    assert [[list(p) for p in r] for r in one] == [
        [[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]]
    ]
    assert _one(
        spark, G.wkt_polygon_rings(F.lit("POINT (1 2)")), dummy=1
    ) is None


def test_is_valid_polygon_holes(spark):
    def valid(coords):
        return _one(
            spark,
            G.is_valid_polygon_holes(F.lit("Polygon"), F.col("coords")),
            coords=coords,
        )

    assert valid(DONUT) is True
    assert valid([DONUT[0]]) is True  # no holes
    # hole straddling the outer boundary: vertices outside + edge cross
    assert valid(
        [DONUT[0], [[5.0, 5.0], [8.0, 5.0], [8.0, 8.0], [5.0, 8.0]]]
    ) is False
    # hole fully OUTSIDE the outer ring (no edge cross, vertices out)
    assert valid(
        [DONUT[0], [[7.0, 7.0], [8.0, 7.0], [8.0, 8.0], [7.0, 8.0]]]
    ) is False
    # overlapping holes
    assert valid(
        [DONUT[0], DONUT[1], [[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0]]]
    ) is False
    # nested holes (hole inside hole) — OGC-invalid
    assert valid(
        [DONUT[0], DONUT[1],
         [[1.5, 1.5], [2.0, 1.5], [2.0, 2.0], [1.5, 2.0]]]
    ) is False
    # degenerate hole (zero area)
    assert valid(
        [DONUT[0], [[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]]
    ) is False
    # self-intersecting (bowtie) hole
    assert valid(
        [DONUT[0], [[1.0, 1.0], [3.0, 3.0], [3.0, 1.0], [1.0, 3.0]]]
    ) is False
    # invalid OUTER still fails with clean holes
    assert valid(
        [[[0.0, 0.0], [6.0, 6.0], [6.0, 0.0], [0.0, 6.0]], DONUT[2]]
    ) is False
    assert _one(
        spark,
        G.is_valid_polygon_holes(F.lit("Point"), F.col("coords")),
        coords=DONUT,
    ) is False


def test_multipolygon_measures_and_validity(spark):
    import pyspark.sql.types as T

    donut = [DONUT[0], DONUT[1]]  # 6x6 outer, 2x2 hole -> area 32
    sq = [[[8.0, 0.0], [10.0, 0.0], [10.0, 2.0], [8.0, 2.0]]]
    island = [[[1.5, 1.5], [2.5, 1.5], [2.5, 2.5], [1.5, 2.5]]]
    overlap = [[[5.0, 1.0], [7.0, 1.0], [7.0, 3.0], [5.0, 3.0]]]
    mp_t = T.ArrayType(
        T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))
    )
    df = spark.createDataFrame(
        [(1, [donut, sq]), (2, [donut, island]), (3, [donut, overlap])],
        T.StructType([
            T.StructField("id", T.IntegerType()),
            T.StructField("mp", mp_t),
        ]),
    )
    rows = {
        r.id: r
        for r in df.select(
            "id",
            G.multipolygon_area(F.col("mp")).alias("area"),
            G.multipolygon_perimeter(F.col("mp")).alias("perim"),
            G.is_valid_multipolygon(F.col("mp")).alias("valid"),
            G.point_in_multipolygon(
                F.col("mp"), F.lit(2.0), F.lit(2.0)
            ).alias("pip_hole"),
        ).collect()
    }
    # disjoint donut + square
    assert (rows[1].area, rows[1].perim) == (36.0, 40.0)
    assert rows[1].valid is True and rows[1].pip_hole is False
    # island INSIDE the donut's hole: valid OGC nesting, pip flips
    assert rows[2].area == 33.0
    assert rows[2].valid is True and rows[2].pip_hole is True
    # overlapping members: invalid
    assert rows[3].valid is False


def test_multipolygon_wkt_roundtrip(spark):
    import pyspark.sql.types as T

    mp = [
        [DONUT[0], DONUT[1]],
        [[[8.0, 0.0], [10.0, 0.0], [10.0, 2.0], [8.0, 2.0]]],
    ]
    mp_t = T.ArrayType(
        T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))
    )
    df = spark.createDataFrame(
        [(mp,)], T.StructType([T.StructField("mp", mp_t)])
    )
    wkt = df.select(
        G.multipolygon_wkt(F.col("mp")).alias("w")
    ).first()["w"]
    assert wkt.startswith("MULTIPOLYGON (((0.0 0.0, 6.0 0.0")
    assert "), (1.0 1.0," in wkt  # the hole ring
    assert ")), ((8.0 0.0" in wkt  # the second member
    rt = df.select(
        G.wkt_multipolygon(G.multipolygon_wkt(F.col("mp"))).alias("c")
    ).first()["c"]
    assert [
        [[list(p) for p in ring] for ring in poly] for poly in rt
    ] == mp
    assert df.select(
        G.wkt_multipolygon(F.lit("POLYGON ((0 0, 1 0, 1 1, 0 1))"))
        .alias("c")
    ).first()["c"] is None


def test_multipolygon_overlap_through_nonconvex_hole(spark):
    """Round-13 review fix: a member whose vertices all sit inside
    another member's NON-CONVEX hole but whose edges span the hole's
    gap overlaps through the hole ring — the pairwise test must check
    edge crossings against every ring pair, not just the outer
    hulls."""
    # member A: 10x10 square with a U-shaped hole (arms at x in
    # [2,3.5] and [6.5,8], base y in [2,3], height to y=8)
    u_hole = [
        [2.0, 2.0], [8.0, 2.0], [8.0, 8.0], [6.5, 8.0],
        [6.5, 3.0], [3.5, 3.0], [3.5, 8.0], [2.0, 8.0],
    ]
    a = [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]], u_hole]
    # member B: thin bar whose endpoints sit INSIDE the two U arms
    # but whose span crosses the solid block between them (y in
    # [4,5], which is A-filled for x in [3.5,6.5])
    b = [[[2.5, 4.0], [7.5, 4.0], [7.5, 5.0], [2.5, 5.0]]]
    import pyspark.sql.types as T

    mp_t = T.ArrayType(
        T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))
    )
    df = spark.createDataFrame(
        [([a, b],)], T.StructType([T.StructField("mp", mp_t)])
    )
    assert df.select(
        G.is_valid_multipolygon(F.col("mp")).alias("v")
    ).first()["v"] is False
    # sanity: the same bar fully inside ONE arm is valid nesting
    b_ok = [[[2.5, 4.0], [3.0, 4.0], [3.0, 5.0], [2.5, 5.0]]]
    df2 = spark.createDataFrame(
        [([a, b_ok],)], T.StructType([T.StructField("mp", mp_t)])
    )
    assert df2.select(
        G.is_valid_multipolygon(F.col("mp")).alias("v")
    ).first()["v"] is True


def test_centroid_degenerate_members_contribute_zero(spark):
    """Round-13 review fix: a zero-area member (or hole) contributes
    zero weight to the weighted centroid instead of NULL-poisoning
    the fold."""
    import pyspark.sql.types as T

    sq = [[[10.0, 10.0], [20.0, 10.0], [20.0, 20.0], [10.0, 20.0]]]
    degenerate = [[[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]]  # collinear
    mp_t = T.ArrayType(
        T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))
    )
    df = spark.createDataFrame(
        [([degenerate, sq],)], T.StructType([T.StructField("mp", mp_t)])
    )
    c = df.select(
        G.multipolygon_centroid(F.col("mp")).alias("c")
    ).first()["c"]
    assert (c.cx, c.cy) == (15.0, 15.0)
    # degenerate HOLE inside a polygon: zero weight, not NULL
    donut_deg = [sq[0], [[11.0, 11.0], [12.0, 11.0], [13.0, 11.0]]]
    df2 = spark.createDataFrame(
        [(donut_deg,)],
        T.StructType([
            T.StructField(
                "c", T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))
            )
        ]),
    )
    c2 = df2.select(
        G.polygon_centroid_holes(F.col("c")).alias("ct")
    ).first()["ct"]
    assert (c2.cx, c2.cy) == (15.0, 15.0)
    # all-degenerate: NULL (total live area 0)
    df3 = spark.createDataFrame(
        [([degenerate],)], T.StructType([T.StructField("mp", mp_t)])
    )
    assert df3.select(
        G.multipolygon_centroid(F.col("mp")).alias("c")
    ).first()["c"] is None


# --- simple-features predicates (round 14) -------------------------------


def _rect(x0, y0, x1, y1):
    return [
        [float(x0), float(y0)], [float(x1), float(y0)],
        [float(x1), float(y1)], [float(x0), float(y1)],
    ]


def _fl(ring):
    return [[float(a), float(b)] for a, b in ring]


# (name, polygon A rings, polygon B rings,
#  expected (touches, overlaps, equals, intersects, A-within-B))
_SF_CASES = [
    ("disjoint", [_rect(0, 0, 2, 2)], [_rect(5, 5, 7, 7)],
     (False, False, False, False, False)),
    ("edge_touch", [_rect(0, 0, 2, 2)], [_rect(2, 0, 4, 2)],
     (True, False, False, True, False)),
    ("corner_touch", [_rect(0, 0, 2, 2)], [_rect(2, 2, 4, 4)],
     (True, False, False, True, False)),
    ("partial_overlap", [_rect(0, 0, 4, 4)], [_rect(2, 2, 6, 6)],
     (False, True, False, True, False)),
    # every vertex of one on the other's boundary; midpoint probes decide
    ("collinear_shift", [_rect(0, 0, 2, 1)], [_rect(1, 0, 3, 1)],
     (False, True, False, True, False)),
    ("equal", [_rect(0, 0, 4, 4)], [_rect(0, 0, 4, 4)],
     (False, False, True, True, True)),
    # topological equality: start vertex / winding irrelevant
    ("equal_rotated", [_rect(0, 0, 4, 4)],
     [_fl([[4, 0], [4, 4], [0, 4], [0, 0]])],
     (False, False, True, True, True)),
    # an extra collinear vertex still equals the minimal ring
    ("equal_extra_vertex", [_rect(0, 0, 4, 4)],
     [_fl([[0, 0], [2, 0], [4, 0], [4, 4], [0, 4]])],
     (False, False, True, True, True)),
    ("within_strict", [_rect(1, 1, 2, 2)], [_rect(0, 0, 4, 4)],
     (False, False, False, True, True)),
    ("within_shared_edge", [_rect(0, 0, 2, 4)], [_rect(0, 0, 4, 4)],
     (False, False, False, True, True)),
    # the round-13 residual: hole-only overlap is DISJOINT
    ("island_in_hole", [_rect(3, 3, 5, 5)],
     [_rect(0, 0, 8, 8), _rect(2, 2, 6, 6)],
     (False, False, False, False, False)),
    ("straddles_hole_edge", [_rect(1, 1, 3, 3)],
     [_rect(0, 0, 8, 8), _rect(2, 2, 6, 6)],
     (False, True, False, True, False)),
    ("donut_within_donut", [_rect(0, 0, 8, 8), _rect(2, 2, 6, 6)],
     [_rect(0, 0, 8, 8), _rect(2, 2, 6, 6)],
     (False, False, True, True, True)),
    # interiors overlap with every vertex probe outside the other
    ("cross_plus_sign", [_rect(4, 0, 6, 10)], [_rect(0, 4, 10, 6)],
     (False, True, False, True, False)),
    # island exactly filling the hole: touches, NOT within
    ("hole_touch_island", [_rect(2, 2, 6, 6)],
     [_rect(0, 0, 8, 8), _rect(2, 2, 6, 6)],
     (True, False, False, True, False)),
    ("donut_in_bigger_donut",
     [_rect(1, 1, 7, 7), _rect(3, 3, 5, 5)],
     [_rect(0, 0, 8, 8), _rect(3, 3, 5, 5)],
     (False, False, False, True, True)),
    # B's hole pokes into A: overlap, no containment either way
    ("b_hole_pokes_a", [_rect(0, 0, 8, 4)],
     [_rect(0, 0, 8, 8), _rect(2, 2, 6, 6)],
     (False, True, False, True, False)),
]


def test_simple_features_polygon_predicates(spark):
    df = spark.createDataFrame(
        [(c[0], c[1], c[2]) for c in _SF_CASES],
        "name string, a array<array<array<double>>>, "
        "b array<array<array<double>>>",
    )
    rows = df.select(
        "name",
        G.polygons_touch(F.col("a"), F.col("b")).alias("t"),
        G.polygons_overlap_sf(F.col("a"), F.col("b")).alias("o"),
        G.polygons_equal_sf(F.col("a"), F.col("b")).alias("e"),
        G.polygons_intersect_sf(F.col("a"), F.col("b")).alias("i"),
        G.polygon_within_polygon(F.col("a"), F.col("b")).alias("w"),
    ).collect()
    exp = {c[0]: c[3] for c in _SF_CASES}
    got = {r["name"]: (r["t"], r["o"], r["e"], r["i"], r["w"]) for r in rows}
    assert got == exp


def test_simple_features_symmetric(spark):
    # touches/overlaps/equals/intersects are symmetric relations
    df = spark.createDataFrame(
        [(c[0], c[1], c[2]) for c in _SF_CASES],
        "name string, a array<array<array<double>>>, "
        "b array<array<array<double>>>",
    )
    rows = df.select(
        "name",
        (G.polygons_touch(F.col("a"), F.col("b"))
         == G.polygons_touch(F.col("b"), F.col("a"))).alias("t"),
        (G.polygons_overlap_sf(F.col("a"), F.col("b"))
         == G.polygons_overlap_sf(F.col("b"), F.col("a"))).alias("o"),
        (G.polygons_equal_sf(F.col("a"), F.col("b"))
         == G.polygons_equal_sf(F.col("b"), F.col("a"))).alias("e"),
        (G.polygons_intersect_sf(F.col("a"), F.col("b"))
         == G.polygons_intersect_sf(F.col("b"), F.col("a"))).alias("i"),
    ).collect()
    for r in rows:
        assert r["t"] and r["o"] and r["e"] and r["i"], r["name"]


def test_line_crosses_polygon(spark):
    cases = [
        ("through", _fl([[-2, 5], [12, 5]]), [_rect(0, 0, 10, 10)], True),
        ("inside_only", _fl([[2, 2], [8, 8]]), [_rect(0, 0, 10, 10)], False),
        ("outside", _fl([[-5, -5], [-1, -1]]), [_rect(0, 0, 10, 10)], False),
        # exits the interior INTO the hole: hole is exterior -> crosses
        ("into_hole", _fl([[4, 5], [12, 5]]),
         [_rect(0, 0, 10, 10), _rect(3, 3, 7, 7)], True),
        ("touch_edge_only", _fl([[-2, 0], [12, 0]]),
         [_rect(0, 0, 10, 10)], False),
    ]
    df = spark.createDataFrame(
        cases,
        "name string, l array<array<double>>, "
        "p array<array<array<double>>>, want boolean",
    )
    rows = df.select(
        "name", "want",
        G.line_crosses_polygon(F.col("l"), F.col("p")).alias("got"),
    ).collect()
    for r in rows:
        assert r["got"] == r["want"], r["name"]


def test_lines_cross(spark):
    cases = [
        ("proper_cross", _fl([[0, 0], [4, 4]]), _fl([[0, 4], [4, 0]]), True),
        ("endpoint_touch", _fl([[0, 0], [2, 2]]), _fl([[2, 2], [4, 0]]),
         False),
        ("collinear_overlap", _fl([[0, 0], [4, 0]]), _fl([[2, 0], [6, 0]]),
         False),
        ("parallel", _fl([[0, 0], [4, 0]]), _fl([[0, 1], [4, 1]]), False),
    ]
    df = spark.createDataFrame(
        cases,
        "name string, a array<array<double>>, b array<array<double>>, "
        "want boolean",
    )
    rows = df.select(
        "name", "want", G.lines_cross(F.col("a"), F.col("b")).alias("got")
    ).collect()
    for r in rows:
        assert r["got"] == r["want"], r["name"]
