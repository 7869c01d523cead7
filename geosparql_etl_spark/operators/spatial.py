"""Distributed spatial join + locality partitioning (engine extension;
the reference converts geometries but never joins them spatially —
this is the operator a GeoSPARQL workload needs once data outgrows one
node, built without Sedona from native expressions only).

Design (the standard scale-out spatial join):

  1. each bbox explodes to the grid cells it covers (``sequence`` over
     cell ranges — native, no UDF);
  2. candidates = equi-join on the cell key, so the shuffle is
     cell-partitioned and the cross product never materializes;
  3. exact bbox-intersection predicate re-checks every candidate;
  4. pairs found in multiple shared cells are deduped on the pair key.

Cell size is the skew/fan-out dial: smaller cells = more explode rows
but tighter candidate sets; a hot cell (dense urban area) behaves like
a hot LSH bucket and can be capped the same way if needed. At 100 TB
the cell key also becomes the table's physical partitioning
(repartitionByRange on zorder_key of the cell), so the join reads
co-located partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def covered_cells(
    minx: Column, miny: Column, maxx: Column, maxy: Column, cell: float
) -> Column:
    """array<struct<cx,cy>> of grid cells a bbox covers (inclusive)."""
    cx = F.sequence(
        F.floor(minx / cell).cast("long"), F.floor(maxx / cell).cast("long")
    )
    cy = F.sequence(
        F.floor(miny / cell).cast("long"), F.floor(maxy / cell).cast("long")
    )
    return F.flatten(
        F.transform(
            cx,
            lambda i: F.transform(
                cy, lambda j: F.struct(i.alias("cx"), j.alias("cy"))
            ),
        )
    )


def bbox_spatial_join(
    boxes: DataFrame,
    id_col: str = "box_id",
    cell: float = 50.0,
    max_cell: int | None = None,
) -> DataFrame:
    """(id_a, id_b) pairs of intersecting bboxes (id_a < id_b).

    ``boxes`` needs columns: id_col, minx, miny, maxx, maxy. Exact
    semantics (grid bucketing only prunes; the intersection predicate
    decides), closed-boundary intersection (touching edges count).

    ``max_cell`` is the hot-cell skew cap — the same bounded-work dial
    as lsh_candidate_pairs' max_bucket: a cell holding f boxes
    self-joins to f^2/2 candidates, so one dense downtown cell in a
    planetary dataset explodes the join. Cells wider than the cap are
    dropped (pairs whose ONLY shared cell is hot are missed — bounded
    work, measurable recall loss). None (default) = exact everywhere.
    """
    with_cells = boxes.select(
        F.col(id_col).alias("__id"),
        "minx",
        "miny",
        "maxx",
        "maxy",
        F.explode(
            covered_cells(
                F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), cell
            )
        ).alias("__cell"),
    )
    if max_cell is not None:
        # broadcast the HOT set (tiny by construction), not the kept
        # set — same shape as ngram_jaccard_pairs' df-cap
        hot = (
            with_cells.groupBy("__cell")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_cell)
            .select("__cell", F.lit(1).alias("__hot"))
        )
        with_cells = (
            with_cells.join(F.broadcast(hot), "__cell", "left")
            .where(F.col("__hot").isNull())
            .drop("__hot")
        )
    a = with_cells.select(
        F.col("__cell"),
        F.col("__id").alias("id_a"),
        F.col("minx").alias("ax0"),
        F.col("miny").alias("ay0"),
        F.col("maxx").alias("ax1"),
        F.col("maxy").alias("ay1"),
    )
    b = with_cells.select(
        F.col("__cell"),
        F.col("__id").alias("id_b"),
        F.col("minx").alias("bx0"),
        F.col("miny").alias("by0"),
        F.col("maxx").alias("bx1"),
        F.col("maxy").alias("by1"),
    )
    return (
        a.join(b, "__cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            (F.col("ax0") <= F.col("bx1"))
            & (F.col("bx0") <= F.col("ax1"))
            & (F.col("ay0") <= F.col("by1"))
            & (F.col("by0") <= F.col("ay1"))
        )
        .select("id_a", "id_b")
        .dropDuplicates()
    )
