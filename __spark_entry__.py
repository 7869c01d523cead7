"""Driver contract for the spark-graft builder (PySpark target).

Every operator family from SURVEY.md §2 (plus the charter's scale
operators: dedup, similarity search, text analysis, multimodal) is
exhibited as a named query over the driver's synthetic tables, with a
DuckDB oracle. Engine code lives in geosparql_etl_spark/; this module
only wires operators to the test tables.

Naming: qXX core relational, jXX joins, aXX aggregations, pXX
projections/filters, wXX windows, gXX geometry, hXX hashing, tXX
text/format, sXX streaming-shaped, dXX dedup, simXX similarity,
txtXX text analysis, mmXX multimodal. Keys map to SURVEY §2 ids in
each docstring.

Float policy: every float aggregate is rounded (2 dp money, 4-6 dp
ratios) in BOTH engines — double sums are order-dependent and the two
engines reduce in different orders. Per-row float arithmetic (cosine,
area) is bit-identical (verified) and rounded only for display.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geosparql_etl_spark.functions.geometry import (
    denormalized_polygon_wkt,
    parse_polygon_string_wkt,
    polygon_area,
    polygon_bounds,
    polygon_perimeter,
)
from geosparql_etl_spark.functions.hashing import md5_long, sha256_id
from geosparql_etl_spark.functions.text import (
    batch_file_name,
    iso_utc,
    patch_metadata,
    replace_urn_hash,
)
from geosparql_etl_spark.functions.textstats import (
    bpe_ish_token_count,
    char_count,
    fingerprint64,
    mean_word_length,
    punct_ratio,
    quality_score,
    word_count,
)
from geosparql_etl_spark.operators.argmax import dominant_entry
from geosparql_etl_spark.operators.batching import with_batch_id
from geosparql_etl_spark.operators.dedup import (
    ngram_jaccard_pairs,
    simhash,
    with_minhash,
    SIMHASH_BITS,
)
from geosparql_etl_spark.operators.ledger import filter_pending
from geosparql_etl_spark.operators.render import ordered_concat
from geosparql_etl_spark.operators.similarity import ann_topk, cosine, cosine_topk


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark 4 rejects by
    default; read nanos as long and truncate to micros (what DuckDB's
    TIMESTAMP does too)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = _t(spark, sf_dir, "events")
    # integer div, NOT float /: nanos ~1.7e18 exceeds double precision
    return e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


# =============================================================================
# flagship
# =============================================================================


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the mongo-etl plan shape on the test tables — multi-key
    equi-join (J1) -> batch window (W1) -> deterministic doc render (A6).
    One doc per (customer, batch of 100 line items)."""
    sf_dir = "/root/testdata/sf0.001"
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")

    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        )
    )
    block = F.format_string(
        "  item %d/%d qty=%.0f price=%.2f",
        F.col("o_orderkey").cast("int"),
        F.col("l_linenumber"),
        F.col("l_quantity"),
        F.col("l_extendedprice"),
    )
    batched = with_batch_id(
        joined.withColumn("block", block).withColumn(
            "seq", F.col("o_orderkey") * 10 + F.col("l_linenumber")
        ),
        ["c_custkey"],
        "seq",
        batch_size=100,
    )
    docs = batched.groupBy("c_custkey", "c_name", "batch_id").agg(
        ordered_concat(F.col("seq"), F.col("block"), "\n").alias("body"),
        F.count("*").alias("n_items"),
    )
    return docs.select(
        "c_custkey",
        "batch_id",
        "n_items",
        F.concat(
            F.lit("# line items for "),
            F.col("c_name"),
            F.lit(" batch "),
            F.col("batch_id").cast("string"),
            F.lit("\n"),
            F.col("body"),
        ).alias("document"),
    )


# =============================================================================
# core relational (SURVEY §2.2-2.6)
# =============================================================================


def q01_pricing_summary(spark, sf_dir):
    """A2/A3 aggregation suite (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _sql_q01():
    return """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """


def j01_multikey_equijoin(spark, sf_dir):
    """J1: the marks x analysis analog — lineitem x orders x customer."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


def _sql_j01():
    return """
    SELECT c_mktsegment, o_orderpriority, count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderpriority
    """


def j02_broadcast_lookup(spark, sf_dir):
    """J2: broadcast dimension join (SNOMED-lookup analog)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


def _sql_j02():
    return """
    SELECT r_name, count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """


def j03_enrich_missing_flag(spark, sf_dir):
    """J3/J4: broadcast lookup with negative-cache flag (slide-hash
    enrichment analog): customers in nations with no supplier get the
    missing flag."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    lookup = s.select(F.col("s_nationkey").alias("c_nationkey")).dropDuplicates()
    enriched = c.join(F.broadcast(lookup.withColumn("has_supplier", F.lit(1))), "c_nationkey", "left")
    return (
        enriched.withColumn("hash_missing", F.col("has_supplier").isNull())
        .groupBy("c_nationkey", "hash_missing")
        .agg(F.count("*").alias("n_customers"))
    )


def _sql_j03():
    return """
    SELECT c_nationkey,
           (s.s_nationkey IS NULL) AS hash_missing,
           count(*) AS n_customers
    FROM customer c LEFT JOIN (SELECT DISTINCT s_nationkey FROM supplier) s
      ON c.c_nationkey = s.s_nationkey
    GROUP BY c_nationkey, s.s_nationkey IS NULL
    """


def j06_anti_join(spark, sf_dir):
    """J6/P9: anti-join — customers with no orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def _sql_j06():
    return """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """


def j07_semi_join(spark, sf_dir):
    """J7: semi-join — customers with at least one order over 100k."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 100000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def _sql_j07():
    return """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """


def p09_ledger_resume(spark, sf_dir):
    """P9: checkpoint-ledger anti-join — work items not yet completed
    (ledger = every 7th order, standing in for the completed set)."""
    o = _t(spark, sf_dir, "orders")
    ledger = o.where(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.lit("completed").alias("status"),
        F.lit(None).cast("string").alias("error"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    return filter_pending(o, ledger, "o_orderkey").select(
        "o_orderkey", "o_orderstatus"
    )


def _sql_p09():
    return """
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0)
    """


def a01_argmax_window(spark, sf_dir):
    """A1 (window form): dominant line item per order by extendedprice,
    deterministic tie-break on linenumber."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_partkey").alias("dominant_partkey"),
            F.col("l_linenumber").alias("dominant_linenumber"),
            F.round("l_extendedprice", 2).alias("dominant_price"),
        )
    )


def _sql_a01():
    return """
    SELECT l_orderkey, l_partkey AS dominant_partkey,
           l_linenumber AS dominant_linenumber,
           round(l_extendedprice, 2) AS dominant_price
    FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
                 ORDER BY l_extendedprice DESC, l_linenumber) rn FROM lineitem)
    WHERE rn = 1
    """


def a02_map_argmax(spark, sf_dir):
    """A1 (map-fold form): the reference's first-max-wins argmax over a
    prob_* map (json-etl:45-60), built from lineitem columns."""
    li = _t(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("prob_qty"), F.col("l_quantity") / 100.0,
        F.lit("prob_disc"), F.col("l_discount"),
        F.lit("prob_tax"), F.col("l_tax"),
        F.lit("nr_cells"), F.col("l_quantity"),
    )
    dom = dominant_entry(m)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dom["class"].alias("dominant_class"),
        F.round(dom["prob"], 6).alias("dominant_prob"),
    )


def _sql_a02():
    # first-max-wins with strict '>' over entry order (qty, disc, tax):
    # a later entry wins only when strictly greater than the running max.
    return """
    SELECT l_orderkey, l_linenumber,
      CASE WHEN l_tax > l_discount AND l_tax > l_quantity/100.0 AND l_tax > 0 THEN 'tax'
           WHEN l_discount > l_quantity/100.0 AND l_discount > 0 THEN 'disc'
           WHEN l_quantity/100.0 > 0 THEN 'qty'
           ELSE NULL END AS dominant_class,
      round(CASE WHEN l_tax > l_discount AND l_tax > l_quantity/100.0 AND l_tax > 0 THEN l_tax
           WHEN l_discount > l_quantity/100.0 AND l_discount > 0 THEN l_discount
           WHEN l_quantity/100.0 > 0 THEN l_quantity/100.0
           ELSE 0.0 END, 6) AS dominant_prob
    FROM lineitem
    """


def p04_map_prefix_filter(spark, sf_dir):
    """P4: map key-prefix filter + prefix strip + explode
    (measurements-map analog)."""
    li = _t(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("prob_qty"), F.col("l_quantity") / 100.0,
        F.lit("prob_disc"), F.col("l_discount"),
        F.lit("nr_cells"), F.col("l_quantity"),
    )
    filtered = F.transform_keys(
        F.map_filter(m, lambda k, v: k.startswith("prob_")),
        lambda k, v: F.replace(k, F.lit("prob_"), F.lit("")),
    )
    return li.select(
        "l_orderkey", "l_linenumber", F.explode(filtered).alias("cls", "val")
    ).select("l_orderkey", "l_linenumber", "cls", F.round("val", 6).alias("val"))


def _sql_p04():
    return """
    SELECT l_orderkey, l_linenumber, 'qty' AS cls, round(l_quantity/100.0, 6) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'disc' AS cls, round(l_discount, 6) AS val FROM lineitem
    """


def w01_batch_window(spark, sf_dir):
    """W1: fixed-size batch windowing (1000 rows/batch, the reference's
    mark batching) + per-batch stats."""
    li = _t(spark, sf_dir, "lineitem")
    # (orderkey, linenumber) is NOT unique in the synthetic data; the
    # 4-column key is — batching needs a total order per group.
    batched = with_batch_id(
        li,
        ["l_returnflag"],
        ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
        batch_size=1000,
    )
    return batched.groupBy("l_returnflag", "batch_id").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("batch_qty"),
    )


def _sql_w01():
    return """
    SELECT l_returnflag, CAST(floor((rn - 1) / 1000) AS INT) AS batch_id,
           count(*) AS n_rows, round(sum(l_quantity), 2) AS batch_qty
    FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) rn FROM lineitem)
    GROUP BY 1, 2
    """


def w03_sort_offset(spark, sf_dir):
    """W2/W3: deterministic total-order sort + offset/limit slice."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


def _sql_w03():
    return """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10
    """


def a04_distinct_agg(spark, sf_dir):
    """A4: distinct counting per group."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


def _sql_a04():
    return """
    SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
           count(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """


def a06_group_concat(spark, sf_dir):
    """A6: deterministic ordered group-concat (TTL doc assembly shape)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        ordered_concat(
            F.col("o_orderkey"), F.col("o_orderkey").cast("string"), ","
        ).alias("order_keys"),
        F.count("*").alias("n_orders"),
    )


def _sql_a06():
    return """
    SELECT o_custkey,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """


def a07_union_distinct(spark, sf_dir):
    """A7: union + dedup (RDF graph merge semantics)."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .dropDuplicates()
    )


def _sql_a07():
    return """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """


# =============================================================================
# geometry (SURVEY §2.7 G*)
# =============================================================================


def g02_parse_polygon(spark, sf_dir):
    """G2: '[x:y:...]' parse + ring auto-close, coordinate text verbatim."""
    p = _t(spark, sf_dir, "part")
    poly = F.concat(
        F.lit("["),
        F.col("p_partkey").cast("string"), F.lit(":"),
        F.col("p_size").cast("string"), F.lit(":"),
        (F.col("p_partkey") + 3).cast("string"), F.lit(":"),
        (F.col("p_size") * 2).cast("string"),
        F.lit("]"),
    )
    return p.select(
        "p_partkey", parse_polygon_string_wkt(poly).alias("wkt")
    )


def _sql_g02():
    return """
    SELECT p_partkey,
      'POLYGON ((' || p_partkey || ' ' || p_size || ', ' || (p_partkey + 3)
        || ' ' || (p_size * 2) || ', ' || p_partkey || ' ' || p_size || '))' AS wkt
    FROM part
    """


def g03_denormalized_wkt(spark, sf_dir):
    """G3: normalized->pixel WKT with %.2f formatting and ring close."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_discount") != F.col("l_tax"))
    coords = F.array(
        F.array(
            F.array(F.col("l_discount"), F.col("l_tax")),
            F.array(F.col("l_tax"), F.col("l_discount")),
            F.array(F.col("l_discount"), F.col("l_discount")),
        )
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        denormalized_polygon_wkt(
            F.lit("Polygon"), coords, F.lit(1000.0), F.lit(2000.0)
        ).alias("wkt"),
    )


def _sql_g03():
    return """
    SELECT l_orderkey, l_linenumber,
      'POLYGON ((' || printf('%.2f %.2f', l_discount*1000, l_tax*2000)
        || ', ' || printf('%.2f %.2f', l_tax*1000, l_discount*2000)
        || ', ' || printf('%.2f %.2f', l_discount*1000, l_discount*2000)
        || ', ' || printf('%.2f %.2f', l_discount*1000, l_tax*2000) || '))' AS wkt
    FROM lineitem WHERE l_discount != l_tax
    """


def g06_geometry_measures(spark, sf_dir):
    """G6/G7/G8: shoelace area, perimeter, bounds of a per-part triangle
    (0,0)-(size,0)-(0,price) — all native expressions."""
    p = _t(spark, sf_dir, "part")
    s = F.col("p_size").cast("double")
    r = F.col("p_retailprice")
    coords = F.array(
        F.array(
            F.array(F.lit(0.0), F.lit(0.0)),
            F.array(s, F.lit(0.0)),
            F.array(F.lit(0.0), r),
        )
    )
    bounds = polygon_bounds(coords)
    return p.select(
        "p_partkey",
        F.round(polygon_area(coords), 4).alias("area"),
        F.round(polygon_perimeter(coords), 4).alias("perimeter"),
        F.round(bounds["maxx"], 4).alias("maxx"),
        F.round(bounds["maxy"], 4).alias("maxy"),
    )


def _sql_g06():
    return """
    SELECT p_partkey,
      round(p_size * p_retailprice / 2, 4) AS area,
      round(p_size + p_retailprice + sqrt(p_size*p_size + p_retailprice*p_retailprice), 4) AS perimeter,
      round(CAST(p_size AS DOUBLE), 4) AS maxx,
      round(p_retailprice, 4) AS maxy
    FROM part
    """


# =============================================================================
# hashing / text / formatting (SURVEY §2.7 H*/T*)
# =============================================================================


def h01_sha256(spark, sf_dir):
    """H1: sha256 hex parity with hashlib/DuckDB."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        sha256_id(F.col("c_name")).alias("name_hash"),
        F.concat(F.lit("urn:sha256:"), sha256_id(F.col("c_name"))).alias("urn"),
    )


def _sql_h01():
    return """
    SELECT c_custkey, sha256(c_name) AS name_hash,
           'urn:sha256:' || sha256(c_name) AS urn
    FROM customer
    """


def t02_patch_metadata(spark, sf_dir):
    """T2: filename -> patch metadata with fallback defaults."""
    li = _t(spark, sf_dir, "lineitem")
    fname = F.when(
        F.col("l_linenumber") > 4, F.lit("bad-name.csv")
    ).otherwise(
        F.format_string(
            "%d_%d_500_600_0.25_1-features.csv",
            F.col("l_orderkey").cast("int"),
            F.col("l_linenumber"),
        )
    )
    meta = patch_metadata(fname)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        meta["x"].alias("px"),
        meta["y"].alias("py"),
        meta["width"].alias("pw"),
        meta["height"].alias("ph"),
    )


def _sql_t02():
    return """
    SELECT l_orderkey, l_linenumber,
      CASE WHEN l_linenumber > 4 THEN 0 ELSE CAST(l_orderkey AS INT) END AS px,
      CASE WHEN l_linenumber > 4 THEN 0 ELSE l_linenumber END AS py,
      CASE WHEN l_linenumber > 4 THEN 40000 ELSE 500 END AS pw,
      CASE WHEN l_linenumber > 4 THEN 40000 ELSE 600 END AS ph
    FROM lineitem
    """


def t05_urn_rewrite(spark, sf_dir):
    """T5: sha256/md5 URN regex rewrite (incl. md5 migration)."""
    c = _t(spark, sf_dir, "customer")
    text = F.concat(
        F.lit("<urn:md5:"), F.md5(F.col("c_name")), F.lit("> a so:ImageObject ;")
    )
    return c.select(
        "c_custkey",
        replace_urn_hash(text, sha256_id(F.col("c_name"))).alias("rewritten"),
    )


def _sql_t05():
    return """
    SELECT c_custkey,
      regexp_replace('<urn:md5:' || md5(c_name) || '> a so:ImageObject ;',
                     '<urn:(?:sha256|md5):[0-9a-fA-F]+>',
                     '<urn:sha256:' || sha256(c_name) || '>', 'g') AS rewritten
    FROM customer
    """


def t07_format_string(spark, sf_dir):
    """T7: fixed-width numeric formats (batch file names, %.6f)."""
    o = _t(spark, sf_dir, "orders")
    # %.6f input chosen exactly representable (x/64 has <= 6 decimals):
    # Java's formatter rounds decimal-half-up, C/Python round half-even
    # on the binary value, so tie inputs would legitimately differ.
    return o.select(
        "o_orderkey",
        batch_file_name(F.col("o_orderkey") % 250).alias("batch_file"),
        F.format_string("%.6f", (F.col("o_orderkey") % 640) / 64.0).alias("prob_fmt"),
    )


def _sql_t07():
    return """
    SELECT o_orderkey,
           printf('batch_%06d.ttl.gz', o_orderkey % 250) AS batch_file,
           printf('%.6f', (o_orderkey % 640) / 64.0) AS prob_fmt
    FROM orders
    """


def t08_iso_timestamp(spark, sf_dir):
    """T8: ISO-8601 UTC rendering with Z suffix."""
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderkey", iso_utc(F.col("o_orderdate")).alias("iso_ts"))


def _sql_t08():
    return """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts
    FROM orders
    """


# =============================================================================
# streaming-shaped (SURVEY §2.9) — batch semantics over events
# =============================================================================


def s01_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour window aggregation over the events stream table."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total"
        )
    )


def _sql_s01():
    return """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY 1, 2
    """


def s02_sliding_window(spark, sf_dir):
    """Sliding 2-hour window, 1-hour slide."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def _sql_s02():
    return """
    SELECT window_start, count(*) AS n FROM (
      SELECT date_trunc('hour', ts) AS window_start FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events
    ) GROUP BY 1
    """


def s03_sessionization(spark, sf_dir):
    """Session windows: per-user sessions with 30-minute inactivity gap
    (lag + cumulative gap-count — the batch form of session_window)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 1800,
        1,
    ).otherwise(0)
    sess = F.sum("gap_flag").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    return (
        e.withColumn("gap_flag", gap)
        .withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
        )
    )


def _sql_s03():
    return """
    SELECT user_id, session_id, min(ts) AS session_start, count(*) AS n_events
    FROM (
      SELECT user_id, ts, sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
          CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
               THEN 1 ELSE 0 END AS gap_flag
        FROM events)
    ) GROUP BY user_id, session_id
    """


# =============================================================================
# dedup family (charter scale operators)
# =============================================================================

_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_WORDS = f"regexp_split_to_array({_NORM}, ' ')"
# portable 60-bit hash: ('0x' || first 15 md5 hex chars)::BIGINT
def _hex60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def d01_dedup_exact(spark, sf_dir):
    """Exact dedup: min doc_id per normalized-text digest + copy count."""
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        d.withColumn("digest", F.md5(norm))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def _sql_d01():
    return f"""
    SELECT md5({_NORM}) AS digest, min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """


def d02_fingerprint(spark, sf_dir):
    """64-bit-ish md5-derived document fingerprint (portable hash)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint64(F.col("text")).alias("fp"))


def _sql_d02():
    return f"SELECT doc_id, {_hex60(_NORM)} AS fp FROM documents"


def d03_minhash_signature(spark, sf_dir):
    """MinHash signatures (4 seeded md5 hashes over word 3-shingles)."""
    d = _t(spark, sf_dir, "documents")
    sigs = with_minhash(d, "text", "doc_id", num_hashes=4, k=3, out_col="sig")
    return sigs.select(
        "doc_id",
        *[F.element_at(F.col("sig"), i + 1).alias(f"mh{i}") for i in range(4)],
    )


def _sql_d03():
    shingles = (
        "CASE WHEN len(w) >= 3 THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] "
        "for i in range(1, len(w) - 1)]) ELSE [array_to_string(w, ' ')] END"
    )
    seeded = [_hex60(f"'{i}:' || s") for i in range(4)]
    cols = ", ".join(
        f"list_aggregate(list_transform(sh, s -> {seeded[i]}), 'min') AS mh{i}"
        for i in range(4)
    )
    return f"""
    SELECT doc_id, {cols} FROM (
      SELECT doc_id, {shingles} AS sh FROM (SELECT doc_id, {_WORDS} AS w FROM documents))
    """


def d04_ngram_jaccard(spark, sf_dir):
    """Exact word-3-shingle Jaccard near-dup pairs (inverted-index join),
    threshold 0.2."""
    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", k=3, min_jaccard=0.2)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def _sql_d04():
    return f"""
    WITH sh AS (
      SELECT doc_id,
        CASE WHEN len(w) >= 3 THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             for i in range(1, len(w) - 1)]) ELSE [array_to_string(w, ' ')] END AS s
      FROM (SELECT doc_id, {_WORDS} AS w FROM documents))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s))::DOUBLE /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.2
    """


def d05_simhash(spark, sf_dir):
    """32-bit SimHash over whitespace tokens (md5-derived bit votes)."""
    d = _t(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text").select("doc_id", "simhash")


def _sql_d05():
    h = _hex60("tok")
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    pack = " + ".join(
        f"CASE WHEN b{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END"
        for b in range(SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array({_NORM}, ' ')) AS tok FROM documents),
    hashed AS (SELECT doc_id, {h} AS h FROM toks),
    votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
    SELECT doc_id, {pack} AS simhash FROM votes
    """


def d06_minhash_dedup_e2e(spark, sf_dir):
    """End-to-end MinHash LSH dedup (banding + candidate join + exact
    Jaccard verify). Approximate by construction -> rows-only check."""
    from geosparql_etl_spark.operators.dedup import minhash_dedup

    d = _t(spark, sf_dir, "documents")
    return minhash_dedup(d, "doc_id", "text", threshold=0.8).select(
        "doc_id", "lang", "source"
    )


# =============================================================================
# similarity search (charter scale operators)
# =============================================================================


def sim01_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-5 for query vectors vec_id < 5."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return cosine_topk(e, q, k=5, dim=64).select(
        "query_id",
        "neighbor_id",
        "rank",
        F.round("cosine_sim", 6).alias("cosine_sim"),
    )


def _sql_sim01():
    return """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
               FROM embeddings)
    SELECT query_id, neighbor_id, rank, round(sim, 6) AS cosine_sim FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, c.v) AS sim,
             row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) AS rank
      FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id != q.vec_id)
    WHERE rank <= 5
    """


def sim02_threshold_pairs(spark, sf_dir):
    """All embedding pairs with cosine >= 0.4 (order-insensitive set)."""
    from geosparql_etl_spark.operators.similarity import pairwise_cosine

    e = _t(spark, sf_dir, "embeddings")
    pairs = pairwise_cosine(e, e, left_alias="id_a", right_alias="id_b", dim=64)
    return (
        pairs.where(F.col("id_a") < F.col("id_b"))
        .where(F.col("cosine_sim") >= 0.4)
        .select("id_a", "id_b", F.round("cosine_sim", 6).alias("sim"))
    )


def _sql_sim02():
    return """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
               FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    """


def sim03_ann_lsh(spark, sf_dir):
    """Sign-LSH bucketed ANN top-5 (approximate -> rows-only check);
    the 100 TB path: candidates share an LSH band bucket."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return ann_topk(e, q, k=5, dim=64).select(
        "query_id", "neighbor_id", "rank", F.round("cosine_sim", 6).alias("cosine_sim")
    )


# =============================================================================
# text analysis (charter scale operators)
# =============================================================================


def txt01_stats(spark, sf_dir):
    """Token/char counts + punctuation ratio + mean word length."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        word_count(F.col("text")).alias("n_words"),
        char_count(F.col("text")).alias("n_chars2"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(mean_word_length(F.col("text")), 6).alias("mean_wlen"),
    )


def _sql_txt01():
    return """
    SELECT doc_id,
      CASE WHEN trim(text) = '' OR text IS NULL THEN 0
           ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
      coalesce(len(text), 0) AS n_chars2,
      round(CASE WHEN len(regexp_replace(text, '\\s+', '', 'g')) > 0
        THEN len(regexp_replace(regexp_replace(text, '\\s+', '', 'g'), '[\\w]', '', 'g'))::DOUBLE
             / len(regexp_replace(text, '\\s+', '', 'g'))
        ELSE 0.0 END, 6) AS punct_ratio,
      round(CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
        THEN list_aggregate(list_transform(regexp_split_to_array(trim(text), '\\s+'),
             w -> len(w)), 'sum')::DOUBLE / len(regexp_split_to_array(trim(text), '\\s+'))
        ELSE 0.0 END, 6) AS mean_wlen
    FROM documents
    """


def txt02_lang_id(spark, sf_dir):
    """Heuristic language ID vs the labeled lang column."""
    from geosparql_etl_spark.functions.textstats import lang_id

    d = _t(spark, sf_dir, "documents")
    pred = lang_id(F.col("text"))
    return d.select(
        "doc_id", pred.alias("lang_pred"), (pred == F.col("lang")).alias("is_match")
    )


def _sql_txt02():
    # mirrors greatest(struct(hits, lang)) tie semantics: highest hit
    # count, ties -> lexicographically greatest language code.
    toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    counts = {
        "en": ("the", "and", "of", "is", "to"),
        "de": ("der", "die", "und", "ist", "das"),
        "fr": ("le", "la", "et", "est", "les"),
        "es": ("el", "la", "y", "es", "los"),
    }
    hit_cols = ", ".join(
        f"len(list_filter({toks}, t -> t IN {tuple(ws)!r})) AS h_{code}".replace(
            '"', "'"
        )
        for code, ws in counts.items()
    )
    return f"""
    WITH h AS (SELECT doc_id, lang, {hit_cols} FROM documents)
    SELECT doc_id,
      CASE WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de AND h_fr > 0 THEN 'fr'
           WHEN h_es >= h_en AND h_es >= h_de AND h_es > 0 THEN 'es'
           WHEN h_en >= h_de AND h_en > 0 THEN 'en'
           WHEN h_de > 0 THEN 'de'
           ELSE 'und' END AS lang_pred,
      (CASE WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de AND h_fr > 0 THEN 'fr'
           WHEN h_es >= h_en AND h_es >= h_de AND h_es > 0 THEN 'es'
           WHEN h_en >= h_de AND h_en > 0 THEN 'en'
           WHEN h_de > 0 THEN 'de'
           ELSE 'und' END = lang) AS is_match
    FROM h
    """


def txt03_quality(spark, sf_dir):
    """Composite quality score."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.round(quality_score(F.col("text")), 6).alias("quality")
    )


def _sql_txt03():
    nospace = "regexp_replace(text, '\\s+', '', 'g')"
    punct = f"CASE WHEN len({nospace}) > 0 THEN len(regexp_replace({nospace}, '[\\w]', '', 'g'))::DOUBLE / len({nospace}) ELSE 0.0 END"
    words = "regexp_split_to_array(trim(text), '\\s+')"
    mwl = f"CASE WHEN len({words}) > 0 THEN list_aggregate(list_transform({words}, w -> len(w)), 'sum')::DOUBLE / len({words}) ELSE 0.0 END"
    return f"""
    SELECT doc_id, round((
      (CASE WHEN coalesce(len(text),0) BETWEEN 100 AND 20000 THEN 1.0
            WHEN coalesce(len(text),0) > 0 THEN 0.5 ELSE 0.0 END)
      + (CASE WHEN {punct} <= 0.2 THEN 1.0 ELSE 0.0 END)
      + (CASE WHEN {mwl} BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
    ) / 3.0, 6) AS quality
    FROM documents
    """


def txt04_token_count(spark, sf_dir):
    """BPE-ish subword token count (pretokenizer regex)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", bpe_ish_token_count(F.col("text")).alias("n_tokens")
    )


def _sql_txt04():
    return r"""
    SELECT doc_id,
      len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)|\w+|[^\w\s]+')) AS n_tokens
    FROM documents
    """


# =============================================================================
# multimodal plumbing (stubbed decode; rows-only)
# =============================================================================


def mm01_media_features(spark, sf_dir):
    """Binary media column -> mapInPandas feature extraction (decode is a
    deterministic stub; Spark-side schema/batching is real)."""
    from geosparql_etl_spark.operators.multimodal import extract_features

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("image/fake").alias("mime"),
        ).alias("meta"),
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        F.size("features").alias("feature_dim"),
        F.round(F.aggregate("features", F.lit(0.0), lambda a, v: a + v), 6).alias(
            "feature_sum"
        ),
    )


# =============================================================================
# registry
# =============================================================================

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_pricing_summary": q01_pricing_summary,
    "j01_multikey_equijoin": j01_multikey_equijoin,
    "j02_broadcast_lookup": j02_broadcast_lookup,
    "j03_enrich_missing_flag": j03_enrich_missing_flag,
    "j06_anti_join": j06_anti_join,
    "j07_semi_join": j07_semi_join,
    "p09_ledger_resume": p09_ledger_resume,
    "a01_argmax_window": a01_argmax_window,
    "a02_map_argmax": a02_map_argmax,
    "p04_map_prefix_filter": p04_map_prefix_filter,
    "w01_batch_window": w01_batch_window,
    "w03_sort_offset": w03_sort_offset,
    "a04_distinct_agg": a04_distinct_agg,
    "a06_group_concat": a06_group_concat,
    "a07_union_distinct": a07_union_distinct,
    "g02_parse_polygon": g02_parse_polygon,
    "g03_denormalized_wkt": g03_denormalized_wkt,
    "g06_geometry_measures": g06_geometry_measures,
    "h01_sha256": h01_sha256,
    "t02_patch_metadata": t02_patch_metadata,
    "t05_urn_rewrite": t05_urn_rewrite,
    "t07_format_string": t07_format_string,
    "t08_iso_timestamp": t08_iso_timestamp,
    "s01_tumbling_window": s01_tumbling_window,
    "s02_sliding_window": s02_sliding_window,
    "s03_sessionization": s03_sessionization,
    "d01_dedup_exact": d01_dedup_exact,
    "d02_fingerprint": d02_fingerprint,
    "d03_minhash_signature": d03_minhash_signature,
    "d04_ngram_jaccard": d04_ngram_jaccard,
    "d05_simhash": d05_simhash,
    "d06_minhash_dedup_e2e": d06_minhash_dedup_e2e,
    "sim01_cosine_topk": sim01_cosine_topk,
    "sim02_threshold_pairs": sim02_threshold_pairs,
    "sim03_ann_lsh": sim03_ann_lsh,
    "txt01_stats": txt01_stats,
    "txt02_lang_id": txt02_lang_id,
    "txt03_quality": txt03_quality,
    "txt04_token_count": txt04_token_count,
    "mm01_media_features": mm01_media_features,
}

_ORACLES: dict[str, str] = {
    "q01_pricing_summary": _sql_q01(),
    "j01_multikey_equijoin": _sql_j01(),
    "j02_broadcast_lookup": _sql_j02(),
    "j03_enrich_missing_flag": _sql_j03(),
    "j06_anti_join": _sql_j06(),
    "j07_semi_join": _sql_j07(),
    "p09_ledger_resume": _sql_p09(),
    "a01_argmax_window": _sql_a01(),
    "a02_map_argmax": _sql_a02(),
    "p04_map_prefix_filter": _sql_p04(),
    "w01_batch_window": _sql_w01(),
    "w03_sort_offset": _sql_w03(),
    "a04_distinct_agg": _sql_a04(),
    "a06_group_concat": _sql_a06(),
    "a07_union_distinct": _sql_a07(),
    "g02_parse_polygon": _sql_g02(),
    "g03_denormalized_wkt": _sql_g03(),
    "g06_geometry_measures": _sql_g06(),
    "h01_sha256": _sql_h01(),
    "t02_patch_metadata": _sql_t02(),
    "t05_urn_rewrite": _sql_t05(),
    "t07_format_string": _sql_t07(),
    "t08_iso_timestamp": _sql_t08(),
    "s01_tumbling_window": _sql_s01(),
    "s02_sliding_window": _sql_s02(),
    "s03_sessionization": _sql_s03(),
    "d01_dedup_exact": _sql_d01(),
    "d02_fingerprint": _sql_d02(),
    "d03_minhash_signature": _sql_d03(),
    "d04_ngram_jaccard": _sql_d04(),
    "d05_simhash": _sql_d05(),
    # d06: LSH banding is engine-defined -> rows-only
    "sim01_cosine_topk": _sql_sim01(),
    "sim02_threshold_pairs": _sql_sim02(),
    # sim03: ANN recall is approximate -> rows-only
    "txt01_stats": _sql_txt01(),
    "txt02_lang_id": _sql_txt02(),
    "txt03_quality": _sql_txt03(),
    "txt04_token_count": _sql_txt04(),
    # mm01: stubbed decode -> rows-only
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
