"""mongo-etl pipeline throughput check: synthesized analyses + marks ->
rendered, batched, gzip-written TTL docs.

Usage: python tools/bench_pipeline.py [n_analyses] [marks_per_analysis]

Prints one JSON line {"marks": N, "docs": D, "seconds": S,
"marks_per_sec": R}. The reference's design target is ~4B marks
(mongodb_to_rdf.py:4) on 20 cores; this measures the same plan shape
(J1 join -> render -> W1 batch -> A6 assemble -> K2 gzip) end to end,
including the sink.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from geosparql_etl_spark.pipelines import mongo_etl
from geosparql_etl_spark.session import get_spark


def synth(spark, n_an: int, marks_per: int):
    an = spark.range(n_an).select(
        F.format_string("an-%04d", F.col("id")).alias("_id"),
        F.struct(
            F.format_string("exec-%d", F.col("id")).alias("execution_id"),
            F.struct(
                F.lit("2000").alias("image_width"),
                F.lit("1000").alias("image_height"),
                F.format_string("case-%d", F.col("id")).alias("case_id"),
            ).alias("algorithm_params"),
        ).alias("analysis"),
        F.struct(
            F.format_string("img-%d", F.col("id")).alias("imageid"),
            F.lit("subj").alias("subject"),
            F.lit("study").alias("study"),
            F.format_string("%d", F.col("id") % 7).alias("slide"),
        ).alias("image"),
    )
    mk = spark.range(n_an * marks_per).select(
        F.format_string("mark-%08d", F.col("id")).alias("_id"),
        F.struct(
            F.struct(
                F.format_string("exec-%d", F.col("id") % n_an).alias("execution_id")
            ).alias("analysis"),
            F.struct(
                F.format_string("img-%d", F.col("id") % n_an).alias("imageid"),
                F.format_string("%d", (F.col("id") % n_an) % 7).alias("slide"),
            ).alias("image"),
        ).alias("provenance"),
        F.struct(
            F.array(
                F.struct(
                    F.struct(
                        F.lit("Polygon").alias("type"),
                        F.array(
                            F.array(
                                F.array(F.rand(1) * 0.9, F.rand(2) * 0.9),
                                F.array(F.rand(3) * 0.9, F.rand(4) * 0.9),
                                F.array(F.rand(5) * 0.9, F.rand(6) * 0.9),
                            )
                        ).alias("coordinates"),
                    ).alias("geometry"),
                    F.struct(
                        F.lit(42).alias("footprint"),
                        F.lit("a.b.c").alias("nucleustype"),
                    ).alias("properties"),
                )
            ).alias("features")
        ).alias("geometries"),
        F.struct(
            F.struct(
                F.array(
                    F.struct(
                        F.concat(
                            F.lit("http://snomed.info/id/"),
                            (F.col("id") % 100).cast("string"),
                        ).alias("annotationID")
                    )
                ).alias("annotation")
            ).alias("mark")
        ).alias("userUpdate"),
    )
    return an, mk


def main() -> None:
    n_an = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    marks_per = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    spark = get_spark("metl-bench")
    an, mk = synth(spark, n_an, marks_per)
    out = tempfile.mkdtemp(prefix="metl_bench_")
    t0 = time.time()
    docs = mongo_etl.run(spark, an, mk, out)
    n_docs = docs.count()  # NB: re-executes the plan; sink already ran once
    dt = time.time() - t0
    marks = n_an * marks_per
    print(
        json.dumps(
            {
                "marks": marks,
                "docs": n_docs,
                "seconds": round(dt, 2),
                "marks_per_sec": round(marks / dt),
            }
        )
    )


if __name__ == "__main__":
    main()
