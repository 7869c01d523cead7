"""Dump .explain("formatted") snapshots for the round-14 optimization
targets into plans/r14/<query>_<tag>.txt.

Usage: python tools/dump_r14_plans.py <tag> [query ...]
       (no query names = the default target list below)

The judge checks plan claims in OPTIMIZATION_r14.md against these
files; dump a _before set at the starting commit and an _after set
once a query's plan changes.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from geosparql_etl_spark.session import get_spark  # noqa: E402

TARGETS = [
    # top bench rows (baseline seconds in parens, r13-close baseline)
    "g23_zone_holes_join",        # 6.39
    "sim22_shippable_ann",        # 5.96
    "llm25_semantic_training_funnel",  # 5.92
    "sim02_threshold_pairs",      # 4.88
    "d13_triangle_count",         # 4.85
    "sim23_persisted_ivfpq_probe",  # 4.60
    "llm11_contamination_report",  # 4.46
    "sp45_donut_zone",            # 3.91
    "d12_dup_pagerank",           # 3.62
    "sim16_ivf_index_probe",      # 3.60
    "d08_dedup_clusters",         # 3.57
    "mm07_shot_boundaries",       # 3.55
    "sp39_zone_overlap",          # 3.48
    "llm24_crawl_training_pipeline",  # 3.15
    "llm20_bpe_tokenize",         # 3.09
    "er02_golden_record",         # 2.86
    "d20_skew_capped_neardup",    # 2.79
    "sp16_update_rewrite",        # 2.49
    "sp43_optional_rejoin",       # 2.46
    "d10_containment_pairs",      # 2.39
    "sim10_knn_classify",         # 2.26
    "sp44_erroring_bind",         # 2.24
    "sp36_service_join",          # 2.20
    "d04_ngram_jaccard",          # 2.16
    "sp22_count_distinct",        # 2.14
    # new round-14 headline rows (no baseline yet)
    "sp47_zone_relate",
    "sp50_donut_disjoint",
    "sp51_donut_grid_join",
    "g24_multipolygon_grid_join",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or TARGETS
    out_dir = REPO / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-r14-plans")
    qs = entrymod.queries()
    sf_dir = "/root/testdata/sf0.1"
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
