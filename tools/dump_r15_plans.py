"""Dump .explain("formatted") snapshots for the round-15 optimization
targets into plans/r15/<query>_<tag>.txt.

Usage: python tools/dump_r15_plans.py <tag> [query ...]
       (no query names = the default target list below)

The judge checks plan claims in OPTIMIZATION_r15.md against these
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
    # round-15 optimization targets (before seconds from
    # plans/r15/bench_before_run1.json, idle box)
    "sim22_shippable_ann",             # 8.68
    "llm25_semantic_training_funnel",  # 5.65
    "d08_dedup_clusters",              # 3.91
    "llm11_contamination_report",      # 3.73
    "d20_skew_capped_neardup",         # 3.53
    "d12_dup_pagerank",                # 3.06
    "er02_golden_record",              # 2.93
    "sim23_persisted_ivfpq_probe",     # 2.92
    "llm24_crawl_training_pipeline",   # 2.82
    "llm20_bpe_tokenize",              # 2.62
    "d13_triangle_count",              # 2.51
    "d04_ngram_jaccard",               # 2.32
    "d10_containment_pairs",           # 2.35
    "sim02_threshold_pairs",           # 1.86
    "sim16_ivf_index_probe",           # 1.55
    "mm05_image_neardup",              # 1.57
    "mm06_audio_neardup",              # 1.38
    "sim06_pq_ann",                    # 0.88
    "sim01_cosine_topk",               # 0.72
    "sim10_knn_classify",              # 1.00
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or TARGETS
    out_dir = REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-r15-plans")
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
