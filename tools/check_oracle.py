"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py [sf_dir] --changed-since <git-ref>

--changed-since selects only the queries the diff vs <git-ref> could
affect (inner-loop mode): entry functions whose source changed, any
function transitively REFERENCING a changed function (so a changed
helper re-checks its callers), and — when a geosparql_etl_spark/
module changed — every query whose code imports from it. The
selection is a conservative over-approximation (extra queries run;
none are missed short of exotic dynamic dispatch). Explicit query
names union with it.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from geosparql_etl_spark.schemas import TESTDATA_TABLES  # noqa: E402
from geosparql_etl_spark.session import get_spark  # noqa: E402


def canon(v):
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if v is None:
        return "\\N"
    return str(v)


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


# The driver's value hash is TYPED (arrow buffers), so a DuckDB
# decimal128 vs a Spark bigint mismatches even when every value is
# numerically equal (round-1 s03 failure mode). Map both engines'
# types onto a coarse lattice and flag any column pair that lands in
# different classes.
_TYPE_CLASS = {
    # spark simpleString -> class
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "binary": "bytes",
    "date": "date", "timestamp": "ts", "timestamp_ntz": "ts",
}


def _class_of_spark(dt: str) -> str:
    base = dt.split("(")[0].lower()
    if base == "decimal":
        return "decimal"
    return _TYPE_CLASS.get(base, base)


def _class_of_arrow(t) -> str:
    import pyarrow.types as pat

    if pat.is_decimal(t):
        return "decimal"
    if pat.is_integer(t):
        return "int"
    if pat.is_floating(t):
        return "float"
    if pat.is_string(t) or pat.is_large_string(t):
        return "str"
    if pat.is_boolean(t):
        return "bool"
    if pat.is_binary(t) or pat.is_large_binary(t):
        return "bytes"
    if pat.is_timestamp(t):
        return "ts"
    if pat.is_date(t):
        return "date"
    if pat.is_list(t) or pat.is_large_list(t):
        return "list"
    return str(t)


def type_mismatches(spark_dtypes, arrow_schema):
    spark_map = {c: _class_of_spark(t) for c, t in spark_dtypes}
    problems = []
    for field in arrow_schema:
        cls = _class_of_arrow(field.type)
        if field.name in spark_map and spark_map[field.name] != cls:
            problems.append(
                f"{field.name}: spark {spark_map[field.name]} vs oracle {cls}"
            )
    return problems


def changed_queries(ref: str) -> set[str]:
    """Registry queries the working-tree diff vs ``ref`` could affect.

    Mechanism: extract every module-level function's source from the
    ref's __spark_entry__.py and the working tree's; seed the changed
    set with added/modified functions plus (for each changed
    geosparql_etl_spark/ module) every function importing from it;
    propagate to callers by name reference until fixpoint. A changed
    ``_sql_<pfx>`` helper marks the ``<pfx>_*`` queries (the oracle
    naming convention)."""
    import ast
    import re as _re
    import subprocess

    def run(*args):
        return subprocess.run(
            args, capture_output=True, text=True, cwd=REPO
        ).stdout

    old_src = run("git", "show", f"{ref}:__spark_entry__.py")
    new_src = (REPO / "__spark_entry__.py").read_text()

    def fn_sources(src: str) -> dict[str, str]:
        try:
            tree = ast.parse(src)
        except SyntaxError:
            return {}
        return {
            n.name: ast.get_source_segment(src, n) or ""
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }

    old_f, new_f = fn_sources(old_src), fn_sources(new_src)
    changed = {
        name for name, src in new_f.items() if old_f.get(name) != src
    }
    # package-module changes: any function importing from the changed
    # module (or its parent package — over-approximate) is affected
    diff_files = run(
        "git", "diff", "--name-only", ref, "--", "geosparql_etl_spark/"
    ).split()
    needles = set()
    for f in diff_files:
        if not f.endswith(".py"):
            continue
        dotted = f[:-3].replace("/", ".")
        needles.add(dotted)
        if "." in dotted:
            needles.add(dotted.rsplit(".", 1)[0])
    for name, src in new_f.items():
        if any(n in src for n in needles):
            changed.add(name)
    # propagate changed helpers to their callers, to fixpoint
    word = {name: _re.compile(rf"\b{_re.escape(name)}\b") for name in new_f}
    grew = True
    while grew:
        grew = False
        for name, src in new_f.items():
            if name in changed:
                continue
            if any(word[c].search(src) for c in list(changed) if c != name):
                changed.add(name)
                grew = True
    qs = set(entrymod.queries())
    picked = changed & qs
    for c in changed:
        if c.startswith("_sql_"):
            pfx = c[len("_sql_"):] + "_"
            picked |= {q for q in qs if q.startswith(pfx)}
    return picked


def main():
    argv = list(sys.argv[1:])
    since = None
    if "--changed-since" in argv:
        i = argv.index("--changed-since")
        since = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    if since is not None:
        picked = changed_queries(since)
        only |= picked
        print(f"--changed-since {since}: {len(picked)} affected queries")
        if not only:
            print("nothing affected; 0 ok, 0 rows-only, 0 FAILED")
            return 0

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # h02's oracle embeds literal hashes of the driver's sf0.01 files;
    # when checking a different sf dir, rebuild it for that dir so the
    # local tool matches what the driver would see at its own scale.
    try:
        oracles["h02_file_hash"] = entrymod._sql_h02(sf_dir)
    except (AttributeError, FileNotFoundError):
        pass
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = df.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (rows-only, {time.time()-t0:.1f}s)")
            if len(spark_rows) == 0 and name != "expected_empty":
                print(f"      WARNING: rows-only query returned 0 rows")
            n_rowsonly += 1
            continue
        try:
            tbl = con.execute(oracles[name]).arrow()
            duck_cols = tbl.column_names
            cols_data = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            duck_rows = list(zip(*cols_data)) if cols_data else []
            if not duck_rows and tbl.num_rows:
                duck_rows = [() for _ in range(tbl.num_rows)]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        tmis = type_mismatches(df.dtypes, tbl.schema)
        if tmis:
            problems.append("type classes differ: " + ", ".join(tmis))
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            ms_s = rows_to_multiset([list(r) for r in spark_rows], spark_cols)
            ms_d = rows_to_multiset([list(r) for r in duck_rows], duck_cols)
            if ms_s != ms_d:
                diffs = [
                    (a, b) for a, b in zip(ms_s, ms_d) if a != b
                ][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + " ; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAILED")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
