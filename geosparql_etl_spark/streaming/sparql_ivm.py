"""Incremental SPARQL view maintenance: CONSTRUCT under streaming.

A materialized CONSTRUCT view (sparql/compiler.py) over a GROWING
graph should not be recomputed from scratch per micro-batch — at
100 TB the accumulated graph dwarfs every batch. This module
implements SEMI-NAIVE delta evaluation (the classic Datalog
incrementalization, public literature): for an n-pattern BGP with
per-pattern accumulated match frames M1..Mn and batch deltas δ1..δn,
the new derivations are exactly

    Δresult = Σ_i  (M1+δ1) ⋈ … ⋈ (M_{i-1}+δ_{i-1}) ⋈ δi ⋈ M_{i+1} ⋈ … ⋈ Mn

— each term pins pattern i to the DELTA, patterns before i to their
UPDATED state and patterns after i to their PRE-BATCH state, so every
new derivation is produced exactly once and nothing is recomputed.
Per batch the work is n joins each with one batch-sized input; the
accumulated frames are only probed, never re-joined against each
other.

Monotone fragment only (BGP + FILTER + BIND): no OPTIONAL/MINUS/NOT
EXISTS, whose deltas can RETRACT — the standard stratification
boundary for incremental evaluation. FILTERs and BINDs commute with
union-of-deltas (a filter selects rows, a bind maps each row), so
they apply per delta term.

Scale notes: state frames are var-column projections sized to the
MATCHES of one pattern (not the graph); localCheckpoint after each
update cuts lineage (reliable checkpoint when a dir is configured —
the d08/pagerank convention). The derived-set dedup is a left_anti
against the accumulated view, which AQE broadcasts while the view is
small and shuffles on the template key once it is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from geosparql_etl_spark.sparql.compiler import (
    _compile_expr,
    _join,
    _operand_col,
    _scan_pattern,
    construct_triples,
    parse_query,
)
from geosparql_etl_spark.sparql.triples import TripleStore
from geosparql_etl_spark.util import cut_lineage as _cut
from geosparql_etl_spark.util import local_frame


class IncrementalConstructView:
    """Maintains CONSTRUCT { template } WHERE { BGP [FILTER…] }
    incrementally over arriving triples.

    ``update(batch)`` ingests a batch of (s, p, o) triples and returns
    the NEWLY derived template triples (never previously emitted).
    ``snapshot()`` returns the full materialized view so far.
    """

    def __init__(self, construct_text: str, static_store: TripleStore | None = None):
        q = parse_query(construct_text)
        if q.construct_template is None:
            raise ValueError("IncrementalConstructView needs a CONSTRUCT query")
        self.template = q.construct_template
        self.patterns: list = []
        self.filters: list = []
        self.binds: list = []  # ordered (var, expr) — BIND is a pure
        # per-binding map, so it commutes with union-of-deltas and the
        # monotone fragment extends to it (round 6)
        for el in q.where.elements:
            if el[0] == "bgp":
                self.patterns.extend(el[1])
            elif el[0] == "filter":
                self.filters.append(el[1])
            elif el[0] == "bind":
                self.binds.append((el[1], el[2]))
            else:
                raise ValueError(
                    f"only the monotone BGP+FILTER+BIND fragment is "
                    f"incrementally maintainable; got {el[0].upper()}"
                )
        for pat in self.patterns:
            if pat[1][0] == "path":
                # a path predicate evaluates WITHIN one store — a
                # batch-only delta would miss sequences/closures whose
                # hops span batches. Loud rejection, not silent loss;
                # express the path as explicit per-hop patterns
                # instead (each hop then deltas independently).
                raise ValueError(
                    "property paths are not incrementally maintainable; "
                    "rewrite the path as separate triple patterns"
                )
        if not self.patterns:
            raise ValueError("empty BGP")
        # per-pattern accumulated match frames, seeded from the static
        # graph when one is given (streamed triples then extend it)
        self.state: list[DataFrame | None] = [None] * len(self.patterns)
        if static_store is not None:
            self.state = [
                _cut(_scan_pattern(static_store, pat).dropDuplicates())
                for pat in self.patterns
            ]
        self.view: DataFrame | None = None  # accumulated derived triples

    def _derive(self, bindings: DataFrame) -> DataFrame:
        for var, expr in self.binds:
            bindings = bindings.withColumn(var, _operand_col(expr, False))
        for expr in self.filters:
            bindings = bindings.where(_compile_expr(expr))
        return construct_triples(bindings, self.template)

    def update(self, batch_triples: DataFrame) -> DataFrame:
        """Ingest one batch; return the never-before-emitted derived
        triples (already deduplicated against the accumulated view)."""
        batch_store = TripleStore(batch_triples)
        deltas = [
            _scan_pattern(batch_store, pat).dropDuplicates()
            for pat in self.patterns
        ]
        # drop delta rows already in the accumulated state (re-sent
        # triples must not re-derive)
        for i, d in enumerate(deltas):
            if self.state[i] is not None:
                deltas[i] = d.join(self.state[i], on=d.columns, how="left_anti")
        # one small job per pattern on the BATCH-sized delta; lets the
        # loop below skip the i-th semi-naive term entirely and — more
        # important — lets an untouched pattern KEEP its already-
        # checkpointed state frame instead of re-materializing it
        nonempty = [d.limit(1).count() > 0 for d in deltas]
        updated = [
            deltas[i]
            if self.state[i] is None
            else self.state[i]
            if not nonempty[i]
            else self.state[i].unionByName(deltas[i])
            for i in range(len(self.patterns))
        ]
        new_bindings: DataFrame | None = None
        for i in range(len(self.patterns)):
            if not nonempty[i]:  # empty delta: term i derives nothing
                continue
            term: DataFrame | None = None
            for j in range(len(self.patterns)):
                part = (
                    updated[j]
                    if j < i
                    else deltas[i]
                    if j == i
                    else self.state[j]
                )
                if part is None:  # pre-batch state empty: term derives nothing
                    term = None
                    break
                term = _join(term, part)
            if term is not None:
                new_bindings = (
                    term
                    if new_bindings is None
                    else new_bindings.unionByName(term)
                )
        self.state = [
            self.state[i]
            if (not nonempty[i] and self.state[i] is not None)
            else _cut(updated[i])
            for i in range(len(self.patterns))
        ]
        if new_bindings is None:  # nothing new matched any pattern
            empty = local_frame(
                batch_triples.sparkSession, [], "s string, p string, o string"
            )
            if self.view is None:  # the view now exists, just empty
                self.view = empty
            return empty
        fresh = self._derive(new_bindings)
        if self.view is not None:
            fresh = fresh.join(self.view, on=["s", "p", "o"], how="left_anti")
        fresh = _cut(fresh)
        self.view = (
            fresh if self.view is None else _cut(self.view.unionByName(fresh))
        )
        return fresh

    def snapshot(self) -> DataFrame:
        if self.view is None:
            raise ValueError("no batches ingested yet")
        return self.view


def run_incremental_construct(
    spark,
    triples_stream: DataFrame,
    construct_text: str,
    out_dir: str,
    checkpoint_dir: str,
    static_store: TripleStore | None = None,
    bootstrap_triples: DataFrame | None = None,
):
    """Wire the view into Structured Streaming: per micro-batch, emit
    only the newly derived triples, appended to a parquet view dir.
    Append-only is exactly-once here BECAUSE the fragment is monotone:
    a replayed batch re-derives only rows the view already holds, and
    the left_anti dedup drops them (same idempotence argument as
    streaming/sink.py's MERGE).

    On RESTART pass ``bootstrap_triples`` = the already-processed
    triples (the lake the checkpoint says is consumed): the view
    replays them once to rebuild its per-pattern state and discards
    their derivations — state is re-derived from durable inputs, the
    reference's checkpoint-recovery pattern (mongo-etl checkpoint
    semantics), not persisted mutable state.

    Crash window closed (round-6 advice): if the dying run's LAST
    parquet append committed but its epoch checkpoint did not, the
    replayed epoch's input is absent from ``bootstrap_triples``, so
    the rebuilt view does not hold its derivations and the in-view
    left_anti alone would re-append them. The FIRST post-restart
    batch therefore also dedups against the existing ``out_dir``
    contents — one extra anti-join, paid once per restart, and the
    append is idempotent end to end. (The window is exactly the one
    in-flight epoch; ``bootstrap_triples`` must still cover every
    checkpoint-acknowledged epoch, as before.)"""
    view = IncrementalConstructView(construct_text, static_store=static_store)
    if bootstrap_triples is not None:
        view.update(bootstrap_triples.select("s", "p", "o"))
    pending_restart_dedup = [bootstrap_triples is not None]

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        fresh = view.update(batch_df.select("s", "p", "o"))
        if pending_restart_dedup[0]:
            pending_restart_dedup[0] = False
            existing = _existing_view_output(spark, out_dir)
            if existing is not None:
                fresh = fresh.join(existing, on=["s", "p", "o"], how="left_anti")
        if fresh.limit(1).count() > 0:
            fresh.write.mode("append").parquet(out_dir)

    return (
        triples_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _existing_view_output(spark, out_dir: str) -> DataFrame | None:
    """The prior run's (s, p, o) view output, or None when the view
    has never written. ONLY "no prior output" maps to None: any other
    read failure (corrupt footer, permission, wrong schema) raises, or
    the restart-dedup would silently skip and the duplicate window it
    exists to close reopens (round-6 ADVICE finding)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(out_dir).select("s", "p", "o")
    except AnalysisException as exc:
        err_class = (
            exc.getErrorClass() or ""
            if hasattr(exc, "getErrorClass")
            else ""
        )
        if (
            "PATH_NOT_FOUND" not in err_class
            and "Path does not exist" not in str(exc)
        ):
            raise
        return None
