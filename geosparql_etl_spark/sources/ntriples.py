"""Spark 4 Python DataSource: a distributed N-Triples reader.

`spark.read.format("ntriples").load(dir)` -> the engine's triples
schema (subject/predicate/object/is_literal/datatype/lang + source
path), parsing the exact lines `sinks/rdf.py:render_ntriples` emits —
the round-trip makes RDF a first-class TABLE format for this engine
instead of a write-only sink.

Why a Python DataSource (the Spark 4 `pyspark.sql.datasource` API)
rather than read.text + regex columns: the API gives the engine a
REGISTERED format with its own schema and its own partitioning —
`partitions()` returns one InputPartition per file, so a directory of
N files scans with N-way parallelism and each executor parses only
its file (gzip-aware), streaming rows out through Arrow without a
driver-side listing loop or a second parse pass. This is also the
template for wrapping any line-oriented domain format (WARC, JSONL
variants, log formats) as a queryable source.

Partition pruning is OPTION-driven (``pathEquals``, ``graph``), not
claimed-filter-driven: see NTriplesReader's docstring for the Spark
4.1.2 multi-branch planning hazard that forced this design.

Strictness: blank lines and `#` comments skip; any other unparseable
line raises with file context — a triple store must not silently drop
statements (the GeoJSON source's PERMISSIVE-mode lesson).
"""

from __future__ import annotations

import glob
import gzip
import io
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

NTRIPLES_SCHEMA = (
    "subject string, predicate string, object string, "
    "is_literal boolean, datatype string, lang string, path string"
)
# quad-lake layout (option("graphPartitions","true") on read,
# option("partitionBy","g") on write): files live under one
# ``g=<percent-encoded-graph-iri>`` directory per named graph — the
# GRAPH-scoped analog of a parquet partitionBy("g") lake, where a
# constant-graph scan prunes whole directories before any file opens
NTQUADS_SCHEMA = NTRIPLES_SCHEMA + ", g string"

_LINE = re.compile(r"^<([^>]*)> <([^>]*)> (.+?) \.\s*$", re.S)
_LITERAL = re.compile(
    r'^"(.*)"(?:\^\^<([^>]*)>|@([A-Za-z0-9][A-Za-z0-9-]*))?$', re.S
)
_URI = re.compile(r"^<([^>]*)>$")
_UNESCAPE = re.compile(r"\\(.)")
_UNESCAPE_MAP = {"n": "\n", "r": "\r", "t": "\t", '"': '"', "\\": "\\"}


def _unescape(s: str) -> str:
    # single left-to-right pass: chained str.replace would mis-read
    # the 'n' of an escaped backslash followed by n ('\\\\n')
    return _UNESCAPE.sub(
        lambda m: _UNESCAPE_MAP.get(m.group(1), "\\" + m.group(1)), s
    )


class _FilePartition(InputPartition):
    def __init__(self, path: str, graph: str | None = None):
        self.path = path
        self.graph = graph


def _enc_graph(g: str) -> str:
    from urllib.parse import quote

    return quote(g, safe="")


def _dec_graph(dirname: str) -> str:
    from urllib.parse import unquote

    return unquote(dirname[len("g="):])


def _list_nt_files(path: str) -> list[str]:
    """Expand a load path into concrete .nt/.nt.gz files.

    Accepted forms (comma-separable, so a partitioned triple lake
    like ``out/exec/img,out/exec/rad`` or ``out/**/*.nt.gz`` reads as
    ONE table; pair with ``option("pathEquals", <file>)`` for
    partition pruning on top):
      - a directory           -> its *.nt + *.nt.gz files
      - a glob (supports **)  -> every match (dirs expand recursively)
      - a concrete file path  -> itself
    """
    files: list[str] = []
    for token in (t.strip() for t in path.split(",")):
        if not token:
            continue
        if os.path.isdir(token):
            files += glob.glob(os.path.join(token, "*.nt"))
            files += glob.glob(os.path.join(token, "*.nt.gz"))
        elif glob.has_magic(token):
            for hit in glob.glob(token, recursive=True):
                if os.path.isdir(hit):
                    files += glob.glob(os.path.join(hit, "*.nt"))
                    files += glob.glob(os.path.join(hit, "*.nt.gz"))
                else:
                    files.append(hit)
        else:
            files.append(token)
    return sorted(set(files))


class NTriplesReader(DataSourceReader):
    """Reader with OPTION-driven partition pruning and NO claimed
    filter pushdown.

    Why no pushFilters claims (round-6 finding, Spark 4.1.2): when the
    same ntriples source appears in several branches of one plan (a
    BGP self-join, an update's bindings + full-graph scan), Spark's
    Python-data-source planning does not keep the per-branch claimed
    filter state apart — branches execute with ANOTHER branch's
    claimed equalities and silently return wrong rows (verified
    empirically; the regression test pins it). Claims REMOVE filters
    from the plan, so correctness then depends on exactly which
    pickled reader ran — unacceptable. This reader therefore claims
    nothing: Spark keeps every filter in the plan and applies it above
    the scan, branch by branch — always correct.

    Pruning still exists, through read OPTIONS, which are part of the
    relation identity and therefore can never cross branches:
      - ``option("pathEquals", <file>)``: scan exactly one file
      - ``option("graph", <iri>)`` (+ graphPartitions): scan one
        ``g=<enc>`` directory of a quad lake
    NTriplesLakeStore / GraphScopedStore set these per scan."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("ntriples source needs a path: .load(<path>)")
        self.path = path
        self.graph_partitions = (
            options.get("graphPartitions", "false").lower() == "true"
        )
        self.path_equals = options.get("pathequals")
        self.graph = options.get("graph")
        if self.graph is not None and not self.graph_partitions:
            raise ValueError(
                "ntriples option 'graph' needs graphPartitions=true "
                "(a quad lake laid out as g=<enc> directories)"
            )

    def pushFilters(self, filters):
        """Claim NOTHING (see class docstring): every filter is
        returned unsupported so Spark re-applies it above the scan.
        The method still exists so registration's filterPushdown
        session guard keeps working."""
        return list(filters)

    def partitions(self):
        if self.graph_partitions:
            return self._graph_partitions()
        files = _list_nt_files(self.path)
        if not files:
            raise FileNotFoundError(f"no .nt/.nt.gz files under {self.path}")
        if self.path_equals is not None:  # option prunes to one file
            files = [p for p in files if p == self.path_equals]
            if not files:
                return [_FilePartition("")]
        # one partition per file: an N-file directory scans N-wide and
        # a task re-run re-reads exactly one file
        return [_FilePartition(p) for p in files]

    def _graph_partitions(self):
        """Quad lake: one ``g=<enc>`` directory per graph under the
        root. option("graph", <iri>) prunes whole DIRECTORIES here —
        zero file opens for the other graphs, the partition-pruning
        behavior a parquet partitionBy("g") lake gets from Catalyst."""
        dirs = sorted(glob.glob(os.path.join(self.path, "g=*")))
        dirs = [d for d in dirs if os.path.isdir(d)]
        if not dirs:
            raise FileNotFoundError(
                f"no g=* graph directories under {self.path} "
                "(not a quad lake? drop graphPartitions)"
            )
        if self.graph is not None:
            want = os.path.join(self.path, "g=" + _enc_graph(self.graph))
            dirs = [d for d in dirs if d == want]
            if not dirs:
                return [_FilePartition("")]
        parts = []
        for d in dirs:
            graph = _dec_graph(os.path.basename(d))
            for p in sorted(
                glob.glob(os.path.join(d, "*.nt"))
                + glob.glob(os.path.join(d, "*.nt.gz"))
            ):
                parts.append(_FilePartition(p, graph))
        return parts or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:  # pruned-to-nothing sentinel
            return
        tail = (
            (partition.graph,) if self.graph_partitions else ()
        )
        opener = gzip.open if partition.path.endswith(".gz") else io.open
        with opener(partition.path, "rt", encoding="utf-8") as fh:
            for n, raw in enumerate(fh, 1):
                line = raw.strip()
                if not line or line.startswith("#"):
                    continue
                m = _LINE.match(line)
                if not m:
                    raise ValueError(
                        f"{partition.path}:{n}: unparseable N-Triples "
                        f"statement: {line[:120]!r}"
                    )
                subj, pred, obj = m.groups()
                uri = _URI.match(obj)
                if uri:
                    yield (subj, pred, uri.group(1), False, None, None,
                           partition.path) + tail
                    continue
                lit = _LITERAL.match(obj)
                if not lit:
                    raise ValueError(
                        f"{partition.path}:{n}: unparseable object term: "
                        f"{obj[:120]!r}"
                    )
                value, dtype, lang = lit.groups()
                yield (
                    subj, pred, _unescape(value), True, dtype, lang,
                    partition.path,
                ) + tail


class NTriplesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ntriples"

    def schema(self) -> str:
        if self.options.get("graphPartitions", "false").lower() == "true":
            return NTQUADS_SCHEMA
        return NTRIPLES_SCHEMA

    def reader(self, schema):
        return NTriplesReader(self.options)

    def writer(self, schema, overwrite: bool):
        w = NTriplesWriter(self.options, overwrite)
        if overwrite:
            # Invalidate the previous generation NOW (readers must not
            # treat a half-replaced directory as committed), but defer
            # deleting the old part files to commit(): a job that dies
            # mid-write leaves the old data intact, not half-deleted.
            success = os.path.join(w.path, "_SUCCESS")
            if os.path.exists(success):
                os.remove(success)
        return w


def register(spark) -> None:
    """Register the format on a session: read via
    spark.read.format('ntriples').load(path). Python-source filter
    pushdown is opt-in in Spark 4 — a reader that implements
    pushFilters() REFUSES to run with it disabled, so registration
    enables it for the session."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(NTriplesDataSource)


# --- write side --------------------------------------------------------------


def _escape_nt_py(s: str) -> str:
    """Python twin of sinks/rdf.py:_escape_nt — same order (backslash
    first), byte-identical output."""
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def render_line(row) -> str:
    """One N-Triples statement from a triples row — matches
    render_ntriples' column expression byte-for-byte (asserted by the
    roundtrip parity test)."""
    if row.is_literal:
        obj = '"' + _escape_nt_py(row.object) + '"'
        if row.lang is not None:
            obj += "@" + row.lang
        elif row.datatype is not None:
            obj += "^^<" + row.datatype + ">"
    else:
        obj = "<" + row.object + ">"
    return f"<{row.subject}> <{row.predicate}> {obj} ."


class _Committed(WriterCommitMessage):
    def __init__(self, renames: list[tuple[str, str]], n_rows: int):
        # [(attempt-unique temp path, final name relative to the root)]
        # — one pair for a flat write, one PER GRAPH for partitionBy=g
        self.renames = renames
        self.n_rows = n_rows


class NTriplesWriter(DataSourceWriter):
    """One .nt (or .nt.gz with option("compression","gzip")) file per
    task partition — a REAL two-phase protocol:

    phase 1 (task-side): each attempt writes to an attempt-unique
      hidden temp name ``.part-<pid>-<taskAttemptId>.nt.tmp``, so a
      speculative or zombie re-attempt of the same partition can never
      interleave with (or truncate) another attempt's bytes — they
      hold different paths by construction.
    phase 2 (driver-side commit): only the WINNING attempts' temp
      files (the commit messages Spark hands over — one per partition)
      are renamed to their final ``part-<pid>.nt[.gz]`` names; loser
      temps are swept; on overwrite the previous generation's parts
      (.nt AND .nt.gz — a stale gzip generation must not survive and
      pollute the next read) are deleted here, not before the job, so
      a mid-write crash leaves old data intact. abort() sweeps all
      temps and touches nothing final.

    Readers that glob ``part-*`` therefore never observe a torn or
    duplicated partition file, whether or not they gate on _SUCCESS.
    Mirrors the reference's gzip-compressed sink output
    (mongo-etl/mongodb_to_rdf.py:548-563) on the write side."""

    def __init__(self, options: dict, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("ntriples sink needs a path: .save(<path>)")
        self.path = path
        self.overwrite = overwrite
        compression = options.get("compression", "none").lower()
        if compression not in ("none", "gzip"):
            raise ValueError(
                f"ntriples sink: unsupported compression {compression!r} "
                "(use 'gzip' or omit)"
            )
        self.gzip = compression == "gzip"
        part_by = options.get("partitionby")
        if part_by not in (None, "g"):
            raise ValueError(
                f"ntriples sink: partitionBy={part_by!r} unsupported "
                "(only 'g' — one directory per named graph)"
            )
        # quad-lake write: rows carry a ``g`` column; each task writes
        # one file PER GRAPH it holds under g=<enc>/ (repartition the
        # frame by g upstream so each graph concentrates in few tasks)
        self.graph_partitioned = part_by == "g"
        # APPEND mode needs job-unique final names: a second append job
        # re-issues the same partition ids, and plain part-<pid> names
        # would os.replace the PREVIOUS job's files — silent data loss.
        # Overwrite keeps the legacy exact names (old parts are deleted
        # at commit, so there is nothing to collide with).
        import uuid

        self.job_token = "" if overwrite else f"-{uuid.uuid4().hex[:8]}"

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        ext = ".nt.gz" if self.gzip else ".nt"
        opener = gzip.open if self.gzip else io.open
        if self.graph_partitioned:
            return self._write_graphs(iterator, pid, attempt, ext, opener)
        final_name = f"part-{pid:05d}{self.job_token}{ext}"
        tmp = os.path.join(
            self.path, f".part-{pid:05d}-{attempt}{ext}.tmp"
        )
        n = 0
        with opener(tmp, "wt", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(render_line(row) + "\n")
                n += 1
        return _Committed([(tmp, final_name)], n)

    def _write_graphs(self, iterator, pid, attempt, ext, opener):
        """One temp file per graph seen by this task; the commit
        message carries every (tmp, g=<enc>/part-<pid>) rename pair.
        Handles live streaming: rows go straight to the open handle of
        their graph — no per-task buffering of the data."""
        handles: dict[str, tuple] = {}
        n = 0
        try:
            for row in iterator:
                if row.g is None:
                    raise ValueError(
                        "ntriples partitionBy=g: NULL graph value "
                        "(every row of a quad lake needs a graph IRI)"
                    )
                fh_pair = handles.get(row.g)
                if fh_pair is None:
                    enc = _enc_graph(row.g)
                    tmp = os.path.join(
                        self.path,
                        f".part-{pid:05d}-{attempt}-{enc}{ext}.tmp",
                    )
                    final = os.path.join(
                        "g=" + enc, f"part-{pid:05d}{self.job_token}{ext}"
                    )
                    fh_pair = (opener(tmp, "wt", encoding="utf-8"), tmp, final)
                    handles[row.g] = fh_pair
                fh_pair[0].write(render_line(row) + "\n")
                n += 1
        finally:
            for fh, _, _ in handles.values():
                fh.close()
        return _Committed(
            [(tmp, final) for _, tmp, final in handles.values()], n
        )

    def commit(self, messages) -> None:
        if self.overwrite:
            pats = ("part-*.nt", "part-*.nt.gz",
                    os.path.join("g=*", "part-*.nt"),
                    os.path.join("g=*", "part-*.nt.gz"))
            for pat in pats:
                for f in glob.glob(os.path.join(self.path, pat)):
                    os.remove(f)
        for m in messages:
            if m is None:
                continue
            for tmp, final_name in m.renames:
                if not os.path.exists(tmp):
                    # a reported winner whose temp vanished (concurrent
                    # job sweeping this directory, external cleanup) is
                    # a protocol violation: publishing _SUCCESS anyway
                    # would present an output silently missing rows.
                    raise IOError(
                        f"ntriples commit: winner temp {tmp!r} is "
                        "missing — refusing to publish an incomplete "
                        "output (is another job writing this directory?)"
                    )
                dest = os.path.join(self.path, final_name)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.replace(tmp, dest)
        self._sweep_temps()
        with io.open(
            os.path.join(self.path, "_SUCCESS"), "wt", encoding="utf-8"
        ) as fh:
            fh.write("")

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp, _ in m.renames:
                if os.path.exists(tmp):
                    os.remove(tmp)
        self._sweep_temps()

    def _sweep_temps(self) -> None:
        # losing speculative attempts and failed attempts never report
        # a commit message; their temps are only findable by glob
        for f in glob.glob(os.path.join(self.path, ".part-*.tmp")):
            try:
                os.remove(f)
            except OSError:
                pass


def compact_quad_lake(spark, path: str, compression: str | None = None) -> None:
    """Rewrite a ``g=<enc>`` quad lake so each graph holds ONE file.

    Streaming MERGE/append jobs add one file per task per graph per
    micro-batch (NTriplesWriter._write_graphs), so a long-lived lake
    accumulates N files per graph and every scan fans one partition
    per file — the small-files problem. This rewrites the lake in
    place: read every graph, concentrate each graph into one task
    (repartition on g), overwrite. Atomicity rides the writer's own
    two-phase commit — temps first, previous generation deleted only
    at commit — so a crash mid-compaction leaves the old lake intact;
    the read's lineage is severed (localCheckpoint) BEFORE the
    overwrite so the write never re-reads the files it replaces. The
    triple SET and the g=<enc> layout are unchanged: option("graph")
    directory pruning behaves identically after.

    The parquet twin is sinks/parquet.compact_partitions; ports the
    same pattern to the N-Triples layout (round-6 verdict #7).

    Scale note: repartition(g) gives one WRITE TASK per graph — right
    while single-graph volume fits one task's disk/time budget (the
    layout's own constraint: a graph is one directory). A lake with a
    few giant graphs would pass max_files_per_graph > 1 via
    ``repartition(N, "g")`` upstream instead; the writer already
    splits per task."""
    df = (
        spark.read.format("ntriples")
        .option("graphPartitions", "true")
        .load(path)
    )
    # sever lineage before overwriting the source files; drop the
    # provenance column the writer does not serialize
    snap = df.drop("path").localCheckpoint()
    w = (
        snap.repartition("g")
        .write.format("ntriples")
        .mode("overwrite")
        .option("partitionBy", "g")
        .option("path", path)
    )
    if compression:
        w = w.option("compression", compression)
    w.save()
