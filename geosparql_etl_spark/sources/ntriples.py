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
    def __init__(self, path: str):
        self.path = path


class NTriplesReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("ntriples source needs a path: .load(<path>)")
        self.path = path
        self._eq: dict[str, object] = {}

    def pushFilters(self, filters):
        """Source-side filter pushdown: equality on subject/predicate/
        object drops rows DURING the parse (before Arrow serialization
        to the JVM), and equality on ``path`` prunes whole files out
        of ``partitions()`` — the custom-format analog of parquet's
        PushedFilters + partition pruning. Everything else is returned
        unsupported, so Spark re-applies it (pushdown must never
        change semantics, only cost)."""
        from pyspark.sql.datasource import EqualTo

        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 and \
                    f.attribute[0] in ("subject", "predicate", "object", "path"):
                self._eq[f.attribute[0]] = f.value
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                glob.glob(os.path.join(self.path, "*.nt"))
                + glob.glob(os.path.join(self.path, "*.nt.gz"))
            )
        else:
            files = sorted(glob.glob(self.path)) or [self.path]
        if not files:
            raise FileNotFoundError(f"no .nt/.nt.gz files under {self.path}")
        if "path" in self._eq:  # pushed path equality prunes whole files
            files = [p for p in files if p == self._eq["path"]]
        # one partition per file: an N-file directory scans N-wide and
        # a task re-run re-reads exactly one file
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
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
                if self._eq.get("subject", subj) != subj:
                    continue
                if self._eq.get("predicate", pred) != pred:
                    continue
                uri = _URI.match(obj)
                if uri:
                    o = uri.group(1)
                    if self._eq.get("object", o) == o:
                        yield (subj, pred, o, False, None, None,
                               partition.path)
                    continue
                lit = _LITERAL.match(obj)
                if not lit:
                    raise ValueError(
                        f"{partition.path}:{n}: unparseable object term: "
                        f"{obj[:120]!r}"
                    )
                value, dtype, lang = lit.groups()
                o = _unescape(value)
                if self._eq.get("object", o) != o:
                    continue
                yield (
                    subj, pred, o, True, dtype, lang, partition.path,
                )


class NTriplesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ntriples"

    def schema(self) -> str:
        return NTRIPLES_SCHEMA

    def reader(self, schema):
        return NTriplesReader(self.options)

    def writer(self, schema, overwrite: bool):
        w = NTriplesWriter(self.options, overwrite)
        if overwrite:  # driver-side: clear prior parts before tasks run
            for f in glob.glob(os.path.join(w.path, "part-*.nt")):
                os.remove(f)
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
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class NTriplesWriter(DataSourceWriter):
    """One .nt file per task partition, written task-side; commit is
    the standard two-phase protocol: tasks write part files and return
    their paths, the driver's commit() publishes _SUCCESS, abort()
    deletes every reported part — a replayed/zombie task's output is
    never half-visible."""

    def __init__(self, options: dict, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("ntriples sink needs a path: .save(<path>)")
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.nt")
        n = 0
        with io.open(out, "wt", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(render_line(row) + "\n")
                n += 1
        return _Committed(out, n)

    def commit(self, messages) -> None:
        with io.open(
            os.path.join(self.path, "_SUCCESS"), "wt", encoding="utf-8"
        ) as fh:
            fh.write("")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
