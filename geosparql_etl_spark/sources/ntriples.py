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


def _list_nt_files(path: str) -> list[str]:
    """Expand a load path into concrete .nt/.nt.gz files.

    Accepted forms (comma-separable, so a partitioned triple lake
    like ``out/exec/img,out/exec/rad`` or ``out/**/*.nt.gz`` reads as
    ONE table; pair with the pushed ``path`` equality filter for
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
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("ntriples source needs a path: .load(<path>)")
        self.path = path
        self._eq: dict[str, object] = {}
        # set when pushed equalities contradict each other (x=='a' AND
        # x=='b'): the scan is provably empty and must RETURN empty —
        # accepting both filters but applying only one would silently
        # return the wrong rows (ADVICE r04)
        self._impossible = False

    def pushFilters(self, filters):
        """Source-side filter pushdown: equality on subject/predicate/
        object drops rows DURING the parse (before Arrow serialization
        to the JVM), and equality on ``path`` prunes whole files out
        of ``partitions()`` — the custom-format analog of parquet's
        PushedFilters + partition pruning. Everything else is returned
        unsupported, so Spark re-applies it (pushdown must never
        change semantics, only cost). Two contradictory equalities on
        one column mark the scan impossible (zero partitions' worth of
        rows) instead of last-write-wins."""
        from pyspark.sql.datasource import EqualTo

        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 and \
                    f.attribute[0] in ("subject", "predicate", "object", "path"):
                attr = f.attribute[0]
                if attr in self._eq and self._eq[attr] != f.value:
                    self._impossible = True
                else:
                    self._eq[attr] = f.value
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self):
        if self._impossible:
            # contradictory pushed equalities: one sentinel partition
            # whose read() yields nothing (the API requires >=1)
            return [_FilePartition("")]
        files = _list_nt_files(self.path)
        if not files:
            raise FileNotFoundError(f"no .nt/.nt.gz files under {self.path}")
        if "path" in self._eq:  # pushed path equality prunes whole files
            files = [p for p in files if p == self._eq["path"]]
            if not files:
                return [_FilePartition("")]
        # one partition per file: an N-file directory scans N-wide and
        # a task re-run re-reads exactly one file
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        if not partition.path:  # impossible-scan sentinel
            return
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
    def __init__(self, tmp_path: str, final_name: str, n_rows: int):
        self.tmp_path = tmp_path
        self.final_name = final_name
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

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        ext = ".nt.gz" if self.gzip else ".nt"
        final_name = f"part-{pid:05d}{ext}"
        tmp = os.path.join(
            self.path, f".part-{pid:05d}-{attempt}{ext}.tmp"
        )
        opener = gzip.open if self.gzip else io.open
        n = 0
        with opener(tmp, "wt", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(render_line(row) + "\n")
                n += 1
        return _Committed(tmp, final_name, n)

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in glob.glob(os.path.join(self.path, "part-*.nt")) + \
                    glob.glob(os.path.join(self.path, "part-*.nt.gz")):
                os.remove(f)
        for m in messages:
            if m is None:
                continue
            if not os.path.exists(m.tmp_path):
                # a reported winner whose temp vanished (concurrent job
                # sweeping this directory, external cleanup) is a
                # protocol violation: publishing _SUCCESS anyway would
                # present an output silently missing that partition.
                raise IOError(
                    f"ntriples commit: winner temp {m.tmp_path!r} is "
                    "missing — refusing to publish an incomplete output "
                    "(is another job writing this directory?)"
                )
            os.replace(m.tmp_path, os.path.join(self.path, m.final_name))
        self._sweep_temps()
        with io.open(
            os.path.join(self.path, "_SUCCESS"), "wt", encoding="utf-8"
        ) as fh:
            fh.write("")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
        self._sweep_temps()

    def _sweep_temps(self) -> None:
        # losing speculative attempts and failed attempts never report
        # a commit message; their temps are only findable by glob
        for f in glob.glob(os.path.join(self.path, ".part-*.tmp")):
            try:
                os.remove(f)
            except OSError:
                pass
