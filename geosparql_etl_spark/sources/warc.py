"""Spark 4 Python DataSource: a distributed WARC (Web ARChive) reader
and writer — the web-crawl ingest surface of an LLM training-data
pipeline (Common Crawl's on-disk format, ISO 28500).

`spark.read.format("warc").load(dir)` -> one row per WARC record
(schema ``WARC_SCHEMA``: named headers + the raw payload as BINARY),
parsing the exact framing `df.write.format("warc")` emits, so crawl
archives are a first-class TABLE format for this engine — the
round-trip is pinned byte-for-byte by tests (the ntriples source's
discipline, sources/ntriples.py, which this module is the documented
"template for wrapping any line-oriented domain format (WARC, logs)"
instance of).

Format (WARC/1.1, ISO 28500; WARC/1.0 accepted on read):

    WARC/1.1\\r\\n
    <Header-Name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length payload bytes>
    \\r\\n\\r\\n

Reader design (the 100 TB shape):
  - ``partitions()`` returns ONE InputPartition per .warc/.warc.gz
    file: an N-file crawl dump scans N-wide, each executor parses only
    its file (gzip-aware, streamed — payloads never buffer more than
    one record), no driver-side listing loop.
  - The payload stays an opaque ``binary`` column with typed metadata
    beside it — the multimodal-column convention (operators/
    multimodal.py): decode/extract runs downstream in vectorized
    batches, the scan itself never interprets content.
  - NO claimed filter pushdown, same reason as the ntriples reader
    (Spark 4.1.2 multi-branch claimed-filter hazard, SCALE.md r06):
    pruning is OPTION-driven (``pathEquals``).

Strictness: a malformed record raises with file/offset context — a
crawl ingest that silently drops records poisons every dedup and
contamination number computed downstream (the GeoJSON source's
PERMISSIVE-mode lesson, but the failure matters MORE here because the
corpus is the product).
"""

from __future__ import annotations

import glob
import gzip
import io
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

WARC_SCHEMA = (
    "warc_type string, record_id string, target_uri string, "
    "warc_date string, content_type string, content_encoding string, "
    "content_length long, payload binary, path string, "
    "record_offset long"
)

# headers the schema surfaces by name; anything else is preserved on
# write only if the caller re-adds it (minimal reader by design)
_H_TYPE = "warc-type"
_H_ID = "warc-record-id"
_H_URI = "warc-target-uri"
_H_DATE = "warc-date"
_H_CTYPE = "content-type"
_H_CENC = "content-encoding"
_H_CLEN = "content-length"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _list_warc_files(path: str) -> list[str]:
    """Directory / glob / concrete file -> sorted .warc/.warc.gz list
    (same expansion rules as the ntriples lake)."""
    files: list[str] = []
    for token in (t.strip() for t in path.split(",")):
        if not token:
            continue
        if os.path.isdir(token):
            files += glob.glob(os.path.join(token, "*.warc"))
            files += glob.glob(os.path.join(token, "*.warc.gz"))
        elif glob.has_magic(token):
            for hit in glob.glob(token, recursive=True):
                if os.path.isdir(hit):
                    files += glob.glob(os.path.join(hit, "*.warc"))
                    files += glob.glob(os.path.join(hit, "*.warc.gz"))
                else:
                    files.append(hit)
        else:
            files.append(token)
    return sorted(set(files))


def parse_warc_records(fh, path: str):
    """Stream (headers: dict, payload: bytes, offset: int) tuples from
    an open BINARY file object. Shared by the reader and the tests'
    independent fixture checks."""
    offset = 0
    while True:
        pos = offset
        magic = fh.readline()
        if not magic:
            return
        offset += len(magic)
        line = magic.rstrip(b"\r\n")
        if not line:  # tolerate extra blank separation between records
            continue
        if line not in (b"WARC/1.0", b"WARC/1.1"):
            raise ValueError(
                f"{path}@{pos}: expected WARC/1.0 or WARC/1.1 record "
                f"header, got {line[:60]!r}"
            )
        headers: dict[str, str] = {}
        last_name: str | None = None
        while True:
            raw = fh.readline()
            if not raw:
                raise ValueError(f"{path}@{pos}: EOF inside WARC headers")
            offset += len(raw)
            h = raw.rstrip(b"\r\n")
            if not h:
                break
            if raw[:1] in (b" ", b"\t"):
                # ISO 28500 header folding: a continuation line (leading
                # SP/HT) appends to the previous header's value — real
                # Common Crawl archives use this
                if last_name is None:
                    raise ValueError(
                        f"{path}@{pos}: continuation line before any "
                        f"header {h[:60]!r}"
                    )
                headers[last_name] += " " + h.strip().decode("utf-8")
                continue
            if b":" not in h:
                raise ValueError(
                    f"{path}@{pos}: malformed WARC header line "
                    f"{h[:60]!r}"
                )
            name, _, value = h.partition(b":")
            last_name = name.strip().lower().decode("ascii")
            headers[last_name] = value.strip().decode("utf-8")
        if _H_CLEN not in headers:
            raise ValueError(f"{path}@{pos}: record missing Content-Length")
        clen = int(headers[_H_CLEN])
        payload = fh.read(clen)
        if len(payload) != clen:
            raise ValueError(
                f"{path}@{pos}: truncated payload "
                f"({len(payload)} of {clen} bytes)"
            )
        offset += clen
        # ISO 28500 terminates a record with CRLF CRLF; accept the
        # first separator as CRLF or bare LF (lenient read — archives
        # in the wild differ) and let the top-of-loop blank tolerance
        # consume the second, so strict and single-separator framings
        # both parse. Offsets are unchanged for the sink's own output.
        sep = fh.readline()
        if sep.strip(b"\r\n") != b"" or not sep:
            raise ValueError(
                f"{path}@{pos}: payload not followed by a blank "
                f"separator line (got {sep[:8]!r})"
            )
        offset += len(sep)
        yield headers, payload, pos


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warc source needs a path: .load(<path>)")
        self.path = path
        self.path_equals = options.get("pathequals")

    def pushFilters(self, filters):
        # claim NOTHING — the ntriples reader's Spark 4.1.2 branch-
        # soundness rule; pruning is option-driven
        return list(filters)

    def partitions(self):
        files = _list_warc_files(self.path)
        if not files:
            raise FileNotFoundError(
                f"no .warc/.warc.gz files under {self.path}"
            )
        if self.path_equals is not None:
            files = [p for p in files if p == self.path_equals]
            if not files:
                return [_FilePartition("")]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        opener = gzip.open if partition.path.endswith(".gz") else io.open
        with opener(partition.path, "rb") as fh:
            for headers, payload, pos in parse_warc_records(
                fh, partition.path
            ):
                yield (
                    headers.get(_H_TYPE),
                    headers.get(_H_ID),
                    headers.get(_H_URI),
                    headers.get(_H_DATE),
                    headers.get(_H_CTYPE),
                    headers.get(_H_CENC),
                    len(payload),
                    payload,
                    partition.path,
                    pos,
                )


class _Committed(WriterCommitMessage):
    def __init__(self, renames: list[tuple[str, str]], n_rows: int):
        self.renames = renames
        self.n_rows = n_rows


class WarcWriter(DataSourceWriter):
    """One .warc (or .warc.gz) file per task partition, under the SAME
    two-phase protocol as the ntriples sink (attempt-unique hidden
    temps; winners renamed at driver-side commit; overwrite deletes
    the old generation at commit, never before) — see NTriplesWriter
    for the speculative-attempt rationale.

    Input rows need (warc_type, record_id, target_uri, warc_date,
    content_type, payload); Content-Length is computed from the
    payload, never trusted from input."""

    def __init__(self, options: dict, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("warc sink needs a path: .save(<path>)")
        self.path = path
        self.overwrite = overwrite
        compression = options.get("compression", "none").lower()
        if compression not in ("none", "gzip"):
            raise ValueError(
                f"warc sink: unsupported compression {compression!r}"
            )
        self.gzip = compression == "gzip"
        import uuid

        self.job_token = "" if overwrite else f"-{uuid.uuid4().hex[:8]}"

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        ext = ".warc.gz" if self.gzip else ".warc"
        opener = gzip.open if self.gzip else io.open
        final_name = f"part-{pid:05d}{self.job_token}{ext}"
        tmp = os.path.join(self.path, f".part-{pid:05d}-{attempt}{ext}.tmp")
        n = 0
        with opener(tmp, "wb") as fh:
            for row in iterator:
                fh.write(render_record(row))
                n += 1
        return _Committed([(tmp, final_name)], n)

    def commit(self, messages) -> None:
        if self.overwrite:
            for pat in ("part-*.warc", "part-*.warc.gz"):
                for f in glob.glob(os.path.join(self.path, pat)):
                    os.remove(f)
        for m in messages:
            if m is None:
                continue
            for tmp, final_name in m.renames:
                if not os.path.exists(tmp):
                    raise IOError(
                        f"warc commit: winner temp {tmp!r} is missing — "
                        "refusing to publish an incomplete output"
                    )
                os.replace(tmp, os.path.join(self.path, final_name))
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
        for f in glob.glob(os.path.join(self.path, ".part-*.tmp")):
            try:
                os.remove(f)
            except OSError:
                pass


def render_record(row) -> bytes:
    """One WARC/1.1 record, byte-exact against parse_warc_records
    (round-trip pinned by test)."""
    payload = bytes(row.payload) if row.payload is not None else b""
    headers = [
        ("WARC-Type", row.warc_type),
        ("WARC-Record-ID", row.record_id),
        ("WARC-Target-URI", row.target_uri),
        ("WARC-Date", row.warc_date),
        ("Content-Type", row.content_type),
        # optional: gzip'd response payloads declare their transport
        # encoding (round 10 — the first thing a CommonCrawl-shaped
        # input needs); absent on rows without the column
        ("Content-Encoding", getattr(row, "content_encoding", None)),
        ("Content-Length", str(len(payload))),
    ]
    out = [b"WARC/1.1\r\n"]
    for name, value in headers:
        if value is None:
            continue
        if "\r" in str(value) or "\n" in str(value):
            raise ValueError(
                f"warc sink: header {name} value contains a line break"
            )
        out.append(f"{name}: {value}\r\n".encode("utf-8"))
    out.append(b"\r\n")
    out.append(payload)
    out.append(b"\r\n\r\n")
    return b"".join(out)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema):
        return WarcReader(self.options)

    def writer(self, schema, overwrite: bool):
        w = WarcWriter(self.options, overwrite)
        if overwrite:
            success = os.path.join(w.path, "_SUCCESS")
            if os.path.exists(success):
                os.remove(success)
        return w


def register(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcDataSource)
