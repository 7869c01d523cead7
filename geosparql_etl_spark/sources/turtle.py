"""Turtle -> triples: parse the engine's (and reference's) own TTL
output back into the queryable (subject, predicate, object, ...) shape.

The renderers (pipelines/json_etl, segmentation_etl, mongo_etl — and
the reference they byte-match, ``json-etl/geojson_to_geosparql_etl.py:
86-182``) emit a well-defined Turtle subset: ``@prefix`` headers,
subject blocks with ``;``-separated predicate-object lists and ``,``
object lists, prefixed names, ``a``, plain/typed/lang literals, and
anonymous blank nodes ``[ ... ]``. This module parses exactly that
subset — strictly (an unparseable token raises with document context;
a triple store must not silently drop statements — the ntriples
reader's rule) — so pipeline output becomes a TABLE and therefore
SPARQL-queryable without an external triple store.

Distribution: parsing is stateful per document, so it crosses to
Python ONCE per document batch via ``mapInPandas`` (the codec-family
boundary: Arrow batches, never row-at-a-time). Each document parses
independently — N output files scan N-wide with no shuffle.

Prefixed names expand with the document's own @prefix map (honest RDF
semantics); the empty IRI ``<>`` resolves to the document path (its
base); blank nodes mint document-scoped ids ``_:b<n>``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame

TURTLE_TRIPLES_SCHEMA = (
    "subject string, predicate string, object string, "
    "is_literal boolean, datatype string, lang string, path string"
)

_TOKEN = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<iri><[^>]*>)
    | (?P<dtype>\^\^)
    | (?P<lang>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<pname>[A-Za-z_][\w.-]*:[\w.%-]*|:[\w.%-]+)
    | (?P<kw_a>\ba\b)
    | (?P<num>[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)
    | (?P<punct>[\[\];,.])
    """,
    re.X,
)

_UNESCAPE = {"n": "\n", "r": "\r", "t": "\t", '"': '"', "\\": "\\"}


def _unquote(tok: str) -> str:
    return re.sub(
        r"\\(.)", lambda m: _UNESCAPE.get(m.group(1), m.group(1)), tok[1:-1]
    )


class _TurtleDoc:
    """One document's parse state (prefixes + blank-node counter)."""

    def __init__(self, text: str, path: str):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if not m:
                raise ValueError(
                    f"turtle parse error in {path!r} at: {text[pos:pos + 40]!r}"
                )
            pos = m.end()
            if m.lastgroup != "ws":
                self.toks.append((m.lastgroup, m.group()))
        self.i = 0
        self.path = path
        self.prefixes: dict[str, str] = {}
        self.bnode_n = 0
        self.out: list[tuple] = []

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        kind, tok = self.peek()
        if kind is None:
            raise ValueError(f"unexpected end of turtle document {self.path!r}")
        self.i += 1
        return kind, tok

    def expect(self, value: str) -> None:
        kind, tok = self.next()
        if tok != value:
            raise ValueError(
                f"turtle: expected {value!r}, got {tok!r} in {self.path!r}"
            )

    # -- terms ------------------------------------------------------------
    def _expand(self, pname: str) -> str:
        pfx, local = pname.split(":", 1)
        base = self.prefixes.get(pfx)
        if base is None:
            raise ValueError(
                f"turtle: undeclared prefix {pfx!r} in {self.path!r}"
            )
        return base + local

    def _iri(self, tok: str) -> str:
        inner = tok[1:-1]
        return inner if inner else self.path  # <> = base = the document

    def _bnode(self) -> str:
        self.bnode_n += 1
        return f"_:b{self.bnode_n}"

    # -- grammar ----------------------------------------------------------
    def parse(self) -> list[tuple]:
        while self.peek()[0] is not None:
            kind, tok = self.peek()
            if kind == "lang" and tok == "@prefix":
                self.next()
                _, pname = self.next()  # 'dc:' (pname) — strip colon
                _, iri = self.next()
                self.prefixes[pname.rstrip(":")] = iri[1:-1]
                self.expect(".")
                continue
            self._statement()
        return self.out

    def _subject(self) -> str:
        kind, tok = self.next()
        if kind == "iri":
            return self._iri(tok)
        if kind == "pname":
            return self._expand(tok)
        if kind == "punct" and tok == "[":
            return self._bnode_block()
        raise ValueError(f"turtle: bad subject {tok!r} in {self.path!r}")

    def _statement(self) -> None:
        s = self._subject()
        self._predicate_object_list(s)
        self.expect(".")

    def _predicate_object_list(self, s: str) -> None:
        while True:
            kind, tok = self.peek()
            if kind == "punct" and tok in (".", "]"):
                return  # dangling ';' before the terminator is legal
            p = self._predicate()
            self._objects(s, p)
            kind, tok = self.peek()
            if kind == "punct" and tok == ";":
                self.next()
                continue
            return

    def _predicate(self) -> str:
        kind, tok = self.next()
        if kind == "kw_a":
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        if kind == "iri":
            return self._iri(tok)
        if kind == "pname":
            return self._expand(tok)
        raise ValueError(f"turtle: bad predicate {tok!r} in {self.path!r}")

    def _objects(self, s: str, p: str) -> None:
        while True:
            self._object(s, p)
            kind, tok = self.peek()
            if kind == "punct" and tok == ",":
                self.next()
                continue
            return

    def _object(self, s: str, p: str) -> None:
        kind, tok = self.next()
        if kind == "iri":
            self.out.append((s, p, self._iri(tok), False, None, None))
        elif kind == "pname":
            self.out.append((s, p, self._expand(tok), False, None, None))
        elif kind == "num":
            self.out.append(
                (
                    s,
                    p,
                    tok,
                    True,
                    "http://www.w3.org/2001/XMLSchema#"
                    + ("decimal" if "." in tok or "e" in tok.lower() else "integer"),
                    None,
                )
            )
        elif kind == "string":
            lit = _unquote(tok)
            nkind, ntok = self.peek()
            if nkind == "dtype":
                self.next()
                dkind, dtok = self.next()
                dt = self._iri(dtok) if dkind == "iri" else self._expand(dtok)
                self.out.append((s, p, lit, True, dt, None))
            elif nkind == "lang":
                self.next()
                self.out.append((s, p, lit, True, None, ntok[1:]))
            else:
                self.out.append((s, p, lit, True, None, None))
        elif kind == "punct" and tok == "[":
            bn = self._bnode_block()
            self.out.append((s, p, bn, False, None, None))
        else:
            raise ValueError(f"turtle: bad object {tok!r} in {self.path!r}")

    def _bnode_block(self) -> str:
        # '[' already consumed by caller? No: callers consume '[' then
        # call; _subject/_object consume '[' and call this.
        bn = self._bnode()
        self._predicate_object_list(bn)
        self.expect("]")
        return bn


def parse_turtle_document(text: str, path: str) -> list[tuple]:
    """-> [(subject, predicate, object, is_literal, datatype, lang)]"""
    return _TurtleDoc(text, path).parse()


def turtle_to_triples(docs: DataFrame) -> DataFrame:
    """(path, text) documents -> the ntriples-source triple schema
    (so ``TripleStore.from_ntriples`` adapts it unchanged, graphs
    included: one TTL document == one named graph via ``path``)."""
    import pandas as pd

    def parse_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, text in zip(pdf["path"], pdf["text"]):
                for s, p, o, lit, dt, lang in parse_turtle_document(text, path):
                    rows.append((s, p, o, lit, dt, lang, path))
            yield pd.DataFrame(
                rows,
                columns=[
                    "subject",
                    "predicate",
                    "object",
                    "is_literal",
                    "datatype",
                    "lang",
                    "path",
                ],
            )

    return docs.select("path", "text").mapInPandas(
        parse_batches, schema=TURTLE_TRIPLES_SCHEMA
    )
