"""SPARQL layer: parser, BGP compiler, OPTIONAL/UNION/FILTER semantics,
GeoSPARQL filter functions, aggregates — checked against hand-built
tiny graphs AND the relational equivalents over the testdata tables
(the strongest cross-check: the SPARQL path goes triples -> self-joins,
the relational path never leaves the source tables; agreement proves
the compiler, the triple generation, and the lexical canon at once)."""

import pytest
from pyspark.sql import functions as F

from geosparql_etl_spark.sparql import (
    TripleStore,
    parse_query,
    sparql_select,
    tpch_triples,
)

PFX = "PREFIX ex: <urn:ex:> PREFIX geo: <geo:> PREFIX geof: <geof:> "


@pytest.fixture(scope="module")
def toy_store(spark):
    rows = [
        ("urn:p:1", "rdf:type", "urn:ex:Person"),
        ("urn:p:1", "urn:ex:name", "ada"),
        ("urn:p:1", "urn:ex:age", "36"),
        ("urn:p:1", "urn:ex:city", "urn:c:1"),
        ("urn:p:2", "rdf:type", "urn:ex:Person"),
        ("urn:p:2", "urn:ex:name", "grace"),
        ("urn:p:2", "urn:ex:age", "47"),
        ("urn:p:2", "urn:ex:city", "urn:c:2"),
        ("urn:p:3", "rdf:type", "urn:ex:Person"),
        ("urn:p:3", "urn:ex:name", "alan"),
        # p:3 has no age, no city (sparse predicates)
        ("urn:c:1", "rdf:type", "urn:ex:City"),
        ("urn:c:1", "urn:ex:name", "london"),
        ("urn:c:1", "geo:asWKT", "POINT(10 20)"),
        ("urn:c:2", "rdf:type", "urn:ex:City"),
        ("urn:c:2", "urn:ex:name", "york"),
        ("urn:c:2", "geo:asWKT", "POINT(90 90)"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    return TripleStore(df)


def run(store, q):
    return sparql_select(store, PFX + q)


class TestParser:
    def test_basic_shape(self):
        q = parse_query(
            PFX + "SELECT DISTINCT ?a ?b WHERE { ?a ex:name ?b . } "
            "ORDER BY DESC(?b) LIMIT 7"
        )
        assert q.distinct and q.limit == 7
        assert q.projections == [("var", "a"), ("var", "b")]
        assert q.order_by == [("b", False)]
        ((kind, pats),) = [(e[0], e[1]) for e in q.where.elements]
        assert kind == "bgp"
        assert pats == [(("var", "a"), ("const", "urn:ex:name"), ("var", "b"))]

    def test_a_is_rdf_type_and_literals(self):
        q = parse_query('SELECT ?x WHERE { ?x a <urn:ex:T> . ?x <urn:n> "v" }')
        pats = q.where.elements[0][1]
        assert pats[0][1] == ("const", "rdf:type")
        assert pats[1][2] == ("const", "v")

    def test_filter_precedence(self):
        q = parse_query(
            "SELECT ?x WHERE { ?x <p> ?y FILTER(?y > 1 && ?y < 5 || !(?y = 3)) }"
        )
        expr = q.where.elements[1][1]
        assert expr[0] == "or" and expr[1][0] == "and" and expr[2][0] == "not"

    def test_aggregates_group_by(self):
        q = parse_query(
            "SELECT ?g (COUNT(*) AS ?n) (SUM(?v) AS ?t) WHERE { ?x <p> ?g . "
            "?x <q> ?v } GROUP BY ?g"
        )
        assert q.group_by == ["g"]
        assert q.projections[1] == ("agg", "COUNT", None, "n")
        assert q.projections[2] == ("agg", "SUM", "v", "t")

    def test_lex_error(self):
        with pytest.raises(ValueError, match="lex error"):
            parse_query("SELECT ?x WHERE { ?x @ ?y }")


class TestToyGraph:
    def test_bgp_star_join(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?name ?cname WHERE { ?p a ex:Person . ?p ex:name ?name . "
            "?p ex:city ?c . ?c ex:name ?cname } ORDER BY ?name",
        ).collect()
        assert [(r.name, r.cname) for r in rows] == [
            ("ada", "london"),
            ("grace", "york"),
        ]

    def test_optional_unbound_is_null(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?name ?age WHERE { ?p a ex:Person . ?p ex:name ?name . "
            "OPTIONAL { ?p ex:age ?age } } ORDER BY ?name",
        ).collect()
        assert [(r.name, r.age) for r in rows] == [
            ("ada", "36"),
            ("alan", None),
            ("grace", "47"),
        ]

    def test_union(self, toy_store):
        rows = run(
            toy_store,
            "SELECT DISTINCT ?n WHERE { { ?x a ex:Person . ?x ex:name ?n } "
            "UNION { ?x a ex:City . ?x ex:name ?n } } ORDER BY ?n",
        ).collect()
        assert [r.n for r in rows] == ["ada", "alan", "grace", "london", "york"]

    def test_numeric_filter_casts_lexical(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?name WHERE { ?p ex:name ?name . ?p ex:age ?a "
            "FILTER(?a > 40.0) }",
        ).collect()
        assert [r.name for r in rows] == ["grace"]

    def test_regex_and_strstarts(self, toy_store):
        rows = run(
            toy_store,
            'SELECT ?n WHERE { ?p a ex:Person . ?p ex:name ?n '
            'FILTER(REGEX(?n, "^a") && !STRSTARTS(?n, "al")) }',
        ).collect()
        assert [r.n for r in rows] == ["ada"]

    def test_bound_after_optional(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?name WHERE { ?p a ex:Person . ?p ex:name ?name . "
            "OPTIONAL { ?p ex:age ?a } FILTER(!BOUND(?a)) }",
        ).collect()
        assert [r.name for r in rows] == ["alan"]

    def test_geof_sfwithin(self, toy_store):
        rows = run(
            toy_store,
            'SELECT ?cn WHERE { ?c geo:asWKT ?w . ?c ex:name ?cn '
            'FILTER(geof:sfWithin(?w, "POLYGON((0 0, 50 0, 50 50, 0 50, 0 0))")) }',
        ).collect()
        assert [r.cn for r in rows] == ["london"]

    def test_geof_distance(self, toy_store):
        rows = run(
            toy_store,
            'SELECT ?cn WHERE { ?c geo:asWKT ?w . ?c ex:name ?cn '
            'FILTER(geof:distance(?w, "POINT(12 21)") < 5.0) }',
        ).collect()
        assert [r.cn for r in rows] == ["london"]

    def test_subject_constant_pattern(self, toy_store):
        rows = run(
            toy_store, "SELECT ?n WHERE { <urn:p:1> ex:name ?n }"
        ).collect()
        assert [r.n for r in rows] == ["ada"]

    def test_count_group(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?t (COUNT(*) AS ?n) WHERE { ?x a ?t } GROUP BY ?t ORDER BY ?t",
        ).collect()
        assert [(r.t, r.n) for r in rows] == [
            ("urn:ex:City", 2),
            ("urn:ex:Person", 3),
        ]

    def test_vertical_partition_same_answers(self, spark, toy_store):
        vp = TripleStore.vertically_partitioned(toy_store.triples)
        q = (
            "SELECT ?name ?cname WHERE { ?p a ex:Person . ?p ex:name ?name . "
            "?p ex:city ?c . ?c ex:name ?cname } ORDER BY ?name"
        )
        assert run(vp, q).collect() == run(toy_store, q).collect()

    def test_absent_predicate_empty_not_error(self, spark, toy_store):
        vp = TripleStore.vertically_partitioned(toy_store.triples)
        assert run(vp, "SELECT ?x WHERE { ?x ex:nosuch ?y }").count() == 0


class TestAgainstRelational:
    """SPARQL-over-triples must agree with direct relational plans."""

    @pytest.fixture(scope="class")
    def store(self, spark, sf_dir):
        return TripleStore.vertically_partitioned(
            tpch_triples(spark, sf_dir).localCheckpoint()
        )

    def test_chain_join_vs_relational(self, spark, sf_dir, store):
        got = run(
            store,
            "SELECT ?cname ?nname WHERE { ?c a ex:Customer . ?c ex:name ?cname . "
            "?c ex:acctbal ?bal . ?c ex:nation ?n . ?n ex:name ?nname . "
            '?n ex:region ?r . ?r ex:name "ASIA" FILTER(?bal > 9000.0) } '
            "ORDER BY ?cname",
        ).collect()
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
        reg = spark.read.parquet(f"{sf_dir}/region.parquet")
        want = (
            cust.join(nat, cust.c_nationkey == nat.n_nationkey)
            .join(reg, nat.n_regionkey == reg.r_regionkey)
            .where((F.col("r_name") == "ASIA") & (F.col("c_acctbal") > 9000.0))
            .select(F.col("c_name").alias("cname"), F.col("n_name").alias("nname"))
            .orderBy("cname")
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert len(got) > 0

    def test_sparse_vip_matches_threshold(self, spark, sf_dir, store):
        got = run(store, "SELECT ?c WHERE { ?c ex:vip ?v }").count()
        want = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .where(F.col("c_acctbal") > 9000)
            .count()
        )
        assert got == want

    def test_geo_filter_vs_arithmetic(self, spark, sf_dir, store):
        got = run(
            store,
            "SELECT ?s WHERE { ?s geo:asWKT ?w FILTER(geof:sfWithin(?w, "
            '"POLYGON((5.5 4.5, 74.5 4.5, 74.5 80.5, 5.5 80.5, 5.5 4.5))")) }',
        ).count()
        supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        x = (F.col("s_suppkey") * 37) % 100
        y = (F.col("s_suppkey") * 61) % 100
        want = supp.where(
            (x > 5.5) & (x < 74.5) & (y > 4.5) & (y < 80.5)
        ).count()
        assert got == want and got > 0


class TestSparql11Extensions:
    """MINUS / EXISTS / VALUES / property paths / CONSTRUCT."""

    def test_minus(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?name WHERE { ?p a ex:Person . ?p ex:name ?name "
            "MINUS { ?p ex:city ?c } } ORDER BY ?name",
        ).collect()
        assert [r.name for r in rows] == ["alan"]

    def test_not_exists(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?name WHERE { ?p a ex:Person . ?p ex:name ?name "
            "FILTER NOT EXISTS { ?p ex:age ?a } }",
        ).collect()
        assert [r.name for r in rows] == ["alan"]

    def test_exists(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?name WHERE { ?p a ex:Person . ?p ex:name ?name "
            "FILTER EXISTS { ?p ex:city ?c } } ORDER BY ?name",
        ).collect()
        assert [r.name for r in rows] == ["ada", "grace"]

    def test_values(self, toy_store):
        rows = run(
            toy_store,
            'SELECT ?name WHERE { VALUES ?name { "ada" "alan" "nobody" } '
            "?p ex:name ?name . ?p a ex:Person } ORDER BY ?name",
        ).collect()
        assert [r.name for r in rows] == ["ada", "alan"]

    def test_path_sequence(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?name ?cname WHERE { ?p ex:name ?name . "
            "?p ex:city/ex:name ?cname } ORDER BY ?name",
        ).collect()
        assert [(r.name, r.cname) for r in rows] == [
            ("ada", "london"),
            ("grace", "york"),
        ]

    def test_path_inverse(self, toy_store):
        rows = run(
            toy_store,
            'SELECT ?name WHERE { ?c ex:name "london" . ?c ^ex:city ?p . '
            "?p ex:name ?name }",
        ).collect()
        assert [r.name for r in rows] == ["ada"]

    def test_path_alternation(self, toy_store):
        rows = run(
            toy_store,
            "SELECT DISTINCT ?v WHERE { ?p a ex:Person . "
            "?p ex:age|ex:name ?v } ORDER BY ?v",
        ).collect()
        assert [r.v for r in rows] == ["36", "47", "ada", "alan", "grace"]

    def test_path_plus_closure(self, spark):
        # chain a -> b -> c -> d: closure has 3+2+1 pairs
        rows = [(x, "urn:ex:next", y) for x, y in
                [("a", "b"), ("b", "c"), ("c", "d")]]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(store, "SELECT ?x ?y WHERE { ?x ex:next+ ?y }").collect()
        assert sorted((r.x, r.y) for r in got) == [
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"), ("c", "d"),
        ]

    def test_path_plus_cycle_terminates(self, spark):
        rows = [("a", "p", "b"), ("b", "p", "a")]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(store, "SELECT ?x ?y WHERE { ?x <p>+ ?y }").collect()
        # cycle: every node reaches both nodes (including itself)
        assert sorted((r.x, r.y) for r in got) == [
            ("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"),
        ]

    def test_construct(self, toy_store):
        g = run(
            toy_store,
            "CONSTRUCT { ?p ex:locatedIn ?cname } WHERE { "
            "?p ex:city ?c . ?c ex:name ?cname }",
        ).collect()
        assert sorted((r.s, r.p, r.o) for r in g) == [
            ("urn:p:1", "urn:ex:locatedIn", "london"),
            ("urn:p:2", "urn:ex:locatedIn", "york"),
        ]

    def test_path_var_modifier_rejected(self):
        with pytest.raises(ValueError, match="constant IRI"):
            parse_query("SELECT ?x WHERE { ?x ^?p ?y }")

    def test_ask_true_false(self, toy_store):
        yes = run(toy_store, 'ASK { ?p ex:name "ada" }').collect()
        no = run(toy_store, 'ASK { ?p ex:name "turing" }').collect()
        assert [r.ask for r in yes] == [True]
        assert [r.ask for r in no] == [False]

    def test_describe(self, toy_store):
        g = run(
            toy_store,
            "DESCRIBE ?p WHERE { ?p ex:age ?a FILTER(?a > 40.0) }",
        ).collect()
        assert sorted((r.s, r.p, r.o) for r in g) == [
            ("urn:p:2", "rdf:type", "urn:ex:Person"),
            ("urn:p:2", "urn:ex:age", "47"),
            ("urn:p:2", "urn:ex:city", "urn:c:2"),
            ("urn:p:2", "urn:ex:name", "grace"),
        ]


class TestNTriplesLoop:
    """The full RDF loop: CONSTRUCT a new graph from a query, persist
    it through the registered ntriples table format, read it back as
    a table, and SPARQL-query the result — ETL output that is
    immediately queryable by the same engine."""

    def test_construct_write_read_query(self, spark, toy_store, tmp_path):
        from geosparql_etl_spark.sources.ntriples import register
        from geosparql_etl_spark.sparql.triples import to_ntriples_rows

        register(spark)
        g = run(
            toy_store,
            "CONSTRUCT { ?p ex:locatedIn ?cname } WHERE { "
            "?p ex:city ?c . ?c ex:name ?cname }",
        )
        out = str(tmp_path / "constructed")
        to_ntriples_rows(g).write.format("ntriples").mode("overwrite").save(out)

        back = spark.read.format("ntriples").load(out)
        # IRIs stayed IRIs, city names stayed literals
        assert back.where(F.col("is_literal")).count() == 2
        store2 = TripleStore.from_ntriples(back)
        rows = sparql_select(
            store2, PFX + 'SELECT ?p WHERE { ?p ex:locatedIn "london" }'
        ).collect()
        assert [r.p for r in rows] == ["urn:p:1"]


class TestPlanShape:
    def test_constant_predicate_scans_pruned_slice(self, spark, toy_store):
        """Vertical store: a bound-predicate scan must not touch the
        full triples frame (the in-memory analog of partition
        pruning)."""
        vp = TripleStore.vertically_partitioned(toy_store.triples)
        df = sparql_select(vp, PFX + "SELECT ?n WHERE { ?x ex:name ?n }")
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # the pruned slice carries no 'p' column through the plan
        assert "p#" not in plan.split("\n")[0]

    def test_star_join_single_key(self, spark, toy_store):
        """All three patterns of a subject star join on s — the plan
        contains equi-joins only (no cartesian)."""
        df = sparql_select(
            toy_store,
            PFX + "SELECT ?a ?b WHERE { ?x ex:name ?a . ?x ex:age ?b . "
            "?x a ex:Person }",
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_construct_ask_describe_reject_trailing_modifiers():
    from geosparql_etl_spark.sparql import parse_query as pq

    for q in (
        "CONSTRUCT { ?s <p> ?o } WHERE { ?s <p> ?o } LIMIT 10",
        "ASK { ?s <p> ?o } ORDER BY ?s",
        "DESCRIBE ?s WHERE { ?s <p> ?o } LIMIT 5",
    ):
        with pytest.raises(ValueError, match="SELECT-only"):
            pq(q)


class TestAggExtensions:
    def test_group_concat_sorted_and_sample(self, toy_store):
        rows = run(
            toy_store,
            'SELECT ?t (GROUP_CONCAT(?n; SEPARATOR="|") AS ?names) '
            "(SAMPLE(?n) AS ?first) WHERE { ?x a ?t . ?x ex:name ?n } "
            "GROUP BY ?t ORDER BY ?t",
        ).collect()
        assert [(r.t, r.names, r.first) for r in rows] == [
            ("urn:ex:City", "london|york", "london"),
            ("urn:ex:Person", "ada|alan|grace", "ada"),
        ]

    def test_having(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?t (COUNT(*) AS ?n) WHERE { ?x a ?t } GROUP BY ?t "
            "HAVING(?n > 2)",
        ).collect()
        assert [(r.t, r.n) for r in rows] == [("urn:ex:Person", 3)]


class TestNamedGraphs:
    @pytest.fixture(scope="class")
    def quad_store(self, spark):
        rows = [
            ("urn:p:1", "urn:ex:name", "ada", "urn:g:hr"),
            ("urn:p:2", "urn:ex:name", "grace", "urn:g:hr"),
            ("urn:p:1", "urn:ex:name", "ada-2024", "urn:g:archive"),
            ("urn:p:3", "urn:ex:name", "alan", "urn:g:archive"),
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string, g string")
        )

    def test_graph_constant_scopes(self, quad_store):
        rows = run(
            quad_store,
            "SELECT ?n WHERE { GRAPH <urn:g:hr> { ?s ex:name ?n } } ORDER BY ?n",
        ).collect()
        assert [r.n for r in rows] == ["ada", "grace"]

    def test_graph_variable_binds_and_joins(self, quad_store):
        rows = run(
            quad_store,
            "SELECT ?g ?n WHERE { GRAPH ?g { <urn:p:1> ex:name ?n } } ORDER BY ?g",
        ).collect()
        assert [(r.g, r.n) for r in rows] == [
            ("urn:g:archive", "ada-2024"),
            ("urn:g:hr", "ada"),
        ]

    def test_graph_scope_keeps_patterns_in_one_graph(self, spark):
        # cross-graph chain: s->m in g1, m->o only in g2 — a scoped
        # 2-pattern BGP must NOT stitch across graphs
        rows = [
            ("a", "p", "m", "g1"),
            ("m", "q", "z", "g2"),
            ("b", "p", "n", "g2"),
            ("n", "q", "y", "g2"),
        ]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string, g string")
        )
        got = sparql_select(
            store,
            "SELECT ?s ?o WHERE { GRAPH ?g { ?s <p> ?m . ?m <q> ?o } }",
        ).collect()
        assert [(r.s, r.o) for r in got] == [("b", "y")]

    def test_graph_on_triple_store_rejected(self, toy_store):
        with pytest.raises(ValueError, match="quad store"):
            run(toy_store, "SELECT ?n WHERE { GRAPH ?g { ?s ex:name ?n } }").collect()

    def test_ntriples_files_are_graphs(self, spark, tmp_path):
        from geosparql_etl_spark.sources.ntriples import register

        register(spark)
        a = tmp_path / "a.nt"
        b = tmp_path / "b.nt"
        a.write_text("<urn:s:1> <urn:p:name> \"one\" .\n")
        b.write_text("<urn:s:2> <urn:p:name> \"two\" .\n")
        df = spark.read.format("ntriples").load(str(tmp_path))
        store = TripleStore.from_ntriples(df, with_graphs=True)
        rows = sparql_select(
            store,
            "SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } } "
            "GROUP BY ?g ORDER BY ?g",
        ).collect()
        assert [(r.g.split("/")[-1], r.n) for r in rows] == [
            ("a.nt", 1),
            ("b.nt", 1),
        ]


class TestSubqueries:
    def test_subquery_aggregate_joins_outer(self, toy_store):
        # max age via subquery, joined back to find who has it
        rows = run(
            toy_store,
            "SELECT ?name ?m WHERE { "
            "{ SELECT (MAX(?a) AS ?m) WHERE { ?x ex:age ?a } } "
            "?p ex:age ?m . ?p ex:name ?name }",
        ).collect()
        # MAX returns the winning TERM: the original stored lexical "47",
        # not a canonicalized copy — which is exactly why the join back
        # onto `?p ex:age ?m` matches string=string
        assert [(r.name, str(r.m)) for r in rows] == [("grace", "47")]

    def test_subquery_group_by(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?t ?n WHERE { "
            "{ SELECT ?t (COUNT(*) AS ?n) WHERE { ?x a ?t } GROUP BY ?t } "
            "} ORDER BY ?t",
        ).collect()
        assert [(r.t, r.n) for r in rows] == [
            ("urn:ex:City", 2),
            ("urn:ex:Person", 3),
        ]

    def test_subquery_limit_stays_inside(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?n WHERE { "
            "{ SELECT ?n WHERE { ?p a ex:Person . ?p ex:name ?n } "
            "ORDER BY ?n LIMIT 2 } }",
        ).collect()
        assert sorted(r.n for r in rows) == ["ada", "alan"]


class TestReviewFixes:
    def test_having_without_aggregates_rejected(self, toy_store):
        with pytest.raises(ValueError, match="HAVING"):
            run(
                toy_store,
                "SELECT ?x WHERE { ?s ex:name ?x } HAVING(?x > 5)",
            )

    def test_group_by_without_aggregates_is_distinct_keys(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?t WHERE { ?x a ?t } GROUP BY ?t ORDER BY ?t",
        ).collect()
        assert [r.t for r in rows] == ["urn:ex:City", "urn:ex:Person"]

    def test_path_inside_constant_graph_stays_scoped(self, spark):
        rows = [
            ("a", "p", "m", "g1"),
            ("m", "q", "z", "g1"),
            ("b", "p", "n", "g1"),
            ("n", "q", "y", "g2"),  # second hop in the OTHER graph
        ]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string, g string")
        )
        got = sparql_select(
            store,
            "SELECT ?s ?o WHERE { GRAPH <g1> { ?s <p>/<q> ?o } }",
        ).collect()
        assert [(r.s, r.o) for r in got] == [("a", "z")]

    def test_path_inside_variable_graph_threads_g(self, spark):
        # round-6 upgrade (was a loud rejection): seq paths inside
        # GRAPH ?g join every hop on the graph column — a path whose
        # hops live in DIFFERENT graphs must not compose
        store = TripleStore(
            spark.createDataFrame(
                [
                    ("a", "p", "m", "g1"), ("m", "q", "b", "g2"),  # split
                    ("x", "p", "n", "g1"), ("n", "q", "y", "g1"),  # same
                ],
                "s string, p string, o string, g string",
            )
        )
        rows = sparql_select(
            store, "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s <p>/<q> ?o } }"
        ).collect()
        assert [(r.g, r.s, r.o) for r in rows] == [("g1", "x", "y")]

    def test_graph_var_position_collision_rejected(self, spark):
        store = TripleStore(
            spark.createDataFrame(
                [("a", "p", "b", "g1")], "s string, p string, o string, g string"
            )
        )
        with pytest.raises(ValueError, match="also used"):
            sparql_select(
                store, "SELECT ?g WHERE { GRAPH ?g { ?s ?g ?o } }"
            ).collect()


class TestSparqlUpdate:
    def test_delete_insert_renames_predicate(self, toy_store):
        from geosparql_etl_spark.sparql import sparql_update

        g = sparql_update(
            toy_store,
            PFX + "DELETE { ?p ex:age ?a } INSERT { ?p ex:years ?a } "
            "WHERE { ?p ex:age ?a }",
        )
        assert g.where(F.col("p") == "urn:ex:age").count() == 0
        got = sorted(
            (r.s, r.o) for r in g.where(F.col("p") == "urn:ex:years").collect()
        )
        assert got == [("urn:p:1", "36"), ("urn:p:2", "47")]
        # untouched triples survive
        assert g.count() == toy_store.triples.count()

    def test_delete_where_shorthand(self, toy_store):
        from geosparql_etl_spark.sparql import sparql_update

        g = sparql_update(
            toy_store, PFX + "DELETE WHERE { ?c a ex:City . ?c ex:name ?n }"
        )
        # both matched patterns' instantiations are gone
        assert g.where(F.col("o") == "urn:ex:City").count() == 0
        assert g.where(F.col("o") == "london").count() == 0
        # people's names untouched
        assert g.where(F.col("o") == "ada").count() == 1

    def test_insert_is_set_semantics(self, toy_store):
        from geosparql_etl_spark.sparql import sparql_update

        g = sparql_update(
            toy_store,
            PFX + 'INSERT { ?p ex:flag "x" } WHERE { ?p a ex:Person }',
        )
        # inserting twice changes nothing
        g2 = sparql_update(
            TripleStore(g),
            PFX + 'INSERT { ?p ex:flag "x" } WHERE { ?p a ex:Person }',
        )
        assert g.count() == g2.count() == toy_store.triples.count() + 3

    def test_update_through_select_rejected(self, toy_store):
        with pytest.raises(ValueError, match="sparql_update"):
            run(toy_store, "DELETE { ?s ?p ?o } INSERT { } WHERE { ?s ?p ?o }")

    def test_urn_rewrite_like_reference(self, toy_store):
        """The reference's hash-update surgery (rewrite URNs, keep the
        rest) as one declarative statement."""
        from geosparql_etl_spark.sparql import sparql_update

        g = sparql_update(
            toy_store,
            PFX + "DELETE { ?c ex:city ?old } INSERT { ?c ex:cityRef ?old } "
            'WHERE { ?c ex:city ?old FILTER(CONTAINS(?old, "urn:c:")) }',
        )
        assert g.where(F.col("p") == "urn:ex:city").count() == 0
        assert g.where(F.col("p") == "urn:ex:cityRef").count() == 2


class TestGraphScopeComposition:
    @pytest.fixture(scope="class")
    def qstore(self, spark):
        rows = [
            ("urn:p:1", "urn:ex:name", "ada", "urn:g:hr"),
            ("urn:p:1", "urn:ex:age", "36", "urn:g:hr"),
            ("urn:p:2", "urn:ex:name", "grace", "urn:g:hr"),
            ("urn:p:9", "urn:ex:name", "zuse", "urn:g:archive"),
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string, g string")
        )

    def test_optional_inside_graph(self, qstore):
        rows = run(
            qstore,
            "SELECT ?n ?a WHERE { GRAPH <urn:g:hr> { ?p ex:name ?n "
            "OPTIONAL { ?p ex:age ?a } } } ORDER BY ?n",
        ).collect()
        assert [(r.n, r.a) for r in rows] == [("ada", "36"), ("grace", None)]

    def test_union_inside_graph(self, qstore):
        rows = run(
            qstore,
            "SELECT DISTINCT ?v WHERE { GRAPH <urn:g:hr> { "
            "{ ?p ex:name ?v } UNION { ?p ex:age ?v } } } ORDER BY ?v",
        ).collect()
        assert [r.v for r in rows] == ["36", "ada", "grace"]


def test_vertical_parquet_lake_partition_pruning(spark, sf_dir, tmp_path):
    """The SCALE.md claim made real: persist the graph partitionBy("p")
    and a bound-predicate SPARQL pattern must show the predicate in the
    scan's PartitionFilters — directory pruning by Spark itself, not
    the in-memory vertical simulation."""
    from geosparql_etl_spark.sparql.triples import tpch_triples

    lake = str(tmp_path / "lake")
    tpch_triples(spark, sf_dir).write.partitionBy("p").parquet(lake)
    store = TripleStore(spark.read.parquet(lake))
    df = sparql_select(
        store, PFX + "SELECT ?c ?bal WHERE { ?c ex:acctbal ?bal }"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "urn:ex:acctbal" in plan
    # and the values are right (spot check against the source table)
    n = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert df.count() == n


class TestRound6:
    """Round-6 surface: lexer '<' disambiguation, BIND, SELECT
    expressions, zero-length paths, GRAPH-threaded paths, rdf:type
    form aliasing, numeric VALUES, quad-update guard."""

    def test_filter_lt_before_gt(self, toy_store):
        # the old greedy IRI rule <[^>]*> swallowed "< 47 && ?a >" as a
        # bogus IRI token; this ordering must lex as comparisons
        rows = run(
            toy_store,
            "SELECT ?n WHERE { ?p ex:name ?n . ?p ex:age ?a "
            "FILTER(?a < 47.0 && ?a > 1.0) }",
        ).collect()
        assert [r.n for r in rows] == ["ada"]

    def test_lt_filter_then_iri(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?n WHERE { ?p ex:age ?a FILTER(?a < 40.0) . "
            "?p <urn:ex:name> ?n }",
        ).collect()
        assert [r.n for r in rows] == ["ada"]

    def test_bind_arithmetic(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?n ?decade WHERE { ?p ex:name ?n . ?p ex:age ?a "
            "BIND(FLOOR(?a / 10) AS ?decade) } ORDER BY ?n",
        ).collect()
        assert [(r.n, r.decade) for r in rows] == [("ada", 3), ("grace", 4)]

    def test_bind_string_functions(self, toy_store):
        rows = run(
            toy_store,
            'SELECT ?tag WHERE { ?p ex:name ?n '
            'BIND(CONCAT(UCASE(?n), "-", STR(STRLEN(?n))) AS ?tag) '
            'FILTER(STRSTARTS(?n, "ad")) }',
        ).collect()
        assert [r.tag for r in rows] == ["ADA-3"]

    def test_bind_rebind_rejected(self, toy_store):
        with pytest.raises(ValueError, match="rebind"):
            run(toy_store, "SELECT ?n WHERE { ?p ex:name ?n BIND(1 AS ?n) }")

    def test_bind_opens_group(self, toy_store):
        rows = run(toy_store, "SELECT ?v WHERE { BIND(2 + 3 AS ?v) }").collect()
        assert [r.v for r in rows] == [5.0]

    def test_select_expression_over_aggregate_alias(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?t (COUNT(*) AS ?n) (?n * 10 AS ?pct) WHERE { ?x a ?t } "
            "GROUP BY ?t ORDER BY ?t",
        ).collect()
        assert [(r.t, r.n, r.pct) for r in rows] == [
            ("urn:ex:City", 2, 20.0),
            ("urn:ex:Person", 3, 30.0),
        ]

    @pytest.fixture(scope="class")
    def chain_store(self, spark):
        # 1 -> 2 -> 3 -> 4, plus island 9
        rows = [(str(i), "urn:ex:next", str(i + 1)) for i in (1, 2, 3)]
        rows.append(("9", "urn:ex:self", "9"))
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_star_is_identity_union_closure(self, chain_store):
        rows = run(
            chain_store, "SELECT ?o WHERE { <2> ex:next* ?o }"
        ).collect()
        assert sorted(r.o for r in rows) == ["2", "3", "4"]

    def test_opt_is_identity_union_hop(self, chain_store):
        rows = run(
            chain_store, "SELECT ?o WHERE { <2> ex:next? ?o }"
        ).collect()
        assert sorted(r.o for r in rows) == ["2", "3"]

    def test_star_identity_covers_all_nodes(self, chain_store):
        # ?x p* ?x holds for EVERY node in the graph (zero-length match),
        # including nodes with no p edge at all
        rows = run(chain_store, "SELECT ?x WHERE { ?x ex:next* ?x }").collect()
        assert sorted(r.x for r in rows) == ["1", "2", "3", "4", "9"]

    def test_constant_endpoints_path_is_existence(self, chain_store):
        rows = run(
            chain_store,
            "SELECT ?o WHERE { <1> ex:next+ <4> . <9> ex:self ?o }",
        ).collect()
        assert [r.o for r in rows] == ["9"]
        # and a FALSE reachability test yields zero rows, not an error
        assert (
            run(
                chain_store,
                "SELECT ?o WHERE { <4> ex:next+ <1> . <9> ex:self ?o }",
            ).count()
            == 0
        )

    def test_path_closure_uses_reliable_checkpoint_dir(
        self, spark, chain_store, tmp_path
    ):
        # judge round-5 nit: _path_df must route through util.cut_lineage
        # so a configured checkpoint dir gives executor-loss recovery
        sc = spark.sparkContext
        ckpt = tmp_path / "ckpt"
        try:
            sc.setCheckpointDir(str(ckpt))
            rows = run(
                chain_store, "SELECT ?o WHERE { <1> ex:next+ ?o }"
            ).collect()
        finally:
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(
                sc._jvm.scala.Option.empty()
            )
        assert sorted(r.o for r in rows) == ["2", "3", "4"]
        written = [p for p in ckpt.rglob("*") if p.is_file()]
        assert written, "closure did not write to the reliable checkpoint dir"

    def test_star_inside_variable_graph(self, spark):
        # chain split across graphs: g1 holds 1->2, g2 holds 2->3.
        # closure must stay within each graph; identity rows appear per
        # graph over that graph's nodes.
        quads = spark.createDataFrame(
            [("1", "urn:ex:n", "2", "g1"), ("2", "urn:ex:n", "3", "g2")],
            "s string, p string, o string, g string",
        )
        rows = run(
            TripleStore(quads),
            "SELECT ?g ?o WHERE { GRAPH ?g { <2> ex:n* ?o } }",
        ).collect()
        assert sorted((r.g, r.o) for r in rows) == [
            ("g1", "2"),  # identity (2 is a node of g1)
            ("g2", "2"),  # identity
            ("g2", "3"),  # one hop within g2
        ]

    def test_values_numeric_literals(self, spark):
        store = TripleStore(
            spark.createDataFrame(
                [("a", "urn:ex:v", "5"), ("b", "urn:ex:v", "7")],
                "s string, p string, o string",
            )
        )
        rows = run(
            store, "SELECT ?s WHERE { ?s ex:v ?v VALUES ?v { 5 10 } }"
        ).collect()
        assert [r.s for r in rows] == ["a"]

    def test_a_keyword_over_turtle_loaded_store(self, spark):
        # ADVICE round-5: turtle expands 'a' to the full rdf-syntax-ns
        # IRI while the compiler's 'a' is compact "rdf:type" — scans
        # must treat the two forms as the same predicate
        from geosparql_etl_spark.sources.turtle import turtle_to_triples

        ttl = (
            "@prefix ex: <urn:ex:> .\n"
            "<urn:p:1> a ex:Thing ; ex:name \"ada\" .\n"
        )
        docs = spark.createDataFrame(
            [("mem://doc.ttl", ttl)], "path string, text string"
        )
        store = TripleStore.from_ntriples(turtle_to_triples(docs))
        rows = run(
            store, "SELECT ?n WHERE { ?s a ex:Thing . ?s ex:name ?n }"
        ).collect()
        assert [r.n for r in rows] == ["ada"]
        # and the vertical layout takes the same alias path
        vp = TripleStore.vertically_partitioned(store.triples)
        assert run(vp, "SELECT ?s WHERE { ?s a ex:Thing }").count() == 1

    def test_update_on_quad_store_rejected(self, spark):
        from geosparql_etl_spark.sparql.compiler import sparql_update

        store = TripleStore(
            spark.createDataFrame(
                [("a", "p", "b", "g1")], "s string, p string, o string, g string"
            )
        )
        with pytest.raises(ValueError, match="quad store"):
            sparql_update(store, "DELETE WHERE { ?s <p> ?o }")


class TestRound6Modifiers:
    """OFFSET, ORDER BY expressions, IN, COALESCE/IF (round 6)."""

    def test_order_by_expression_numeric(self, toy_store):
        # lexical ages "36" < "47" as strings too, so force a numeric
        # DESC through an expression and check the order flips
        rows = run(
            toy_store,
            "SELECT ?n WHERE { ?p ex:name ?n . ?p ex:age ?a } "
            "ORDER BY DESC(?a * 1) ?n",
        ).collect()
        assert [r.n for r in rows] == ["grace", "ada"]

    def test_limit_offset_paging(self, toy_store):
        q = "SELECT ?n WHERE { ?p a ex:Person . ?p ex:name ?n } ORDER BY ?n "
        assert [r.n for r in run(toy_store, q + "LIMIT 2").collect()] == [
            "ada", "alan",
        ]
        assert [
            r.n for r in run(toy_store, q + "LIMIT 2 OFFSET 1").collect()
        ] == ["alan", "grace"]
        assert [
            r.n for r in run(toy_store, q + "OFFSET 2").collect()
        ] == ["grace"]

    def test_in_operator_strings(self, toy_store):
        rows = run(
            toy_store,
            'SELECT ?n WHERE { ?p ex:name ?n FILTER(?n IN ("ada", "alan")) } '
            "ORDER BY ?n",
        ).collect()
        assert [r.n for r in rows] == ["ada", "alan"]

    def test_in_operator_numeric(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?n WHERE { ?p ex:name ?n . ?p ex:age ?a "
            "FILTER(?a IN (36, 99)) }",
        ).collect()
        assert [r.n for r in rows] == ["ada"]

    def test_coalesce_after_optional(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?n ?age WHERE { ?p a ex:Person . ?p ex:name ?n "
            'OPTIONAL { ?p ex:age ?a } BIND(COALESCE(?a, "unknown") AS ?age) '
            "} ORDER BY ?n",
        ).collect()
        assert [(r.n, r.age) for r in rows] == [
            ("ada", "36"), ("alan", "unknown"), ("grace", "47"),
        ]

    def test_if_expression(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?n ?cohort WHERE { ?p ex:name ?n . ?p ex:age ?a "
            'BIND(IF(?a > 40.0, "older", "younger") AS ?cohort) } ORDER BY ?n',
        ).collect()
        assert [(r.n, r.cohort) for r in rows] == [
            ("ada", "younger"), ("grace", "older"),
        ]


class TestRound6TurtleSugar:
    """Predicate-object lists (';' / ',') in BGPs and the SPARQL
    string functions SUBSTR/REPLACE/STRBEFORE/STRAFTER (round 6)."""

    def test_predicate_object_lists(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?name ?cname WHERE { "
            "?p a ex:Person ; ex:name ?name ; ex:city ?c . "
            "?c ex:name ?cname } ORDER BY ?name",
        ).collect()
        assert [(r.name, r.cname) for r in rows] == [
            ("ada", "london"), ("grace", "york"),
        ]

    def test_object_list_requires_all(self, toy_store):
        # s p o1 , o2 expands to TWO patterns on the same (s, p): only
        # subjects carrying BOTH objects match (none here — names are
        # functional in the toy graph)
        assert (
            run(
                toy_store,
                'SELECT ?p WHERE { ?p ex:name "ada" , "grace" }',
            ).count()
            == 0
        )
        # and a type + name pair through ',' on rdf:type works
        rows = run(
            toy_store,
            "SELECT ?n WHERE { ?p a ex:Person ; ex:name ?n "
            'FILTER(STRSTARTS(?n, "a")) } ORDER BY ?n',
        ).collect()
        assert [r.n for r in rows] == ["ada", "alan"]

    def test_dangling_semicolon(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?n WHERE { ?p a ex:Person ; ex:name ?n ; . } ORDER BY ?n",
        ).collect()
        assert [r.n for r in rows] == ["ada", "alan", "grace"]

    def test_substr_and_replace(self, toy_store):
        rows = run(
            toy_store,
            "SELECT ?s ?r WHERE { ?p ex:name ?n "
            "BIND(SUBSTR(?n, 1, 2) AS ?s) "
            'BIND(REPLACE(?n, "[aeiou]", "_") AS ?r) '
            'FILTER(?n = "grace") }',
        ).collect()
        assert [(r.s, r.r) for r in rows] == [("gr", "gr_c_")]

    def test_strbefore_strafter(self, spark):
        store = TripleStore(
            spark.createDataFrame(
                [("urn:p:1", "urn:ex:email", "ada@example.org")],
                "s string, p string, o string",
            )
        )
        rows = run(
            store,
            "SELECT ?u ?d ?m WHERE { ?p ex:email ?e "
            'BIND(STRBEFORE(?e, "@") AS ?u) BIND(STRAFTER(?e, "@") AS ?d) '
            'BIND(STRBEFORE(?e, "zzz") AS ?m) }',
        ).collect()
        assert [(r.u, r.d, r.m) for r in rows] == [
            ("ada", "example.org", ""),  # absent substring -> "" per spec
        ]


class TestRound6PathsAndTerms:
    """Negated property sets, COUNT(DISTINCT), isIRI/isLiteral/isBlank
    (round 6)."""

    @pytest.fixture(scope="class")
    def mixed(self, spark):
        return TripleStore(
            spark.createDataFrame(
                [
                    ("urn:a", "urn:ex:knows", "urn:b"),
                    ("urn:a", "urn:ex:hates", "urn:c"),
                    ("urn:a", "rdf:type", "urn:ex:T"),
                    ("urn:a", "urn:ex:label", "alpha"),
                    ("urn:a", "urn:ex:note", "_:blank1"),
                ],
                "s string, p string, o string",
            )
        )

    def test_negated_property_set(self, mixed):
        rows = run(
            mixed,
            "SELECT ?o WHERE { <urn:a> !(ex:hates|ex:label|ex:note) ?o } "
            "ORDER BY ?o",
        ).collect()
        assert [r.o for r in rows] == ["urn:b", "urn:ex:T"]

    def test_negated_single_and_type_alias(self, mixed):
        # negating 'a' (rdf:type) must exclude BOTH lexical type forms
        rows = run(
            mixed,
            "SELECT ?o WHERE { <urn:a> !a ?o } ORDER BY ?o",
        ).collect()
        assert "urn:ex:T" not in [r.o for r in rows]
        assert len(rows) == 4

    def test_negated_set_rejects_variable(self, mixed):
        with pytest.raises(ValueError, match="constant IRIs"):
            run(mixed, "SELECT ?o WHERE { <urn:a> !(?p) ?o }")

    def test_count_distinct(self, spark):
        store = TripleStore(
            spark.createDataFrame(
                [
                    ("o1", "urn:ex:cust", "c1"),
                    ("o2", "urn:ex:cust", "c1"),
                    ("o3", "urn:ex:cust", "c2"),
                ],
                "s string, p string, o string",
            )
        )
        rows = run(
            store,
            "SELECT (COUNT(?o) AS ?n) (COUNT(DISTINCT ?c) AS ?d) "
            "WHERE { ?o ex:cust ?c }",
        ).collect()
        assert [(r.n, r.d) for r in rows] == [(3, 2)]

    def test_is_term_tests(self, mixed):
        got = {
            fn: sorted(
                r.o
                for r in run(
                    mixed,
                    f"SELECT ?o WHERE {{ <urn:a> ?p ?o FILTER({fn}(?o)) }}",
                ).collect()
            )
            for fn in ("isIRI", "isLiteral", "isBlank")
        }
        assert got["isIRI"] == ["urn:b", "urn:c", "urn:ex:T"]
        assert got["isLiteral"] == ["alpha"]
        assert got["isBlank"] == ["_:blank1"]


class TestRound6WithGraph:
    """WITH <g>: SPARQL Update scoped to one named graph of a quad
    store (round 6 — replaces the unconditional quad-store rejection)."""

    @pytest.fixture()
    def quads(self, spark):
        return TripleStore(
            spark.createDataFrame(
                [
                    ("a", "urn:ex:st", "draft", "g1"),
                    ("b", "urn:ex:st", "draft", "g2"),
                    ("a", "urn:ex:lock", "y", "g1"),
                ],
                "s string, p string, o string, g string",
            )
        )

    def test_with_updates_only_named_graph(self, quads):
        from geosparql_etl_spark.sparql.compiler import sparql_update

        out = sparql_update(
            quads,
            'WITH <g1> DELETE { ?s <urn:ex:st> "draft" } '
            'INSERT { ?s <urn:ex:st> "review" } '
            'WHERE { ?s <urn:ex:st> "draft" }',
        )
        assert sorted(tuple(r) for r in out.collect()) == [
            ("a", "urn:ex:lock", "y", "g1"),
            ("a", "urn:ex:st", "review", "g1"),   # rewritten in g1
            ("b", "urn:ex:st", "draft", "g2"),    # g2 untouched
        ]

    def test_with_bindings_are_graph_scoped(self, quads):
        # the WHERE pattern matches in g2 as well, but WITH <g1> must
        # bind only within g1 — so the g2 subject never reaches the
        # insert template even if the template row would land in g1
        from geosparql_etl_spark.sparql.compiler import sparql_update

        out = sparql_update(
            quads,
            'WITH <g1> INSERT { ?s <urn:ex:seen> "1" } '
            'WHERE { ?s <urn:ex:st> "draft" }',
        )
        ins = [r.s for r in out.collect() if r.p == "urn:ex:seen"]
        assert ins == ["a"]

    def test_unscoped_quad_update_still_rejected(self, quads):
        from geosparql_etl_spark.sparql.compiler import sparql_update

        with pytest.raises(ValueError, match="WITH"):
            sparql_update(quads, "DELETE WHERE { ?s <urn:ex:st> ?o }")

    def test_with_on_triple_store_rejected(self, toy_store):
        from geosparql_etl_spark.sparql.compiler import sparql_update

        with pytest.raises(ValueError, match="quad store"):
            sparql_update(
                toy_store,
                'WITH <g1> DELETE { ?s ex:name ?n } WHERE { ?s ex:name ?n }',
            )

    def test_with_on_select_rejected(self):
        with pytest.raises(ValueError, match="update forms"):
            parse_query("WITH <g1> SELECT ?s WHERE { ?s <p> ?o }")

    def test_with_update_quad_lake_e2e(self, spark, tmp_path):
        """WITH update round-trips through the partitioned quad lake:
        update one graph, rewrite the lake, re-read, other graphs
        byte-stable."""
        from geosparql_etl_spark.sources.ntriples import register
        from geosparql_etl_spark.sparql import NTriplesLakeStore
        from geosparql_etl_spark.sparql.compiler import sparql_update

        register(spark)
        lake = str(tmp_path / "lake")
        rows = [
            ("urn:p:1", "urn:ex:st", "draft", "urn:g:hr"),
            ("urn:p:2", "urn:ex:st", "draft", "urn:g:eng"),
        ]
        spark.createDataFrame(
            rows, "s string, p string, o string, g string"
        ).selectExpr(
            "s AS subject", "p AS predicate", "o AS object",
            "TRUE AS is_literal", "CAST(NULL AS STRING) AS datatype",
            "CAST(NULL AS STRING) AS lang", "g",
        ).repartition(1, "g").write.format("ntriples").option(
            "partitionBy", "g"
        ).option("path", lake).mode("overwrite").save()

        store = NTriplesLakeStore(spark, lake, quad_lake=True)
        updated = sparql_update(
            store,
            'WITH <urn:g:hr> DELETE { ?s <urn:ex:st> "draft" } '
            'INSERT { ?s <urn:ex:st> "review" } '
            'WHERE { ?s <urn:ex:st> "draft" }',
        )
        out2 = str(tmp_path / "lake2")
        updated.selectExpr(
            "s AS subject", "p AS predicate", "o AS object",
            "TRUE AS is_literal", "CAST(NULL AS STRING) AS datatype",
            "CAST(NULL AS STRING) AS lang", "g",
        ).repartition(1, "g").write.format("ntriples").option(
            "partitionBy", "g"
        ).option("path", out2).mode("overwrite").save()
        got = {
            tuple(r)
            for r in NTriplesLakeStore(spark, out2, quad_lake=True)
            .full()
            .collect()
        }
        assert got == {
            ("urn:p:1", "urn:ex:st", "review", "urn:g:hr"),
            ("urn:p:2", "urn:ex:st", "draft", "urn:g:eng"),
        }


class TestRound8GroundUpdates:
    """INSERT DATA / DELETE DATA (ground updates, no WHERE) and
    CLEAR/DROP GRAPH (graph management) — round 8."""

    def test_insert_data_adds_ground_triples(self, toy_store):
        from geosparql_etl_spark.sparql import sparql_update

        g = sparql_update(
            toy_store,
            PFX + 'INSERT DATA { <urn:p:9> a ex:Person . '
            '<urn:p:9> ex:name "kay" }',
        )
        assert g.count() == toy_store.triples.count() + 2
        assert g.where(F.col("o") == "kay").count() == 1

    def test_insert_data_is_idempotent(self, toy_store):
        # re-inserting an existing triple is a set-semantics no-op
        from geosparql_etl_spark.sparql import sparql_update

        q = PFX + "INSERT DATA { <urn:p:1> a ex:Person }"
        g = sparql_update(toy_store, q)
        g2 = sparql_update(TripleStore(g), q)
        assert g.count() == g2.count() == toy_store.triples.count()

    def test_delete_data_removes_exact_triple(self, toy_store):
        from geosparql_etl_spark.sparql import sparql_update

        g = sparql_update(
            toy_store,
            PFX + 'DELETE DATA { <urn:p:1> ex:age "36" }',
        )
        assert g.count() == toy_store.triples.count() - 1
        # a non-matching ground triple deletes nothing
        g2 = sparql_update(
            toy_store, PFX + 'DELETE DATA { <urn:p:1> ex:age "99" }'
        )
        assert g2.count() == toy_store.triples.count()

    def test_data_block_rejects_variables(self, toy_store):
        from geosparql_etl_spark.sparql import sparql_update

        with pytest.raises(ValueError, match="ground"):
            sparql_update(
                toy_store, PFX + "INSERT DATA { ?s a ex:Person }"
            )
        with pytest.raises(ValueError, match="ground"):
            sparql_update(
                toy_store, PFX + 'DELETE DATA { <urn:p:1> ex:age ?a }'
            )

    def test_ground_update_through_select_rejected(self, toy_store):
        with pytest.raises(ValueError, match="sparql_update"):
            run(toy_store, "INSERT DATA { <urn:x> a ex:Y }")

    @pytest.fixture()
    def quads_with_default(self, spark):
        # g = NULL models default-graph quads: they must survive any
        # named-graph operation (the round-7 ADVICE eqNullSafe class)
        return TripleStore(
            spark.createDataFrame(
                [
                    ("a", "urn:ex:st", "x", "g1"),
                    ("b", "urn:ex:st", "y", "g2"),
                    ("c", "urn:ex:st", "z", None),
                ],
                "s string, p string, o string, g string",
            )
        )

    def test_clear_graph_drops_only_named_graph(self, quads_with_default):
        from geosparql_etl_spark.sparql import sparql_update

        out = sparql_update(quads_with_default, "CLEAR GRAPH <g1>")
        assert sorted((r.s, r.g) for r in out.collect()) == [
            ("b", "g2"),
            ("c", None),  # NULL-graph quad survives (eqNullSafe)
        ]

    def test_drop_silent_is_clear(self, quads_with_default):
        from geosparql_etl_spark.sparql import sparql_update

        out = sparql_update(quads_with_default, "DROP SILENT GRAPH <g2>")
        assert out.count() == 2

    def test_clear_needs_quad_store(self, toy_store):
        from geosparql_etl_spark.sparql import sparql_update

        with pytest.raises(ValueError, match="quad store"):
            sparql_update(toy_store, "CLEAR GRAPH <g1>")

    def test_with_update_keeps_null_graph_quads(self, quads_with_default):
        # the round-6 ADVICE finding: rest = g != WITH-graph dropped
        # NULL-graph rows; eqNullSafe keeps them
        from geosparql_etl_spark.sparql import sparql_update

        out = sparql_update(
            quads_with_default,
            'WITH <g1> DELETE { ?s <urn:ex:st> "x" } '
            'WHERE { ?s <urn:ex:st> "x" }',
        )
        assert sorted((r.s, r.g) for r in out.collect()) == [
            ("b", "g2"),
            ("c", None),
        ]

    def test_insert_data_on_quads_needs_with(self, quads_with_default):
        from geosparql_etl_spark.sparql import sparql_update

        with pytest.raises(ValueError, match="WITH"):
            sparql_update(
                quads_with_default, "INSERT DATA { <urn:x> <urn:p> <urn:y> }"
            )
        out = sparql_update(
            quads_with_default,
            "WITH <g1> INSERT DATA { <urn:x> <urn:p> <urn:y> }",
        )
        assert sorted((r.s, r.g) for r in out.collect()) == [
            ("a", "g1"),
            ("b", "g2"),
            ("c", None),
            ("urn:x", "g1"),
        ]


class TestRound8PathsAndSpatial:
    """p{n,m} bounded repetition and the var-var geof:distance
    grid-join rewrite — round 8."""

    @pytest.fixture(scope="class")
    def chain_store(self, spark):
        rows = [(f"n{i}", "urn:ex:next", f"n{i+1}") for i in range(6)]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_repeat_exact(self, chain_store):
        got = run(chain_store, "SELECT ?b WHERE { <n0> ex:next{2} ?b }")
        assert [r.b for r in got.collect()] == ["n2"]

    def test_repeat_range(self, chain_store):
        got = run(
            chain_store, "SELECT ?b WHERE { <n0> ex:next{2,4} ?b }"
        )
        assert sorted(r.b for r in got.collect()) == ["n2", "n3", "n4"]

    def test_repeat_zero_lower_bound(self, chain_store):
        # {0,1} includes the identity pairs (zero-length path)
        got = run(chain_store, "SELECT ?b WHERE { <n0> ex:next{0,1} ?b }")
        assert sorted(r.b for r in got.collect()) == ["n0", "n1"]

    def test_repeat_unbounded_upper(self, chain_store):
        got = run(chain_store, "SELECT ?b WHERE { <n0> ex:next{3,} ?b }")
        assert sorted(r.b for r in got.collect()) == [
            "n3", "n4", "n5", "n6",
        ]

    def test_repeat_empty_lower_bound(self, chain_store):
        # p{,2} = p{0,2}: includes the zero-length identity binding
        got = run(chain_store, "SELECT ?b WHERE { <n0> ex:next{,2} ?b }")
        assert sorted(r.b for r in got.collect()) == ["n0", "n1", "n2"]

    def test_repeat_matches_seq_and_star_composition(self, chain_store):
        # property check on the small chain: p{2,} == p/p/p*
        a = run(chain_store, "SELECT ?a ?b WHERE { ?a ex:next{2,} ?b }")
        b = run(
            chain_store,
            "SELECT ?a ?b WHERE { ?a ex:next/ex:next/ex:next* ?b }",
        )
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )

    def test_repeat_bad_bounds_rejected(self, chain_store):
        with pytest.raises(ValueError, match="quantifier"):
            run(chain_store, "SELECT ?b WHERE { <n0> ex:next{3,2} ?b }")
        with pytest.raises(ValueError, match="constant"):
            run(chain_store, "SELECT ?b WHERE { <n0> ?p{1,2} ?b }")

    def test_spacefree_comparison_lexes_as_ops(self, toy_store):
        # round-8 lexer fix: `<5&&?a>` must not lex as one IRI token
        got = run(
            toy_store,
            "SELECT ?p WHERE { ?p ex:age ?a FILTER(?a<40&&?a>30) }",
        )
        assert [r.p for r in got.collect()] == ["urn:p:1"]

    @pytest.fixture(scope="class")
    def points_store(self, spark):
        rows = []
        for i, (x, y) in enumerate(
            [(0, 0), (1, 1), (10, 10), (11, 10), (50, 50)]
        ):
            rows += [
                (f"urn:e:{i}", "rdf:type", "urn:ex:Thing"),
                (f"urn:e:{i}", "geo:asWKT", f"POINT({x} {y})"),
            ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def _pairs(self, store, dist):
        return run(
            store,
            """
            SELECT ?a ?b WHERE {
              ?a a ex:Thing . ?a geo:asWKT ?wa .
              ?b a ex:Thing . ?b geo:asWKT ?wb .
              FILTER(geof:distance(?wa, ?wb) < %s)
              FILTER(?a < ?b)
            }
            """
            % dist,
        )

    def test_var_var_distance_pairs(self, points_store):
        got = sorted(map(tuple, self._pairs(points_store, "2.5").collect()))
        assert got == [("urn:e:0", "urn:e:1"), ("urn:e:2", "urn:e:3")]

    def test_var_var_distance_plans_grid_join(self, points_store):
        # the rewrite's whole point: a hash join on grid cells, never
        # CartesianProduct + filter
        plan = (
            self._pairs(points_store, "2.5")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan

    def test_grid_join_boundary_complete(self, points_store):
        # pairs exactly at cell borders: d=1.5 puts (10,10)-(11,10)
        # in adjacent cells; the neighbor-cell scheme must keep them
        # (and sqrt(2) ~ 1.414 < 1.5 keeps (0,0)-(1,1) too)
        got = sorted(map(tuple, self._pairs(points_store, "1.5").collect()))
        assert got == [("urn:e:0", "urn:e:1"), ("urn:e:2", "urn:e:3")]

    def test_conjunctive_filter_splits(self, points_store):
        # one FILTER(dist && order) conjunction behaves identically to
        # two FILTER clauses (the and-split path)
        got = run(
            points_store,
            """
            SELECT ?a ?b WHERE {
              ?a a ex:Thing . ?a geo:asWKT ?wa .
              ?b a ex:Thing . ?b geo:asWKT ?wb .
              FILTER(geof:distance(?wa, ?wb) < 2.5 && ?a < ?b)
            }
            """,
        )
        assert sorted(map(tuple, got.collect())) == [
            ("urn:e:0", "urn:e:1"),
            ("urn:e:2", "urn:e:3"),
        ]


class TestRound8GroupedPaths:
    """Parenthesized path groups: (a/b)+, (a|b), ^(a/b), (a/b){n,m}."""

    @pytest.fixture(scope="class")
    def zig_store(self, spark):
        # alternating two-predicate chain: n0 -a-> n1 -b-> n2 -a-> ...
        rows = []
        for i in range(6):
            pred = "urn:ex:a" if i % 2 == 0 else "urn:ex:b"
            rows.append((f"n{i}", pred, f"n{i+1}"))
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_grouped_seq_plus(self, zig_store):
        # (a/b)+ from n0: every even node reached by >=1 full a/b hops
        got = run(zig_store, "SELECT ?x WHERE { <n0> (ex:a/ex:b)+ ?x }")
        assert sorted(r.x for r in got.collect()) == ["n2", "n4", "n6"]

    def test_grouped_alt_quantified(self, zig_store):
        # (a|b){2,3}: any 2- or 3-hop walk down the chain
        got = run(
            zig_store, "SELECT ?x WHERE { <n0> (ex:a|ex:b){2,3} ?x }"
        )
        assert sorted(r.x for r in got.collect()) == ["n2", "n3"]

    def test_inverse_group(self, zig_store):
        got = run(zig_store, "SELECT ?x WHERE { <n2> ^(ex:a/ex:b) ?x }")
        assert [r.x for r in got.collect()] == ["n0"]

    def test_unbalanced_paren_fails(self, zig_store):
        with pytest.raises(ValueError):
            run(zig_store, "SELECT ?x WHERE { <n0> (ex:a/ex:b ?x }")


class TestRound8Functions:
    """STRENDS / hash functions / ENCODE_FOR_URI / sameTerm."""

    def test_strends(self, toy_store):
        got = run(
            toy_store,
            'SELECT ?n WHERE { ?p ex:name ?n FILTER(STRENDS(?n, "ce")) }',
        )
        assert [r.n for r in got.collect()] == ["grace"]

    def test_hash_functions(self, toy_store):
        import hashlib

        got = run(
            toy_store,
            'SELECT ?n (SHA256(?n) AS ?h) (MD5(?n) AS ?m) WHERE '
            '{ ?p ex:name ?n FILTER(?n = "ada") }',
        ).collect()[0]
        assert got.h == hashlib.sha256(b"ada").hexdigest()
        assert got.m == hashlib.md5(b"ada").hexdigest()

    def test_encode_for_uri(self, spark):
        # spec examples: space -> %20, unreserved ~ . - _ stay bare;
        # '*' is NOT unreserved (URLEncoder passes it raw — round-8
        # ADVICE finding) -> %2A
        rows = [("s1", "urn:ex:v", "Los Angeles~CA_99.x-y/z*w")]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(
            store,
            "SELECT (ENCODE_FOR_URI(?v) AS ?e) WHERE { ?s <urn:ex:v> ?v }",
        ).collect()[0]
        assert got.e == "Los%20Angeles~CA_99.x-y%2Fz%2Aw"

    def test_update_resets_meta_need_on_error(self, toy_store):
        # round-8 ADVICE: a failing compile must not leave stale
        # sidecar demand on the shared store object
        from geosparql_etl_spark.sparql.compiler import sparql_update

        try:
            sparql_update(toy_store, "DELETE WHERE { ?s ex:name ?o . "
                                     "?s (ex:a|ex:b) ?x }")
        except ValueError:
            pass
        assert getattr(toy_store, "_meta_need", None) is None

    def test_sameterm(self, toy_store):
        got = run(
            toy_store,
            "SELECT ?p WHERE { ?p ex:name ?n . ?p ex:city ?c "
            "FILTER(sameTerm(?n, ?n)) } ORDER BY ?p",
        )
        assert [r.p for r in got.collect()] == ["urn:p:1", "urn:p:2"]


class TestRound8SpecFills:
    """Multi-var VALUES, aggregate DISTINCT forms, CONSTRUCT WHERE."""

    def test_values_multi_var(self, toy_store):
        got = run(
            toy_store,
            'SELECT ?p ?n ?tag WHERE { ?p ex:name ?n '
            'VALUES (?n ?tag) { ("ada" "pioneer") ("alan" "founder") } }',
        )
        assert sorted(map(tuple, got.collect())) == [
            ("urn:p:1", "ada", "pioneer"),
            ("urn:p:3", "alan", "founder"),
        ]

    def test_values_multi_arity_mismatch(self, toy_store):
        with pytest.raises(ValueError, match="arity"):
            run(
                toy_store,
                'SELECT ?a WHERE { VALUES (?a ?b) { ("x") } }',
            )

    def test_values_undef_opening_group(self, toy_store):
        # round 11 (D1 closed): an UNDEF frame may OPEN a group — the
        # unbound cell materializes NULL and is MARKED maybe-unbound,
        # so any later join applies compatibility semantics instead of
        # silently dropping the rows (which was why round 10 rejected
        # this shape loudly)
        got = run(
            toy_store,
            'SELECT ?a ?b WHERE { VALUES (?a ?b) { ("x" UNDEF) } }',
        )
        assert [tuple(r) for r in got.collect()] == [("x", None)]

    def test_values_undef_before_binding_pattern(self, toy_store):
        # round-11 medium advice: VALUES mid-group BEFORE the pattern
        # that binds one of its UNDEF variables must behave exactly
        # like the same VALUES placed after it (spec 18.5 join
        # order-independence) — the old code materialized a literal
        # NULL column the later BGP equi-joined, silently dropping the
        # spec-compatible rows
        before = run(
            toy_store,
            """SELECT ?p ?name ?age WHERE {
                 ?p ex:name ?name .
                 VALUES (?name ?age) { ("ada" UNDEF) (UNDEF "47") }
                 ?p ex:age ?age .
               } ORDER BY ?p""",
        )
        after = run(
            toy_store,
            """SELECT ?p ?name ?age WHERE {
                 ?p ex:name ?name . ?p ex:age ?age .
                 VALUES (?name ?age) { ("ada" UNDEF) (UNDEF "47") }
               } ORDER BY ?p""",
        )
        got_b = [tuple(r) for r in before.collect()]
        got_a = [tuple(r) for r in after.collect()]
        assert got_b == got_a == [
            ("urn:p:1", "ada", "36"),
            ("urn:p:2", "grace", "47"),
        ]

    def test_values_undef_compatibility_join(self, spark):
        """Spec 18.2 solution compatibility for VALUES UNDEF (round
        10, closing the loud rejection): an UNDEF cell matches ANY
        binding of that var, a solution compatible with several VALUES
        rows joins each (multiplicity preserved), and the merged
        solution takes the bound side's value."""
        rows = [
            ("urn:c:1", "urn:ex:nation", "N3"),
            ("urn:c:1", "urn:ex:segment", "BUILDING"),
            ("urn:c:2", "urn:ex:nation", "N3"),
            ("urn:c:2", "urn:ex:segment", "AUTO"),
            ("urn:c:3", "urn:ex:nation", "N7"),
            ("urn:c:3", "urn:ex:segment", "BUILDING"),
            ("urn:c:4", "urn:ex:nation", "N7"),
            ("urn:c:4", "urn:ex:segment", "AUTO"),
        ]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(
            store,
            """
            SELECT ?c ?n ?s WHERE {
              ?c ex:nation ?n . ?c ex:segment ?s .
              VALUES (?n ?s) { ("N3" UNDEF) (UNDEF "BUILDING") }
            } ORDER BY ?c ?n ?s
            """,
        ).collect()
        # c1 (N3, BUILDING) is compatible with BOTH rows -> twice;
        # c2 matches the N3 row, c3 the BUILDING row, c4 neither
        assert [tuple(r) for r in got] == [
            ("urn:c:1", "N3", "BUILDING"),
            ("urn:c:1", "N3", "BUILDING"),
            ("urn:c:2", "N3", "AUTO"),
            ("urn:c:3", "N7", "BUILDING"),
        ]

    def test_values_join_merges_optional_unbound_with_bound_cell(self, spark):
        """The OTHER side of compatibility: a solution whose var is
        unbound (OPTIONAL miss) is compatible with a BOUND VALUES
        cell, and the merged solution takes the VALUES value (spec
        solution merge) — plain equi-join semantics would drop it."""
        rows = [
            ("urn:p:1", "urn:ex:name", "ann"),
            ("urn:p:2", "urn:ex:name", "bob"),
            ("urn:p:1", "urn:ex:tag", "vip"),
        ]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(
            store,
            """
            SELECT ?n ?t WHERE {
              ?x ex:name ?n .
              OPTIONAL { ?x ex:tag ?t }
              VALUES (?t) { ("vip") (UNDEF) }
            } ORDER BY ?n ?t
            """,
        ).collect()
        # ann: t bound 'vip' -> compatible with BOTH rows (equal /
        # undef) -> twice. bob: t unbound -> compatible with both; the
        # ("vip") row MERGES t:='vip' into the solution, the (UNDEF)
        # row leaves it unbound.
        assert [tuple(r) for r in got] == [
            ("ann", "vip"),
            ("ann", "vip"),
            ("bob", None),
            ("bob", "vip"),
        ]

    def test_values_undef_binds_fresh_var_unbound(self, spark):
        """A fresh var introduced only by VALUES stays unbound (NULL)
        in the rows whose cell is UNDEF."""
        store = TripleStore(
            spark.createDataFrame(
                [("urn:x:1", "urn:ex:name", "a")],
                "s string, p string, o string",
            )
        )
        got = run(
            store,
            """
            SELECT ?v ?extra WHERE {
              ?x ex:name ?v .
              VALUES (?v ?extra) { ("a" UNDEF) ("a" "tag") }
            } ORDER BY ?extra
            """,
        ).collect()
        assert [tuple(r) for r in got] == [(("a"), None), ("a", "tag")]

    def test_sum_distinct(self, spark):
        rows = [
            ("a", "urn:ex:v", "3"), ("b", "urn:ex:v", "3"),
            ("c", "urn:ex:v", "5"),
        ]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(
            store,
            "SELECT (SUM(DISTINCT ?v) AS ?t) (SUM(?v) AS ?all) "
            "WHERE { ?s <urn:ex:v> ?v }",
        ).collect()[0]
        assert (got.t, got.all) == ("8.00", "11.00")

    def test_group_concat_distinct(self, toy_store):
        got = run(
            toy_store,
            "SELECT (GROUP_CONCAT(DISTINCT ?t) AS ?ts) WHERE "
            "{ ?p a ?t }",
        ).collect()[0]
        assert got.ts == "urn:ex:City urn:ex:Person"

    def test_avg_min_distinct(self, spark):
        rows = [("a", "urn:ex:v", "2"), ("b", "urn:ex:v", "2"),
                ("c", "urn:ex:v", "4")]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(
            store,
            "SELECT (AVG(DISTINCT ?v) AS ?a) (MIN(DISTINCT ?v) AS ?m) "
            "WHERE { ?s <urn:ex:v> ?v }",
        ).collect()[0]
        assert (got.a, got.m) == (3.0, "2")  # MIN = the original lexical

    def test_construct_where_shorthand(self, toy_store):
        got = run(toy_store, "CONSTRUCT WHERE { ?p ex:age ?a }")
        assert sorted(map(tuple, got.collect())) == [
            ("urn:p:1", "urn:ex:age", "36"),
            ("urn:p:2", "urn:ex:age", "47"),
        ]

    def test_construct_where_rejects_nonbgp(self, toy_store):
        with pytest.raises(ValueError, match="plain triple"):
            run(
                toy_store,
                'CONSTRUCT WHERE { ?p ex:age ?a FILTER(?a > 40) }',
            )
        with pytest.raises(ValueError, match="plain triple"):
            run(toy_store, "CONSTRUCT WHERE { ?p ex:age+ ?a }")


class TestRound8TypeErrors:
    """SPARQL type-error semantics under Spark 4 ANSI mode: a numeric
    operation over a non-numeric lexical must NOT throw — the filter
    simply doesn't match and aggregates skip the value (try_cast)."""

    @pytest.fixture(scope="class")
    def mixed_store(self, spark):
        rows = [
            ("a", "urn:ex:v", "12"),
            ("b", "urn:ex:v", "oops"),
            ("c", "urn:ex:v", "3"),
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_numeric_filter_drops_nonnumeric(self, mixed_store):
        got = run(
            mixed_store,
            "SELECT ?s WHERE { ?s <urn:ex:v> ?v FILTER(?v > 5) }",
        )
        assert [r.s for r in got.collect()] == ["a"]
        # and the complement filter doesn't resurrect it either
        got2 = run(
            mixed_store,
            "SELECT ?s WHERE { ?s <urn:ex:v> ?v FILTER(?v <= 5) }",
        )
        assert [r.s for r in got2.collect()] == ["c"]

    def test_aggregates_skip_nonnumeric(self, mixed_store):
        got = run(
            mixed_store,
            "SELECT (SUM(?v) AS ?t) (AVG(?v) AS ?a) (MAX(?v) AS ?m) "
            "WHERE { ?s <urn:ex:v> ?v }",
        ).collect()[0]
        assert (got.t, got.a, got.m) == ("15.00", 7.5, "12")

    def test_arithmetic_yields_unbound_not_error(self, mixed_store):
        got = run(
            mixed_store,
            "SELECT ?s (?v * 2 AS ?d) WHERE { ?s <urn:ex:v> ?v } "
            "ORDER BY ?s",
        )
        assert [(r.s, r.d) for r in got.collect()] == [
            ("a", 24.0), ("b", None), ("c", 6.0),
        ]


def test_geo_call_on_nonpoint_literal_is_type_error(spark):
    # round 8 (ANSI hazard class): a non-POINT WKT under geof:distance
    # must drop the binding, not kill the job with CAST_INVALID_INPUT
    rows = [
        ("a", "geo:asWKT", "POINT(1 2)"),
        ("b", "geo:asWKT", "LINESTRING(0 0, 1 1)"),
    ]
    store = TripleStore(
        spark.createDataFrame(rows, "s string, p string, o string")
    )
    got = run(
        store,
        'SELECT ?s WHERE { ?s geo:asWKT ?w '
        'FILTER(geof:distance(?w, "POINT(0 0)") < 10) }',
    )
    assert [r.s for r in got.collect()] == ["a"]


class TestRound8Load:
    """LOAD <file> [INTO GRAPH <g>] — serialized-graph merge with set
    semantics."""

    def test_load_ntriples_merges(self, spark, toy_store, tmp_path):
        from geosparql_etl_spark.sparql import TripleStore, sparql_update

        nt = tmp_path / "extra.nt"
        nt.write_text(
            '<urn:p:9> <urn:ex:name> "kay" .\n'
            '<urn:p:1> <urn:ex:name> "ada" .\n'  # already present
        )
        g = sparql_update(toy_store, f"LOAD <file://{nt}>")
        assert g.count() == toy_store.triples.count() + 1
        assert g.where(F.col("o") == "kay").count() == 1
        # idempotent: loading again adds nothing
        g2 = sparql_update(TripleStore(g), f"LOAD <file://{nt}>")
        assert g2.count() == g.count()

    def test_load_turtle(self, spark, toy_store, tmp_path):
        from geosparql_etl_spark.sparql import sparql_update

        ttl = tmp_path / "extra.ttl"
        ttl.write_text(
            "@prefix ex: <urn:ex:> .\n"
            '<urn:p:9> ex:name "kay" ; ex:age "9" .\n'
        )
        g = sparql_update(toy_store, f"LOAD <file://{ttl}>")
        assert g.count() == toy_store.triples.count() + 2

    def test_load_into_graph_on_quads(self, spark, tmp_path):
        from geosparql_etl_spark.sparql import TripleStore, sparql_update

        quads = TripleStore(
            spark.createDataFrame(
                [("a", "urn:ex:p", "x", "g1")],
                "s string, p string, o string, g string",
            )
        )
        nt = tmp_path / "extra.nt"
        nt.write_text('<b> <urn:ex:p> "y" .\n')
        g = sparql_update(quads, f"LOAD <file://{nt}> INTO GRAPH <g2>")
        assert sorted((r.s, r.g) for r in g.collect()) == [
            ("a", "g1"), ("b", "g2"),
        ]
        # unscoped load on quads rejected
        with pytest.raises(ValueError, match="INTO GRAPH"):
            sparql_update(quads, f"LOAD <file://{nt}>")

    def test_load_into_graph_needs_quads(self, toy_store, tmp_path):
        from geosparql_etl_spark.sparql import sparql_update

        nt = tmp_path / "x.nt"
        nt.write_text('<b> <urn:ex:p> "y" .\n')
        with pytest.raises(ValueError, match="quad store"):
            sparql_update(toy_store, f"LOAD <file://{nt}> INTO GRAPH <g>")


class TestRound8GraphManagement:
    """ADD / COPY / MOVE <g1> TO <g2> (SPARQL 1.1 graph management)."""

    @pytest.fixture()
    def gm_quads(self, spark):
        return TripleStore(
            spark.createDataFrame(
                [
                    ("a", "urn:ex:p", "1", "g1"),
                    ("b", "urn:ex:p", "2", "g1"),
                    ("b", "urn:ex:p", "2", "g2"),  # overlaps g1's b
                    ("c", "urn:ex:p", "3", "g2"),
                    ("d", "urn:ex:p", "4", None),  # default graph
                ],
                "s string, p string, o string, g string",
            )
        )

    def _shape(self, df):
        return sorted((r.s, r.g) for r in df.collect())

    def test_add(self, gm_quads):
        from geosparql_etl_spark.sparql import sparql_update

        out = sparql_update(gm_quads, "ADD GRAPH <g1> TO GRAPH <g2>")
        # g2 gains a; b deduped (set semantics); g1 and default intact
        assert self._shape(out) == [
            ("a", "g1"), ("a", "g2"), ("b", "g1"), ("b", "g2"),
            ("c", "g2"), ("d", None),
        ]

    def test_copy_replaces_destination(self, gm_quads):
        from geosparql_etl_spark.sparql import sparql_update

        out = sparql_update(gm_quads, "COPY <g1> TO <g2>")
        assert self._shape(out) == [
            ("a", "g1"), ("a", "g2"), ("b", "g1"), ("b", "g2"),
            ("d", None),
        ]

    def test_move(self, gm_quads):
        from geosparql_etl_spark.sparql import sparql_update

        out = sparql_update(gm_quads, "MOVE SILENT <g1> TO <g2>")
        assert self._shape(out) == [
            ("a", "g2"), ("b", "g2"), ("d", None),
        ]

    def test_same_graph_noop(self, gm_quads):
        from geosparql_etl_spark.sparql import sparql_update

        out = sparql_update(gm_quads, "COPY <g1> TO <g1>")
        assert out.count() == gm_quads.triples.count()

    def test_needs_quads(self, toy_store):
        from geosparql_etl_spark.sparql import sparql_update

        with pytest.raises(ValueError, match="quad store"):
            sparql_update(toy_store, "ADD <g1> TO <g2>")


def test_create_graph_is_noop_on_quads(spark):
    from geosparql_etl_spark.sparql import TripleStore, sparql_update

    quads = TripleStore(
        spark.createDataFrame(
            [("a", "urn:ex:p", "1", "g1")],
            "s string, p string, o string, g string",
        )
    )
    out = sparql_update(quads, "CREATE SILENT GRAPH <g9>")
    assert out.count() == 1
    with pytest.raises(ValueError, match="quad store"):
        sparql_update(
            TripleStore(quads.triples.select("s", "p", "o")),
            "CREATE GRAPH <g9>",
        )


class TestRound8TemplateGraphBlocks:
    """GRAPH <g> { ... } blocks in DELETE/INSERT templates — the spec
    form for quad updates, incl. cross-graph rewrites WITH cannot
    express."""

    @pytest.fixture()
    def tb_quads(self, spark):
        return TripleStore(
            spark.createDataFrame(
                [
                    ("a", "urn:ex:st", "draft", "g1"),
                    ("b", "urn:ex:st", "draft", "g1"),
                    ("c", "urn:ex:st", "final", "g2"),
                    ("d", "urn:ex:st", "x", None),
                ],
                "s string, p string, o string, g string",
            )
        )

    def test_cross_graph_move_by_pattern(self, tb_quads):
        # promote drafts: delete from g1, insert into g2 — one update
        from geosparql_etl_spark.sparql import sparql_update

        out = sparql_update(
            tb_quads,
            'DELETE { GRAPH <g1> { ?s <urn:ex:st> "draft" } } '
            'INSERT { GRAPH <g2> { ?s <urn:ex:st> "review" } } '
            'WHERE { GRAPH <g1> { ?s <urn:ex:st> "draft" } }',
        )
        assert sorted((r.s, r.o, r.g) for r in out.collect()) == [
            ("a", "review", "g2"),
            ("b", "review", "g2"),
            ("c", "final", "g2"),
            ("d", "x", None),
        ]

    def test_insert_data_graph_blocks(self, tb_quads):
        from geosparql_etl_spark.sparql import sparql_update

        out = sparql_update(
            tb_quads,
            'INSERT DATA { GRAPH <g2> { <e> <urn:ex:st> "new" } . '
            'GRAPH <g1> { <f> <urn:ex:st> "raw" } }',
        )
        got = sorted((r.s, r.g) for r in out.collect())
        assert ("e", "g2") in got and ("f", "g1") in got
        assert len(got) == 6
        # set semantics: re-inserting an existing quad is a no-op
        out2 = sparql_update(
            tb_quads,
            'INSERT DATA { GRAPH <g1> { <a> <urn:ex:st> "draft" } }',
        )
        assert out2.count() == 4

    def test_delete_data_graph_block_hits_one_graph(self, tb_quads):
        from geosparql_etl_spark.sparql import sparql_update

        # "draft" exists in g1 only; deleting it FROM g2 removes nothing
        out = sparql_update(
            tb_quads,
            'DELETE DATA { GRAPH <g2> { <a> <urn:ex:st> "draft" } }',
        )
        assert out.count() == 4
        out2 = sparql_update(
            tb_quads,
            'DELETE DATA { GRAPH <g1> { <a> <urn:ex:st> "draft" } }',
        )
        assert out2.count() == 3

    def test_bare_triples_still_rejected_on_quads(self, tb_quads):
        from geosparql_etl_spark.sparql import sparql_update

        with pytest.raises(ValueError, match="GRAPH"):
            sparql_update(
                tb_quads,
                'INSERT { ?s <urn:ex:seen> "1" } '
                'WHERE { GRAPH <g1> { ?s <urn:ex:st> "draft" } }',
            )

    def test_with_plus_graph_blocks_rejected(self, tb_quads):
        from geosparql_etl_spark.sparql import sparql_update

        with pytest.raises(ValueError, match="mixing"):
            sparql_update(
                tb_quads,
                'WITH <g1> DELETE { GRAPH <g2> { ?s ?p ?o } } '
                "WHERE { ?s ?p ?o }",
            )

    def test_graph_blocks_need_quads(self, toy_store):
        from geosparql_etl_spark.sparql import sparql_update

        with pytest.raises(ValueError, match="quad store"):
            sparql_update(
                toy_store,
                'INSERT DATA { GRAPH <g1> { <x> <urn:ex:p> "1" } }',
            )


class TestRound8DescribeNotIn:
    def test_describe_const_iri(self, toy_store):
        got = run(toy_store, "DESCRIBE <urn:p:1>")
        assert sorted(r.p for r in got.collect()) == [
            "rdf:type", "urn:ex:age", "urn:ex:city", "urn:ex:name",
        ]

    def test_not_in(self, toy_store):
        got = run(
            toy_store,
            'SELECT ?n WHERE { ?p a ex:Person . ?p ex:name ?n '
            'FILTER(?n NOT IN ("ada", "alan")) }',
        )
        assert [r.n for r in got.collect()] == ["grace"]

    def test_not_in_numeric(self, toy_store):
        got = run(
            toy_store,
            "SELECT ?a WHERE { ?p ex:age ?a FILTER(?a NOT IN (36)) }",
        )
        assert [r.a for r in got.collect()] == ["47"]


class TestLiteralMetadata:
    """RDF 1.1 literal metadata (round 8): lang tags and datatype IRIs
    ride optional store columns; LANG()/LANGMATCHES()/DATATYPE()/
    STRLANG()/STRDT() read them through need-provisioned sidecars, and
    tagged/typed literal constants match as full RDF terms. Mirrors
    the reference's typed-literal TTL output (json-etl emits
    ^^geo:wktLiteral; rdf_utils.py mints typed literals via rdflib) —
    which the reference itself can only WRITE, never query."""

    @pytest.fixture(scope="class")
    def meta_store(self, spark):
        rows = [
            ("urn:n:1", "urn:ex:label", "Berlin", "de", None),
            ("urn:n:1", "urn:ex:label", "Berlin", None, None),
            ("urn:n:2", "urn:ex:label", "Paris", "fr", None),
            ("urn:n:2", "urn:ex:label", "Paris", "fr-CA", None),
            ("urn:n:3", "urn:ex:label", "Madrid", "es-ES", None),
            ("urn:n:1", "urn:ex:pop", "3600000", None,
             "http://www.w3.org/2001/XMLSchema#integer"),
            ("urn:n:2", "urn:ex:pop", "2100000", None,
             "http://www.w3.org/2001/XMLSchema#integer"),
            ("urn:n:1", "urn:ex:seen", "urn:n:2", None, None),
        ]
        df = spark.createDataFrame(
            rows, "s string, p string, o string, lang string, dt string"
        )
        return TripleStore(df)

    XSD_PFX = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "

    def test_langmatches_exact_and_subtag(self, meta_store):
        # RFC 4647 basic filtering: "fr" matches fr AND fr-CA
        rows = run(
            meta_store,
            'SELECT ?l WHERE { ?s ex:label ?l '
            'FILTER(LANGMATCHES(LANG(?l), "fr")) } ORDER BY ?l',
        ).collect()
        assert [r.l for r in rows] == ["Paris", "Paris"]

    def test_langmatches_star_excludes_plain(self, meta_store):
        # "*" = any non-empty tag: the plain "Berlin" drops out
        rows = run(
            meta_store,
            'SELECT ?s ?l WHERE { ?s ex:label ?l '
            'FILTER(LANGMATCHES(LANG(?l), "*")) }',
        ).collect()
        assert len(rows) == 4

    def test_group_by_lang(self, meta_store):
        rows = run(
            meta_store,
            "SELECT ?tag (COUNT(*) AS ?n) WHERE { ?s ex:label ?l "
            "BIND(LANG(?l) AS ?tag) } GROUP BY ?tag ORDER BY ?tag",
        ).collect()
        # plain literal -> "" per spec; LANG preserves the stored
        # tag's case (only LANGMATCHES folds)
        assert [(r.tag, int(r.n)) for r in rows] == [
            ("", 1), ("de", 1), ("es-ES", 1), ("fr", 1), ("fr-CA", 1),
        ]

    def test_tagged_constant_in_pattern(self, meta_store):
        # "Berlin"@de is a DIFFERENT term from plain "Berlin": the
        # tagged pattern matches exactly the tagged row
        assert run(
            meta_store, 'SELECT ?s WHERE { ?s ex:label "Berlin"@de }'
        ).collect()[0].s == "urn:n:1"
        # ...while a PLAIN constant matches by lexical form (the
        # engine's documented lexical term model: metadata-agnostic)
        assert run(
            meta_store, 'SELECT ?s WHERE { ?s ex:label "Berlin" }'
        ).count() == 2

    def test_typed_constant_in_pattern(self, meta_store):
        rows = run(
            meta_store,
            self.XSD_PFX.replace("PREFIX", "PREFIX") +
            'SELECT ?s WHERE { ?s ex:pop "3600000"^^xsd:integer }',
        ).collect()
        assert [r.s for r in rows] == ["urn:n:1"]
        # wrong datatype -> no term in the store matches
        assert run(
            meta_store,
            'SELECT ?s WHERE { ?s ex:pop "3600000"^^xsd:decimal }',
        ).count() == 0

    def test_datatype_function(self, meta_store):
        rows = run(
            meta_store,
            "SELECT ?s ?d WHERE { ?s ex:pop ?v BIND(DATATYPE(?v) AS ?d) } "
            "ORDER BY ?s",
        ).collect()
        assert all(
            r.d == "http://www.w3.org/2001/XMLSchema#integer" for r in rows
        )
        # pname IRI constant on the comparison side
        assert run(
            meta_store,
            self.XSD_PFX + "SELECT ?s WHERE { ?s ex:pop ?v "
            "FILTER(DATATYPE(?v) = xsd:integer) }",
        ).count() == 2

    def test_datatype_of_tagged_plain_and_iri(self, meta_store):
        rows = run(
            meta_store,
            "SELECT ?l ?d WHERE { <urn:n:1> ex:label ?l "
            "BIND(DATATYPE(?l) AS ?d) } ORDER BY ?d",
        ).collect()
        assert sorted(r.d for r in rows) == [
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
            "http://www.w3.org/2001/XMLSchema#string",
        ]
        # IRI-valued binding: DATATYPE is a type error -> NULL -> the
        # FILTER comparison eliminates the row
        assert run(
            meta_store,
            self.XSD_PFX + "SELECT ?o WHERE { ?s ex:seen ?o "
            "FILTER(DATATYPE(?o) = xsd:string) }",
        ).count() == 0

    def test_term_equality_filter(self, meta_store):
        rows = run(
            meta_store,
            'SELECT ?s WHERE { ?s ex:label ?l FILTER(?l = "Paris"@fr) }',
        ).collect()
        assert [r.s for r in rows] == ["urn:n:2"]
        # != is the term-level negation: every OTHER label row
        assert run(
            meta_store,
            'SELECT ?l WHERE { ?s ex:label ?l FILTER(?l != "Paris"@fr) }',
        ).count() == 4

    def test_strlang_strdt_equality(self, meta_store):
        assert run(
            meta_store,
            "SELECT ?s WHERE { ?s ex:label ?l "
            'FILTER(?l = STRLANG("Madrid", "es-ES")) }',
        ).collect()[0].s == "urn:n:3"
        assert run(
            meta_store,
            self.XSD_PFX +
            "SELECT ?s WHERE { ?s ex:pop ?v "
            'FILTER(?v = STRDT("2100000", xsd:integer)) }',
        ).collect()[0].s == "urn:n:2"

    def test_lang_of_subject_position_var_is_empty(self, meta_store):
        # ?o binds an IRI (object of ex:seen, subject elsewhere):
        # LANG() -> "" consistently, whichever pattern provisions it
        rows = run(
            meta_store,
            "SELECT ?o ?t WHERE { ?s ex:seen ?o . ?o ex:pop ?p "
            "BIND(LANG(?o) AS ?t) }",
        ).collect()
        assert [(r.o, r.t) for r in rows] == [("urn:n:2", "")]

    def test_turtle_roundtrip_lang_and_datatype(self, spark):
        from geosparql_etl_spark.sources.turtle import turtle_to_triples

        ttl = (
            "@prefix ex: <urn:ex:> .\n"
            "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
            '<urn:n:1> ex:label "Berlin"@de ; ex:pop "36"^^xsd:integer .\n'
            '<urn:n:2> ex:label "york" .\n'
        )
        docs = spark.createDataFrame(
            [("mem://doc.ttl", ttl)], "path string, text string"
        )
        store = TripleStore.from_ntriples(turtle_to_triples(docs))
        rows = run(
            store,
            'SELECT ?s WHERE { ?s ex:label ?l FILTER(LANGMATCHES(LANG(?l), "de")) }',
        ).collect()
        assert [r.s for r in rows] == ["urn:n:1"]
        rows = run(
            store,
            "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
            "SELECT ?s WHERE { ?s ex:pop ?v FILTER(DATATYPE(?v) = xsd:integer) }",
        ).collect()
        assert [r.s for r in rows] == ["urn:n:1"]

    def test_vertical_store_keeps_metadata(self, spark):
        rows = [
            ("urn:n:1", "urn:ex:label", "Berlin", "de", None),
            ("urn:n:2", "urn:ex:label", "Paris", "fr", None),
        ]
        df = spark.createDataFrame(
            rows, "s string, p string, o string, lang string, dt string"
        )
        store = TripleStore.vertically_partitioned(df)
        got = run(
            store,
            'SELECT ?s WHERE { ?s ex:label ?l FILTER(LANG(?l) = "fr") }',
        ).collect()
        assert [r.s for r in got] == ["urn:n:2"]

    def test_metadata_free_store_sees_plain_literals(self, toy_store):
        # stores without lang/dt columns: LANG() == "", DATATYPE() ==
        # xsd:string, and a tagged constant matches nothing
        assert run(
            toy_store,
            'SELECT ?n WHERE { ?p ex:name ?n FILTER(LANG(?n) = "") '
            'FILTER(?p = <urn:p:1>) }',
        ).collect()[0].n == "ada"
        assert run(
            toy_store, 'SELECT ?p WHERE { ?p ex:name "ada"@en }'
        ).count() == 0

    def test_no_sidecars_in_plan_without_metadata_calls(self, meta_store):
        # the 99%-path guarantee: a query that never touches metadata
        # plans zero __meta_ columns even on a metadata-bearing store
        df = run(meta_store, "SELECT ?s ?l WHERE { ?s ex:label ?l }")
        assert not [c for c in df.columns if c.startswith("__meta_")]
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "__meta_" not in plan


class TestSpatialContainmentJoin:
    """Var-var geof:sfWithin/sfContains/sfDisjoint (round 8): the
    polygon side bound from data, compiled to the grid-cover hash
    join when the geometry vars live in disconnected components."""

    @pytest.fixture(scope="class")
    def geo_store(self, spark):
        rows = [
            ("urn:pt:a", "rdf:type", "urn:ex:Pt"),
            ("urn:pt:a", "geo:asWKT", "POINT(5 5)"),
            ("urn:pt:b", "rdf:type", "urn:ex:Pt"),
            ("urn:pt:b", "geo:asWKT", "POINT(45 45)"),
            ("urn:pt:c", "rdf:type", "urn:ex:Pt"),
            ("urn:pt:c", "geo:asWKT", "POINT(200 200)"),
            ("urn:z:1", "rdf:type", "urn:ex:Zone"),
            ("urn:z:1", "urn:ex:wkt", "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"),
            ("urn:z:2", "rdf:type", "urn:ex:Zone"),
            ("urn:z:2", "urn:ex:wkt", "POLYGON((40 40, 50 40, 50 50, 40 50))"),
            # a zone whose geometry is NOT a polygon: type error ->
            # matches nothing, drops nothing else
            ("urn:z:3", "rdf:type", "urn:ex:Zone"),
            ("urn:z:3", "urn:ex:wkt", "LINESTRING(0 0, 1 1)"),
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def _within(self, store, fn="geof:sfWithin", a="?pt", b="?zn"):
        return run(
            store,
            "SELECT ?p ?z WHERE { "
            "?p a ex:Pt . ?p geo:asWKT ?pt . "
            "?z a ex:Zone . ?z ex:wkt ?zn . "
            f"FILTER({fn}({a}, {b})) }} ORDER BY ?p",
        )

    def test_var_var_sfwithin(self, geo_store):
        got = [(r.p, r.z) for r in self._within(geo_store).collect()]
        # z:2's ring arrives unclosed — wkt_polygon_ring treats
        # closure as implicit, so (45,45) still matches
        assert got == [("urn:pt:a", "urn:z:1"), ("urn:pt:b", "urn:z:2")]

    def test_sfcontains_is_mirrored_sfwithin(self, geo_store):
        got = [
            (r.p, r.z)
            for r in self._within(
                geo_store, fn="geof:sfContains", a="?zn", b="?pt"
            ).collect()
        ]
        assert got == [("urn:pt:a", "urn:z:1"), ("urn:pt:b", "urn:z:2")]

    def test_var_var_sfwithin_plans_grid_join(self, geo_store):
        plan = (
            self._within(geo_store)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan

    def test_sfdisjoint_same_frame(self, spark):
        # disjoint needs pt and polygon already joined (here: both on
        # one subject) — the negated ray cast, type errors drop
        rows = [
            ("urn:x:1", "urn:ex:pt", "POINT(5 5)"),
            ("urn:x:1", "urn:ex:zn", "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"),
            ("urn:x:2", "urn:ex:pt", "POINT(99 99)"),
            ("urn:x:2", "urn:ex:zn", "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"),
        ]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(
            store,
            "SELECT ?x WHERE { ?x ex:pt ?p . ?x ex:zn ?z "
            "FILTER(geof:sfDisjoint(?p, ?z)) }",
        ).collect()
        assert [r.x for r in got] == ["urn:x:2"]

    def test_cell_straddling_polygon(self, spark):
        # polygon spanning multiple grid cells (cell = 25): the cover
        # explode must reach a point far from the polygon's min corner
        rows = [
            ("urn:pt:far", "rdf:type", "urn:ex:Pt"),
            ("urn:pt:far", "geo:asWKT", "POINT(70 5)"),
            ("urn:z:wide", "rdf:type", "urn:ex:Zone"),
            ("urn:z:wide", "urn:ex:wkt",
             "POLYGON((0 0, 80 0, 80 10, 0 10, 0 0))"),
        ]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = [(r.p, r.z) for r in self._within(store).collect()]
        assert got == [("urn:pt:far", "urn:z:wide")]


class TestRound8SpecFillsCont:
    """SELECT *, trailing VALUES, inline aggregates in HAVING,
    UUID/STRUUID (round 8 continuation). Named -Cont: an earlier
    class already holds the round-8 spec-fill tests, and a same-name
    class would shadow it out of pytest collection entirely."""

    @pytest.fixture(scope="class")
    def knows_store(self, spark):
        rows = [
            ("urn:p:1", "urn:ex:knows", "urn:p:2"),
            ("urn:p:1", "urn:ex:knows", "urn:p:3"),
            ("urn:p:2", "urn:ex:knows", "urn:p:3"),
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_select_star(self, toy_store):
        got = run(toy_store, "SELECT * WHERE { ?p ex:age ?a } ORDER BY ?p")
        assert got.columns == ["p", "a"]
        assert [tuple(r) for r in got.collect()] == [
            ("urn:p:1", "36"), ("urn:p:2", "47"),
        ]

    def test_select_star_hides_metadata_sidecars(self, spark):
        # SELECT * with a LANG filter: the __meta_ sidecar must not
        # leak into the star expansion
        rows = [("urn:n:1", "urn:ex:label", "Berlin", "de", None)]
        store = TripleStore(
            spark.createDataFrame(
                rows, "s string, p string, o string, lang string, dt string"
            )
        )
        got = run(
            store,
            'SELECT * WHERE { ?s ex:label ?l FILTER(LANG(?l) = "de") }',
        )
        assert got.columns == ["s", "l"]

    def test_trailing_values_joins_pattern(self, toy_store):
        got = run(
            toy_store,
            "SELECT ?n WHERE { ?p ex:name ?n } ORDER BY ?n "
            'VALUES ?n { "ada" "alan" }',
        )
        assert [r.n for r in got.collect()] == ["ada", "alan"]

    def test_trailing_values_multi(self, toy_store):
        got = run(
            toy_store,
            "SELECT ?n ?a WHERE { ?p ex:name ?n . ?p ex:age ?a } "
            'VALUES (?n ?a) { ("ada" "36") ("grace" "99") }',
        )
        # ("grace", "99") matches no binding: VALUES is a JOIN
        assert [tuple(r) for r in got.collect()] == [("ada", "36")]

    def test_having_inline_aggregate(self, knows_store):
        got = run(
            knows_store,
            "SELECT ?s (COUNT(?o) AS ?c) WHERE { ?s ex:knows ?o } "
            "GROUP BY ?s HAVING(COUNT(?o) >= 2) ORDER BY ?s",
        )
        assert [tuple(r) for r in got.collect()] == [("urn:p:1", 2)]

    def test_having_hidden_aggregate_dropped(self, knows_store):
        # no projected aggregate at all: the hidden __having_0 column
        # must not survive into the output
        got = run(
            knows_store,
            "SELECT ?s WHERE { ?s ex:knows ?o } GROUP BY ?s "
            "HAVING(COUNT(?o) >= 2)",
        )
        assert got.columns == ["s"]
        assert [r.s for r in got.collect()] == ["urn:p:1"]

    def test_having_mixes_alias_and_inline(self, knows_store):
        got = run(
            knows_store,
            "SELECT ?s (COUNT(?o) AS ?c) WHERE { ?s ex:knows ?o } "
            "GROUP BY ?s HAVING(COUNT(?o) >= 1 && ?c <= 5) ORDER BY ?s",
        )
        assert [tuple(r) for r in got.collect()] == [
            ("urn:p:1", 2), ("urn:p:2", 1),
        ]

    def test_struuid_and_uuid_shapes(self, toy_store):
        import re as _re

        got = run(
            toy_store,
            "SELECT ?n (STRUUID() AS ?u) (UUID() AS ?iri) "
            "WHERE { ?p a ex:Person . ?p ex:name ?n }",
        ).collect()
        assert len(got) == 3
        assert all(_re.fullmatch(r"[0-9a-f-]{36}", r.u) for r in got)
        assert all(r.iri.startswith("urn:uuid:") for r in got)
        # nondeterministic but UNIQUE per row
        assert len({r.u for r in got}) == 3

    def test_two_uuid_binds_differ(self, toy_store):
        """Pin the call-memo invariant (round-15, judge note): two
        UUID()/STRUUID() BINDs in ONE query must mint distinct values
        per row — the deterministic-call memo must never share a
        nondeterministic tree (a shared memoized tree would alias
        their per-position seeds)."""
        got = run(
            toy_store,
            "SELECT ?n (UUID() AS ?a) (UUID() AS ?b) "
            "(STRUUID() AS ?c) (STRUUID() AS ?d) "
            "WHERE { ?p a ex:Person . ?p ex:name ?n }",
        ).collect()
        assert len(got) == 3
        for r in got:
            assert r.a != r.b
            assert r.c != r.d
        # and distinct across rows as well
        assert len({r.a for r in got} | {r.b for r in got}) == 6


class TestDatetimeAccessors:
    """SPARQL YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS/TZ over
    xsd:dateTime lexicals (round 8 continuation)."""

    @pytest.fixture(scope="class")
    def dt_store(self, spark):
        rows = [
            ("urn:e:1", "urn:ex:at", "1997-03-15T10:30:45"),
            ("urn:e:2", "urn:ex:at", "1998-12-01T23:59:59"),
            ("urn:e:3", "urn:ex:at", "not-a-date"),
            ("urn:e:4", "urn:ex:at", "2001-07-04T08:15:00+05:30"),
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_accessors(self, dt_store):
        got = run(
            dt_store,
            "SELECT ?s (YEAR(?d) AS ?y) (MONTH(?d) AS ?mo) (DAY(?d) AS ?dd) "
            "(HOURS(?d) AS ?h) (MINUTES(?d) AS ?mi) (SECONDS(?d) AS ?sec) "
            "WHERE { ?s ex:at ?d } ORDER BY ?s",
        ).collect()
        assert [tuple(r) for r in got] == [
            ("urn:e:1", 1997, 3, 15, 10, 30, 45),
            ("urn:e:2", 1998, 12, 1, 23, 59, 59),
            # non-dateTime lexical: every accessor is a type error
            ("urn:e:3", None, None, None, None, None, None),
            ("urn:e:4", 2001, 7, 4, 8, 15, 0),
        ]

    def test_year_filter_drops_type_errors(self, dt_store):
        got = run(
            dt_store,
            "SELECT ?s WHERE { ?s ex:at ?d FILTER(YEAR(?d) >= 1998) } "
            "ORDER BY ?s",
        ).collect()
        # e:3's NULL year fails every comparison; e:1 is below the bar
        assert [r.s for r in got] == ["urn:e:2", "urn:e:4"]

    def test_tz(self, dt_store):
        got = run(
            dt_store,
            "SELECT ?s (TZ(?d) AS ?z) WHERE { ?s ex:at ?d } ORDER BY ?s",
        ).collect()
        assert [(r.s, r.z) for r in got] == [
            ("urn:e:1", ""), ("urn:e:2", ""), ("urn:e:3", ""),
            ("urn:e:4", "+05:30"),
        ]

    def test_now_shape(self, dt_store):
        import re as _re

        got = run(
            dt_store, "SELECT (NOW() AS ?t) WHERE { ?s ex:at ?d } LIMIT 1"
        ).collect()
        assert _re.fullmatch(
            r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}", got[0].t
        )


class TestBlankNodeSyntax:
    """_:label terms and [ p o ; ... ] property lists (round 8
    continuation): both desugar to internal non-projectable
    variables; brackets also emit their inner patterns."""

    @pytest.fixture(scope="class")
    def addr_store(self, spark):
        rows = [
            ("urn:p:1", "urn:ex:name", "ada"),
            ("urn:p:1", "urn:ex:age", "36"),
            ("urn:p:1", "urn:ex:addr", "urn:a:1"),
            ("urn:a:1", "urn:ex:city", "london"),
            ("urn:a:1", "urn:ex:zip", "E1"),
            ("urn:p:2", "urn:ex:name", "grace"),
            ("urn:p:2", "urn:ex:age", "47"),
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_bnode_label_joins(self, addr_store):
        got = run(
            addr_store,
            'SELECT ?n WHERE { _:b ex:name ?n . _:b ex:age "47" }',
        )
        assert [r.n for r in got.collect()] == ["grace"]
        assert got.columns == ["n"]  # the label never projects

    def test_anon_property_list_subject(self, addr_store):
        got = run(
            addr_store,
            'SELECT ?n WHERE { [ ex:name ?n ; ex:age "36" ] }',
        ).collect()
        assert [r.n for r in got] == ["ada"]

    def test_anon_object_and_nesting(self, addr_store):
        got = run(
            addr_store,
            "SELECT ?n WHERE { ?p ex:name ?n ; "
            'ex:addr [ ex:city "london" ; ex:zip "E1" ] }',
        ).collect()
        assert [r.n for r in got] == ["ada"]

    def test_bracket_subject_with_predicate_list(self, addr_store):
        got = run(
            addr_store,
            'SELECT ?c WHERE { [ ex:city ?c ] ex:zip "E1" }',
        ).collect()
        assert [r.c for r in got] == ["london"]

    def test_empty_anon_object(self, addr_store):
        # []: pure existential — matches any object of ex:addr
        got = run(
            addr_store,
            "SELECT ?n WHERE { ?p ex:name ?n . ?p ex:addr [] }",
        ).collect()
        assert [r.n for r in got] == ["ada"]

    def test_select_star_excludes_bnode_vars(self, addr_store):
        got = run(
            addr_store, 'SELECT * WHERE { _:b ex:name ?n . _:b ex:age ?a }'
        )
        assert sorted(got.columns) == ["a", "n"]


def test_lake_roundtrip_preserves_literal_metadata(spark, tmp_path):
    """Metadata e2e (round 8): a lang/datatype-bearing graph written
    through the ntriples sink, read back as a LIVE lake store, still
    answers LANG()/DATATYPE() — the writer serializes "x"@tag /
    "x"^^<dt> forms, the reader re-parses them, and the lake scan
    serves the metadata sidecars."""
    from geosparql_etl_spark.sources.ntriples import register
    from geosparql_etl_spark.sparql import NTriplesLakeStore
    from geosparql_etl_spark.sparql.triples import to_ntriples_rows

    register(spark)
    rows = [
        ("urn:n:1", "urn:ex:label", "Berlin", "de", None),
        ("urn:n:2", "urn:ex:label", "york", None, None),
        ("urn:n:1", "urn:ex:pop", "36", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
    ]
    g = spark.createDataFrame(
        rows, "s string, p string, o string, lang string, dt string"
    )
    out = str(tmp_path / "lake")
    to_ntriples_rows(g).write.format("ntriples").mode("overwrite").save(out)
    store = NTriplesLakeStore(spark, out)
    got = sparql_select(
        store,
        PFX + 'SELECT ?s WHERE { ?s ex:label ?l '
        'FILTER(LANGMATCHES(LANG(?l), "de")) }',
    ).collect()
    assert [r.s for r in got] == ["urn:n:1"]
    got = sparql_select(
        store,
        PFX + "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
        "SELECT ?s ?v WHERE { ?s ex:pop ?v "
        "FILTER(DATATYPE(?v) = xsd:integer) }",
    ).collect()
    assert [tuple(r) for r in got] == [("urn:n:1", "36")]


def test_lang_metadata_union_and_unbound(spark):
    """LANG() across UNION branches (each branch provisions its own
    sidecar; unionByName aligns them) and over an UNBOUND optional
    variable (spec: type error -> unbound, not \"\")."""
    rows = [
        ("urn:n:1", "urn:ex:label", "Berlin", "de", None),
        ("urn:n:2", "urn:ex:alias", "Paris", "fr", None),
        ("urn:n:3", "urn:ex:label", "york", None, None),
    ]
    store = TripleStore(
        spark.createDataFrame(
            rows, "s string, p string, o string, lang string, dt string"
        )
    )
    got = run(
        store,
        "SELECT ?s ?t WHERE { { ?s ex:label ?l } UNION { ?s ex:alias ?l } "
        "BIND(LANG(?l) AS ?t) } ORDER BY ?s",
    ).collect()
    assert [tuple(r) for r in got] == [
        ("urn:n:1", "de"), ("urn:n:2", "fr"), ("urn:n:3", ""),
    ]
    got = run(
        store,
        "SELECT ?s ?t WHERE { ?s ex:label ?l "
        "OPTIONAL { ?s ex:alias ?a } BIND(LANG(?a) AS ?t) } ORDER BY ?s",
    ).collect()
    assert [tuple(r) for r in got] == [
        ("urn:n:1", None), ("urn:n:3", None),
    ]


def test_group_by_expression_key(spark):
    """GROUP BY (expr AS ?v): the spec's computed group key,
    desugared to BIND + grouping on the alias."""
    rows = [
        ("urn:n:1", "urn:ex:label", "Berlin", "de", None),
        ("urn:n:2", "urn:ex:label", "Paris", "fr", None),
        ("urn:n:3", "urn:ex:label", "Madrid", "fr", None),
    ]
    store = TripleStore(
        spark.createDataFrame(
            rows, "s string, p string, o string, lang string, dt string"
        )
    )
    got = run(
        store,
        "SELECT ?t (COUNT(?l) AS ?n) WHERE { ?s ex:label ?l } "
        "GROUP BY (LANG(?l) AS ?t) ORDER BY ?t",
    ).collect()
    assert [tuple(r) for r in got] == [("de", 1), ("fr", 2)]


class TestService:
    """SERVICE [SILENT] <iri> { P }: federated patterns against
    register_service stores. Federation is a JOIN between two lazy
    plans, not an RPC — the endpoint registry stands in for a second
    catalog/table provider."""

    @pytest.fixture()
    def remote(self, spark):
        from geosparql_etl_spark.sparql import (
            register_service,
            unregister_service,
        )

        rows = [
            ("urn:c:1", "urn:ex:country", "uk"),
            ("urn:c:2", "urn:ex:country", "uk"),
            ("urn:c:9", "urn:ex:country", "fr"),
        ]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        register_service("urn:svc:geo", store)
        yield store
        unregister_service("urn:svc:geo")

    def test_service_joins_outer(self, toy_store, remote):
        got = run(
            toy_store,
            """
            SELECT ?n ?country WHERE {
              ?p ex:name ?n . ?p ex:city ?c .
              SERVICE <urn:svc:geo> { ?c ex:country ?country }
            } ORDER BY ?n
            """,
        ).collect()
        assert [tuple(r) for r in got] == [("ada", "uk"), ("grace", "uk")]

    def test_service_data_stays_remote(self, toy_store, remote):
        # the local store holds NO ex:country triples: bindings can
        # only have come from the registered endpoint store
        got = run(
            toy_store,
            "SELECT ?c ?country WHERE { ?c ex:country ?country }",
        ).collect()
        assert got == []

    def test_service_silent_unknown_is_unit(self, toy_store):
        got = run(
            toy_store,
            """
            SELECT ?n WHERE {
              ?p a ex:Person . ?p ex:name ?n .
              SERVICE SILENT <urn:svc:nowhere> { ?p ex:x ?y }
            } ORDER BY ?n
            """,
        ).collect()
        # spec 18.6: SILENT failure -> unit solution; outer unchanged
        assert [r.n for r in got] == ["ada", "alan", "grace"]

    def test_service_unknown_raises(self, toy_store):
        with pytest.raises(ValueError, match="SERVICE endpoint"):
            run(
                toy_store,
                "SELECT ?n WHERE { ?p ex:name ?n . "
                "SERVICE <urn:svc:nowhere> { ?p ex:x ?y } }",
            )

    def test_service_variable_endpoint_rejected(self, toy_store):
        with pytest.raises(ValueError, match="constant IRI"):
            run(
                toy_store,
                "SELECT ?n WHERE { "
                "SERVICE ?ep { ?p ex:name ?n } }",
            )

    def test_service_inside_optional(self, toy_store, remote):
        # p:3 (alan) has no city -> OPTIONAL leaves ?country unbound
        got = run(
            toy_store,
            """
            SELECT ?n ?country WHERE {
              ?p a ex:Person . ?p ex:name ?n .
              OPTIONAL {
                ?p ex:city ?c .
                SERVICE <urn:svc:geo> { ?c ex:country ?country }
              }
            } ORDER BY ?n
            """,
        ).collect()
        assert [tuple(r) for r in got] == [
            ("ada", "uk"), ("alan", None), ("grace", "uk"),
        ]

    def test_service_filter_applies_to_joined(self, toy_store, remote):
        got = run(
            toy_store,
            """
            SELECT ?n WHERE {
              ?p ex:name ?n . ?p ex:city ?c .
              SERVICE <urn:svc:geo> { ?c ex:country ?country }
              FILTER(?country = "uk" && ?n != "ada")
            }
            """,
        ).collect()
        assert [r.n for r in got] == ["grace"]


class TestGeoNonTopological:
    """GeoSPARQL 1.1 geof:area / geof:centroid / geof:envelope:
    shoelace math over the parsed outer ring, POINT passthrough,
    non-geometry lexicals as type errors (BIND leaves the variable
    unbound; FILTER drops the row)."""

    @pytest.fixture(scope="class")
    def geo_store(self, spark):
        rows = [
            ("urn:g:sq", "urn:ex:wkt", "POLYGON((0 0, 4 0, 4 2, 0 2, 0 0))"),
            ("urn:g:tri", "urn:ex:wkt", "POLYGON((0 0, 6 0, 0 6, 0 0))"),
            ("urn:g:pt", "urn:ex:wkt", "POINT(3.5 -1.5)"),
            ("urn:g:bad", "urn:ex:wkt", "MULTIPOINT(0 0, 1 1)"),
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_area_centroid_envelope(self, geo_store):
        got = run(
            geo_store,
            """
            SELECT ?s ?a ?c ?e WHERE {
              ?s ex:wkt ?g .
              BIND(geof:area(?g) AS ?a)
              BIND(geof:centroid(?g) AS ?c)
              BIND(geof:envelope(?g) AS ?e)
            } ORDER BY ?s
            """,
        ).collect()
        assert [tuple(r) for r in got] == [
            ("urn:g:bad", None, None, None),
            ("urn:g:pt", 0.0, "POINT(3.5 -1.5)", "POINT(3.5 -1.5)"),
            (
                "urn:g:sq",
                8.0,
                "POINT(2.0 1.0)",
                "POLYGON((0.0 0.0, 4.0 0.0, 4.0 2.0, 0.0 2.0, 0.0 0.0))",
            ),
            (
                "urn:g:tri",
                18.0,
                "POINT(2.0 2.0)",
                "POLYGON((0.0 0.0, 6.0 0.0, 6.0 6.0, 0.0 6.0, 0.0 0.0))",
            ),
        ]

    def test_centroid_clockwise_ring_and_unclosed(self, geo_store, spark):
        # clockwise orientation (negative signed area) and a ring
        # without the closing repeat both centroid correctly
        rows = [
            ("urn:g:cw", "urn:ex:wkt", "POLYGON((0 0, 0 2, 4 2, 4 0, 0 0))"),
            ("urn:g:open", "urn:ex:wkt", "POLYGON((0 0, 4 0, 4 2, 0 2))"),
        ]
        st = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(
            st,
            "SELECT ?s ?c WHERE { ?s ex:wkt ?g . "
            "BIND(geof:centroid(?g) AS ?c) } ORDER BY ?s",
        ).collect()
        assert [tuple(r) for r in got] == [
            ("urn:g:cw", "POINT(2.0 1.0)"),
            ("urn:g:open", "POINT(2.0 1.0)"),
        ]

    def test_area_filter_drops_type_errors(self, geo_store):
        # FILTER over geof:area: the LINESTRING row is a type error
        # (NULL compares to nothing) and drops; POINT area is 0
        got = run(
            geo_store,
            "SELECT ?s WHERE { ?s ex:wkt ?g . "
            "FILTER(geof:area(?g) > 5.0) } ORDER BY ?s",
        ).collect()
        assert [r.s for r in got] == ["urn:g:sq", "urn:g:tri"]

    def test_linestring_length_centroid_envelope(self, spark):
        rows = [("urn:g:ls", "urn:ex:wkt", "LINESTRING(0 0, 3 4, 3 10)")]
        st = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(
            st,
            """
            SELECT ?len ?a ?c ?e WHERE {
              ?s ex:wkt ?g .
              BIND(geof:length(?g) AS ?len)
              BIND(geof:area(?g) AS ?a)
              BIND(geof:centroid(?g) AS ?c)
              BIND(geof:envelope(?g) AS ?e)
            }
            """,
        ).collect()
        (r,) = got
        # segments 5 + 6; centroid = length-weighted midpoints
        # (5*(1.5,2) + 6*(3,7)) / 11 — shapely LineString conventions
        assert r.len == 11.0 and r.a == 0.0
        assert r.c == "POINT(2.3181818181818183 4.7272727272727275)"
        assert r.e == "POLYGON((0.0 0.0, 3.0 0.0, 3.0 10.0, 0.0 10.0, 0.0 0.0))"

    def test_polygon_length_is_perimeter(self, geo_store):
        got = run(
            geo_store,
            "SELECT ?s ?len WHERE { ?s ex:wkt ?g . "
            "BIND(geof:length(?g) AS ?len) FILTER(?len > 0) } ORDER BY ?s",
        ).collect()
        assert [tuple(r) for r in got] == [
            ("urn:g:sq", 12.0),
            ("urn:g:tri", 12.0 + (72.0 ** 0.5)),
        ]

    def test_degenerate_ring_is_type_error(self, spark):
        # zero-area polygon: centroid is undefined -> unbound
        rows = [("urn:g:z", "urn:ex:wkt", "POLYGON((0 0, 2 0, 4 0, 0 0))")]
        st = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(
            st,
            "SELECT ?c WHERE { ?s ex:wkt ?g . BIND(geof:centroid(?g) AS ?c) }",
        ).collect()
        assert [r.c for r in got] == [None]


class TestSpecFillsRound8c:
    """REDUCED (identity — spec-lawful), isNumeric, sameTerm."""

    @pytest.fixture(scope="class")
    def typed_store(self, spark):
        rows = [
            # (s, p, o, lang, dt)
            ("urn:x:1", "urn:ex:v", "47", None, None),
            ("urn:x:2", "urn:ex:v", "47", None, "xsd:integer"),
            ("urn:x:3", "urn:ex:v", "47", "en", None),
            ("urn:x:4", "urn:ex:v", "urn:other:47", None, None),
            ("urn:x:5", "urn:ex:v", "fourty-seven", None, None),
            ("urn:x:6", "urn:ex:v", "47", None, "xsd:string"),
        ]
        return TripleStore(
            spark.createDataFrame(
                rows, "s string, p string, o string, lang string, dt string"
            )
        )

    def test_reduced_parses_and_keeps_rows(self, toy_store):
        got = run(
            toy_store,
            "SELECT REDUCED ?c WHERE { ?p ex:city ?c }",
        ).collect()
        # identity implementation: every city binding survives, same
        # as the plain (non-DISTINCT) projection
        plain = run(
            toy_store, "SELECT ?c WHERE { ?p ex:city ?c }"
        ).collect()
        assert sorted(r.c for r in got) == sorted(r.c for r in plain)
        assert len(got) >= 2

    def test_isnumeric(self, typed_store):
        got = run(
            typed_store,
            "SELECT ?s WHERE { ?s ex:v ?o . FILTER(isNumeric(?o)) } ORDER BY ?s",
        ).collect()
        # plain parseable + numeric-typed pass; tagged, IRI, word,
        # string-typed fail
        assert [r.s for r in got] == ["urn:x:1", "urn:x:2"]

    def test_sameterm_is_strict_term_identity(self, typed_store):
        # "47" plain matches only the OTHER plain "47" — not the
        # integer-typed, tagged, or string-typed spellings '=' might
        # coerce together
        got = run(
            typed_store,
            """
            SELECT ?a ?b WHERE {
              ?a ex:v ?x . ?b ex:v ?y .
              FILTER(sameTerm(?x, ?y) && STR(?a) < STR(?b))
            } ORDER BY ?a ?b
            """,
        ).collect()
        assert [tuple(r) for r in got] == []

    def test_sameterm_const_and_var(self, typed_store):
        got = run(
            typed_store,
            'SELECT ?s WHERE { ?s ex:v ?o . FILTER(sameTerm(?o, "47")) }',
        ).collect()
        assert [r.s for r in got] == ["urn:x:1"]

    def test_sameterm_tagged_const(self, typed_store):
        got = run(
            typed_store,
            'SELECT ?s WHERE { ?s ex:v ?o . FILTER(sameTerm(?o, "47"@en)) }',
        ).collect()
        assert [r.s for r in got] == ["urn:x:3"]


class TestSfIntersects:
    """geof:sfIntersects: point-point / point-polygon / polygon-polygon
    in one frame, and the var-var polygon-polygon grid-cover join
    rewrite (no CartesianProduct, no duplicate solutions)."""

    SQUARE = "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"

    @pytest.fixture(scope="class")
    def shapes(self, spark):
        rows = [
            ("urn:a:overlap", "urn:ex:g", "POLYGON((3 3, 6 3, 6 6, 3 6, 3 3))"),
            ("urn:a:inside", "urn:ex:g", "POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))"),
            # a strip passing clean through: NO vertex of either
            # polygon is inside the other — only the edge-cross arm
            # can detect this intersection
            ("urn:a:cross", "urn:ex:g", "POLYGON((-1 1, 5 1, 5 2, -1 2, -1 1))"),
            ("urn:a:far", "urn:ex:g", "POLYGON((10 10, 12 10, 12 12, 10 12, 10 10))"),
            ("urn:a:pt_in", "urn:ex:g", "POINT(3 3)"),
            ("urn:a:pt_out", "urn:ex:g", "POINT(9 9)"),
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_same_frame_vs_constant(self, shapes):
        got = run(
            shapes,
            "SELECT ?s WHERE { ?s ex:g ?g . "
            f'FILTER(geof:sfIntersects(?g, "{self.SQUARE}")) }} ORDER BY ?s',
        ).collect()
        assert [r.s for r in got] == [
            "urn:a:cross", "urn:a:inside", "urn:a:overlap", "urn:a:pt_in",
        ]

    def test_point_argument(self, shapes):
        # point-polygon: strictly interior point of 'overlap' only;
        # point-point: exact coordinate equality
        got = run(
            shapes,
            'SELECT ?s WHERE { ?s ex:g ?g . '
            'FILTER(geof:sfIntersects(?g, "POINT(3.5 3.5)")) } ORDER BY ?s',
        ).collect()
        assert [r.s for r in got] == ["urn:a:overlap"]
        got = run(
            shapes,
            'SELECT ?s WHERE { ?s ex:g ?g . '
            'FILTER(geof:sfIntersects(?g, "POINT(9 9)")) } ORDER BY ?s',
        ).collect()
        assert [r.s for r in got] == ["urn:a:pt_out"]

    def test_var_var_grid_join(self, shapes, spark):
        zones = TripleStore(
            spark.createDataFrame(
                [
                    ("urn:z:low", "urn:ex:zone", self.SQUARE),
                    (
                        "urn:z:high",
                        "urn:ex:zone",
                        "POLYGON((9 9, 13 9, 13 13, 9 13, 9 9))",
                    ),
                ],
                "s string, p string, o string",
            ).unionByName(shapes.df.select("s", "p", "o"))
            if hasattr(shapes, "df")
            else spark.createDataFrame(
                [
                    ("urn:z:low", "urn:ex:zone", self.SQUARE),
                    (
                        "urn:z:high",
                        "urn:ex:zone",
                        "POLYGON((9 9, 13 9, 13 13, 9 13, 9 9))",
                    ),
                    ("urn:a:overlap", "urn:ex:g", "POLYGON((3 3, 6 3, 6 6, 3 6, 3 3))"),
                    ("urn:a:inside", "urn:ex:g", "POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))"),
                    ("urn:a:cross", "urn:ex:g", "POLYGON((-1 1, 5 1, 5 2, -1 2, -1 1))"),
                    ("urn:a:far", "urn:ex:g", "POLYGON((10 10, 12 10, 12 12, 10 12, 10 10))"),
                ],
                "s string, p string, o string",
            )
        )
        df = run(
            zones,
            """
            SELECT ?s ?z WHERE {
              ?s ex:g ?g . ?z ex:zone ?w .
              FILTER(geof:sfIntersects(?g, ?w))
            } ORDER BY ?s ?z
            """,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        got = [tuple(r) for r in df.collect()]
        # each matching pair exactly ONCE (canonical-cell rule), even
        # though big shapes share several cover cells
        assert got == [
            ("urn:a:cross", "urn:z:low"),
            ("urn:a:far", "urn:z:high"),
            ("urn:a:inside", "urn:z:low"),
            ("urn:a:overlap", "urn:z:low"),
        ]

    def test_static_polygon_bind_prunes_point_arms(self, spark):
        """Round 10: a var bound by CONCAT("POLYGON((", ...) is
        statically all-POLYGON, so the grid sfIntersects rewrite
        builds only the two arms that side can feed (polygon-polygon,
        polygon-point) — 2 joins in the optimized plan instead of 4 —
        while a store-derived side (unknown domain) keeps its mixed
        arms and both shape classes still match correctly."""
        from geosparql_etl_spark.sparql.compiler import _static_wkt_shape

        assert _static_wkt_shape(("str", "POLYGON((0 0, 1 0, 0 1, 0 0))")) == "POLYGON"
        assert _static_wkt_shape(("str", "  point(1 2)")) == "POINT"
        assert _static_wkt_shape(
            ("call", "concat", [("str", "POLYGON(("), ("var", "x")])
        ) == "POLYGON"
        assert _static_wkt_shape(("var", "x")) is None
        assert _static_wkt_shape(("call", "concat", [("var", "x")])) is None

        store = TripleStore(
            spark.createDataFrame(
                [
                    ("urn:s:1", "urn:ex:w", "0"),
                    ("urn:z:1", "urn:ex:zone",
                     "POLYGON((3 3, 6 3, 6 6, 3 6, 3 3))"),
                    ("urn:z:2", "urn:ex:zone", "POINT(1 1)"),
                    ("urn:z:3", "urn:ex:zone", "POINT(20 20)"),
                ],
                "s string, p string, o string",
            )
        )
        q = """
        SELECT ?s ?z WHERE {
          ?s ex:w ?a .
          BIND(CONCAT("POLYGON((", STR(?a), " 0, 9 0, 9 9, 0 9, 0 0))") AS ?ga)
          ?z ex:zone ?w .
          FILTER(geof:sfIntersects(?ga, ?w))
        } ORDER BY ?s ?z
        """
        df = run(store, q)
        # both reachable shape classes match; the far point does not
        assert sorted(tuple(r) for r in df.collect()) == [
            ("urn:s:1", "urn:z:1"),
            ("urn:s:1", "urn:z:2"),
        ]
        op = df._jdf.queryExecution().optimizedPlan().toString()
        n_joins = len([ln for ln in op.splitlines() if "Join" in ln])
        assert n_joins == 2, f"expected 2 shape arms, plan has {n_joins} joins"

    def test_var_var_grid_join_with_points(self, spark):
        # round-9 ADVICE fix: POINT geometries used to parse to NULL
        # rings and silently DROP from the grid-cover rewrite, so the
        # same FILTER gave different answers on connected vs
        # disconnected plans. Points now land in their single cell and
        # the full mixed predicate re-applies after the cell join —
        # point-point, point-polygon, polygon-point, polygon-polygon
        # all in one var-var join.
        rows = [
            ("urn:q:in_low", "urn:ex:g", "POINT(3.5 3.5)"),
            ("urn:q:in_high", "urn:ex:g", "POINT(10.5 10.5)"),
            ("urn:q:nowhere", "urn:ex:g", "POINT(20 20)"),
            ("urn:q:poly", "urn:ex:g", "POLYGON((3 3, 6 3, 6 6, 3 6, 3 3))"),
            ("urn:z:low", "urn:ex:zone", self.SQUARE),
            ("urn:z:high", "urn:ex:zone",
             "POLYGON((9 9, 13 9, 13 13, 9 13, 9 9))"),
            ("urn:z:pt", "urn:ex:zone", "POINT(3.5 3.5)"),
        ]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        df = run(
            store,
            """
            SELECT ?s ?z WHERE {
              ?s ex:g ?g . ?z ex:zone ?w .
              FILTER(geof:sfIntersects(?g, ?w))
            } ORDER BY ?s ?z
            """,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        got = [tuple(r) for r in df.collect()]
        assert got == [
            ("urn:q:in_high", "urn:z:high"),
            ("urn:q:in_low", "urn:z:low"),
            ("urn:q:in_low", "urn:z:pt"),
            ("urn:q:poly", "urn:z:low"),
            ("urn:q:poly", "urn:z:pt"),
        ]


class TestOrderByAggregates:
    """Inline aggregate calls in ORDER BY (spec 18.2.4.4): reuse a
    projected alias when one matches, otherwise a hidden aggregate
    column that rides to the sort and is dropped after."""

    @pytest.fixture(scope="class")
    def cities(self, spark):
        rows = [
            ("urn:p:%d" % i, "urn:ex:city", c)
            for i, c in enumerate(["a", "b", "b", "c", "c", "c"])
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_orderby_agg_reuses_projected_alias(self, cities):
        got = run(
            cities,
            "SELECT ?c (COUNT(?s) AS ?n) WHERE { ?s ex:city ?c } "
            "GROUP BY ?c ORDER BY DESC(COUNT(?s)) ?c",
        ).collect()
        assert [tuple(r) for r in got] == [("c", 3), ("b", 2), ("a", 1)]

    def test_orderby_agg_not_projected(self, cities):
        got = run(
            cities,
            "SELECT ?c WHERE { ?s ex:city ?c } "
            "GROUP BY ?c ORDER BY DESC(COUNT(?s)) ?c",
        )
        assert got.columns == ["c"]  # the hidden sort column is gone
        assert [r.c for r in got.collect()] == ["c", "b", "a"]

    def test_orderby_and_having_share_hidden_aggregate(self, cities):
        got = run(
            cities,
            "SELECT ?c WHERE { ?s ex:city ?c } GROUP BY ?c "
            "HAVING(COUNT(?s) > 1) ORDER BY DESC(COUNT(?s))",
        ).collect()
        assert [r.c for r in got] == ["c", "b"]

    def test_distinct_with_hidden_order_column(self, cities):
        got = run(
            cities,
            "SELECT DISTINCT ?c WHERE { ?s ex:city ?c } "
            "GROUP BY ?c ORDER BY DESC(COUNT(?s))",
        )
        assert got.columns == ["c"]
        assert [r.c for r in got.collect()] == ["c", "b", "a"]

    def test_count_star_in_having_and_orderby(self, cities):
        got = run(
            cities,
            "SELECT ?c WHERE { ?s ex:city ?c } GROUP BY ?c "
            "HAVING(COUNT(*) > 1) ORDER BY DESC(COUNT(*)) ?c",
        ).collect()
        assert [r.c for r in got] == ["c", "b"]

    def test_count_star_reuses_projected_alias(self, cities):
        got = run(
            cities,
            "SELECT ?c (COUNT(*) AS ?n) WHERE { ?s ex:city ?c } "
            "GROUP BY ?c ORDER BY DESC(COUNT(*))",
        ).collect()
        assert [tuple(r) for r in got] == [("c", 3), ("b", 2), ("a", 1)]

    def test_sum_star_rejected(self, cities):
        # only COUNT takes the star; SUM(*) fails loudly at parse
        with pytest.raises(ValueError):
            run(
                cities,
                "SELECT ?c WHERE { ?s ex:city ?c } GROUP BY ?c "
                "HAVING(SUM(*) > 1)",
            ).collect()


class TestTermConstructors:
    """IRI()/URI(), BNODE() and BNODE(str): term minting in the
    lexical-string store."""

    def test_iri_from_concat(self, toy_store):
        names = sorted(
            r.n for r in run(
                toy_store, "SELECT ?n WHERE { ?p ex:name ?n }"
            ).collect()
        )
        got = run(
            toy_store,
            'SELECT ?u WHERE { ?p ex:name ?n . '
            'BIND(IRI(CONCAT("urn:person:", ?n)) AS ?u) } ORDER BY ?u',
        ).collect()
        assert [r.u for r in got] == ["urn:person:" + n for n in names]
        # the minted term is an IRI to isIRI()
        got = run(
            toy_store,
            'SELECT ?n WHERE { ?p ex:name ?n . '
            'FILTER(isIRI(URI(CONCAT("urn:person:", ?n)))) }',
        ).collect()
        assert len(got) == len(names)

    def test_bnode_fresh_per_row(self, toy_store):
        got = run(
            toy_store,
            "SELECT ?b WHERE { ?p ex:name ?n . BIND(BNODE() AS ?b) }",
        ).collect()
        vals = [r.b for r in got]
        assert len(vals) == len(set(vals)) >= 3
        assert all(v.startswith("_:") for v in vals)

    def test_bnode_deterministic_from_arg(self, toy_store):
        q = (
            "SELECT ?n ?b WHERE { ?p ex:name ?n . BIND(BNODE(?n) AS ?b) } "
            "ORDER BY ?n"
        )
        by_name = {r.n: r.b for r in run(toy_store, q).collect()}
        # stable skolemization: same label -> same node, run to run
        assert by_name == {r.n: r.b for r in run(toy_store, q).collect()}
        assert by_name and all(
            b.startswith("_:") for b in by_name.values()
        )
        # the minted node answers isBlank()
        got = run(
            toy_store,
            "SELECT ?n WHERE { ?p ex:name ?n . FILTER(isBlank(BNODE(?n))) }",
        ).collect()
        assert len(got) == len(by_name) or len(got) >= 3


class TestOptionalFilterScope:
    """FILTER inside OPTIONAL referencing outer variables is the
    LeftJoin CONDITION (spec 18.2.2.5): a left row keeps a match only
    when the merged solution passes, and keeps the optional side
    unbound otherwise — never dropped."""

    @pytest.fixture(scope="class")
    def people(self, spark):
        rows = [
            ("urn:p:1", "urn:ex:name", "ada"),
            ("urn:p:1", "urn:ex:city", "urn:c:1"),
            ("urn:p:2", "urn:ex:name", "bob"),
            ("urn:p:2", "urn:ex:city", "urn:c:2"),
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_outer_var_filter_is_join_condition(self, people):
        got = run(
            people,
            'SELECT ?n ?c WHERE { ?p ex:name ?n '
            'OPTIONAL { ?p ex:city ?c FILTER(?n = "ada") } } ORDER BY ?n',
        ).collect()
        assert [tuple(r) for r in got] == [
            ("ada", "urn:c:1"), ("bob", None),
        ]

    def test_inner_only_filter_keeps_current_path(self, people):
        got = run(
            people,
            'SELECT ?n ?c WHERE { ?p ex:name ?n '
            'OPTIONAL { ?p ex:city ?c FILTER(?c = "urn:c:1") } } ORDER BY ?n',
        ).collect()
        assert [tuple(r) for r in got] == [
            ("ada", "urn:c:1"), ("bob", None),
        ]

    def test_mixed_condition_over_both_sides(self, people):
        got = run(
            people,
            'SELECT ?n ?c WHERE { ?p ex:name ?n OPTIONAL { ?p ex:city ?c '
            'FILTER(?n = "bob" && ?c = "urn:c:2") } } ORDER BY ?n',
        ).collect()
        assert [tuple(r) for r in got] == [
            ("ada", None), ("bob", "urn:c:2"),
        ]


def test_construct_template_blank_nodes_fresh_per_solution(toy_store, spark):
    """Template blank nodes mint one node per solution: the same _:x
    within a solution's instantiation shares the node, different
    solutions differ."""
    rows = [
        ("urn:p:1", "urn:ex:name", "ada"),
        ("urn:p:2", "urn:ex:name", "bob"),
    ]
    st = TripleStore(
        spark.createDataFrame(rows, "s string, p string, o string")
    )
    got = run(
        st,
        'CONSTRUCT { _:x ex:label ?n . _:x ex:type "person" } '
        "WHERE { ?p ex:name ?n }",
    ).collect()
    by_node = {}
    for r in got:
        by_node.setdefault(r.s, []).append((r.p, r.o))
    # two solutions -> two distinct bnodes, each with both triples
    assert len(by_node) == 2
    for triples in by_node.values():
        assert len(triples) == 2
        assert any(p.endswith("type") and o == "person" for p, o in triples)
    assert all(n.startswith("_:") for n in by_node)


class TestUpdateMetadataPreservation:
    """Round-9 ADVICE fix: updates return full(meta=True) — a single
    update must not strip lang/datatype metadata graph-wide."""

    def _meta_store(self, spark):
        rows = [
            ("urn:n:1", "urn:ex:label", "hello", "en", None),
            ("urn:n:1", "urn:ex:size", "42", None,
             "http://www.w3.org/2001/XMLSchema#integer"),
            ("urn:n:1", "urn:ex:junk", "x", None, None),
        ]
        return TripleStore(spark.createDataFrame(
            rows, "s string, p string, o string, lang string, dt string"
        ))

    def test_delete_keeps_survivor_metadata(self, spark):
        from geosparql_etl_spark.sparql.compiler import sparql_update

        out = sparql_update(
            self._meta_store(spark),
            'DELETE WHERE { <urn:n:1> <urn:ex:junk> ?o }',
        )
        assert set(out.columns) == {"s", "p", "o", "lang", "dt"}
        rows = {r.p: r for r in out.collect()}
        assert set(rows) == {"urn:ex:label", "urn:ex:size"}
        assert rows["urn:ex:label"].lang == "en"
        assert rows["urn:ex:size"].dt.endswith("#integer")

    def test_insert_rows_get_null_metadata(self, spark):
        from geosparql_etl_spark.sparql.compiler import sparql_update

        out = sparql_update(
            self._meta_store(spark),
            'INSERT DATA { <urn:n:2> <urn:ex:label> "salut" }',
        )
        rows = {(r.s, r.p): r for r in out.collect()}
        assert rows[("urn:n:2", "urn:ex:label")].lang is None
        # pre-existing tagged literal untouched
        assert rows[("urn:n:1", "urn:ex:label")].lang == "en"

    def test_update_result_roundtrips_tags_to_ntriples(self, spark):
        from geosparql_etl_spark.sinks.rdf import render_ntriples
        from geosparql_etl_spark.sparql.compiler import sparql_update
        from geosparql_etl_spark.sparql.triples import to_ntriples_rows

        out = sparql_update(
            self._meta_store(spark),
            'DELETE WHERE { <urn:n:1> <urn:ex:junk> ?o }',
        )
        lines = {r.line for r in render_ntriples(to_ntriples_rows(out)).collect()}
        assert '<urn:n:1> <urn:ex:label> "hello"@en .' in lines
        assert ('<urn:n:1> <urn:ex:size> '
                '"42"^^<http://www.w3.org/2001/XMLSchema#integer> .'
                ) in lines


def test_predicate_shape_statistics_prune_store_side_arms(spark):
    """Round 10, the statistics half of shape-arm pruning: a store
    whose predicate's objects are ALL polygons prunes the point arms
    for a store-derived var the same way a BIND constant does — ONE
    join subtree for a polygon-polygon var-var filter — while a
    mixed-shape predicate keeps its arms and stats memoize per
    instance (one aggregate pass, then free)."""
    rows = [
        ("urn:a:1", "urn:ex:g", "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"),
        ("urn:a:2", "urn:ex:g", "POLYGON((10 10, 12 10, 12 12, 10 12, 10 10))"),
        ("urn:z:1", "urn:ex:zone", "POLYGON((3 3, 6 3, 6 6, 3 6, 3 3))"),
        ("urn:z:2", "urn:ex:zone", "POLYGON((20 20, 22 20, 22 22, 20 22, 20 20))"),
        ("urn:m:1", "urn:ex:mixed", "POINT(1 1)"),
        ("urn:m:2", "urn:ex:mixed", "POLYGON((0 0, 2 0, 0 2, 0 0))"),
    ]
    store = TripleStore(
        spark.createDataFrame(rows, "s string, p string, o string")
    )
    assert store.predicate_object_shape("urn:ex:g") == "POLYGON"
    assert store.predicate_object_shape("urn:ex:zone") == "POLYGON"
    assert store.predicate_object_shape("urn:ex:mixed") is None
    assert store.predicate_object_shape("urn:ex:absent") is None
    # memoized per instance (immutable-data stores set stats_key for a
    # process-wide memo — tpch_store does)
    assert store._shape_stats["urn:ex:g"] == "POLYGON"

    df = run(
        store,
        """
        SELECT ?a ?z WHERE {
          ?a ex:g ?ga . ?z ex:zone ?w .
          FILTER(geof:sfIntersects(?ga, ?w))
        } ORDER BY ?a ?z
        """,
    )
    assert [tuple(r) for r in df.collect()] == [("urn:a:1", "urn:z:1")]
    op = df._jdf.queryExecution().optimizedPlan().toString()
    n_joins = len([ln for ln in op.splitlines() if "Join" in ln])
    assert n_joins == 1, f"stats should prune to 1 arm, got {n_joins}"


def test_lake_store_shape_stats_disabled(spark, tmp_path):
    """NTriplesLakeStore's backing data is LIVE (appends land between
    queries): predicate_object_shape must return unknown (both arms
    kept — always sound) instead of memoizing a stale domain."""
    from geosparql_etl_spark.sources.ntriples import register
    from geosparql_etl_spark.sparql.triples import (
        NTriplesLakeStore,
        to_ntriples_rows,
    )

    register(spark)
    rows = spark.createDataFrame(
        [("urn:z:1", "urn:ex:zone", "POLYGON((0 0, 2 0, 0 2, 0 0))")],
        "s string, p string, o string",
    )
    path = str(tmp_path / "lake")
    to_ntriples_rows(rows).write.format("ntriples").mode(
        "overwrite"
    ).save(path)
    store = NTriplesLakeStore(spark, path)
    assert store.shape_stats_enabled is False
    assert store.predicate_object_shape("urn:ex:zone") is None


class TestD1CompatibilityJoins:
    """Deviation D1 CLOSED (round 11): a shared variable that can be
    UNBOUND (OPTIONAL / non-uniform UNION / VALUES UNDEF / subquery
    projection of one) joins later groups with spec 18.3 COMPATIBILITY
    semantics — unbound matches anything, the merged solution takes
    the bound side's value — instead of SQL NULL-equality (which
    silently dropped those rows). Never-null shared vars keep the
    untouched equi-join fast path."""

    def test_optional_null_var_rejoined_by_later_bgp(self, toy_store):
        # alan has no ex:city -> ?c unbound -> compatible with EVERY
        # (?c ex:name ?cname) binding; merged solution takes its ?c
        got = run(
            toy_store,
            """SELECT ?p ?c ?cname WHERE {
                 ?p a ex:Person .
                 OPTIONAL { ?p ex:city ?c }
                 ?c a ex:City . ?c ex:name ?cname .
               } ORDER BY ?p ?c""",
        )
        assert [tuple(r) for r in got.collect()] == [
            ("urn:p:1", "urn:c:1", "london"),
            ("urn:p:2", "urn:c:2", "york"),
            ("urn:p:3", "urn:c:1", "london"),
            ("urn:p:3", "urn:c:2", "york"),
        ]

    def test_union_missing_var_rejoined(self, toy_store):
        # the second UNION branch does not bind ?c -> its rows carry
        # NULL -> must join every city, not vanish
        got = run(
            toy_store,
            """SELECT ?p ?c ?cname WHERE {
                 { ?p ex:city ?c } UNION { ?p ex:name "alan" }
                 ?c a ex:City . ?c ex:name ?cname .
               } ORDER BY ?p ?c""",
        )
        assert [tuple(r) for r in got.collect()] == [
            ("urn:p:1", "urn:c:1", "london"),
            ("urn:p:2", "urn:c:2", "york"),
            ("urn:p:3", "urn:c:1", "london"),
            ("urn:p:3", "urn:c:2", "york"),
        ]

    def test_exists_with_unbound_shared_var(self, toy_store):
        # spec compatibility: alan's unbound ?c is compatible with any
        # EXISTS solution -> alan passes the filter (SQL semi-join on
        # NULL would drop it)
        got = run(
            toy_store,
            """SELECT ?p WHERE {
                 ?p a ex:Person .
                 OPTIONAL { ?p ex:city ?c }
                 FILTER EXISTS { ?c ex:name ?any }
               } ORDER BY ?p""",
        )
        assert [r.p for r in got.collect()] == [
            "urn:p:1", "urn:p:2", "urn:p:3",
        ]

    def test_minus_domain_overlap_rule(self, toy_store):
        # MINUS removes ada (bound ?c matches the london binding);
        # alan's domain is DISJOINT from the MINUS solutions (?c
        # unbound) so spec 8.3 keeps it even though it is "compatible"
        got = run(
            toy_store,
            """SELECT ?p WHERE {
                 ?p a ex:Person .
                 OPTIONAL { ?p ex:city ?c }
                 MINUS { ?c ex:name "london" . }
               } ORDER BY ?p""",
        )
        assert [r.p for r in got.collect()] == ["urn:p:2", "urn:p:3"]

    def test_subquery_projects_nullable_var(self, toy_store):
        # the maybe-unbound mark must survive subquery projection: the
        # OUTER group re-joins ?c produced by an OPTIONAL inside the
        # subquery
        got = run(
            toy_store,
            """SELECT ?p ?cname WHERE {
                 { SELECT ?p ?c WHERE {
                     ?p a ex:Person . OPTIONAL { ?p ex:city ?c }
                 } }
                 ?c a ex:City . ?c ex:name ?cname .
               } ORDER BY ?p ?cname""",
        )
        assert [tuple(r) for r in got.collect()] == [
            ("urn:p:1", "london"),
            ("urn:p:2", "york"),
            ("urn:p:3", "london"),
            ("urn:p:3", "york"),
        ]

    def test_erroring_bind_var_rejoined(self, toy_store):
        # spec 10.1: BIND whose expression ERRORS binds nothing — a
        # string lexical under arithmetic is a numeric type error, so
        # ?x is unbound for every person; unbound ?x is compatible
        # with EVERY ?x the later BGP binds (ages), and the merged
        # solution takes the bound side's value. The round-11 residual:
        # unmarked BIND outputs equi-joined on NULL -> zero rows.
        got = run(
            toy_store,
            """SELECT ?p ?q ?x WHERE {
                 ?p a ex:Person . ?p ex:name ?name .
                 BIND(?name * 2 AS ?x)
                 ?q ex:age ?x .
               } ORDER BY ?p ?q""",
        )
        rows = [tuple(r) for r in got.collect()]
        # 3 persons x 2 age bindings; ?x takes the bound side's value
        # in its LEXICAL form (the type-mismatched merge carries both
        # sides as strings — a double column would ANSI-crash on
        # non-numeric lexicals like sp44's vip terms)
        assert len(rows) == 6
        assert ("urn:p:3", "urn:p:1", "36") in rows
        assert ("urn:p:3", "urn:p:2", "47") in rows

    def test_bind_of_maybe_unbound_var_propagates_mark(self, toy_store):
        # copying an OPTIONAL-produced var through BIND copies its
        # unboundness: alan's ?c2 is unbound and must re-join both
        # cities, exactly like joining ?c directly
        got = run(
            toy_store,
            """SELECT ?p ?c2 ?cn WHERE {
                 ?p a ex:Person .
                 OPTIONAL { ?p ex:city ?c }
                 BIND(?c AS ?c2)
                 ?c2 a ex:City . ?c2 ex:name ?cn .
               } ORDER BY ?p ?c2""",
        )
        assert [tuple(r) for r in got.collect()] == [
            ("urn:p:1", "urn:c:1", "london"),
            ("urn:p:2", "urn:c:2", "york"),
            ("urn:p:3", "urn:c:1", "london"),
            ("urn:p:3", "urn:c:2", "york"),
        ]

    def test_subquery_erroring_select_expr_rejoined(self, toy_store):
        # (expr AS ?alias) is BIND's twin: a subquery projecting an
        # ERRORING expression leaves the alias unbound, and the outer
        # group's join must apply compatibility semantics
        got = run(
            toy_store,
            """SELECT ?p ?q ?x WHERE {
                 { SELECT ?p (?name * 2 AS ?x) WHERE {
                     ?p a ex:Person . ?p ex:name ?name } }
                 ?q ex:age ?x .
               } ORDER BY ?p ?q""",
        )
        rows = [tuple(r) for r in got.collect()]
        assert len(rows) == 6  # 3 persons x 2 age bindings
        assert ("urn:p:3", "urn:p:1", "36") in rows

    def test_total_bind_is_not_marked(self, toy_store):
        # a BIND that can never error (string function over a var the
        # BGP guarantees bound) must NOT be marked maybe-unbound: a
        # later join on it keeps the equi fast path (marks survive
        # projection, so a wrong mark would show on the result frame)
        from geosparql_etl_spark.sparql.compiler import _maybe_null_vars

        inner = run(
            toy_store,
            """SELECT ?p ?u WHERE {
                 ?p ex:city ?c . BIND(UCASE(?c) AS ?u)
               }""",
        )
        assert "u" not in _maybe_null_vars(inner)

    def test_bound_vars_keep_equi_join_plan(self, toy_store):
        # never-null shared vars must keep the plain equi-join fast
        # path: no BroadcastNestedLoopJoin in a pure BGP chain plan
        df = run(
            toy_store,
            "SELECT ?p ?cname WHERE { ?p ex:city ?c . ?c ex:name ?cname }",
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_values_undef_keeps_grid_rewrite_alive(toy_store):
    """Round-11 advice #2: an UNDEF VALUES must not eagerly flatten
    pending DISCONNECTED frames — deferral leaves them for the
    FILTER-stage grid spatial rewrite, so a var-var geof:distance
    between two city frames still compiles to the grid-bucketed join
    (no CartesianProduct), with the VALUES compatibility join applied
    on top."""
    df = run(
        toy_store,
        """SELECT ?a ?b ?tag WHERE {
             ?a a ex:City . ?a geo:asWKT ?wa .
             ?b a ex:City . ?b geo:asWKT ?wb .
             VALUES (?a ?tag) { (<urn:c:1> UNDEF) (<urn:c:2> "x") }
             FILTER(geof:distance(?wa, ?wb) < 200)
           } ORDER BY ?a ?b""",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = [tuple(r) for r in df.collect()]
    assert got == [
        ("urn:c:1", "urn:c:1", None),
        ("urn:c:1", "urn:c:2", None),
        ("urn:c:2", "urn:c:1", "x"),
        ("urn:c:2", "urn:c:2", "x"),
    ]


class TestRound11ReviewFixes:
    """Round-11 code-review repros, pinned: (1) the OPTIONAL
    lifted-filter path must not emit a phantom unmatched row beside a
    row's own compatibility matches; (2) UNDEF VALUES may defer only
    across Joins — it must be flushed before an OPTIONAL/MINUS/BIND
    (LeftJoin/Minus/Extend do not commute with Join)."""

    @pytest.fixture()
    def people(self, spark):
        rows = [
            ("urn:p:1", "rdf:type", "urn:ex:Person"),
            ("urn:p:1", "urn:ex:age", "36"),
            ("urn:p:1", "urn:ex:city", "urn:c:1"),
            ("urn:p:2", "rdf:type", "urn:ex:Person"),
            ("urn:p:2", "urn:ex:age", "47"),
            ("urn:p:2", "urn:ex:city", "urn:c:2"),
            ("urn:p:3", "rdf:type", "urn:ex:Person"),
            ("urn:p:3", "urn:ex:age", "45"),
            ("urn:c:1", "urn:ex:name", "london"),
            ("urn:c:2", "urn:ex:name", "york"),
        ]
        return TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )

    def test_lifted_filter_no_phantom_beside_compat_matches(self, people):
        # p:3 has no city -> ?c unbound -> its compatibility matches
        # pass the lifted filter (?a = "45"), so p:3 must NOT also
        # survive as an unmatched (None, None) row
        got = run(
            people,
            """SELECT ?p ?c ?cn WHERE {
                 ?p a ex:Person . ?p ex:age ?a .
                 OPTIONAL { ?p ex:city ?c }
                 OPTIONAL { ?c ex:name ?cn FILTER(?a = "45") }
               } ORDER BY ?p ?c""",
        )
        assert [tuple(r) for r in got.collect()] == [
            ("urn:p:1", "urn:c:1", None),
            ("urn:p:2", "urn:c:2", None),
            ("urn:p:3", "urn:c:1", "london"),
            ("urn:p:3", "urn:c:2", "york"),
        ]

    def test_values_undef_flushes_before_optional(self, people):
        # spec 18.2.4.2: VALUES joins at its position, THEN the
        # LeftJoin applies. The ("47") VALUES row is incompatible with
        # p:1's age match, so it survives the OPTIONAL unextended —
        # a deferral past the OPTIONAL would drop it
        got = run(
            people,
            """SELECT ?p ?y WHERE {
                 ?p a ex:Person . ?p ex:city ?anyc .
                 VALUES ?y { UNDEF "47" }
                 OPTIONAL { ?p ex:age ?y }
               } ORDER BY ?p ?y""",
        )
        assert [tuple(r) for r in got.collect()] == [
            ("urn:p:1", "36"),
            ("urn:p:1", "47"),
            ("urn:p:2", "47"),
            ("urn:p:2", "47"),
        ]


class TestHoleAwareGeo:
    """Round 13: the geo surface is hole-aware end to end — interior
    rings subtract from area, add to length, weight the centroid, and
    exclude points from sfWithin/sfIntersects, on the constant-WKT,
    variable-WKT and grid-rewrite paths alike."""

    DONUT = (
        '"POLYGON((0 0, 50 0, 50 50, 0 50, 0 0), '
        '(5 15, 15 15, 15 25, 5 25, 5 15))"'
    )  # london POINT(10 20) sits INSIDE the hole

    @pytest.fixture(scope="class")
    def donut_store(self, spark):
        rows = [
            ("urn:c:1", "urn:ex:name", "london"),
            ("urn:c:1", "geo:asWKT", "POINT(10 20)"),
            ("urn:c:2", "urn:ex:name", "york"),
            ("urn:c:2", "geo:asWKT", "POINT(30 30)"),
            ("urn:z:1", "urn:ex:name", "zone"),
            (
                "urn:z:1", "geo:asWKT",
                "POLYGON((0 0, 50 0, 50 50, 0 50, 0 0), "
                "(5 15, 15 15, 15 25, 5 25, 5 15))",
            ),
        ]
        df = spark.createDataFrame(rows, "s string, p string, o string")
        return TripleStore(df)

    def test_sfwithin_constant_donut_excludes_hole(self, donut_store):
        rows = run(
            donut_store,
            "SELECT ?cn WHERE { ?c geo:asWKT ?w . ?c ex:name ?cn "
            f"FILTER(geof:sfWithin(?w, {self.DONUT})) }}",
        ).collect()
        # london (10,20) is in the hole; york (30,30) is in the donut;
        # the zone's own POLYGON is within itself (round 14:
        # polygon-polygon sfWithin — before, a non-POINT first
        # operand was a type error and dropped)
        assert [r.cn for r in rows] == ["york", "zone"]

    def test_sfwithin_variable_donut(self, donut_store):
        rows = run(
            donut_store,
            "SELECT ?cn WHERE { ?c geo:asWKT ?w . ?c ex:name ?cn . "
            "?z ex:name \"zone\" . ?z geo:asWKT ?d "
            "FILTER(geof:sfWithin(?w, ?d)) }",
        ).collect()
        # round 14: the polygon subject routes the var-var join
        # through the relate rewrite — the zone is within itself,
        # identical to the connected-frame answer (no ORDER BY, so
        # compare as a set)
        assert {r.cn for r in rows} == {"york", "zone"}

    def test_measures_over_donut_variable(self, donut_store):
        rows = run(
            donut_store,
            'SELECT ?a ?l ?c ?env WHERE { ?z ex:name "zone" . '
            "?z geo:asWKT ?d "
            "BIND(geof:area(?d) AS ?a) BIND(geof:length(?d) AS ?l) "
            "BIND(geof:centroid(?d) AS ?c) "
            "BIND(geof:envelope(?d) AS ?env) }",
        ).collect()
        (r,) = rows
        assert r.a == 2500.0 - 100.0
        assert r.l == 200.0 + 40.0
        # outer centroid (25,25), hole area 100 at (10,20):
        # ((2500*25 - 100*10)/2400, (2500*25 - 100*20)/2400)
        assert r.c == "POINT(25.625 25.208333333333332)"
        assert r.env == "POLYGON((0.0 0.0, 50.0 0.0, 50.0 50.0, 0.0 50.0, 0.0 0.0))"

    def test_sfintersects_point_donut_hole_aware(self, donut_store):
        rows = run(
            donut_store,
            "SELECT ?cn WHERE { ?c geo:asWKT ?w . ?c ex:name ?cn "
            f"FILTER(geof:sfIntersects(?w, {self.DONUT})) }}",
        ).collect()
        # london's point is in the hole (no intersection); york's is
        # in the donut; the zone's own POLYGON lexical hits the
        # polygon-polygon arm (outer hulls coincide -> intersects)
        assert sorted(r.cn for r in rows) == ["york", "zone"]

    def test_grid_rewrite_sfwithin_hole_aware(self, spark):
        # DISCONNECTED frames -> the grid-cover rewrite path must give
        # the same answer as the connected compile (round-8 lesson)
        rows = [
            ("urn:a:1", "urn:ex:pt", "POINT(10 20)"),   # in the hole
            ("urn:a:2", "urn:ex:pt", "POINT(30 30)"),   # in the donut
            ("urn:b:1", "urn:ex:poly",
             "POLYGON((0 0, 50 0, 50 50, 0 50, 0 0), "
             "(5 15, 15 15, 15 25, 5 25, 5 15))"),
        ]
        store = TripleStore(
            spark.createDataFrame(rows, "s string, p string, o string")
        )
        got = run(
            store,
            "SELECT ?s WHERE { ?s ex:pt ?w . ?z ex:poly ?d "
            "FILTER(geof:sfWithin(?w, ?d)) }",
        ).collect()
        assert [r.s for r in got] == ["urn:a:2"]


class TestMultiPolygonGeo:
    """Round 13: geof functions accept MULTIPOLYGON lexicals —
    constant and variable — with hole-aware member semantics."""

    MP = (
        '"MULTIPOLYGON(((0 0, 20 0, 20 20, 0 20, 0 0), '
        '(5 5, 15 5, 15 15, 5 15, 5 5)), '
        '((30 0, 40 0, 40 10, 30 10, 30 0)))"'
    )  # donut (area 300) + square (area 100)

    @pytest.fixture(scope="class")
    def mp_store(self, spark):
        rows = [
            ("urn:c:1", "urn:ex:name", "in_hole"),
            ("urn:c:1", "geo:asWKT", "POINT(10 10)"),
            ("urn:c:2", "urn:ex:name", "in_donut"),
            ("urn:c:2", "geo:asWKT", "POINT(2 2)"),
            ("urn:c:3", "urn:ex:name", "in_square"),
            ("urn:c:3", "geo:asWKT", "POINT(35 5)"),
            ("urn:c:4", "urn:ex:name", "outside"),
            ("urn:c:4", "geo:asWKT", "POINT(25 25)"),
            ("urn:z:1", "urn:ex:name", "mzone"),
            (
                "urn:z:1", "geo:asWKT",
                "MULTIPOLYGON(((0 0, 20 0, 20 20, 0 20, 0 0), "
                "(5 5, 15 5, 15 15, 5 15, 5 5)), "
                "((30 0, 40 0, 40 10, 30 10, 30 0)))",
            ),
        ]
        df = spark.createDataFrame(rows, "s string, p string, o string")
        return TripleStore(df)

    def test_sfwithin_multipolygon_constant(self, mp_store):
        rows = run(
            mp_store,
            "SELECT ?cn WHERE { ?c geo:asWKT ?w . ?c ex:name ?cn "
            f"FILTER(geof:sfWithin(?w, {self.MP})) }}",
        ).collect()
        assert sorted(r.cn for r in rows) == ["in_donut", "in_square"]

    def test_sfwithin_multipolygon_variable(self, mp_store):
        rows = run(
            mp_store,
            "SELECT ?cn WHERE { ?c geo:asWKT ?w . ?c ex:name ?cn . "
            '?z ex:name "mzone" . ?z geo:asWKT ?d '
            "FILTER(geof:sfWithin(?w, ?d)) }",
        ).collect()
        assert sorted(r.cn for r in rows) == ["in_donut", "in_square"]

    def test_measures_over_multipolygon_variable(self, mp_store):
        rows = run(
            mp_store,
            'SELECT ?a ?l ?c ?env WHERE { ?z ex:name "mzone" . '
            "?z geo:asWKT ?d "
            "BIND(geof:area(?d) AS ?a) BIND(geof:length(?d) AS ?l) "
            "BIND(geof:centroid(?d) AS ?c) "
            "BIND(geof:envelope(?d) AS ?env) }",
        ).collect()
        (r,) = rows
        assert r.a == 400.0  # 400 - 100 + 100
        assert r.l == 80.0 + 40.0 + 40.0
        # donut centroid (10,10) area 300; square centroid (35,5)
        # area 100 -> ((300*10+100*35)/400, (300*10+100*5)/400)
        assert r.c == "POINT(16.25 8.75)"
        assert r.env == (
            "POLYGON((0.0 0.0, 40.0 0.0, 40.0 20.0, 0.0 20.0, 0.0 0.0))"
        )
