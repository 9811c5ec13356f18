"""Graph-pattern front-end (plans/pattern.py): the three reference
shapes (single edge, k-hop chain, cycle close) compile onto the same
joins the hand-written builders use (reference ARCHITECTURE.md:
327-339 Cypher aspiration)."""

import pytest
from pyspark.sql import functions as F

from torua_spark.operators import graph as g
from torua_spark.plans.pattern import PropertyGraph
from torua_spark.plans import plan_string
from torua_spark.queries import graph_q
from torua_spark.sources.catalog import load_table


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _pg_star(spark, sf_dir):
    return (
        PropertyGraph()
        .add_vertex("customer", load_table(spark, sf_dir, "customer"), "c_custkey")
        .add_vertex("supplier", load_table(spark, sf_dir, "supplier"), "s_suppkey")
        .add_edge(
            "SOLD_TO",
            g.copurchase_edges(
                load_table(spark, sf_dir, "orders"),
                load_table(spark, sf_dir, "lineitem"),
            ),
            "src",
            "dst",
        )
    )


def test_single_edge_shape_matches_builder(spark, sf_dir):
    """(a)-[e]->(b) over the copurchase edge == two_hop's result."""
    b = _pg_star(spark, sf_dir).match(
        "MATCH (a:customer)-[:SOLD_TO]->(b:supplier)"
    )
    got = _rows(b.select("a", "b").distinct(), ["a", "b"])
    want = _rows(
        g.two_hop(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "customer"),
            load_table(spark, sf_dir, "supplier"),
        ),
        ["c_custkey", "s_suppkey"],
    )
    assert got == want


def test_two_hop_query_matches_builder(spark, sf_dir):
    """The declared graph_2hop (routed through the compiler) equals
    the hand-written two_hop builder row-for-row."""
    got = _rows(
        graph_q.QUERIES["graph_2hop"](spark, sf_dir),
        ["c_custkey", "s_suppkey"],
    )
    want = _rows(
        g.two_hop(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "customer"),
            load_table(spark, sf_dir, "supplier"),
        ),
        ["c_custkey", "s_suppkey"],
    )
    assert got == want


def test_triangle_query_matches_builder(spark, sf_dir):
    """The declared graph_triangle_agg (pattern-routed, FK edges)
    equals the hand-written broadcast star join, and the FK hops add
    no joins: the binding plan still broadcasts both dims."""
    got = _rows(
        graph_q.QUERIES["graph_triangle_agg"](spark, sf_dir),
        ["region", "nation", "n_customers", "sum_acctbal"],
    )
    want = _rows(
        g.triangle_pattern(
            load_table(spark, sf_dir, "customer"),
            load_table(spark, sf_dir, "nation"),
            load_table(spark, sf_dir, "region"),
        ),
        ["region", "nation", "n_customers", "sum_acctbal"],
    )
    assert got == want
    plan = plan_string(graph_q.QUERIES["graph_triangle_agg"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2


def test_cycle_close_filters_to_equal_ids(spark, sf_dir):
    """(a)-[:TO]->(b)-[:BACK]->(a) keeps only rows whose second hop
    lands back on a — the triangle/cycle predicate."""
    e = g.copurchase_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    rev = e.select(F.col("dst").alias("rsrc"), F.col("src").alias("rdst"))
    pg = (
        PropertyGraph()
        .add_vertex("customer", load_table(spark, sf_dir, "customer"), "c_custkey")
        .add_edge("TO", e, "src", "dst")
        .add_edge("BACK", rev, "rsrc", "rdst")
    )
    b = pg.match("MATCH (a:customer)-[:TO]->(s)-[:BACK]->(a)")
    rows = b.select("a", "s").distinct()
    # every copurchase pair closes its own cycle through the reversed
    # edge, so the cycle binding equals the forward edge set filtered
    # to customer sources
    want = _rows(
        e.join(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("src")
            ),
            "src",
            "left_semi",
        ),
        ["src", "dst"],
    )
    assert _rows(rows, ["a", "s"]) == want


def test_malformed_patterns_raise(spark, sf_dir):
    pg = _pg_star(spark, sf_dir)
    with pytest.raises(ValueError, match="malformed"):
        pg.match("MATCH (a:customer)-[:SOLD_TO]->")
    with pytest.raises(ValueError, match="unknown vertex label"):
        pg.match("MATCH (a:nope)-[:SOLD_TO]->(b)")
    with pytest.raises(ValueError, match="unknown edge relation"):
        pg.match("MATCH (a:customer)-[:NOPE]->(b)")
    with pytest.raises(ValueError, match="must be labeled"):
        pg.match("MATCH (a)-[:SOLD_TO]->(b:supplier)")


def test_variable_length_hop_desugars(spark, sf_dir):
    """(a)-[:KNOWS*2]->(b) == the explicit 2-hop chain — the
    reference's `MATCH (n:Person)-[:KNOWS*2]->(m)` sugar
    (ARCHITECTURE.md:327-339)."""
    people = spark.createDataFrame([(i,) for i in range(6)], "pid long")
    knows = spark.createDataFrame(
        [(0, 1), (1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], "ksrc long, kdst long"
    )
    pg = (
        PropertyGraph()
        .add_vertex("person", people, "pid")
        .add_edge("KNOWS", knows, "ksrc", "kdst")
    )
    sugar = pg.match("MATCH (a:person)-[:KNOWS*2]->(b)")
    explicit = pg.match("MATCH (a:person)-[:KNOWS]->(m)-[:KNOWS]->(b)")
    got = _rows(sugar.select("a", "b").distinct(), ["a", "b"])
    want = _rows(explicit.select("a", "b").distinct(), ["a", "b"])
    assert got == want
    # exact expected 2-hop pairs (distinct)
    assert got == [(0, 2), (0, 3), (1, 4), (2, 5), (3, 5)]


def test_query_where_return_projection(spark, sf_dir):
    """MATCH..WHERE..RETURN == the explicit DataFrame chain, and the
    WHERE filter lands below the joins (predicate pushdown)."""
    from torua_spark.sources.catalog import load_table

    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    pg = (
        PropertyGraph()
        .add_vertex("customer", cust, "c_custkey")
        .add_vertex("nation", nat, "n_nationkey", broadcast=True)
        .add_edge("IN_NATION", None, "c_custkey", "c_nationkey")
    )
    got = pg.query(
        "MATCH (c:customer)-[:IN_NATION]->(n:nation) "
        "WHERE c.c_acctbal > 5000 AND n.n_name <> 'FRANCE' "
        "RETURN c AS c_custkey, n.n_name AS nation"
    )
    from pyspark.sql import functions as F

    want = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .filter((F.col("c_acctbal") > 5000) & (F.col("n_name") != "FRANCE"))
        .select(F.col("c_custkey"), F.col("n_name").alias("nation"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0
    # the acctbal filter must sit in the customer scan, not above a join
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_acctbal" in plan.split("Join")[-1]


def test_query_return_aggregate_groups(spark, sf_dir):
    from torua_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    pg = (
        PropertyGraph()
        .add_vertex("customer", cust, "c_custkey")
        .add_vertex("nation", nat, "n_nationkey", broadcast=True)
        .add_edge("IN_NATION", None, "c_custkey", "c_nationkey")
    )
    got = pg.query(
        "MATCH (c:customer)-[:IN_NATION]->(n:nation) "
        "RETURN n.n_name AS nation, count(*) AS n_customers, "
        "min(c.c_acctbal) AS min_bal"
    )
    want = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.min("c_acctbal").alias("min_bal"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.columns == ["nation", "n_customers", "min_bal"]


def test_query_malformed_where_and_unknown_terms(spark):
    people = spark.range(3).select(F.col("id").alias("pid"))
    knows = spark.createDataFrame([(0, 1)], "ksrc long, kdst long")
    pg = (
        PropertyGraph()
        .add_vertex("person", people, "pid")
        .add_edge("KNOWS", knows, "ksrc", "kdst")
    )
    base = "MATCH (a:person)-[:KNOWS]->(b) "
    with pytest.raises(ValueError, match="unsupported WHERE"):
        pg.query(base + "WHERE a.pid IN (1,2)")
    with pytest.raises(ValueError, match="unknown pattern variable"):
        pg.query(base + "WHERE z.pid = 1")
    with pytest.raises(ValueError, match="no column"):
        pg.query(base + "WHERE a.nope = 1")
    with pytest.raises(ValueError, match="unlabeled"):
        pg.query(base + "RETURN b.pid")
    # no RETURN -> binding table; bare-variable WHERE on ids works
    assert pg.query(base + "WHERE a = 0").select("a", "b").collect() == [
        __import__("pyspark").sql.Row(a=0, b=1)
    ]


def test_where_string_literal_containing_and(spark, sf_dir):
    """AND inside a quoted literal must not split the condition."""
    from torua_spark.sources.catalog import load_table
    from torua_spark.sources.local import local_df

    cust = load_table(spark, sf_dir, "customer")
    nat = local_df(
        spark,
        [(i, "TRINIDAD AND TOBAGO" if i % 2 else "FRANCE") for i in range(25)],
        "n_nationkey long, n_name string",
    )
    pg = (
        PropertyGraph()
        .add_vertex("customer", cust, "c_custkey")
        .add_vertex("nation", nat, "n_nationkey", broadcast=True)
        .add_edge("IN_NATION", None, "c_custkey", "c_nationkey")
    )
    got = pg.query(
        "MATCH (c:customer)-[:IN_NATION]->(n:nation) "
        "WHERE n.n_name = 'TRINIDAD AND TOBAGO' AND c.c_acctbal > 0 "
        "RETURN c AS c_custkey"
    )
    want = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .filter((F.col("n_name") == "TRINIDAD AND TOBAGO") & (F.col("c_acctbal") > 0))
        .count()
    )
    assert got.count() == want > 0


def test_reverse_and_undirected_edges(spark):
    people = spark.range(4).select(F.col("id").alias("pid"))
    knows = spark.createDataFrame([(0, 1), (2, 1)], "ksrc long, kdst long")
    pg = (
        PropertyGraph()
        .add_vertex("person", people, "pid")
        .add_edge("KNOWS", knows, "ksrc", "kdst")
    )
    fwd = _rows(pg.match("MATCH (a:person)-[:KNOWS]->(b)").select("a", "b"), ["a", "b"])
    rev = _rows(pg.match("MATCH (a:person)<-[:KNOWS]-(b)").select("a", "b"), ["a", "b"])
    und = _rows(pg.match("MATCH (a:person)-[:KNOWS]-(b)").select("a", "b"), ["a", "b"])
    assert fwd == [(0, 1), (2, 1)]
    assert rev == [(1, 0), (1, 2)]          # edges traversed dst -> src
    assert und == sorted(fwd + rev)          # both orientations bound

    # FK edges are forward-only
    pg2 = (
        PropertyGraph()
        .add_vertex("person", people, "pid")
        .add_edge("FK", None, "pid", "other")
    )
    with pytest.raises(ValueError, match="forward-only"):
        pg2.match("MATCH (a:person)<-[:FK]-(b)")
    with pytest.raises(ValueError, match="not a direction"):
        pg.match("MATCH (a:person)<-[:KNOWS]->(b)")


def test_return_distinct(spark):
    people = spark.range(3).select(F.col("id").alias("pid"))
    knows = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "ksrc long, kdst long"
    )
    pg = (
        PropertyGraph()
        .add_vertex("person", people, "pid")
        .add_edge("KNOWS", knows, "ksrc", "kdst")
    )
    # every edge has a distinct source — DISTINCT collapses the a list
    plain = pg.query("MATCH (a:person)-[:KNOWS]->(b) RETURN a")
    dedup = pg.query("MATCH (a:person)-[:KNOWS]->(b) RETURN DISTINCT a")
    assert plain.count() == 3
    assert sorted(r.a for r in dedup.collect()) == [0, 1]


# ---------------------------------------------------------------- round 6:
# ORDER BY / LIMIT / OPTIONAL MATCH clauses, shared labels, quote-aware
# clause split, and the compiler-vs-builder plan/timing A/B (VERDICT r5
# #3/#4, ADVICE r5 pattern items).

def _pg_people(spark):
    people = spark.createDataFrame(
        [(i, f"p{i}", 100 * i) for i in range(6)], "pid long, name string, bal long"
    )
    knows = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 1)], "ksrc long, kdst long"
    )
    return (
        PropertyGraph()
        .add_vertex("person", people, "pid")
        .add_edge("KNOWS", knows, "ksrc", "kdst")
    )


def test_order_by_limit_topk(spark):
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b) "
        "RETURN a, count(*) AS n ORDER BY n DESC, a LIMIT 2"
    ).collect()
    assert [(r.a, r.n) for r in got] == [(0, 2), (1, 1)]
    # ORDER BY on a var.attr's default name + ASC default
    got2 = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b) RETURN DISTINCT a.name AS nm "
        "ORDER BY nm LIMIT 10"
    ).collect()
    assert [r.nm for r in got2] == ["p0", "p1", "p3"]


def test_order_by_limit_plans_take_ordered(spark):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-
    partition top-n + driver merge), never a global Sort — the
    100 TB top-k contract."""
    pg = _pg_people(spark)
    df = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b) RETURN a, b ORDER BY b DESC LIMIT 3"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_order_by_unknown_key_raises(spark):
    pg = _pg_people(spark)
    with pytest.raises(ValueError, match="ORDER BY key"):
        pg.query("MATCH (a:person)-[:KNOWS]->(b) RETURN a ORDER BY nope")


def test_optional_match_null_extends(spark):
    """OPTIONAL MATCH keeps unmatched anchors with NULL bindings and
    count(x) counts matches only — the zero-orders row shows up."""
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person) OPTIONAL MATCH (a)-[:KNOWS]->(b) "
        "RETURN a, count(b) AS n ORDER BY a LIMIT 10"
    ).collect()
    assert [(r.a, r.n) for r in got] == [
        (0, 2), (1, 1), (2, 0), (3, 1), (4, 0), (5, 0)
    ]


def test_optional_match_errors(spark):
    pg = _pg_people(spark)
    with pytest.raises(ValueError, match="not bound"):
        pg.query("MATCH (a:person) OPTIONAL MATCH (z)-[:KNOWS]->(b) RETURN a")
    with pytest.raises(ValueError, match="clause order"):
        pg.query("WHERE a = 1 MATCH (a:person) RETURN a")


def test_where_between_match_and_optional(spark):
    """Round 7: clauses apply in read order — a WHERE between MATCH
    and OPTIONAL MATCH narrows the anchors BEFORE the left join
    (previously a clause-order error)."""
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person) WHERE a <= 2 OPTIONAL MATCH (a)-[:KNOWS]->(b) "
        "RETURN a, count(b) AS n ORDER BY a"
    ).collect()
    assert [(r.a, r.n) for r in got] == [(0, 2), (1, 1), (2, 0)]


def test_shared_vertex_label_self_join(spark):
    """Two variables on one label join a per-variable renamed
    projection (ADVICE r5): attributes resolve as a.col for the
    owning var and b__col for the second."""
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b:person) "
        "WHERE b.bal >= 200 RETURN a.name AS an, b.name AS bn ORDER BY an, bn"
    ).collect()
    assert [(r.an, r.bn) for r in got] == [("p0", "p2"), ("p1", "p2")]


def test_clause_keyword_inside_literal(spark):
    """' RETURN ' inside a WHERE string literal must not truncate the
    clause split (ADVICE r5)."""
    people = spark.createDataFrame(
        [(0, "X RETURN Y"), (1, "plain")], "pid long, name string"
    )
    knows = spark.createDataFrame([(0, 1)], "ksrc long, kdst long")
    pg = (
        PropertyGraph()
        .add_vertex("person", people, "pid")
        .add_edge("KNOWS", knows, "ksrc", "kdst")
    )
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b) WHERE a.name = 'X RETURN Y' "
        "RETURN a, b"
    ).collect()
    assert [(r.a, r.b) for r in got] == [(0, 1)]


def test_compiler_plan_parity_two_hop(spark, sf_dir):
    """VERDICT r5 #3: the pattern-routed declared graph_2hop compiles
    to the same physical operator counts as the hand-written builder
    (join strategy, exchanges, aggregates) — pinning the 'plans
    unchanged' claim structurally, not just by result equality."""
    routed = graph_q.QUERIES["graph_2hop"](spark, sf_dir)
    hand = g.two_hop(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
    )

    def ops(df):
        p = plan_string(df)
        return {
            op: p.count(op)
            for op in (
                "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                "HashAggregate",
            )
        }

    assert ops(routed) == ops(hand)


def test_compiler_runtime_parity_two_hop(spark, sf_dir):
    """Same-session wall-clock A/B of compiler vs builder (min of 2
    runs each): the front-end must not cost more than noise. The
    REAL parity guard is the plan-structure test above (identical
    physical join/agg ops — a pathological compile cannot hide from
    it); this wall-clock check is advisory on a shared container
    whose noisy-neighbor variance exceeds any honest bound
    (ADVICE r6), so it SKIPS rather than fails on a slow run unless
    TORUA_STRICT_TIMING=1 pins it (e.g. a quiet dedicated box)."""
    import os
    import time

    def best(mk):
        t = []
        for _ in range(2):
            t0 = time.perf_counter()
            mk().count()
            t.append(time.perf_counter() - t0)
        return min(t)

    routed = best(lambda: graph_q.QUERIES["graph_2hop"](spark, sf_dir))
    hand = best(lambda: g.two_hop(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
    ).distinct())
    if routed >= hand * 2.5 + 0.5 and not os.environ.get("TORUA_STRICT_TIMING"):
        pytest.skip(f"advisory timing bound exceeded (noise?): {routed=} {hand=}")
    if os.environ.get("TORUA_STRICT_TIMING"):
        assert routed < hand * 2.5 + 0.5, (routed, hand)


def test_pattern_topk_and_optional_match_vs_oracle(spark, sf_dir):
    """The two round-6 pattern-clause queries hash-match their DuckDB
    oracles (graph_pattern_topk is declared; graph_optional_match is
    an extra — both stay pytest-pinned here forever)."""
    from tests.oracle import compare

    compare(
        graph_q.QUERIES["graph_pattern_topk"](spark, sf_dir),
        graph_q.ORACLE["graph_pattern_topk"], sf_dir,
    )
    compare(
        graph_q.QUERIES["graph_optional_match"](spark, sf_dir),
        graph_q.ORACLE["graph_optional_match"], sf_dir,
    )


def test_order_by_qualified_resolves_by_provenance(spark):
    """ADVICE r6: a qualified ORDER BY key binds to the RETURN term
    that produced it — never to a different variable's projection that
    happens to carry the bare attribute name — and raises when the
    qualified term was not projected at all."""
    pg = _pg_people(spark)
    # b.pid projected under alias bp: ORDER BY b.pid must find it
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b:person) "
        "RETURN a.name AS aname, b.pid AS bp ORDER BY b.pid DESC, aname LIMIT 2"
    ).collect()
    assert [(r.aname, r.bp) for r in got] == [("p0", 2), ("p1", 2)]
    # a.name is projected as `name` — ORDER BY b.name must NOT silently
    # ride that column; b.name was never returned
    with pytest.raises(ValueError, match="does not match any RETURN term"):
        pg.query(
            "MATCH (a:person)-[:KNOWS]->(b:person) "
            "RETURN a.name AS name, b.pid AS bp ORDER BY b.name"
        )


# ---------------------------------------------------------------- round 7:
# multi-chain MATCH (comma patterns / second MATCH clause) and WHERE
# scoped to OPTIONAL MATCH (VERDICT r6 #7), pinned vs hand-written
# DataFrame code.

def test_comma_pattern_conjunction_shared_label(spark):
    """(a:person)-[:KNOWS]->(x), (b:person)-[:KNOWS]->(x): both
    chains join over the shared x; the second chain's person
    attributes arrive renamed b__col, so a.name and b.name resolve
    to distinct columns."""
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(x), (b:person)-[:KNOWS]->(x) "
        "RETURN a.name AS an, b.name AS bn, x ORDER BY x, an, bn"
    )
    # hand-written: self-join the edge list on dst, decorate both ends
    knows = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 1)], "ksrc long, kdst long"
    )
    people = spark.createDataFrame(
        [(i, f"p{i}", 100 * i) for i in range(6)], "pid long, name string, bal long"
    )
    ea = knows.select(F.col("ksrc").alias("a"), F.col("kdst").alias("x"))
    eb = knows.select(F.col("ksrc").alias("b"), F.col("kdst").alias("x"))
    want = (
        ea.join(eb, "x")
        .join(people.select(F.col("pid").alias("a"), F.col("name").alias("an")), "a")
        .join(people.select(F.col("pid").alias("b"), F.col("name").alias("bn")), "b")
        .select("an", "bn", "x")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert ("p0", "p3", 1) in {tuple(r) for r in got.collect()}


def test_second_match_clause_continues_from_bound_var(spark):
    """MATCH (a)-[:K]->(x) MATCH (x)-[:K]->(c) == the single-chain
    two-hop — the second clause anchors on the bound x and extends
    the same join tree (no cartesian, no re-scan of person)."""
    pg = _pg_people(spark)
    two_clause = pg.query(
        "MATCH (a:person)-[:KNOWS]->(x) MATCH (x)-[:KNOWS]->(c) "
        "RETURN a, x, c"
    )
    one_chain = pg.query(
        "MATCH (a:person)-[:KNOWS]->(x)-[:KNOWS]->(c) RETURN a, x, c"
    )
    assert sorted(map(tuple, two_clause.collect())) == sorted(
        map(tuple, one_chain.collect())
    )
    assert two_clause.count() > 0


def test_optional_match_scoped_where_keeps_null_anchors(spark):
    """WHERE after OPTIONAL MATCH filters the optional side BEFORE
    the left join (Cypher scoping): anchors whose matches all fail
    the predicate survive with count 0 — a post-join filter would
    have dropped them."""
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person) OPTIONAL MATCH (a)-[:KNOWS]->(b:person) "
        "WHERE b.bal >= 200 RETURN a, count(b) AS n ORDER BY a"
    ).collect()
    # a=3 knows only pid 1 (bal 100): its match is filtered out, the
    # anchor survives with 0; a=2/4/5 never matched at all
    assert [(r.a, r.n) for r in got] == [
        (0, 1), (1, 1), (2, 0), (3, 0), (4, 0), (5, 0)
    ]


def test_disjoint_chains_cross_join(spark):
    """Chains sharing no variable are the Cypher cartesian product —
    explicit in the plan, correct in the count."""
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person) MATCH (b:person) RETURN count(*) AS n"
    ).collect()
    assert got[0].n == 36


def test_cross_chain_variable_rebind_raises(spark):
    people = spark.createDataFrame([(0,), (1,)], "pid long")
    cities = spark.createDataFrame([(10,), (11,)], "cid long")
    knows = spark.createDataFrame([(0, 1)], "ksrc long, kdst long")
    pg = (
        PropertyGraph()
        .add_vertex("person", people, "pid")
        .add_vertex("city", cities, "cid")
        .add_edge("KNOWS", knows, "ksrc", "kdst")
    )
    with pytest.raises(ValueError, match="rebinds"):
        pg.query(
            "MATCH (a:person)-[:KNOWS]->(b) MATCH (a:city) RETURN a"
        )


# ---------------------------------------------------------------- round 7:
# edge variables (-[r:REL]->), edge-attribute predicates/aggregates,
# count(DISTINCT ...).

def _pg_ratings(spark):
    users = spark.createDataFrame([(i, f"u{i}") for i in range(4)],
                                  "uid long, uname string")
    items = spark.createDataFrame([(i,) for i in range(10, 13)], "iid long")
    rated = spark.createDataFrame(
        [(0, 10, 5), (0, 11, 2), (1, 10, 4), (1, 12, 1),
         (2, 11, 5), (3, 10, 3)],
        "usrc long, idst long, stars long",
    )
    return (
        PropertyGraph()
        .add_vertex("user", users, "uid")
        .add_vertex("item", items, "iid")
        .add_edge("RATED", rated, "usrc", "idst")
    ), users, items, rated


def test_edge_variable_predicate_and_aggregate(spark):
    """-[r:RATED]-> binds edge attributes: WHERE r.stars >= 4 filters
    on the edge, avg(r.stars) aggregates it — pinned against the
    hand-written join."""
    pg, users, items, rated = _pg_ratings(spark)
    got = pg.query(
        "MATCH (u:user)-[r:RATED]->(i:item) WHERE r.stars >= 4 "
        "RETURN i AS iid, count(*) AS n, avg(r.stars) AS avg_stars "
        "ORDER BY iid"
    ).collect()
    want = (
        rated.filter("stars >= 4")
        .groupBy(F.col("idst").alias("iid"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("stars").alias("avg_stars"))
        .orderBy("iid")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert [(r.iid, r.n) for r in got] == [(10, 2), (11, 1)]


def test_count_and_sum_distinct(spark):
    pg, *_ = _pg_ratings(spark)
    got = pg.query(
        "MATCH (u:user)-[r:RATED]->(i:item) "
        "RETURN count(DISTINCT u) AS n_users, sum(DISTINCT r.stars) AS s"
    ).collect()[0]
    # raters: users 0,1,2,3 -> 4; distinct star values {5,2,4,1,3} -> 15
    assert (got.n_users, got.s) == (4, 15)


def test_edge_variable_in_scoped_optional_where(spark):
    """OPTIONAL MATCH with an edge-attribute WHERE: users whose only
    ratings fail the predicate survive with 0 (pre-join scoping)."""
    pg, *_ = _pg_ratings(spark)
    got = pg.query(
        "MATCH (u:user) OPTIONAL MATCH (u)-[r:RATED]->(i:item) "
        "WHERE r.stars >= 4 RETURN u, count(i) AS n ORDER BY u"
    ).collect()
    # u3 rated only 3 stars -> filtered pre-join -> survives with 0
    assert [(r.u, r.n) for r in got] == [(0, 1), (1, 1), (2, 1), (3, 0)]


def test_edge_variable_errors(spark):
    pg, *_ = _pg_ratings(spark)
    with pytest.raises(ValueError, match="no id column"):
        pg.query("MATCH (u:user)-[r:RATED]->(i:item) RETURN r")
    with pytest.raises(ValueError, match="has no attribute"):
        pg.query("MATCH (u:user)-[r:RATED]->(i:item) RETURN r.nope")
    with pytest.raises(ValueError, match="has no attribute"):
        # endpoints are not edge attributes
        pg.query("MATCH (u:user)-[r:RATED]->(i:item) RETURN r.usrc")
    with pytest.raises(ValueError, match="variable-length"):
        pg.match("MATCH (u:user)-[r:RATED*2]->(i:item)")
    with pytest.raises(ValueError, match="bound twice"):
        pg.query("MATCH (u:user)-[u:RATED]->(i:item) RETURN i")
    with pytest.raises(ValueError, match="bound twice"):
        # a later NODE reusing the edge variable's name
        pg.query(
            "MATCH (u:user)-[r:RATED]->(i:item) MATCH (r:user) RETURN i"
        )


def test_edge_variable_on_fk_edge_raises(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    pg = (
        PropertyGraph()
        .add_vertex("customer", cust, "c_custkey")
        .add_vertex("nation", nat, "n_nationkey", broadcast=True)
        .add_edge("IN_NATION", None, "c_custkey", "c_nationkey")
    )
    with pytest.raises(ValueError, match="FK edge"):
        pg.match("MATCH (c:customer)-[r:IN_NATION]->(n:nation)")


# ---------------------------------------------------------------- round 7:
# WITH pipeline stage (project/aggregate mid-query, HAVING, re-MATCH).

def test_with_aggregate_then_where_is_having(spark):
    """WITH a, count(b) AS n WHERE n >= 2 == groupBy + HAVING: the
    filter runs post-aggregation, pinned vs hand-written."""
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b) WITH a, count(b) AS n "
        "WHERE n >= 2 RETURN a, n"
    ).collect()
    assert [(r.a, r.n) for r in got] == [(0, 2)]


def test_with_then_match_continues_from_projected_var(spark):
    """A MATCH after WITH anchors on a projected id column — the
    friends-of-prolific-knowers shape."""
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b) WITH a, count(b) AS n "
        "WHERE n >= 2 MATCH (a)-[:KNOWS]->(c) RETURN a, c ORDER BY c"
    ).collect()
    # only a=0 survives the HAVING; its targets are 1 and 2
    assert [(r.a, r.c) for r in got] == [(0, 1), (0, 2)]


def test_with_order_by_limit_midstream_topk_then_rematch(spark):
    """``WITH ... ORDER BY ... LIMIT`` mid-pipeline (VERDICT r7 #6):
    top-k a projected aggregate, then MATCH onward from the survivors
    — the canonical 'k most prolific, then their neighbors' shape."""
    pg = _pg_people(spark)
    # out-degrees: 0 -> 2, 1 -> 1, 3 -> 1; top-1 by (n DESC, a) is a=0
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b) "
        "WITH a, count(b) AS n ORDER BY n DESC, a LIMIT 1 "
        "MATCH (a)-[:KNOWS]->(c) "
        "RETURN a, n, c ORDER BY c"
    ).collect()
    assert [(r.a, r.n, r.c) for r in got] == [(0, 2, 1), (0, 2, 2)]
    # SKIP composes: the SECOND-most prolific (ties broken by a ASC)
    got2 = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b) "
        "WITH a, count(b) AS n ORDER BY n DESC, a SKIP 1 LIMIT 1 "
        "MATCH (a)-[:KNOWS]->(c) RETURN a, c ORDER BY c"
    ).collect()
    assert [(r.a, r.c) for r in got2] == [(1, 2)]
    # plain WITH (no ORDER BY) is unchanged by the r8 tail support
    got3 = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b) WITH a, count(b) AS n "
        "WHERE n >= 2 RETURN a, n"
    ).collect()
    assert [(r.a, r.n) for r in got3] == [(0, 2)]


def test_chained_optional_matches_keep_nulls(spark):
    """Two OPTIONAL MATCHes in sequence, the second anchored on a
    variable the FIRST introduced optionally: rows whose first
    optional failed keep NULL through both (a NULL anchor left-joins
    to nothing), and independent optionals extend the same row."""
    pg, users, items, rated = _pg_ratings(spark)
    pg.add_vertex(
        "tag",
        users.sparkSession.createDataFrame(
            [(10, "hot"), (12, "cold")], "tid long, tname string"
        ),
        "tid",
    ).add_edge(
        "TAGGED",
        users.sparkSession.createDataFrame(
            [(10, 10), (12, 12)], "tsrc long, tdst long"
        ),
        "tsrc", "tdst",
    )
    # u2 rated only item 11 (untagged) -> i bound, t NULL
    # u3 rated item 10 (tagged hot) -> both bound
    # chain: user -opt-> item -opt-> tag
    got = {
        (r.u, r.i, r.t)
        for r in pg.query(
            "MATCH (u:user) "
            "OPTIONAL MATCH (u)-[:RATED]->(i:item) WHERE i = 11 "
            "OPTIONAL MATCH (i)-[:TAGGED]->(t:tag) "
            "RETURN u, i, t"
        ).collect()
    }
    # i=11 is never tagged, so t is NULL everywhere; users who never
    # rated item 11 carry NULL i AND NULL t (the NULL anchor case)
    assert got == {(0, 11, None), (1, None, None), (2, 11, None),
                   (3, None, None)}
    got2 = {
        (r.u, r.i, r.t)
        for r in pg.query(
            "MATCH (u:user) "
            "OPTIONAL MATCH (u)-[:RATED]->(i:item) WHERE i = 10 "
            "OPTIONAL MATCH (i)-[:TAGGED]->(t:tag) "
            "RETURN u, i, t"
        ).collect()
    }
    # raters of 10 (u0, u1, u3) get the 'hot' tag id; u2 gets NULLs
    assert got2 == {(0, 10, 10), (1, 10, 10), (3, 10, 10),
                    (2, None, None)}


def test_with_distinct_dedupes_midstream(spark):
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(x) WITH DISTINCT a "
        "RETURN count(*) AS n_knowers"
    ).collect()
    assert got[0].n_knowers == 3  # sources {0, 1, 3}


def test_with_drops_attribute_access(spark):
    """After WITH, only the projected names exist — var.attr terms on
    pre-WITH variables must fail loudly, not resolve stale columns."""
    pg = _pg_people(spark)
    with pytest.raises(ValueError, match="unlabeled|unknown"):
        pg.query(
            "MATCH (a:person)-[:KNOWS]->(b) WITH a, count(b) AS n "
            "RETURN a.name"
        )
    with pytest.raises(ValueError, match="unknown"):
        pg.query(
            "MATCH (a:person)-[:KNOWS]->(b) WITH a "
            "RETURN b"
        )


def test_where_is_null_anti_join_idiom(spark):
    """The Cypher anti-join: OPTIONAL MATCH, pipe through WITH, keep
    the unmatched anchors with IS NULL — compiles to a left join +
    null filter Catalyst rewrites as an anti join."""
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person) OPTIONAL MATCH (a)-[:KNOWS]->(b) "
        "WITH a, b WHERE b IS NULL RETURN a ORDER BY a"
    ).collect()
    assert [r.a for r in got] == [2, 4, 5]  # no outgoing KNOWS
    got2 = pg.query(
        "MATCH (a:person) OPTIONAL MATCH (a)-[:KNOWS]->(b) "
        "WITH a, b WHERE b IS NOT NULL RETURN count(*) AS n"
    ).collect()
    assert got2[0].n == 4  # the four KNOWS edges


def test_relabeling_bound_vars_raises(spark):
    """A label on an already-bound variable must match or raise —
    never silently skip the type filter."""
    pg = _pg_people(spark)
    with pytest.raises(ValueError, match="not supported"):
        # x bound unlabeled in chain 1, labeled in chain 2
        pg.query(
            "MATCH (a:person)-[:KNOWS]->(x) MATCH (x:person)-[:KNOWS]->(c) "
            "RETURN a, c"
        )
    with pytest.raises(ValueError, match="cycle variable"):
        # cycle close relabels the unlabeled b
        pg.match("MATCH (a:person)-[:KNOWS]->(b)-[:KNOWS]->(b:person)")
    # matching label on the repeated anchor is fine
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(x) MATCH (a:person)-[:KNOWS]->(c) "
        "RETURN DISTINCT a ORDER BY a"
    ).collect()
    assert [r.a for r in got] == [0, 1, 3]


def test_where_or_disjunction(spark):
    """WHERE precedence is the Cypher/SQL standard — AND binds tighter
    than OR, so `x OR y AND z` is `x OR (y AND z)`; quoted literals
    containing ' OR ' survive the split."""
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b:person) "
        "WHERE b.name = 'p1' OR b.name = 'p2' AND a < 3 "
        "RETURN a, b ORDER BY a, b"
    ).collect()
    # p1-edges unconditionally, p2-edges only from sources < 3
    assert [(r.a, r.b) for r in got] == [(0, 1), (0, 2), (1, 2), (3, 1)]
    # pure conjunction and pure disjunction are unaffected by the fix
    got_and = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b:person) "
        "WHERE b.name = 'p2' AND a < 1 RETURN a, b"
    ).collect()
    assert [(r.a, r.b) for r in got_and] == [(0, 2)]
    # a quoted literal containing OR must not split
    got2 = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b:person) "
        "WHERE b.name = 'X OR Y' RETURN count(*) AS n"
    ).collect()
    assert got2[0].n == 0
    # OR with IS NULL atoms composes
    got3 = pg.query(
        "MATCH (a:person) OPTIONAL MATCH (a)-[:KNOWS]->(b) "
        "WITH a, b WHERE b IS NULL OR b = 2 RETURN DISTINCT a ORDER BY a"
    ).collect()
    # keeps: unmatched anchors {2,4,5} plus knowers of 2 {0,1}
    assert [r.a for r in got3] == [0, 1, 2, 4, 5]


def test_where_in_list_and_string_predicates(spark):
    pg = _pg_people(spark)
    got = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b:person) "
        "WHERE b.name IN ['p1', 'p2'] RETURN a, b ORDER BY a, b"
    ).collect()
    assert [(r.a, r.b) for r in got] == [(0, 1), (0, 2), (1, 2), (3, 1)]
    # empty list is never true (Cypher semantics)
    assert pg.query(
        "MATCH (a:person) WHERE a IN [] RETURN a"
    ).count() == 0
    # numeric IN over ids
    got2 = pg.query(
        "MATCH (a:person) WHERE a IN [1, 3, 5] RETURN a ORDER BY a"
    ).collect()
    assert [r.a for r in got2] == [1, 3, 5]
    # string predicates: STARTS WITH / ENDS WITH / CONTAINS
    got3 = pg.query(
        "MATCH (a:person) WHERE a.name STARTS WITH 'p' AND "
        "a.name ENDS WITH '2' RETURN a"
    ).collect()
    assert [r.a for r in got3] == [2]
    got4 = pg.query(
        "MATCH (a:person) WHERE a.name CONTAINS '4' OR a.name CONTAINS '5' "
        "RETURN count(*) AS n"
    ).collect()
    assert got4[0].n == 2
    # a quoted comma inside an IN item must not split the list
    assert pg.query(
        "MATCH (a:person) WHERE a.name IN ['x,y', 'p0'] RETURN a"
    ).collect()[0].a == 0


def test_skip_offset_pagination(spark):
    pg = _pg_people(spark)
    page1 = pg.query(
        "MATCH (a:person) RETURN a ORDER BY a LIMIT 2"
    ).collect()
    page2 = pg.query(
        "MATCH (a:person) RETURN a ORDER BY a SKIP 2 LIMIT 2"
    ).collect()
    page3 = pg.query(
        "MATCH (a:person) RETURN a ORDER BY a SKIP 4 LIMIT 10"
    ).collect()
    assert [r.a for r in page1] == [0, 1]
    assert [r.a for r in page2] == [2, 3]
    assert [r.a for r in page3] == [4, 5]
    # SKIP without LIMIT
    rest = pg.query("MATCH (a:person) RETURN a ORDER BY a SKIP 5").collect()
    assert [r.a for r in rest] == [5]


def test_union_and_union_all(spark):
    pg = _pg_people(spark)
    # sources ∪ targets of KNOWS: UNION dedups, UNION ALL keeps all
    u = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b) RETURN a AS pid "
        "UNION MATCH (x:person)-[:KNOWS]->(y:person) RETURN y.pid AS pid"
    ).collect()
    assert sorted(r.pid for r in u) == [0, 1, 2, 3]
    ua = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b) RETURN a AS pid "
        "UNION ALL MATCH (x:person)-[:KNOWS]->(y:person) RETURN y.pid AS pid"
    ).collect()
    assert len(ua) == 8  # 4 edges x both sides, no dedup
    with pytest.raises(ValueError, match="mixing UNION"):
        pg.query(
            "MATCH (a:person) RETURN a UNION MATCH (b:person) RETURN b AS a "
            "UNION ALL MATCH (c:person) RETURN c AS a"
        )
    with pytest.raises(ValueError, match="column mismatch"):
        pg.query(
            "MATCH (a:person) RETURN a UNION MATCH (b:person) RETURN b"
        )


def test_varlength_range_hop(spark):
    pg = _pg_people(spark)
    # paths of length 1..2: edges (0,1) (0,2) (1,2) (3,1) plus the
    # 2-paths 0->1->2 and 3->1->2; one row PER PATH (UNION ALL)
    got = sorted(
        (r.a, r.b)
        for r in pg.query(
            "MATCH (a:person)-[:KNOWS*1..2]->(b:person) RETURN a, b"
        ).collect()
    )
    assert got == [(0, 1), (0, 2), (0, 2), (1, 2), (3, 1), (3, 2)]
    # *..2 is sugar for *1..2
    got2 = sorted(
        (r.a, r.b)
        for r in pg.query(
            "MATCH (a:person)-[:KNOWS*..2]->(b:person) RETURN a, b"
        ).collect()
    )
    assert got2 == got
    # RETURN DISTINCT collapses multi-path pairs
    assert sorted(
        (r.a, r.b)
        for r in pg.query(
            "MATCH (a:person)-[:KNOWS*1..2]->(b:person) RETURN DISTINCT a, b"
        ).collect()
    ) == [(0, 1), (0, 2), (1, 2), (3, 1), (3, 2)]
    # aggregates run ONCE over the unioned binding: count(*) counts
    # paths of every length in the range
    n = pg.query(
        "MATCH (a:person)-[:KNOWS*1..2]->(b:person) RETURN count(*) AS n"
    ).collect()
    assert [r.n for r in n] == [6]
    n2 = pg.query(
        "MATCH (a:person)-[:KNOWS*2..2]->(b:person) RETURN count(*) AS n"
    ).collect()
    assert [r.n for r in n2] == [2]


def test_varlength_range_errors(spark):
    pg = _pg_people(spark)
    with pytest.raises(ValueError, match="at most one"):
        pg.query(
            "MATCH (a:person)-[:KNOWS*1..2]->(b)-[:KNOWS*1..2]->(c) "
            "RETURN a, c"
        )
    with pytest.raises(ValueError, match="1 <= min <= max"):
        pg.query("MATCH (a:person)-[:KNOWS*3..2]->(b) RETURN a, b")
    with pytest.raises(ValueError, match="query\\(\\)-only"):
        pg.match("MATCH (a:person)-[:KNOWS*1..2]->(b)")
    # a range in a LATER clause has no single variable space to union in
    with pytest.raises(ValueError, match="initial MATCH"):
        pg.query(
            "MATCH (a:person) MATCH (a)-[:KNOWS*1..2]->(b:person) "
            "RETURN a, b"
        )
    # no RETURN yields the unioned binding on the shortest variant's
    # columns (anonymous intermediates projected away)
    b = pg.query("MATCH (a:person)-[:KNOWS*1..2]->(b:person)")
    assert b.count() == 6 and "a" in b.columns and "b" in b.columns
    assert not any(c.startswith("_a_") for c in b.columns)


def test_collect_aggregate(spark):
    pg = _pg_people(spark)
    got = {
        r.a: r.bs
        for r in pg.query(
            "MATCH (a:person)-[:KNOWS]->(b:person) "
            "RETURN a, collect(b) AS bs"
        ).collect()
    }
    assert got == {0: [1, 2], 1: [2], 3: [1]}
    # collect an attribute; sorted canonical order
    got2 = {
        r.a: r.names
        for r in pg.query(
            "MATCH (a:person)-[:KNOWS]->(b:person) "
            "RETURN a, collect(b.name) AS names"
        ).collect()
    }
    assert got2 == {0: ["p1", "p2"], 1: ["p2"], 3: ["p1"]}
    # DISTINCT collapses duplicates (2 is reachable from 0 twice via
    # the *1..2 range — collect sees the multiset, set dedups it)
    got3 = {
        r.a: r.bs
        for r in pg.query(
            "MATCH (a:person)-[:KNOWS*1..2]->(b:person) "
            "RETURN a, collect(DISTINCT b) AS bs"
        ).collect()
    }
    assert got3 == {0: [1, 2], 1: [2], 3: [1, 2]}


def test_shortest_path_form(spark):
    pg = _pg_people(spark)
    # knows: (0,1) (0,2) (1,2) (3,1); undirected BFS from 0:
    # 1@1 (via 0), 2@1 (via 0), 3@2 (via 1)
    got = {
        r.b: (r.len_p, r.name)
        for r in pg.query(
            "MATCH p = shortestPath((a:person)-[:KNOWS*..6]-(b:person)) "
            "WHERE a = 0 "
            "RETURN b, length(p) AS len_p, b.name AS name"
        ).collect()
    }
    assert got == {1: (1, "p1"), 2: (1, "p2"), 3: (2, "p3")}
    # residual WHERE terms filter the result (incl. on length(p));
    # ORDER BY / LIMIT ride the shared _finish tail
    got2 = pg.query(
        "MATCH p = shortestPath((a:person)-[:KNOWS*..6]-(b:person)) "
        "WHERE a = 0 AND length(p) >= 2 "
        "RETURN b, length(p) AS hops ORDER BY b LIMIT 1"
    ).collect()
    assert [(r.b, r.hops) for r in got2] == [(3, 2)]
    # unreachable vertices (4, 5) never appear; the source is excluded
    assert 0 not in got and 4 not in got and 5 not in got
    # aggregate over the BFS relation
    n = pg.query(
        "MATCH p = shortestPath((a:person)-[:KNOWS*..1]-(b:person)) "
        "WHERE a = 0 RETURN count(*) AS n"
    ).collect()
    assert [r.n for r in n] == [2]


def test_shortest_path_form_errors(spark):
    pg = _pg_people(spark)
    with pytest.raises(ValueError, match="undirected"):
        pg.query(
            "MATCH p = shortestPath((a:person)-[:KNOWS*..6]->(b)) "
            "WHERE a = 0 RETURN b"
        )
    with pytest.raises(ValueError, match="source pinned"):
        pg.query(
            "MATCH p = shortestPath((a:person)-[:KNOWS*..6]-(b)) "
            "WHERE b = 0 RETURN b"
        )
    with pytest.raises(ValueError, match="lower bound >= 2"):
        pg.query(
            "MATCH p = shortestPath((a:person)-[:KNOWS*2..6]-(b)) "
            "WHERE a = 0 RETURN b"
        )


def test_shortest_path_bound_variants(spark):
    """Round-9 bound set (VERDICT r8 #6): bare ``*`` (unbounded, BFS
    to convergence) and ``*0..k`` (the zero-length path — the source
    matches b=a at length 0), each pinned against the hand-written
    operator call on the same edges."""
    from torua_spark.operators import graph as g

    pg = _pg_people(spark)
    # knows graph: component of 0 is {0,1,2,3}; diameter 2 < the
    # convergence cap, so * and *..6 agree
    bounded = {
        (r.b, r.hops)
        for r in pg.query(
            "MATCH p = shortestPath((a:person)-[:KNOWS*..6]-(b:person)) "
            "WHERE a = 0 RETURN b, length(p) AS hops"
        ).collect()
    }
    unbounded = {
        (r.b, r.hops)
        for r in pg.query(
            "MATCH p = shortestPath((a:person)-[:KNOWS*]-(b:person)) "
            "WHERE a = 0 RETURN b, length(p) AS hops"
        ).collect()
    }
    assert unbounded == bounded == {(1, 1), (2, 1), (3, 2)}
    # *0..k = *..k plus exactly the source row at length 0
    zero = {
        (r.b, r.hops)
        for r in pg.query(
            "MATCH p = shortestPath((a:person)-[:KNOWS*0..6]-(b:person)) "
            "WHERE a = 0 RETURN b, length(p) AS hops"
        ).collect()
    }
    assert zero == bounded | {(0, 0)}
    # the compiled form equals the operator called by hand with
    # max_hops=None (same (id, hops) relation, source excluded)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 1)], "src long, dst long"
    )
    want = {
        (r.id, r.hops)
        for r in g.shortest_paths(edges, 0, None).collect()
        if r.hops > 0
    }
    assert unbounded == want


def test_shortest_paths_convergence_cap_is_loud(spark):
    """A graph whose diameter exceeds SSSP_CONVERGE_CAP must raise
    (silently partial reached sets are the failure mode the cap
    exists to prevent) — a path graph longer than the cap."""
    from torua_spark.operators import graph as g

    n = g.SSSP_CONVERGE_CAP + 8
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="still expanding"):
        g.shortest_paths(edges, 0, None)


def test_optional_match_where_aggregates_optional_side(spark):
    """VERDICT r8 #6 pin: OPTIONAL MATCH ... WHERE (pre-join scoped)
    with aggregates OVER THE OPTIONAL SIDE — count(o) counts matches
    only, sum over the optional edge attribute is NULL for anchors
    with no qualifying match (Cypher semantics)."""
    people = spark.createDataFrame(
        [(i, f"p{i}") for i in range(6)], "pid long, name string"
    )
    knows = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (1, 2, 3), (3, 1, 4)],
        "ksrc long, kdst long, w long",
    )
    pg = (
        PropertyGraph()
        .add_vertex("person", people, "pid")
        .add_edge("KNOWS", knows, "ksrc", "kdst")
    )
    got = {
        r.a: (r.n, r.tot)
        for r in pg.query(
            "MATCH (a:person) OPTIONAL MATCH (a)-[r:KNOWS]->(b:person) "
            "WHERE r.w >= 2 "
            "RETURN a, count(b) AS n, sum(r.w) AS tot"
        ).collect()
    }
    # knows edges (src, dst, w): (0,1,1) (0,2,2) (1,2,3) (3,1,4);
    # w >= 2 keeps (0,2,2) (1,2,3) (3,1,4)
    assert got == {
        0: (1, 2), 1: (1, 3), 2: (0, None), 3: (1, 4),
        4: (0, None), 5: (0, None),
    }


def test_return_arithmetic_items(spark):
    pg = _pg_people(spark)
    got = {
        r.a: (r.bal2, r.frac)
        for r in pg.query(
            "MATCH (a:person) WHERE a.bal > 0 "
            "RETURN a, a.bal * 2 + 10 AS bal2, a.bal / 100 - 1 AS frac"
        ).collect()
    }
    assert got == {i: (100 * i * 2 + 10, i - 1.0) for i in range(1, 6)}
    # arithmetic inside aggregate arguments
    got2 = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b:person) "
        "RETURN a, sum(b.bal * 2) AS twice ORDER BY a"
    ).collect()
    assert [(r.a, r.twice) for r in got2] == [(0, 600), (1, 400), (3, 200)]
    # unary minus literal, and precedence: * binds before -
    got3 = pg.query(
        "MATCH (a:person) WHERE a = 2 RETURN a.bal - -1 * 2 AS v"
    ).collect()
    assert [r.v for r in got3] == [202]
    # expression items need an alias
    with pytest.raises(ValueError, match="AS alias"):
        pg.query("MATCH (a:person) RETURN a.bal * 2")
    with pytest.raises(ValueError, match="AS alias"):
        pg.query("MATCH (a:person) RETURN sum(a.bal * 2)")


def test_unwind_clause(spark):
    pg = _pg_people(spark)
    # literal list: one row per element per binding row
    got = sorted(
        (r.a, r.x)
        for r in pg.query(
            "MATCH (a:person) WHERE a IN [0, 1] UNWIND [10, 20] AS x "
            "RETURN a, x"
        ).collect()
    )
    assert got == [(0, 10), (0, 20), (1, 10), (1, 20)]
    # empty list produces no rows (Cypher semantics)
    assert pg.query(
        "MATCH (a:person) UNWIND [] AS x RETURN a, x"
    ).count() == 0
    # UNWIND a collect() alias round-trips the grouping
    got2 = sorted(
        (r.a, r.x)
        for r in pg.query(
            "MATCH (a:person)-[:KNOWS]->(b:person) "
            "WITH a, collect(b) AS bs UNWIND bs AS x RETURN a, x"
        ).collect()
    )
    assert got2 == [(0, 1), (0, 2), (1, 2), (3, 1)]
    # rebinding an existing variable is an error
    with pytest.raises(ValueError, match="already bound"):
        pg.query("MATCH (a:person) UNWIND [1] AS a RETURN a")


def test_shortest_path_where_standard_precedence(spark):
    """ADVICE r7: mixed AND/OR in the shortestPath WHERE follows
    STANDARD precedence — ``(pin AND x) OR (pin AND y)``, with the
    source pin required in every disjunct — not the old AND-first
    split's ``pin AND (x OR y)``."""
    pg = _pg_people(spark)
    # BFS from 0: 1@1, 2@1, 3@2. (len>=2) OR (b=2) -> {3, 2}
    got = sorted(
        r.b
        for r in pg.query(
            "MATCH p = shortestPath((a:person)-[:KNOWS*..6]-(b:person)) "
            "WHERE a = 0 AND length(p) >= 2 OR a = 0 AND b = 2 "
            "RETURN b"
        ).collect()
    )
    assert got == [2, 3]
    # a pin in one disjunct does not constrain the other — raise, do
    # not silently run a not-single-source query
    with pytest.raises(ValueError, match="every"):
        pg.query(
            "MATCH p = shortestPath((a:person)-[:KNOWS*..6]-(b:person)) "
            "WHERE a = 0 AND length(p) >= 2 OR b = 2 RETURN b"
        )
    # two different pins is two sources
    with pytest.raises(ValueError, match="different ids"):
        pg.query(
            "MATCH p = shortestPath((a:person)-[:KNOWS*..6]-(b:person)) "
            "WHERE a = 0 OR a = 1 AND b = 2 RETURN b"
        )
    # a bare-pin disjunct makes the residual disjunction TRUE
    got2 = sorted(
        r.b
        for r in pg.query(
            "MATCH p = shortestPath((a:person)-[:KNOWS*..6]-(b:person)) "
            "WHERE a = 0 OR a = 0 AND length(p) >= 2 RETURN b"
        ).collect()
    )
    assert got2 == [1, 2, 3]


def test_exists_fresh_var_colliding_with_attr_column(spark):
    """ADVICE r7: a fresh EXISTS sub-pattern variable whose name
    collides with an outer ATTRIBUTE column (here ``name``, carried by
    the (a:person) binding) must stay existential — correlation is on
    the outer VARIABLE space, never on binding.columns — not equi-join
    vertex ids against attribute values (which silently empties the
    semi-join)."""
    pg = _pg_people(spark)
    got = sorted(
        r.a
        for r in pg.query(
            "MATCH (a:person) WHERE EXISTS((a)-[:KNOWS]->(name)) RETURN a"
        ).collect()
    )
    assert got == [0, 1, 3]
    # NOT EXISTS complement stays consistent
    got2 = sorted(
        r.a
        for r in pg.query(
            "MATCH (a:person) WHERE NOT EXISTS((a)-[:KNOWS]->(name)) RETURN a"
        ).collect()
    )
    assert got2 == [2, 4, 5]


def test_where_exists_subpattern(spark):
    pg = _pg_people(spark)
    # knows: (0,1) (0,2) (1,2) (3,1); people with an outgoing edge:
    got = sorted(
        r.a
        for r in pg.query(
            "MATCH (a:person) WHERE EXISTS((a)-[:KNOWS]->(x)) RETURN a"
        ).collect()
    )
    assert got == [0, 1, 3]
    # NOT EXISTS = the complement
    got2 = sorted(
        r.a
        for r in pg.query(
            "MATCH (a:person) WHERE NOT EXISTS((a)-[:KNOWS]->(x)) RETURN a"
        ).collect()
    )
    assert got2 == [2, 4, 5]
    # correlated on TWO bound vars: pairs (a, b) where a ALSO knows
    # someone b knows (a 2-path a->m<-?... here: both know a common
    # target) — sub-pattern shares a AND b with the outer match
    got3 = sorted(
        (r.a, r.b)
        for r in pg.query(
            "MATCH (a:person)-[:KNOWS]->(b:person) "
            "WHERE EXISTS((a)-[:KNOWS]->(m)-[:KNOWS]->(b)) "
            "RETURN a, b"
        ).collect()
    )
    # 0->2 via 1 is the only edge with a parallel 2-path
    assert got3 == [(0, 2)]
    # EXISTS never multiplies rows: the semi-join row count equals the
    # filtered base count even when the sub-pattern matches many ways
    n = pg.query(
        "MATCH (a:person) WHERE EXISTS((a)-[:KNOWS]->(x)) "
        "RETURN count(*) AS n"
    ).collect()[0].n
    assert n == 3
    # guards: OR-composed EXISTS, unlabeled anchor, uncorrelated sub
    with pytest.raises(ValueError, match="standalone AND"):
        pg.query(
            "MATCH (a:person) WHERE a = 1 OR EXISTS((a)-[:KNOWS]->(x)) "
            "RETURN a"
        )
    with pytest.raises(ValueError, match="shares no variable"):
        pg.query(
            "MATCH (a:person) WHERE EXISTS((q:person)-[:KNOWS]->(x)) "
            "RETURN a"
        )


def test_fk_hop_then_conjunct_chain_alias_collision(spark, sf_dir):
    """Regression: an FK hop consumes a hop index without creating a
    __src_ column; a second conjunct chain must still pick fresh edge
    aliases (the count-based offset re-aliased __src_1 and crashed a
    valid query with AMBIGUOUS_REFERENCE)."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    pg = (
        PropertyGraph()
        .add_vertex("customer", cust, "c_custkey")
        .add_vertex("nation", nat, "n_nationkey", broadcast=True)
        .add_edge("IN_NATION", None, "c_custkey", "c_nationkey")
        .add_edge("PLACED", orders.select("o_custkey", "o_orderkey"),
                  "o_custkey", "o_orderkey")
    )
    got = pg.query(
        "MATCH (c:customer)-[:IN_NATION]->(n:nation)-[:PLACED]->(x), "
        "(d:customer)-[:PLACED]->(x) "
        "RETURN count(*) AS n"
    ).collect()
    # nation keys overlap custkeys 0..24: nations that "placed" orders
    # via the shared key space join with every customer d placing the
    # same order — the exact row count is data-derived; the regression
    # is that this COMPILES and runs (it crashed before the fix)
    assert got[0]["n"] >= 0


def test_node_property_map_desugars_to_where(spark):
    """Round-9 sugar: (a:L {k: v}) == (a:L) + WHERE a.k = v (Cypher's
    defined rewrite), in MATCH, comma-conjunction, and OPTIONAL MATCH
    scopes — the OPTIONAL form filters PRE-join so anchors survive."""
    people = spark.createDataFrame(
        [(i, f"p{i}", 100 * i) for i in range(4)],
        "pid long, name string, bal long",
    )
    knows = spark.createDataFrame([(0, 1), (1, 2)], "ksrc long, kdst long")
    pg = (
        PropertyGraph()
        .add_vertex("person", people, "pid")
        .add_edge("KNOWS", knows, "ksrc", "kdst")
    )
    got = pg.query(
        "MATCH (a:person {name: 'p0'})-[:KNOWS]->(b:person) RETURN a, b"
    ).collect()
    assert [(r.a, r.b) for r in got] == [(0, 1)]
    # equivalent explicit-WHERE form produces the same rows
    want = pg.query(
        "MATCH (a:person)-[:KNOWS]->(b:person) WHERE a.name = 'p0' "
        "RETURN a, b"
    ).collect()
    assert [(r.a, r.b) for r in got] == [(r.a, r.b) for r in want]
    # multi-key map = AND of terms
    none = pg.query(
        "MATCH (a:person {name: 'p0', bal: 5})-[:KNOWS]->(b) RETURN a, b"
    ).collect()
    assert none == []
    # OPTIONAL MATCH map scopes pre-join: anchors survive with 0
    opt = {
        r.a: r.n
        for r in pg.query(
            "MATCH (a:person) OPTIONAL MATCH "
            "(a)-[:KNOWS]->(b:person {name: 'p2'}) "
            "RETURN a, count(b) AS n"
        ).collect()
    }
    assert opt == {0: 0, 1: 1, 2: 0, 3: 0}
    # anonymous node with a map is loud
    with pytest.raises(ValueError, match="named node"):
        pg.query("MATCH (a:person)-[:KNOWS]->({name: 'p1'}) RETURN a")


def test_relationship_alternation_unions_bindings(spark):
    """Round-9: [:A|B] compiles each type and unions the BINDINGS
    (bag semantics — one row per matching relationship), so WHERE and
    aggregates apply once over the union; edge variables and
    later-clause alternations are loud."""
    people = spark.createDataFrame(
        [(i, f"p{i}") for i in range(6)], "pid long, name string"
    )
    knows = spark.createDataFrame([(0, 1), (1, 2)], "ksrc long, kdst long")
    likes = spark.createDataFrame([(3, 1), (0, 5)], "lsrc long, ldst long")
    pg = (
        PropertyGraph()
        .add_vertex("person", people, "pid")
        .add_edge("KNOWS", knows, "ksrc", "kdst")
        .add_edge("LIKES", likes, "lsrc", "ldst")
    )
    rows = sorted(
        (r.a, r.b)
        for r in pg.query(
            "MATCH (a:person)-[:KNOWS|LIKES]->(b:person) RETURN a, b"
        ).collect()
    )
    assert rows == [(0, 1), (0, 5), (1, 2), (3, 1)]
    agg = {
        r.a: r.n
        for r in pg.query(
            "MATCH (a:person)-[:KNOWS|LIKES]->(b) RETURN a, count(*) AS n"
        ).collect()
    }
    assert agg == {0: 2, 1: 1, 3: 1}
    # composes with property maps
    both = sorted(
        (r.a, r.b)
        for r in pg.query(
            "MATCH (a:person {name: 'p0'})-[:KNOWS|LIKES]->(b:person) "
            "RETURN a, b"
        ).collect()
    )
    assert both == [(0, 1), (0, 5)]
    with pytest.raises(ValueError, match="edge variable"):
        pg.query("MATCH (a:person)-[r:KNOWS|LIKES]->(b) RETURN a, r.w")
    with pytest.raises(ValueError, match="initial MATCH"):
        pg.query(
            "MATCH (a:person) MATCH (a)-[:KNOWS|LIKES]->(b) RETURN a, b"
        )


# relationship PROPERTY MAPS (round 10): [r:R {k: v}] / [:R {k: v}]
# desugar to pushed edge-equality WHERE terms in clause scope.

def test_edge_property_map_named_equals_where(spark):
    """[r:RATED {stars: 5}] is sugar for the explicit edge WHERE —
    pinned result-for-result against both the WHERE form and the
    hand-written join."""
    pg, users, items, rated = _pg_ratings(spark)
    got = pg.query(
        "MATCH (u:user)-[r:RATED {stars: 5}]->(i:item) "
        "RETURN u, i AS iid ORDER BY u"
    ).collect()
    via_where = pg.query(
        "MATCH (u:user)-[r:RATED]->(i:item) WHERE r.stars = 5 "
        "RETURN u, i AS iid ORDER BY u"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in via_where]
    assert [(r.u, r.iid) for r in got] == [(0, 10), (2, 11)]


def test_edge_property_map_anonymous_and_multikey(spark):
    """Anonymous [:RATED {stars: 5}] binds through a synthesized edge
    variable; a multi-key map ANDs its terms; the map composes with a
    node property map in the same clause."""
    pg, users, items, rated = _pg_ratings(spark)
    got = pg.query(
        "MATCH (u:user {uname: 'u0'})-[:RATED {stars: 5}]->(i:item) "
        "RETURN u, i AS iid"
    ).collect()
    assert [(r.u, r.iid) for r in got] == [(0, 10)]
    # multi-key: stars 5 AND the endpoint column is NOT an attribute,
    # so a two-attr map needs a second data column — reuse stars twice
    # via an impossible pair to prove AND semantics
    none = pg.query(
        "MATCH (u:user)-[:RATED {stars: 5, stars: 4}]->(i:item) "
        "RETURN u, i AS iid"
    ).collect()
    assert none == []
    # two anonymous maps in one pattern: distinct synthesized vars
    both = pg.query(
        "MATCH (u:user)-[:RATED {stars: 5}]->(i:item), "
        "(v:user)-[:RATED {stars: 4}]->(i) "
        "RETURN u, v, i AS iid"
    ).collect()
    assert [(r.u, r.v, r.iid) for r in both] == [(0, 1, 10)]


def test_edge_property_map_in_optional_scope(spark):
    """Under OPTIONAL MATCH the map filters PRE-join, like the node
    map and the scoped WHERE."""
    pg, *_ = _pg_ratings(spark)
    got = pg.query(
        "MATCH (u:user) OPTIONAL MATCH (u)-[:RATED {stars: 5}]->(i:item) "
        "RETURN u, count(i) AS n ORDER BY u"
    ).collect()
    assert [(r.u, r.n) for r in got] == [(0, 1), (1, 0), (2, 1), (3, 0)]


def test_edge_property_map_rejections(spark):
    pg, *_ = _pg_ratings(spark)
    with pytest.raises(ValueError, match="variable-length"):
        pg.query("MATCH (u:user)-[:RATED {stars: 5}*1..2]->(i:item) "
                 "RETURN u")
    with pytest.raises(ValueError, match="variable-length"):
        pg.query("MATCH (u:user)-[:RATED*1..2 {stars: 5}]->(i:item) "
                 "RETURN u")
    with pytest.raises(ValueError, match="alternating"):
        pg.query("MATCH (u:user)-[:RATED|KNOWS {stars: 5}]->(i:item) "
                 "RETURN u")
    # FK hops have no attribute relation: the synthesized variable is
    # rejected by the existing FK edge-variable guard
    fk = (
        PropertyGraph()
        .add_vertex("customer", spark.createDataFrame(
            [(1, 7)], "c_custkey long, c_nationkey long"), "c_custkey")
        .add_vertex("nation", spark.createDataFrame(
            [(7,)], "n_nationkey long"), "n_nationkey")
        .add_edge("IN_NATION", None, "c_custkey", "c_nationkey")
    )
    with pytest.raises(ValueError, match="FK"):
        fk.query("MATCH (c:customer)-[:IN_NATION {x: 1}]->(n:nation) "
                 "RETURN c")


def test_edge_property_map_untyped_edge_message(spark):
    """An untyped map edge [r {k: v}] gets its own diagnosis (hops need
    a type), not the alternation error (r10 review)."""
    pg, *_ = _pg_ratings(spark)
    with pytest.raises(ValueError, match="untyped edge"):
        pg.query("MATCH (u:user)-[r {stars: 5}]->(i:item) RETURN u")
    with pytest.raises(ValueError, match="alternating"):
        pg.query("MATCH (u:user)-[:RATED|KNOWS {stars: 5}]->(i:item) "
                 "RETURN u")


def test_rotated_out_r13_graph_entries_vs_oracle(spark, sf_dir):
    """Rotation discipline (r13): the three graph witnesses that left
    the driver window this round keep their full pytest-vs-DuckDB
    hash parity — graph_exists_filter (r7-r12 driver-green),
    graph_comma_conjunction (r8-r12), graph_pattern_topk (r6-r12,
    also covered by test_pattern_topk_and_optional_match_vs_oracle)."""
    from tests.oracle import compare

    for name in ("graph_exists_filter", "graph_comma_conjunction"):
        compare(
            graph_q.QUERIES[name](spark, sf_dir),
            graph_q.ORACLE[name], sf_dir,
        )
