"""Declared relational / scatter-gather queries + oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from torua_spark.functions.compat import round4_sql
from torua_spark.operators import relational as rel
from torua_spark.sources.catalog import load_table


def q_scatter_gather_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rel.scatter_gather_revenue(load_table(spark, sf_dir, "lineitem"))


def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rel.json_extract_props(load_table(spark, sf_dir, "events"))


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rel.set_ops_demo(load_table(spark, sf_dir, "orders"))


QUERIES = {
    "scatter_gather_agg": q_scatter_gather_agg,
    "json_extract_props": q_json_extract_props,
    "set_ops": q_set_ops,
}

ORACLE = {
    "scatter_gather_agg": """
        SELECT l_returnflag, l_linestatus,
               floor((sum(l_quantity)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_qty,
               floor((sum(l_extendedprice)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_base_price,
               floor((sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_disc_price,
               floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_charge,
               floor((avg(l_quantity)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS avg_qty,
               floor((avg(l_extendedprice)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS avg_price,
               floor((avg(l_discount)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "json_extract_props": """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               count(*) AS n
        FROM events
        GROUP BY k
    """,
    "set_ops": """
        WITH open_c AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
             fin_c  AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
             urg_c  AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        SELECT o_custkey AS custkey FROM (
            SELECT o_custkey FROM open_c INTERSECT SELECT o_custkey FROM fin_c
        ) EXCEPT ALL SELECT o_custkey FROM urg_c
    """,
}


def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (status -> priority -> grand total): Spark
    rollup == SQL GROUP BY ROLLUP; NULL marks subtotal rows."""
    from pyspark.sql import functions as F
    from torua_spark.functions.compat import round4

    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            round4(F.sum("o_totalprice")).alias("sum_total"),
        )
    )


def q_quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distribution stats per event_type: distinct users, median
    and p95 of value (percentile with linear interpolation — the same
    definition as DuckDB quantile_cont)."""
    from pyspark.sql import functions as F
    from torua_spark.functions.compat import round4

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        round4(F.percentile("value", F.lit(0.5))).alias("median_value"),
        round4(F.percentile("value", F.lit(0.95))).alias("p95_value"),
    )


def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based stats per event_type: HLL++ distinct users and
    t-digest-style approximate percentiles. These are THE 100 TB
    formulation of `quantile_stats` — fixed-size mergeable sketch
    state per group (partial+final, no per-key state blowup, no global
    sort), where the exact variants hold all distinct keys / all
    values per group.

    Sketch values can't hash-match a different engine's sketch, so the
    declared contract is a TOLERANCE oracle (VERDICT r1 #4): the query
    emits per-group booleans asserting each estimate sits inside its
    documented error bound (HLL rsd=0.02 -> 10% = 5 sigma; percentile
    accuracy=10000 -> +-1% rank window, checked against the exact
    percentiles at q+-0.01 computed in the same aggregate). The DuckDB
    oracle emits TRUE constants — the hash matches iff every sketch
    honors its bound. The exact values never leave the aggregate, so
    the sketch path (the part that must scale) stays in the plan."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("eu"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
        F.percentile("value", F.lit(0.49)).alias("lo50"),
        F.percentile("value", F.lit(0.51)).alias("hi50"),
        F.percentile("value", F.lit(0.94)).alias("lo95"),
        F.percentile("value", F.lit(0.96)).alias("hi95"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("am"),
        F.percentile_approx("value", F.lit(0.95), F.lit(10000)).alias("ap"),
    )
    return g.select(
        "event_type",
        "n",
        (F.abs(F.col("au") - F.col("eu")) <= F.col("eu") * F.lit(0.10)).alias(
            "users_within_10pct"
        ),
        ((F.col("am") >= F.col("lo50")) & (F.col("am") <= F.col("hi50"))).alias(
            "median_within_1pct_rank"
        ),
        ((F.col("ap") >= F.col("lo95")) & (F.col("ap") <= F.col("hi95"))).alias(
            "p95_within_1pct_rank"
        ),
    )


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube (all 4 grouping-set combinations of status x priority)
    — `rollup_orders`' sibling covering the complete grouping-sets
    family; NULL marks the aggregated-out dimension."""
    from pyspark.sql import functions as F
    from torua_spark.functions.compat import round4

    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        round4(F.sum("o_totalprice")).alias("sum_total"),
    )


def q_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics via ranking windows: events split into
    per-type quartiles (ntile over a unique total order), reporting
    count, mean, and the quartile's upper percent_rank/cume_dist
    boundary. One shuffle on event_type; the sort is per-partition."""
    from pyspark.sql import Window, functions as F
    from torua_spark.functions.compat import round4

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        "value",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("event_type", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        round4(F.avg("value")).alias("avg_value"),
        round4(F.max("pr")).alias("max_percent_rank"),
        round4(F.max("cd")).alias("max_cume_dist"),
    )


QUERIES["rollup_orders"] = q_rollup_orders
QUERIES["quantile_stats"] = q_quantile_stats
QUERIES["approx_stats"] = q_approx_stats
QUERIES["cube_orders"] = q_cube_orders
QUERIES["value_quartiles"] = q_value_quartiles

ORACLE["rollup_orders"] = """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
           floor((sum(o_totalprice)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_total
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""
ORACLE["cube_orders"] = """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
           floor((sum(o_totalprice)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS sum_total
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""
ORACLE["value_quartiles"] = """
    WITH ranked AS (
        SELECT event_type, value,
               ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile,
               percent_rank() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pr,
               cume_dist() OVER (PARTITION BY event_type ORDER BY value, event_id) AS cd
        FROM events
    )
    SELECT event_type, CAST(quartile AS INTEGER) AS quartile, count(*) AS n,
           floor((avg(value)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS avg_value,
           floor((max(pr)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS max_percent_rank,
           floor((max(cd)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS max_cume_dist
    FROM ranked GROUP BY event_type, quartile
"""
ORACLE["quantile_stats"] = """
    SELECT event_type, count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           floor((quantile_cont(value, 0.5)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS median_value,
           floor((quantile_cont(value, 0.95)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS p95_value
    FROM events GROUP BY event_type
"""
# Tolerance oracle: the Spark side emits booleans asserting each sketch
# estimate is inside its documented bound; the oracle asserts they are
# all TRUE. A sketch drifting out of bounds turns a boolean false and
# the value hash red — exactly the failure this check exists to catch.
ORACLE["approx_stats"] = """
    SELECT event_type, count(*) AS n,
           TRUE AS users_within_10pct,
           TRUE AS median_within_1pct_rank,
           TRUE AS p95_within_1pct_rank
    FROM events GROUP BY event_type
"""


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 10-bin histogram of event values per type over the
    corpus-wide [min, max] span. The span is a 1-row broadcast
    aggregate; binning is a pure expression inside the scan stage, so
    the only shuffle is the (type, bin) partial+final count — the
    dashboard-histogram shape at any corpus size. The bin edge uses an
    epsilon-guarded floor, identical in the oracle, so engine ulp
    differences can't flip a boundary value into the next bin."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.least(
            F.greatest(
                (
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        * F.lit(10.0)
                        # greatest(span, eps): a degenerate corpus where
                        # all values are equal must bin deterministically
                        # (0/eps -> bin 1 on both engines), never 0/0=NaN
                        # whose int cast differs across engines (ADVICE r2)
                        / F.greatest(
                            F.col("hi") - F.col("lo"), F.lit(1e-12)
                        )
                        - F.lit(1e-9)
                    )
                    + F.lit(1)
                ).cast("int"),
                F.lit(1),
            ),
            F.lit(10),
        ).alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n_events")
    )


QUERIES["value_histogram"] = q_value_histogram

ORACLE["value_histogram"] = """
    WITH span AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
    SELECT event_type,
           CAST(least(greatest(
               floor((value - lo) * 10.0 / greatest(hi - lo, 1e-12) - 1e-9) + 1, 1), 10)
               AS INTEGER) AS bin,
           count(*)::BIGINT AS n_events
    FROM events, span
    GROUP BY 1, 2
"""


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust training statistics: per event_type, clip values
    to the exact interpolated [p01, p99] band and report the bounds,
    the clipped mean, and the clip rate — the winsorization every
    numeric-feature pipeline applies before normalization. The bounds
    relation is |event_type| rows (broadcast back); both aggregations
    are partial+final."""
    from pyspark.sql import functions as F
    from torua_spark.functions.compat import round4

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("p01"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "p01",
        "p99",
        F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99")).alias("cv"),
        (
            (F.col("value") < F.col("p01")) | (F.col("value") > F.col("p99"))
        ).cast("long").alias("is_clipped"),
    )
    return clipped.groupBy("event_type").agg(
        round4(F.min("p01")).alias("p01"),
        round4(F.min("p99")).alias("p99"),
        round4(F.avg("cv")).alias("clipped_mean"),
        round4(F.sum("is_clipped") / F.count(F.lit(1))).alias("clip_rate"),
    )


QUERIES["winsorized_stats"] = q_winsorized_stats

ORACLE["winsorized_stats"] = """
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(value, 0.01) AS p01,
               quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           floor((min(b.p01)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS p01,
           floor((min(b.p99)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS p99,
           floor((avg(least(greatest(e.value, b.p01), b.p99))) * 10000.0 + 0.5 + 1e-9) / 10000.0
               AS clipped_mean,
           floor((sum(CASE WHEN e.value < b.p01 OR e.value > b.p99 THEN 1 ELSE 0 END)::DOUBLE
                  / count(*)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS clip_rate
    FROM events e JOIN bounds b USING (event_type)
    GROUP BY e.event_type
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from torua_spark.operators.relational import skew_report

    return skew_report(load_table(spark, sf_dir, "events"), "user_id", 10)


QUERIES["skew_report"] = q_skew_report

ORACLE["skew_report"] = """
    WITH counts AS (
        SELECT CAST(user_id AS VARCHAR) AS key, count(*)::BIGINT AS n
        FROM events GROUP BY 1
    ),
    totals AS (
        SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS n_keys,
               max(n) AS max_n, avg(n) AS avg_n
        FROM counts
    ),
    head AS (
        SELECT key, n,
               floor((n::DOUBLE / total) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS share,
               CAST(NULL AS BIGINT) AS n_keys, CAST(NULL AS DOUBLE) AS skew_ratio
        FROM (
            SELECT *, row_number() OVER (ORDER BY n DESC, key ASC) AS r FROM counts
        ), totals WHERE r <= 10
    )
    SELECT key, n, share, n_keys, skew_ratio FROM head
    UNION ALL
    SELECT CAST(NULL AS VARCHAR), total, CAST(NULL AS DOUBLE), n_keys,
           floor((max_n / avg_n) * 10000.0 + 0.5 + 1e-9) / 10000.0
    FROM totals
"""


# ---------------------------------------------------------------- Z-order
# Morton-curve layout analytics (sources/layout.py): quantize
# (user_id, epoch-seconds) onto 8-bit grids with FIXED corpus-
# independent ranges, interleave to a 16-bit z-value, and report
# per-z-bucket occupancy — the planning view of a Z-order rewrite
# (how many rows each curve segment holds and how tight its
# dimension bounds are). Exact integer math end-to-end; the oracle
# reproduces every bit.
_Z_USER_LO, _Z_USER_HI = 0, 16383
_Z_TS_LO, _Z_TS_HI = 1704067200, 1706745599  # Jan 2024, 31 days
_Z_BITS = 8


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from torua_spark.sources.layout import quantize_int, zvalue

    ev = load_table(spark, sf_dir, "events")
    qu = quantize_int("user_id", _Z_USER_LO, _Z_USER_HI, _Z_BITS)
    qt = quantize_int(
        F.col("ts").cast("long"), _Z_TS_LO, _Z_TS_HI, _Z_BITS
    )
    z = zvalue([qu, qt], _Z_BITS)
    return (
        ev.select(z.alias("z"), "user_id")
        .groupBy(F.shiftright("z", 10).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
            F.min("user_id").alias("u_min"),
            F.max("user_id").alias("u_max"),
        )
    )


QUERIES["zorder_layout"] = q_zorder_layout


def _zorder_oracle() -> str:
    from torua_spark.sources.layout import quantize_int_sql, zvalue_sql

    qu = quantize_int_sql("user_id", _Z_USER_LO, _Z_USER_HI, _Z_BITS)
    qt = quantize_int_sql(
        "(epoch_ms(CAST(ts AS TIMESTAMP)) // 1000)", _Z_TS_LO, _Z_TS_HI, _Z_BITS
    )
    return f"""
        WITH q AS (
            SELECT {zvalue_sql([qu, qt], _Z_BITS)} AS z, user_id
            FROM events
        )
        SELECT CAST(z >> 10 AS INTEGER) AS bucket, count(*) AS n_events,
               CAST(min(z) AS BIGINT) AS z_min, CAST(max(z) AS BIGINT) AS z_max,
               CAST(min(user_id) AS BIGINT) AS u_min,
               CAST(max(user_id) AS BIGINT) AS u_max
        FROM q GROUP BY 1
    """


ORACLE["zorder_layout"] = _zorder_oracle()


def q_profile_orders(spark, sf_dir):
    """One-scan column profile of the orders table (counts, nulls,
    exact distincts, typed min/max/avg) — the ingest data-quality
    gate, hash-checked per column against per-column SQL. One column
    per type family: exact count(DISTINCT) expands the input per
    distinct column, so the profile's driver cost is linear in the
    profiled width — the full-width pass belongs to approx=True."""
    from torua_spark.operators.profile import profile_table

    return profile_table(
        load_table(spark, sf_dir, "orders"),
        ["o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"],
    )


QUERIES["profile_orders"] = q_profile_orders


def _profile_orders_oracle() -> str:
    num = {"o_orderkey": "bigint", "o_totalprice": "double"}
    strc = {"o_orderstatus": "string"}
    tmp = {"o_orderdate": "timestamp_ntz"}
    parts = []
    for c, t in num.items():
        parts.append(f"""
            SELECT '{c}' AS col_name, '{t}' AS dtype,
                   count(*)::BIGINT AS n_rows,
                   (count(*) - count({c}))::BIGINT AS n_nulls,
                   count(DISTINCT {c})::BIGINT AS n_distinct,
                   CAST(NULL AS VARCHAR) AS min_str,
                   CAST(NULL AS VARCHAR) AS max_str,
                   {round4_sql(f'min({c}::DOUBLE)')} AS min_num,
                   {round4_sql(f'max({c}::DOUBLE)')} AS max_num,
                   {round4_sql(f'avg({c}::DOUBLE)')} AS avg_num
            FROM orders""")
    for c, t in strc.items():
        parts.append(f"""
            SELECT '{c}', '{t}', count(*)::BIGINT,
                   (count(*) - count({c}))::BIGINT,
                   count(DISTINCT {c})::BIGINT,
                   min({c}), max({c}),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   CAST(NULL AS DOUBLE)
            FROM orders""")
    for c, t in tmp.items():
        parts.append(f"""
            SELECT '{c}', '{t}', count(*)::BIGINT,
                   (count(*) - count({c}))::BIGINT,
                   count(DISTINCT {c})::BIGINT,
                   strftime(min({c}), '%Y-%m-%d %H:%M:%S'),
                   strftime(max({c}), '%Y-%m-%d %H:%M:%S'),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   CAST(NULL AS DOUBLE)
            FROM orders""")
    return " UNION ALL ".join(parts)


ORACLE["profile_orders"] = _profile_orders_oracle()


def q_profile_correlations(spark, sf_dir):
    """Pairwise Pearson correlations of the lineitem numeric columns
    in one fused scan, hash-checked per pair."""
    from torua_spark.operators.profile import profile_correlations

    return profile_correlations(
        load_table(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


QUERIES["profile_correlations"] = q_profile_correlations


def _profile_corr_oracle() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    parts = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            parts.append(f"""
                SELECT '{a}' AS col_a, '{b}' AS col_b,
                       {round4_sql(f'corr({a}::DOUBLE, {b}::DOUBLE)')} AS corr
                FROM lineitem""")
    return " UNION ALL ".join(parts)


ORACLE["profile_correlations"] = _profile_corr_oracle()
