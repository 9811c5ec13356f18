"""Source/sink round-trips + partition pruning on the partitioned sink."""

import pytest
from pyspark.sql import functions as F

from torua_spark.plans import plan_string
from torua_spark.sources import io
from torua_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def nation_df(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_csv_roundtrip(spark, nation_df, tmp_path):
    p = str(tmp_path / "nation_csv")
    io.write_csv(nation_df, p)
    back = io.read_csv(spark, p, nation_df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation_df.collect()))


def test_json_roundtrip(spark, nation_df, tmp_path):
    p = str(tmp_path / "nation_json")
    io.write_json(nation_df, p)
    back = io.read_json(spark, p, nation_df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation_df.collect()))


def test_orc_roundtrip_with_pushdown(spark, nation_df, tmp_path):
    p = str(tmp_path / "nation_orc")
    io.write_orc(nation_df, p)
    back = io.read_orc(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation_df.collect()))
    # ORC scans take predicate pushdown like parquet
    plan = plan_string(back.filter(F.col("n_nationkey") == 3))
    assert "PushedFilters" in plan and "n_nationkey" in plan


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    p = str(tmp_path / "docs_by_lang")
    io.write_partitioned(docs, p, ["lang"])
    back = spark.read.parquet(p).filter(F.col("lang") == "en")
    # partition pruning: only the lang=en directory is scanned
    plan = plan_string(back)
    assert "PartitionFilters" in plan and "lang" in plan
    assert back.count() == docs.filter(F.col("lang") == "en").count()


def test_time_partitioned_events_prune_and_cluster(spark, sf_dir, tmp_path):
    """B14 beyond bucketing (VERDICT r1 #8): dt= hive layout on events
    gives partition-pruned time-range scans, and the intra-partition
    sort gives tight row-group min/max on event_type for row-group
    skipping. Asserted: PartitionFilters carries the dt predicate,
    PushedFilters carries the event_type predicate, counts match the
    unpartitioned path."""
    ev = load_table(spark, sf_dir, "events")
    p = str(tmp_path / "events_by_dt")
    io.write_time_partitioned(ev, p, "ts", cluster_cols=["event_type", "user_id"])

    some_dt = spark.read.parquet(p).select("dt").orderBy("dt").limit(1).collect()[0][0]
    q = (
        spark.read.parquet(p)
        .filter((F.col("dt") == some_dt) & (F.col("event_type") == "click"))
    )
    plan = plan_string(q)
    assert "PartitionFilters" in plan and "dt" in plan
    assert "PushedFilters" in plan and "event_type" in plan
    expect = ev.filter(
        (F.date_format(F.col("ts"), "yyyy-MM-dd") == some_dt)
        & (F.col("event_type") == "click")
    ).count()
    assert q.count() == expect


def test_merge_changelog_agrees_with_merge_report(spark, sf_dir, tmp_path):
    """The CDF preview and the merge itself must tell the same story:
    per-change counts equal the report's updated/inserted split, and
    post-merge the lake contains exactly the changelog's post-images."""
    from pyspark.sql import functions as F

    from torua_spark.sources.catalog import load_table
    from torua_spark.sources.io import merge_changelog, merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    lake = str(tmp_path / "lake")
    orders.repartition("o_orderstatus").write.partitionBy(
        "o_orderstatus"
    ).parquet(lake)
    batch = (
        orders.filter(F.col("o_orderkey") % 50 == 0)
        .withColumn("o_totalprice", F.lit(1.0))
        .unionByName(
            orders.filter(F.col("o_orderkey") % 70 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + 999_999)
            .withColumn("o_totalprice", F.lit(2.0))
        )
    )
    log = merge_changelog(spark, lake, batch, "o_orderkey", "o_orderstatus")
    by_change = {r["change"]: r["n"] for r in
                 log.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()}
    report = merge_upsert(spark, lake, batch, "o_orderkey", "o_orderstatus")
    assert by_change.get("update", 0) == report["rows_updated"]
    assert by_change.get("insert", 0) == report["rows_inserted"]
    # every changelog post-image is present in the merged lake
    merged = spark.read.parquet(lake)
    missing = (
        log.select("o_orderkey", "o_totalprice")
        .join(
            merged.select("o_orderkey", "o_totalprice"),
            ["o_orderkey", "o_totalprice"],
            "left_anti",
        )
        .count()
    )
    assert missing == 0


def test_purge_predicate_rewrites_only_hit_partitions(spark, sf_dir, tmp_path):
    """Retention purge on a year-partitioned lake: only years holding
    matching rows rewrite (others byte-identical by mtime); kept rows
    are exactly the negated predicate."""
    import os

    from pyspark.sql import functions as F

    from torua_spark.sources.catalog import load_table
    from torua_spark.sources.io import purge_predicate

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    lake = str(tmp_path / "lake")
    orders.repartition("o_year").write.partitionBy("o_year").parquet(lake)
    years = sorted(r[0] for r in orders.select("o_year").distinct().collect())
    cutoff_year = years[1]  # delete strictly-before the second year
    pred = f"o_orderdate < TIMESTAMP '{cutoff_year}-01-01 00:00:00'"
    before_mtime = {
        y: os.path.getmtime(f"{lake}/o_year={y}") for y in years
    }
    n_old = orders.filter(F.expr(pred)).count()
    report = purge_predicate(spark, lake, pred, "o_year")
    assert report["rows_deleted"] == n_old > 0
    assert report["partitions_rewritten"] == 1  # only the first year
    after = spark.read.parquet(lake)
    assert after.count() == orders.count() - n_old
    assert after.filter(F.expr(pred)).count() == 0
    for y in years[1:]:
        assert os.path.getmtime(f"{lake}/o_year={y}") == before_mtime[y]
    # idempotent: a re-run deletes nothing and rewrites nothing
    again = purge_predicate(spark, lake, pred, "o_year")
    assert again["rows_deleted"] == 0 and again["partitions_rewritten"] == 0


def test_purge_predicate_on_partition_column_itself(spark, sf_dir, tmp_path):
    """ADVICE r7: the advertised TTL shape generalizes to a predicate
    on the PARTITION column ('o_year < cutoff'). The rewrite scan must
    read with basePath so o_year resolves — and the rewritten files
    must NOT embed o_year (hive layout carries it in the directory
    name; a shadowing data column breaks every later read)."""
    from pyspark.sql import functions as F

    from torua_spark.sources.catalog import load_table
    from torua_spark.sources.io import purge_predicate

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    lake = str(tmp_path / "lake")
    orders.repartition("o_year").write.partitionBy("o_year").parquet(lake)
    years = sorted(r[0] for r in orders.select("o_year").distinct().collect())
    cutoff = years[1]
    # mixed predicate: partition column AND a data column, so the kept
    # set inside the hit partition is non-empty (a pure partition
    # predicate would empty the directory)
    pred = f"o_year < {cutoff} AND o_orderpriority = '1-URGENT'"
    n_del = orders.filter(F.expr(pred)).count()
    report = purge_predicate(spark, lake, pred, "o_year")
    assert report["rows_deleted"] == n_del > 0
    assert report["partitions_rewritten"] == 1
    after = spark.read.parquet(lake)
    assert after.count() == orders.count() - n_del
    assert after.filter(F.expr(pred)).count() == 0
    # the partition column appears once (from the directory), and the
    # rewritten files themselves do not embed it
    assert after.columns.count("o_year") == 1
    raw = spark.read.parquet(f"{lake}/o_year={years[0]}")
    assert "o_year" not in raw.columns


def test_compact_files_rejects_ancestor_out_path(spark, sf_dir, tmp_path):
    import pytest

    from torua_spark.sources.catalog import load_table
    from torua_spark.sources.io import compact_files

    inner = str(tmp_path / "tbl" / "part=1")
    load_table(spark, sf_dir, "nation").write.parquet(inner)
    # overwrite-writing to an ANCESTOR would recursively delete the
    # input mid-scan — must be rejected like the nested case
    with pytest.raises(ValueError, match="outside the"):
        compact_files(spark, inner, str(tmp_path / "tbl"))
