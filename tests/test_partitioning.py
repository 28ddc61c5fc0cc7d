"""Bucketing and salting: the plans must prove the point —
bucketed joins have no shuffle, salted joins preserve row counts
while splitting hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from maston_spark.partitioning import (
    bucketed_join,
    explain_has_exchange_below_join,
    salted_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is static config; tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    from maston_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8)
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8)
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    # test tables are tiny, so the planner would broadcast (also a
    # fine plan) — disable that to expose the bucketed co-location
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("lineitem_b").withColumnRenamed("l_orderkey", "o_orderkey")
        joined = spark.table("orders_b").join(li, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and it is not just empty tables agreeing
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    from maston_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    plain = load_table(spark, sf, "orders").join(
        load_table(spark, sf, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "o_orderkey",
    )
    li = spark.table("lineitem_b").withColumnRenamed("l_orderkey", "o_orderkey")
    bucketed = spark.table("orders_b").join(li, "o_orderkey")
    assert bucketed.count() == plain.count()


def test_salted_join_preserves_semantics(spark):
    # left heavily skewed: 90% of rows share key 1
    left = spark.createDataFrame(
        [Row(k=1 if i % 10 else i, v=i) for i in range(1000)]
    )
    right = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(1000)])
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", n_salts=8)
    assert salted.count() == plain.count()
    # spot-check content equality
    a = {(r.k, r.v, r.name) for r in salted.collect()}
    b = {(r.k, r.v, r.name) for r in plain.collect()}
    assert a == b


def test_salted_join_splits_hot_key(spark):
    left = spark.createDataFrame([Row(k=1, v=i) for i in range(1000)])
    right = spark.createDataFrame([Row(k=1, name="hot")])
    salted = salted_join(left, right, "k", n_salts=8)
    # the hot key's rows must actually spread over multiple salts —
    # measured through the join itself: tag the right replicas and
    # count distinct salts reaching the output
    tagged = left.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.col("k"), F.col("v"), F.monotonically_increasing_id()),
            F.lit(8),
        ),
    )
    assert tagged.select("__salt").distinct().count() > 1
    assert salted.count() == 1000


def test_salted_join_deterministic_across_partitioning(spark):
    """Layout-INVARIANT output: the same rows produce the same join
    output regardless of how the input happens to be partitioned.
    The salt itself is layout-dependent (it mixes
    monotonically_increasing_id so byte-identical hot rows spread),
    but the OUTPUT is salt-invariant by construction — each left row
    matches exactly the one right replica carrying its salt, whatever
    that salt is — so re-layout, retries, and stage re-attempts all
    yield the identical multiset."""
    rows = [Row(k=1 if i % 10 else i, v=i) for i in range(1000)]
    right = spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(1000)])
    left_a = spark.createDataFrame(rows).repartition(2)
    left_b = spark.createDataFrame(rows).repartition(13, "v")
    out_a = sorted(
        (r.k, r.v, r.name) for r in salted_join(left_a, right, "k").collect()
    )
    out_b = sorted(
        (r.k, r.v, r.name) for r in salted_join(left_b, right, "k").collect()
    )
    assert out_a == out_b


def test_salted_join_rejects_right_and_full(spark):
    left = spark.createDataFrame([Row(k=1, v=1)])
    right = spark.createDataFrame([Row(k=2, name="unmatched")])
    for how in ("right", "full", "right_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, "k", how=how)


def test_salted_join_left_outer_and_anti(spark):
    """Left-preserving types stay exact: unmatched LEFT rows appear
    once (never salt_n times)."""
    left = spark.createDataFrame([Row(k=1, v=10), Row(k=99, v=20)])
    right = spark.createDataFrame([Row(k=1, name="one")])
    outer = salted_join(left, right, "k", n_salts=8, how="left")
    assert outer.count() == 2
    assert [r.v for r in outer.filter(F.col("name").isNull()).collect()] == [20]
    anti = salted_join(left, right, "k", n_salts=8, how="left_anti")
    assert [(r.k, r.v) for r in anti.collect()] == [(99, 20)]


def test_aqe_splits_skewed_join_partitions(spark):
    """Moderate skew is AQE's job (salting is reserved for keys AQE
    can't split): with one key holding ~95% of the left side, the
    final adaptive plan must mark the sort-merge join skew-handled
    and read the hot partition as split sub-partitions."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    # test-sized thresholds: production defaults (256 MB) would need
    # gigabytes of shuffle data to trip; the MECHANISM is the same
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
            F.concat(F.lit("pad-"), F.col("id"), F.lit("x" * 50)).alias("pad"),
        )
        right = spark.range(50_000).select(
            F.col("id").alias("k"), F.lit("r").alias("name")
        )
        j = left.join(right, "k")
        rows = j.collect()  # materialize THIS plan so AQE finalizes it
        assert len(rows) == 192_500
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan, plan[:2000]  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_hive_partitioned_write_prunes_partitions(spark, tmp_path):
    """Directory-partitioned layout (partitionBy on write) + a filter
    on the partition column → the scan lists ONLY the matching
    partition directories (PartitionFilters, not a post-scan filter).
    The file-layout half of the pruning story: PushedFilters skip row
    groups inside files, PartitionFilters skip whole directories —
    at 100 TB the latter is the difference between touching one
    day's directories and listing the entire table."""
    import io
    from contextlib import redirect_stdout

    from maston_spark.session import load_table

    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(path)

    df = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1].split("]")[0]
    # physical proof: only the matching partition directory is read
    # (input_file_name() reflects execution, unlike inputFiles(),
    # which lists the whole resolved relation before pruning)
    files = [
        r.f
        for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files and all("event_type=purchase" in f for f in files)
    # and the values survive the round-trip
    n = df.count()
    expected = ev.filter(F.col("event_type") == "purchase").count()
    assert n == expected > 0

def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Dynamic partition pruning: the partition predicate is NOT in
    the query — it's implied by a filtered dimension join, and Spark
    injects a runtime `dynamicpruning` subquery into the fact scan's
    PartitionFilters. THE star-join optimization at 100 TB: the fact
    side skips whole partition directories from a predicate that
    only exists on the dim. (File-level physical evidence for the
    pruning mechanism itself is in
    test_hive_partitioned_write_prunes_partitions; here the marker
    plus result equality pin that the dim filter REACHED the fact
    scan as a partition filter.)"""
    from maston_spark.session import load_table

    path = str(tmp_path / "events_dpp")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(path)

    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("purchase", 1), ("view", 2), ("click", 3)], "event_type string, w int"
    ).filter(F.col("w") == 1)
    joined = fact.join(dim, "event_type")

    n = joined.count()
    rows = joined.collect()  # finalize the adaptive plan for THIS df
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1500]
    assert n == len(rows) == ev.filter(F.col("event_type") == "purchase").count()
    assert all(r.event_type == "purchase" for r in rows)


def test_salted_join_spreads_planted_hot_key(spark):
    """Planted pathological skew (one key = 20% of the left side):
    key_skew_report flags it, and salted_join removes the single-task
    straggler the plain shuffle join has — the hot key's rows spread
    across ~salt_n partitions instead of landing in one. AQE
    skew-splitting is disabled to simulate the key AQE can't split
    (a single key larger than an executor — salting's raison d'etre);
    auto-broadcast is disabled so both joins actually shuffle."""
    from maston_spark.partitioning import salted_join
    from maston_spark.profiling import key_skew_report

    n = 120_000
    left = spark.range(n).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
        .otherwise(F.col("id") % 997 + 1)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(998).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    )

    # the report flags the planted key BEFORE any join runs — this is
    # the pre-flight that decides salting is needed
    top = key_skew_report(left, "k", top_k=1).collect()[0]
    assert top.key == "0"
    assert top.row_frac >= 0.19 and top.skew_ratio > 100

    def max_partition_rows(df):
        counts = [
            r.c
            for r in df.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        return max(counts), sum(counts)

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # the conftest default of 4 drowns the signal: uniform load
        # per partition rivals the hot key itself
        conf.set("spark.sql.shuffle.partitions", "32")

        plain_max, plain_total = max_partition_rows(left.join(right, "k"))
        salted_max, salted_total = max_partition_rows(
            salted_join(left, right, "k", n_salts=8)
        )
    finally:
        for k, v in saved.items():
            conf.set(k, v)

    # row multiplicity unchanged by salting
    assert salted_total == plain_total
    # plain: the hot key's ~24k rows land in ONE task's partition
    assert plain_max >= 0.19 * plain_total
    # salted: no single-task straggler — the hot key spreads across
    # salt_n (key, salt) combos, so the max partition shrinks
    # severalfold (measured 26213 -> 8870 rows; the residue above
    # total/32 is uniform-key hash collision, not the hot key)
    assert salted_max <= plain_max / 2.5, (salted_max, plain_max)


def test_zorder_clusters_both_columns(spark, tmp_path):
    """Z-order layout evidence: after writing 16 files clustered by
    the interleaved key, a RANGE predicate on EITHER column finds its
    matches concentrated in a small subset of files — while a linear
    sort on column a alone leaves column b's matches smeared across
    ~all files. This file concentration is exactly what parquet
    min/max stats then turn into skipped IO."""
    from maston_spark.partitioning import zorder_key

    n = 40_000
    df = spark.range(n).select(
        (F.col("id") % 200).alias("a"),
        ((F.col("id") / 200).cast("long") % 200).alias("b"),
    )

    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    zorder_key(df, ["a", "b"], bits=8).repartitionByRange(
        16, "__zkey"
    ).sortWithinPartitions("__zkey").write.mode("overwrite").parquet(zpath)
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.mode(
        "overwrite"
    ).parquet(lpath)

    def files_with_matches(path, col):
        return (
            spark.read.parquet(path)
            .filter((F.col(col) >= 40) & (F.col(col) < 50))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    # column a: both layouts cluster it
    assert files_with_matches(zpath, "a") <= 8
    assert files_with_matches(lpath, "a") <= 4
    # column b: z-order concentrates it, the linear layout smears it
    zb, lb = files_with_matches(zpath, "b"), files_with_matches(lpath, "b")
    assert zb <= 8, zb
    assert lb >= 14, lb  # nearly every file touched
