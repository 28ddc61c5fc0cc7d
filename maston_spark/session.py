"""SparkSession factory + table loaders for the maston-spark engine.

Scale notes (100 TB design intent, tested on local[32]):

- AQE is on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast demotion all matter far more at
  1000-executor scale than on local mode, and cost nothing here.
- ``spark.sql.session.timeZone=UTC`` pins timestamp semantics so
  results are reproducible across engines (the DuckDB oracle reads
  the same parquet with naive/UTC timestamps).
- Shuffle partitions default to 32 for local runs; a real cluster
  deployment overrides this (or lets AQE coalesce from a high
  initial number, e.g. 2000 for 100 TB inputs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_session(app_name: str = "maston-spark", master: str | None = None) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table from a scale-factor directory.

    Plain ``spark.read.parquet`` so Catalyst keeps full pushdown /
    pruning ability; at cluster scale the same call reads a
    partitioned directory tree and prunes partitions from filters.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read the raw int64 nanos and truncate to
        # microseconds (exactly what DuckDB's ns→µs cast does).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            from pyspark.sql import functions as F

            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
            if dict(df.dtypes).get("ts") == "bigint":
                # integer division — double division would lose precision
                # on 1.7e18-magnitude nanosecond values
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            return df
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
