"""Batch relational surface (SURVEY.md §2.2 S-rows), one query per
operator family, each with a DuckDB oracle.

Scale notes repeated where they matter; common ones:
- dimension joins (region/nation/supplier) are broadcast explicitly;
- window queries totally order rows (unique tiebreaker) so results
  are deterministic across engines and runs;
- float aggregates are rounded in both engines (summation order is
  engine-specific; rounding removes the sub-ulp noise).
"""

from __future__ import annotations

from pyspark.sql import functions as F, Window

from maston_spark.queries import query
from maston_spark.relational import asof_join, top_k_per_group
from maston_spark.session import load_table


# ---------------------------------------------------------------- agg core


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(round(sum(l_quantity), 2) / count(*), 6)              AS avg_qty,
           round(round(sum(l_extendedprice), 2) / count(*), 6)         AS avg_price,
           round(round(sum(l_discount), 2) / count(*), 6)              AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-style flagship aggregation.

    Plan shape at scale: parquet scan with the shipdate predicate
    pushed down, partial hash-agg map-side, single shuffle on the
    2-col grouping key (6 groups), final agg — no sort, no join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(F.round(F.sum("l_discount"), 2) / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 20
      AND l_linestatus LIKE 'F%'
      AND l_discount IS NOT DISTINCT FROM l_discount
      AND NOT (l_tax > 0.07)
    """,
)
def q02_filter_predicates(spark, sf_dir):
    """Predicate language: IN / BETWEEN / LIKE / null-safe eq / NOT.

    All five predicates push down to the parquet scan (verify via
    explain → PushedFilters); nothing shuffles.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 20)
        & F.col("l_linestatus").like("F%")
        & F.col("l_discount").eqNullSafe(F.col("l_discount"))
        & ~(F.col("l_tax") > 0.07)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
    )


# ---------------------------------------------------------------- joins


@query(
    "q03_join_inner",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q03_join_inner(spark, sf_dir):
    """Inner equi-join customer ⨝ orders.

    No broadcast hint: ``customer`` scales with sf, so a forced broadcast
    would OOM the build side at cluster scale.  Below
    ``spark.sql.autoBroadcastJoinThreshold`` (10 MB default, and under AQE's
    runtime re-plan) the planner still picks broadcast-hash on small inputs;
    past the threshold it falls back to sort-merge.  Hints are reserved for
    bounded dims (nation/region) only.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "q04_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q04_join_left(spark, sf_dir):
    """Left outer join keeping order-less customers (count = 0)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias("total_spent"),
        )
    )


@query(
    "q05_join_right",
    oracle="""
    SELECT n.n_name, count(s.s_suppkey) AS n_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q05_join_right(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "q06_join_full",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_name, o.o_orderkey, round(o.o_totalprice, 2) AS price
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
    FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q06_join_full(spark, sf_dir):
    """Full outer join with rows unmatched on both sides."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        F.coalesce(c.c_custkey, o.o_custkey).alias("custkey"),
        "c_name",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
    )


@query(
    "q07_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q07_join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q08_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q08_join_anti(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q09_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name,
           CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_home
    FROM region r CROSS JOIN nation n
    """,
)
def q09_join_cross(spark, sf_dir):
    """Cross join — only ever sane when one side is tiny (both dims
    here); anything larger must be an LSH/bucketed strategy instead.
    """
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1)
        .otherwise(0)
        .alias("is_home"),
    )


@query(
    "q10_join_theta",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS rk
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def q10_join_theta(spark, sf_dir):
    """Theta join: equi part keeps it a hash join; the inequality is
    a post-join predicate (no cartesian product in the plan)."""
    n = load_table(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.col("a.n_regionkey").alias("rk"),
    )


@query(
    "q11_join_range",
    oracle="""
    SELECT o.o_orderkey, count(*) AS n_shipped_30d
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
)
def q11_join_range(spark, sf_dir):
    """Range/interval join anchored on an equi key: Catalyst keeps
    the orderkey equality as the join key (sort-merge/shuffled-hash)
    and applies the date range as a residual filter — linear, not
    quadratic, at any scale."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_shipped_30d"))
    )


@query(
    "q12_asof_join",
    oracle="""
    SELECT c.user_id, c.ts, c.event_id,
           (SELECT p.event_id FROM events p
             WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
               AND p.ts <= c.ts
             ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS event_id_right
    FROM events c WHERE c.event_type = 'click'
    """,
)
def q12_asof_join(spark, sf_dir):
    """As-of join: latest purchase at-or-before each click per user
    (see relational.asof_join for the single-shuffle strategy)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    return asof_join(
        clicks,
        purchases,
        by=["user_id"],
        left_on="ts",
        right_on="ts",
        right_vals=["event_id"],
        right_tiebreak="event_id",
    ).select("user_id", "ts", "event_id", "event_id_right")


# ---------------------------------------------------------------- agg breadth


@query(
    "q13_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q13_agg_distinct(spark, sf_dir):
    """Multiple exact count-distincts → Spark expands per-distinct
    (OK: low grouping cardinality; at extreme scale prefer
    approx_count_distinct, see q15)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q14_agg_stats",
    oracle="""
    SELECT o_orderstatus,
           round(stddev_samp(o_totalprice), 4) AS sd_price,
           round(var_samp(o_totalprice), 2)    AS var_price,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def q14_agg_stats(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "q15_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
           round(quantile_cont(l_extendedprice, 0.5),  4) AS median_price,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
           count(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q15_agg_percentile(spark, sf_dir):
    """Exact continuous percentiles + count distinct per group, via
    :func:`maston_spark.relational.exact_percentiles` — distributed
    order statistics (value-histogram + cumulative window) instead
    of Spark's built-in ``percentile``, whose per-group state holds
    every value in one JVM map (3.0 s → 1.0 s at sf0.1, results
    bit-for-bit identical and hash-graded against quantile_cont).
    At 100 TB the mergeable sketches — ``percentile_approx``
    (KLL-ish) and ``approx_count_distinct`` (HLL) — are the
    engine-specific drop-ins for truly continuous values.
    """
    from maston_spark.relational import exact_percentiles

    li = load_table(spark, sf_dir, "lineitem")
    pct = exact_percentiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        (0.25, 0.5, 0.75),
        ("p25_price", "median_price", "p75_price"),
    ).select(
        "l_returnflag",
        # round to 4, NOT 2: quartiles of 2-decimal prices are exact
        # multiples of 0.0025 — grid points of the 4-decimal grid, so
        # rounding is the identity in both engines. At 2 decimals a
        # median like 52724.245 is a rounding-grid MIDPOINT whose
        # nearest double (…2449999…) Spark's BigDecimal half-up sends
        # DOWN while DuckDB's round sends UP (caught at sf0.001).
        F.round("p25_price", 4).alias("p25_price"),
        F.round("median_price", 4).alias("median_price"),
        F.round("p75_price", 4).alias("p75_price"),
    )
    dis = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts")
    )
    return pct.join(dis, "l_returnflag")


@query(
    "q16_agg_collect",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
           count(DISTINCT o_orderpriority) AS n_prio
    FROM orders GROUP BY o_orderstatus
    """,
)
def q16_agg_collect(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        ),
        F.countDistinct("o_orderpriority").alias("n_prio"),
    )


@query(
    "q17_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q17_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "qty",
        )
    )


@query(
    "q18_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n, round(round(sum(o_totalprice), 2) / count(*), 6) AS avg_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q18_cube(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1)), 6).alias(
                "avg_price"
            ),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "avg_price",
        )
    )


@query(
    "q19_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q19_grouping_sets(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("v_lineitem_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n
        FROM v_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------- windows


@query(
    "q20_window_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q20_window_rank(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q21_window_analytic",
    oracle="""
    SELECT event_id, user_id, ts, round(value, 4) AS val,
           lag(event_id) OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q21_window_analytic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 4).alias("val"),
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(wfull).alias("last_event"),
    )


@query(
    "q22_window_frames",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           round(sum(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(round(sum(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
             / count(*) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3,
           count(*) OVER
             (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
              RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_last_30d
    FROM orders
    """,
)
def q22_window_frames(spark, sf_dir):
    """Row frames (running sum, moving avg) + a range frame over
    event-time seconds (orders within trailing 30 days)."""
    o = load_table(spark, sf_dir, "orders")
    wrows = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrange = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(
            F.sum("o_totalprice").over(
                wrows.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_total"),
        F.round(
            F.round(
                F.sum("o_totalprice").over(wrows.rowsBetween(-2, Window.currentRow)), 2
            )
            / F.count(F.lit(1)).over(wrows.rowsBetween(-2, Window.currentRow)),
            6,
        ).alias("moving_avg3"),
        F.count(F.lit(1)).over(wrange).alias("n_last_30d"),
    )


@query(
    "q23_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def q23_topk_per_group(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"),
        "o_totalprice",
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "price", "rn")
    )


@query(
    "q24_sort_limit",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q24_sort_limit(spark, sf_dir):
    """Global top-100: Spark plans TakeOrderedAndProject (per-
    partition heaps + driver merge), not a full sort — the right
    plan at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"), "o_orderdate")
        .limit(100)
    )


# ---------------------------------------------------------------- set ops


@query(
    "q25_set_ops",
    oracle="""
    WITH hi AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
         seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM hi INTERSECT SELECT * FROM seg)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT * FROM hi EXCEPT SELECT * FROM seg)
    UNION ALL
    SELECT 'union' AS op, c_custkey FROM (SELECT * FROM hi UNION SELECT * FROM seg)
    """,
)
def q25_set_ops(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    hi = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    seg = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "c_custkey")  # noqa: E731
    return (
        tag(hi.intersect(seg), "intersect")
        .unionByName(tag(hi.exceptAll(seg).distinct(), "except"))
        .unionByName(tag(hi.union(seg).distinct(), "union"))
    )


# ---------------------------------------------------------------- scalar fns


@query(
    "q26_string_fns",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_up,
           lower(c_mktsegment) AS seg_lo,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           concat(c_name, '#', c_mktsegment) AS tagged,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           trim('  x  ') AS trimmed,
           replace(c_name, '#', '-') AS name_dash,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_num,
           len(string_split(c_name, '#')) AS n_parts,
           strpos(c_name, '#') AS hash_pos,
           reverse(c_mktsegment) AS seg_rev,
           levenshtein(c_mktsegment, 'BUILDING') AS lev_building
    FROM customer
    """,
)
def q26_string_fns(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_up"),
        F.lower("c_mktsegment").alias("seg_lo"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat("c_name", F.lit("#"), "c_mktsegment").alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dash"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_num"),
        F.size(F.split("c_name", "#")).alias("n_parts"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_building"),
    )


@query(
    "q27_datetime_fns",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dy,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           quarter(o_orderdate) AS qtr
    FROM orders
    """,
)
def q27_datetime_fns(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp")
        .alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.quarter("o_orderdate").alias("qtr"),
    )


@query(
    "q28_math_conditional",
    oracle="""
    SELECT o_orderkey,
           round(abs(o_totalprice - 250000), 2) AS dist_from_mid,
           round(sqrt(o_totalprice), 6) AS sqrt_price,
           round(ln(o_totalprice), 6) AS ln_price,
           round(log10(o_totalprice), 6) AS log10_price,
           round(pow(o_totalprice / 100000, 2), 6) AS pow_price,
           CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k_floor,
           ((-o_orderkey % 7) + 7) % 7 AS pmod7,
           CAST(sign(o_totalprice - 250000) AS DOUBLE) AS side,
           greatest(o_totalprice, 100000.0) AS floored_price,
           least(o_custkey, 100) AS capped_cust,
           CASE WHEN o_totalprice > 400000 THEN 'high'
                WHEN o_totalprice > 200000 THEN 'mid'
                ELSE 'low' END AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open
    FROM orders
    """,
)
def q28_math_conditional(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.abs(p - 250000), 2).alias("dist_from_mid"),
        F.round(F.sqrt(p), 6).alias("sqrt_price"),
        F.round(F.log(p), 6).alias("ln_price"),
        F.round(F.log10(p), 6).alias("log10_price"),
        F.round(F.pow(p / 100000, 2), 6).alias("pow_price"),
        F.ceil(p / 1000).alias("price_k_ceil"),
        F.floor(p / 1000).alias("price_k_floor"),
        F.pmod(-F.col("o_orderkey"), 7).alias("pmod7"),
        F.signum(p - 250000).alias("side"),
        F.greatest(p, F.lit(100000.0)).alias("floored_price"),
        F.least(F.col("o_custkey"), F.lit(100)).alias("capped_cust"),
        F.when(p > 400000, "high").when(p > 200000, "mid").otherwise("low").alias(
            "bucket"
        ),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
    )


@query(
    "q29_array_fns",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           len(list_filter(toks, x -> length(x) > 4)) AS n_long,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
           toks[1] AS first_tok,
           array_to_string(toks[1:3], '_') AS first3,
           list_contains(toks, 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(toks))[1:5], ',') AS first_sorted
    FROM t
    """,
)
def q29_array_fns(spark, sf_dir):
    """Array/higher-order functions over tokenized documents —
    transform/filter/aggregate run inside codegen (no UDFs)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.element_at("toks", 1).alias("first_tok"),
        F.concat_ws("_", F.slice("toks", 1, 3)).alias("first3"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.concat_ws(",", F.slice(F.sort_array(F.array_distinct("toks")), 1, 5)).alias(
            "first_sorted"
        ),
    )


@query(
    "q30_explode_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word HAVING count(*) > 50
    """,
)
def q30_explode_wordcount(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 50)
    )


@query(
    "q31_json_fns",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_tuple,
           json_extract_string(props, '$.missing') AS missing_field
    FROM events
    """,
)
def q31_json_fns(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # json_tuple is a generator, so it gets its own projection; the
    # cast happens one select further out
    with_tuple = ev.select(
        "event_id", "props", F.json_tuple("props", "k").alias("k_str")
    )
    return with_tuple.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_path"),
        F.col("k_str").cast("bigint").alias("k_tuple"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@query(
    "q32_decimal_cast",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS VARCHAR) AS total_price_dec,
           CAST(CAST(avg(CAST(l_quantity AS DECIMAL(18, 2))) AS DECIMAL(18, 4)) AS VARCHAR) AS avg_qty_dec
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q32_decimal_cast(spark, sf_dir):
    """Decimal arithmetic (parity: the reference's Avro decimal
    mapper, mapper/AvroByteBufferToBigDecimalMapper.java:13-26 —
    Spark's DecimalType replaces it). Output as string so the
    cross-engine hash compares exact decimal renderings."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("string")
        .alias("total_price_dec"),
        F.avg(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(18,4)")
        .cast("string")
        .alias("avg_qty_dec"),
    )


@query(
    "q52_pivot",
    oracle="""
    SELECT user_id,
           round(coalesce(sum(CASE WHEN event_type = 'click' THEN value END), 0), 4) AS click_total,
           round(coalesce(sum(CASE WHEN event_type = 'error' THEN value END), 0), 4) AS error_total,
           round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0), 4) AS purchase_total,
           round(coalesce(sum(CASE WHEN event_type = 'signup' THEN value END), 0), 4) AS signup_total,
           round(coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0), 4) AS view_total
    FROM events GROUP BY user_id
    """,
)
def q52_pivot(spark, sf_dir):
    """Pivot (wide aggregation): one shuffle on user_id; the pivot
    values are declared so Catalyst skips the extra distinct-scan."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.sum("value"))
    )
    for k in kinds:
        out = out.withColumn(
            f"{k}_total", F.round(F.coalesce(F.col(k), F.lit(0.0)), 4)
        ).drop(k)
    return out


@query(
    "q56_map_fns",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS keys_csv,
           json_extract(props, '$.k')::BIGINT AS k_value,
           len(json_keys(props)) AS n_keys
    FROM events WHERE props IS NOT NULL
    """,
)
def q56_map_fns(spark, sf_dir):
    """Map-typed columns: JSON → map<string,bigint>, key listing,
    value access — all codegen."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "q82_corr_covar",
    oracle="""
    WITH e AS (
      SELECT l_returnflag,
             CAST(l_quantity AS DECIMAL(18,0)) AS q,
             CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)) AS p,
             CAST(round(l_quantity * l_extendedprice, 2) AS DECIMAL(28,2)) AS qp,
             CAST(l_quantity * l_quantity AS DECIMAL(28,0)) AS qq,
             CAST(round(l_extendedprice * l_extendedprice, 4) AS DECIMAL(38,4)) AS pp
      FROM lineitem),
    s AS (
      SELECT l_returnflag, count(*) AS n,
             sum(q) AS sq, sum(p) AS sp, sum(qp) AS sqp,
             sum(qq) AS sqq, sum(pp) AS spp
      FROM e GROUP BY l_returnflag)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round((CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE) / n)
                 / (n - 1), 4) AS covar_qty_price,
           round((CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE) / n)
                 / sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n)
                        * (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n)),
                 6) AS corr_qty_price
    FROM s ORDER BY l_returnflag
    """,
)
def q82_corr_covar(spark, sf_dir):
    """Sample covariance and Pearson correlation of quantity vs
    extended price per return flag.

    Cross-engine float discipline: both engines compute the moment
    sums (Σq, Σp, Σqp, Σq², Σp²) as EXACT decimals — the inputs are
    exact at 0/2 decimals so every product is exact at ≤4 — and only
    the final covariance/correlation formula runs in doubles on
    identical sums. Spark's built-in `corr`/`covar_samp` aggregate in
    doubles, where 600k-row summation order flips low bits per
    engine; this shape is how to get hash-stable second-moment stats
    at any scale (and it is one map-side-combinable hash agg, same
    cost as the built-in).
    """
    li = load_table(spark, sf_dir, "lineitem")
    e = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,0)").alias("q"),
        F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)").alias("p"),
        F.round(F.col("l_quantity") * F.col("l_extendedprice"), 2)
        .cast("decimal(28,2)")
        .alias("qp"),
        (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(28,0)").alias("qq"),
        F.round(F.col("l_extendedprice") * F.col("l_extendedprice"), 4)
        .cast("decimal(38,4)")
        .alias("pp"),
    )
    s = e.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("p").alias("sp"),
        F.sum("qp").alias("sqp"),
        F.sum("qq").alias("sqq"),
        F.sum("pp").alias("spp"),
    )
    n = F.col("n")
    sq = F.col("sq").cast("double")
    sp = F.col("sp").cast("double")
    sqp = F.col("sqp").cast("double")
    sqq = F.col("sqq").cast("double")
    spp = F.col("spp").cast("double")
    cov = (sqp - sq * sp / n) / (n - 1)
    corr = (sqp - sq * sp / n) / F.sqrt(
        (sqq - sq * sq / n) * (spp - sp * sp / n)
    )
    return s.select(
        "l_returnflag",
        n.alias("n"),
        F.round(cov, 4).alias("covar_qty_price"),
        F.round(corr, 6).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@query(
    "q84_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts, event_id,
             sum(is_start) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM g)
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_no
    """,
)
def q84_sessionize(spark, sf_dir):
    """Batch sessionization: split each user's event stream into
    sessions at >30-minute inactivity gaps (the batch analogue of
    q35's streaming session_window, and the backfill shape every
    clickstream pipeline runs).

    Plan at scale: ONE hash shuffle on user_id serves both window
    passes (lag for gap detection, running sum for session numbering
    — same partitioning, same ordering, so Catalyst reuses the sort),
    then the per-session agg is map-side combinable on
    (user_id, session_no). No Python, no second shuffle until the
    final agg's exchange on the composite key.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts is TIMESTAMP_NTZ (session TZ pinned to UTC), which
    # won't cast straight to long — hop through timestamp first.
    # Gap test at MICROSECOND precision (full stored precision after
    # the nanos→micros load), matching the oracle's epoch_us compare:
    # whole-second truncation would misclassify a true gap in
    # (1800 s, 1801 s) whose floor-second difference is exactly 1800.
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = micros - F.lag(micros).over(w)
    is_start = F.when(
        gap.isNull() | (gap > 1800 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = ev.withColumn("__start", is_start).withColumn(
        "session_no", F.sum("__start").over(run)
    )
    return s.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q85_funnel",
    oracle="""
    WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    conv AS (
      SELECT DISTINCT c.user_id, c.event_id
      FROM c JOIN events p
        ON p.user_id = c.user_id
       AND p.event_type = 'purchase'
       AND p.ts > c.ts
       AND p.ts <= c.ts + INTERVAL 1 HOUR)
    SELECT c.user_id,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(count(conv.event_id) AS BIGINT) AS n_converted,
           round(count(conv.event_id)::DOUBLE / count(*), 6) AS conv_rate
    FROM c LEFT JOIN conv
      ON conv.user_id = c.user_id AND conv.event_id = c.event_id
    GROUP BY c.user_id
    """,
)
def q85_funnel(spark, sf_dir):
    """Click→purchase conversion funnel: per user, the share of
    clicks followed by a purchase within one hour.

    Plan at scale: the conversion test is a LEFT SEMI join on
    user_id with the time window as a residual — one shuffle on the
    key, candidate pairs bounded per user, never a time-only cross
    product; the final agg is map-side combinable on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("ts"))
            & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
            "left_semi",
        )
        # fresh lineage (self-join below) + marker column
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("conv_event"),
        )
    )
    out = clicks.join(
        converted,
        (clicks.user_id == converted.c_user)
        & (clicks.event_id == converted.conv_event),
        "left",
    ).select("user_id", "event_id", "conv_event")
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("conv_event").alias("n_converted"),
        F.round(F.count("conv_event") / F.count(F.lit(1)), 6).alias("conv_rate"),
    )


@query(
    "q86_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events)
    SELECT f.cohort_week,
           CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CASE WHEN a.active_week =
                  f.cohort_week + INTERVAL 1 WEEK THEN f.user_id END) AS BIGINT)
             AS retained_w1,
           CAST(count(DISTINCT CASE WHEN a.active_week =
                  f.cohort_week + INTERVAL 2 WEEK THEN f.user_id END) AS BIGINT)
             AS retained_w2
    FROM firsts f JOIN activity a ON a.user_id = f.user_id
    GROUP BY f.cohort_week
    """,
)
def q86_retention(spark, sf_dir):
    """Weekly retention cohorts: users bucketed by the week of their
    first event; how many are active 1 and 2 weeks later.

    Plan at scale: two aggregations on user_id share one shuffle
    (first-event week and distinct activity weeks), then an equi-join
    on user_id and a conditional count-distinct per cohort — all hash
    aggs, no window over the full event table.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    wk = lambda c: F.date_trunc("week", c)  # noqa: E731
    firsts = ev.groupBy("user_id").agg(wk(F.min("ts")).alias("cohort_week"))
    activity = ev.select("user_id", wk(F.col("ts")).alias("active_week")).distinct()
    j = firsts.join(activity, "user_id")
    w1 = F.col("active_week") == F.col("cohort_week") + F.expr("INTERVAL 1 WEEK")
    w2 = F.col("active_week") == F.col("cohort_week") + F.expr("INTERVAL 2 WEEK")
    return j.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.when(w1, F.col("user_id"))).alias("retained_w1"),
        F.countDistinct(F.when(w2, F.col("user_id"))).alias("retained_w2"),
    )


@query(
    "q110_event_paths",
    oracle="""
    WITH ordered AS (
      SELECT event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM ordered WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY n_paths DESC, path
    LIMIT 20
    """,
)
def q110_event_paths(spark, sf_dir):
    """Event-sequence mining: the corpus-wide top-20 three-step user
    journeys (consecutive event-type triples per user, ordered by
    event time).

    Scale shape: ONE hash shuffle on the user id for the ordering
    window (`lead` builds the triple in place — no per-user
    collect_list materialization, so a hyperactive user costs a
    sorted partition, not a driver-sized array), then a
    combiner-reduced count on the path string (≤ |event_types|³ keys)
    and a TakeOrderedAndProject top-20. Deterministic: the window
    orders by (ts, event_id) so same-timestamp events can't flip
    paths between engines.
    """
    from maston_spark.relational import event_paths

    e = load_table(spark, sf_dir, "events")
    return event_paths(e, n_steps=3, top_k=20)


@query(
    "q114_table_diff",
    oracle="""
    WITH a AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    b AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice + 1.5, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + 3000000, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey
    FROM a FULL OUTER JOIN b USING (o_orderkey)
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
       OR a.o_totalprice  IS DISTINCT FROM b.o_totalprice
    """,
)
def q114_table_diff(spark, sf_dir):
    """Snapshot diff (CDC-style audit): classify every key as
    added / removed / changed between two table versions — the
    data-engineering primitive behind incremental-load validation
    and replication checks. The 'b' snapshot is a deterministic
    mutation of orders (every 13th key dropped, every 7th price
    bumped, every 11th cloned under a new key).

    Scale shape: ONE full-outer sort-merge join on the key (both
    sides shuffle once), change detection is null-safe column
    comparison (`eqNullSafe` — no row hashing, no string
    concatenation, so float formatting can never disagree between
    engines), unchanged rows drop before anything downstream.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = (
        o.filter(F.col("o_orderkey") % 13 != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 7 == 0,
                F.round(F.col("o_totalprice") + 1.5, 2),
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 11 == 0).select(
                (F.col("o_orderkey") + 3000000).alias("o_orderkey"),
                "o_orderstatus",
                "o_totalprice",
            )
        )
    )
    from maston_spark.relational import snapshot_diff

    return snapshot_diff(
        o, b, key_cols=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice"],
    ).select("change_type", "o_orderkey")


@query(
    "q121_argmax_by",
    oracle="""
    SELECT source,
           arg_max(doc_id, n_chars * 1000000 + doc_id) AS longest_doc,
           arg_min(doc_id, n_chars * 1000000 + doc_id) AS shortest_doc,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars
    FROM documents
    GROUP BY source ORDER BY source
    """,
)
def q121_argmax_by(spark, sf_dir):
    """Arg-max aggregation family (`max_by`/`min_by`): per source,
    which document is longest/shortest — the join-free alternative
    to the window-rank idiom for single-winner lookups (one
    combiner-reduced agg instead of shuffle + sort + filter).

    Determinism: the ordering key is ``n_chars * 1e6 + doc_id`` —
    globally unique, so length ties can't make `max_by` pick
    different winners across engines or retries (bare `max_by` on a
    tied key is nondeterministic by contract in BOTH engines).
    """
    d = load_table(spark, sf_dir, "documents")
    key = F.col("n_chars") * 1000000 + F.col("doc_id")
    return (
        d.groupBy("source")
        .agg(
            F.max_by("doc_id", key).alias("longest_doc"),
            F.min_by("doc_id", key).alias("shortest_doc"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.min("n_chars").cast("long").alias("min_chars"),
        )
        .orderBy("source")
    )


@query(
    "q128_robust_outliers",
    oracle="""
    WITH v AS (SELECT o_orderpriority, o_totalprice AS x FROM orders),
    med AS (SELECT o_orderpriority, quantile_cont(x, 0.5) AS med
            FROM v GROUP BY 1),
    dev AS (SELECT v.o_orderpriority, med, abs(x - med) AS d
            FROM v JOIN med USING (o_orderpriority)),
    mad AS (SELECT o_orderpriority, quantile_cont(d, 0.5) AS mad
            FROM dev GROUP BY 1)
    SELECT dev.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(max(dev.med), 4) AS median,
           round(max(mad.mad), 4) AS mad,
           CAST(sum(CASE WHEN d > 3.0 * 1.4826 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           round(sum(CASE WHEN d > 3.0 * 1.4826 * mad.mad THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS outlier_frac
    FROM dev JOIN mad USING (o_orderpriority)
    GROUP BY 1
    """,
)
def q128_robust_outliers(spark, sf_dir):
    """Median/MAD robust outlier gate per order priority: the
    distribution-free data-quality check, built on the distributed
    order-statistics operator twice. See
    :func:`maston_spark.relational.robust_outlier_stats`."""
    from maston_spark.relational import robust_outlier_stats

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    r = robust_outlier_stats(o, "o_orderpriority", "o_totalprice")
    return r.select(
        "o_orderpriority",
        "n_rows",
        # 4 not 2: medians of 2-decimal data are multiples of 0.005 —
        # 2-decimal rounding-grid midpoints (see q15)
        F.round("median", 4).alias("median"),
        F.round("mad", 4).alias("mad"),
        "n_outliers",
        "outlier_frac",
    )


@query(
    "q163_interval_join",
    oracle="""
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS s, event_type
               FROM events),
    p AS (SELECT event_id AS purchase_id, user_id,
                 s AS p_start, s + 86400000000 AS p_end
          FROM e WHERE event_type = 'purchase'),
    r AS (SELECT event_id AS error_id, user_id,
                 s AS e_start, s + 600000000 AS e_end
          FROM e WHERE event_type = 'error')
    SELECT p.user_id AS user_id, purchase_id, error_id,
           least(p_end, e_end) - greatest(p_start, e_start) AS overlap_us
    FROM p JOIN r ON p.user_id = r.user_id
                 AND p_start <= e_end AND e_start <= p_end
    ORDER BY p.user_id, purchase_id, error_id
    """,
)
def q163_interval_join(spark, sf_dir):
    """Interval-overlap join: which error windows (10 min) overlap
    each customer's day-long purchase-attribution window — the
    non-equi range×range join, executed as a bucketized EQUI-join
    (4-hour buckets, first-shared-bucket dedup) instead of the
    |L|·|R| theta scan. See
    :func:`maston_spark.relational.interval_join`."""
    from maston_spark.relational import interval_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        micros.alias("p_start"),
        (micros + 86_400_000_000).alias("p_end"),
    )
    r = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("__r_uid"),
        micros.alias("e_start"),
        (micros + 600_000_000).alias("e_end"),
    )
    out = interval_join(
        p,
        r.withColumnRenamed("__r_uid", "user_id"),
        "p_start", "p_end", "e_start", "e_end",
        bucket_width=14_400_000_000,
        partition_cols=["user_id"],
    )
    return out.select(
        "user_id",
        "purchase_id",
        "error_id",
        (
            F.least("p_end", "e_end") - F.greatest("p_start", "e_start")
        ).alias("overlap_us"),
    ).orderBy("user_id", "purchase_id", "error_id")
