"""Complex relational queries: multi-join TPC-H-style plans and the
subquery family (EXISTS / NOT EXISTS / IN / correlated scalar).

These exercise exactly the Catalyst machinery that matters at 100 TB:
join reordering across 3–6 tables, broadcast selection for the dim
chain (region→nation→customer/supplier are tiny at every sf), semi/
anti-join rewrites of subqueries (never a materialized subquery per
row), and de-correlation of scalar subqueries into an aggregate +
join. Reference parity: the reference engine (Kafka Streams) has no
relational surface at all — SURVEY.md §2.2 declares these rows as
engine contract ("Joins", "Projection / filter"), origin S.

Scale notes per query in the docstrings; plan-shape guards live in
tests/test_plans.py (no CartesianProduct, dims broadcast).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from maston_spark.queries import query
from maston_spark.session import load_table


@query(
    "q65_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q65_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-style shipping priority: 3-way join + agg + top-10.

    Plan at scale: both date filters push to the scans (lineitem and
    orders are pruned before any join); orders⋈lineitem is the one
    sort-merge shuffle on orderkey; the global top-10 is a
    TakeOrderedAndProject (per-partition heap + driver merge), never
    a full sort of the agg output. customer scales with sf, so it
    carries NO broadcast hint — below the 64 MB auto-threshold the
    planner broadcasts it anyway, and past that AQE picks the join
    strategy from runtime stats. (A user hint would be honored
    unconditionally and OOM the build side at 100 TB.)
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q66_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey  = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
                    AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q66_local_supplier_volume(spark, sf_dir):
    """TPC-H-Q5-style 6-way join: local supplier volume per nation.

    Plan at scale: region (5 rows) and nation (25 rows) are bounded
    at every sf and carry explicit broadcast hints. supplier and
    customer GROW with sf, so they carry no hint: under the 64 MB
    auto-threshold the planner broadcasts them on its own, and above
    it the sort-merge path (plus AQE's runtime re-plan) takes over —
    a user hint would be honored regardless of size and OOM at
    100 TB. The only mandatory shuffle is orders⋈lineitem on
    orderkey, then one 6-group hash agg. The
    c_nationkey = s_nationkey residual rides on the supplier join
    rather than forcing an extra join.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q67_exists_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE c.c_acctbal > 9000
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def q67_exists_subquery(spark, sf_dir):
    """Correlated EXISTS — rewritten as a left-semi join.

    At scale the semi join only ships the distinct-ish correlation
    key of the subquery side and never widens rows; Spark's SQL
    planner performs this same RewritePredicateSubquery rewrite, so
    the DataFrame form below IS the post-rewrite plan.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q68_not_exists_antijoin",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_custs,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > 0
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def q68_not_exists_antijoin(spark, sf_dir):
    """TPC-H-Q22-flavoured NOT EXISTS — left-anti join + agg:
    positive-balance customers with no urgent order, per segment.

    The anti join shuffles on custkey once (or broadcasts the
    smaller side); there is no per-row subquery execution anywhere.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "q69_scalar_subquery",
    oracle="""
    SELECT l.l_partkey,
           round(sum(l.l_extendedprice), 2) AS small_lot_revenue,
           count(*) AS n_small_lots
    FROM lineitem l
    JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
          FROM lineitem GROUP BY l_partkey) t
      ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.half_avg_qty
    GROUP BY l.l_partkey
    """,
)
def q69_scalar_subquery(spark, sf_dir):
    """TPC-H-Q17-style correlated scalar subquery, de-correlated:
    per-part average quantity as an aggregate, joined back.

    This is the only 100 TB-viable shape — the naive correlated form
    re-scans lineitem per part. Here lineitem shuffles on partkey
    once for the avg, and the fact⋈avg join reuses that same key, so
    AQE typically plans the second exchange as a no-op reuse; the
    avg side is also orders-of-magnitude smaller (K parts vs N rows)
    and broadcastable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    half_avg = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(half_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .groupBy("l_partkey")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("small_lot_revenue"),
            F.count(F.lit(1)).alias("n_small_lots"),
        )
    )


@query(
    "q70_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '5-LOW'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def q70_customer_distribution(spark, sf_dir):
    """TPC-H-Q13-style customer order-count histogram.

    Left outer join with a pushed non-join predicate on the right
    side only, per-customer count (counts o_orderkey so the no-order
    row contributes 0, not 1), then a tiny second agg over at most a
    few hundred distinct counts — the second shuffle is negligible.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q71_in_subquery",
    oracle="""
    SELECT l.l_returnflag,
           count(*) AS n_items,
           round(sum(l.l_extendedprice), 2) AS gross
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
    GROUP BY l.l_returnflag
    """,
)
def q71_in_subquery(spark, sf_dir):
    """IN (subquery) — left-semi join against a filtered dim.

    part scales with sf, so there is no forced broadcast hint: when
    the filtered side fits under the auto-threshold the planner
    broadcasts it (map-only semi probe, zero fact-side shuffle);
    when it doesn't, a shuffled semi join is the correct plan and
    AQE re-plans from runtime sizes — a forced hint would OOM the
    build side at 100 TB instead of falling back.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
        )
    )


@query(
    "q72_uncorrelated_scalar",
    oracle="""
    SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS bal
    FROM supplier s
    WHERE s.s_acctbal > (SELECT avg(s_acctbal) FROM supplier)
    """,
)
def q72_uncorrelated_scalar(spark, sf_dir):
    """Uncorrelated scalar subquery: suppliers above the mean balance.

    Expressed as a single-row aggregate cross-broadcast onto the
    table (Spark plans the scalar as a broadcast of one row —
    exactly what its own subquery planner emits). Two scans of
    supplier, both map-only.
    """
    s = load_table(spark, sf_dir, "supplier")
    mean = s.agg(F.avg("s_acctbal").alias("avg_bal"))
    return (
        s.join(F.broadcast(mean))
        .filter(F.col("s_acctbal") > F.col("avg_bal"))
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("bal"))
    )


@query(
    "q79_market_share",
    oracle="""
    WITH le AS (
      SELECT l_orderkey, l_suppkey,
             -- price has 2 decimals and discount 2, so the product is
             -- EXACT at 4 decimals: decimal(18,4) sums are then exact
             -- in both engines regardless of summation order (a plain
             -- double sum of ~1e8 flips the 2-dp rounding boundary)
             CAST(round(l_extendedprice * (1 - l_discount), 4)
                  AS DECIMAL(18,4)) AS rev
      FROM lineitem)
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           round(CAST(sum(CASE WHEN sn.n_name = 'NATION_2' THEN l.rev
                          ELSE 0 END) AS DOUBLE), 2) AS nation_revenue,
           round(CAST(sum(l.rev) AS DOUBLE), 2) AS total_revenue,
           round(CAST(sum(CASE WHEN sn.n_name = 'NATION_2' THEN l.rev
                          ELSE 0 END) AS DOUBLE)
                 / CAST(sum(l.rev) AS DOUBLE), 6) AS mkt_share
    FROM le l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN region r    ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q79_market_share(spark, sf_dir):
    """TPC-H-Q8-style market share: NATION_2 suppliers' revenue share
    of all sales to ASIA customers, per order year — a 6-table join
    with two independent dim chains (customer→nation→region and
    supplier→nation).

    Plan at scale: both dim chains (nation/region/supplier) sit far
    under the broadcast threshold, so the lineitem fact shuffles only
    once — for the orders equi-join on orderkey; the region filter
    prunes the customer-side chain before it touches the fact. No
    hints: the planner/AQE must keep choosing this shape as sf grows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier")
    cust_chain = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = s.join(
        n.select(
            F.col("n_nationkey").alias("sn_nationkey"),
            F.col("n_name").alias("sn_name"),
        ),
        s.s_nationkey == F.col("sn_nationkey"),
    ).select("s_suppkey", "sn_name")
    # price×(1-discount) is exact at 4 decimals (2 dp × 2 dp), so the
    # decimal(18,4) sum is summation-order-independent — a double sum
    # of ~1e8 would flip the 2-dp rounding boundary between engines
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    li = li.withColumn("rev", rev)
    nation_rev = F.when(F.col("sn_name") == "NATION_2", F.col("rev")).otherwise(
        F.lit(0)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_chain, o.o_custkey == F.col("c_custkey"))
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(F.sum(nation_rev).cast("double"), 2).alias("nation_revenue"),
            F.round(F.sum("rev").cast("double"), 2).alias("total_revenue"),
            F.round(
                F.sum(nation_rev).cast("double") / F.sum("rev").cast("double"), 6
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@query(
    "q80_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
             AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01'
    """,
)
def q80_promo_revenue(spark, sf_dir):
    """TPC-H-Q14-style promo revenue: the PROMO-part share of one
    ship-month's revenue.

    Plan at scale: the month predicate pushes to the lineitem scan
    (PushedFilters), part joins broadcast-or-SMJ under planner
    choice, and the whole thing reduces to a single scalar row via a
    partial+final agg — nothing but two numbers crosses the wire
    after the map side.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 6).alias(
            "promo_revenue_pct"
        ),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@query(
    "q81_priority_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q81_priority_linestatus(spark, sf_dir):
    """TPC-H-Q12-style priority split: per line status, how many 1997
    shipments belonged to high- vs low-priority orders (the dataset
    has no l_shipmode; l_linestatus plays its grouping role).

    Plan at scale: year predicate pushed to the lineitem scan; ONE
    sort-merge shuffle on orderkey; conditional counts fold into the
    same partial agg — the classic fact⋈fact + pivot-style
    conditional aggregation shape.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q102_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q102_large_volume_customer(spark, sf_dir):
    """TPC-H-Q18-style large-volume customers: who placed orders
    totalling > 300 units.

    Spark-first shape: the IN-subquery is pre-aggregated on lineitem
    FIRST (map-side-combinable sum per orderkey, then the HAVING
    filter) and used as a semi-join — at 100 TB the filter reduces
    lineitem to the rare heavy orders BEFORE the customer/orders
    joins, and quantity sums are exact (integral doubles), so the
    HAVING threshold is engine-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(big, orders.o_orderkey == big.big_orderkey, "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q103_small_quantity_revenue",
    oracle="""
    WITH lim AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                 AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN lim   ON lim.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4' AND l.l_quantity < lim.qty_lim
    """,
)
def q103_small_quantity_revenue(spark, sf_dir):
    """TPC-H-Q17-style small-quantity-order revenue: yearly revenue
    lost if below-20%-of-average-quantity orders of one brand were
    not filled.

    Spark-first shape: the correlated aggregate subquery is
    DECORRELATED by hand into a per-part average (combinable agg)
    joined back on partkey — Catalyst plans two shuffles on
    l_partkey and broadcast-joins the part dim. Revenue sums as
    DECIMAL(18,4) so the single-row answer is summation-order-exact
    across engines (l_extendedprice is not 2-dp clean).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lim = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_lim")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#4")),
                li.l_partkey == part.p_partkey)
        .join(lim, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@query(
    "q106_parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%3%'
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q106_parts_supplier_counts(spark, sf_dir):
    """TPC-H-Q16-style supplier counts per part group, excluding a
    supplier set via NOT IN — the null-aware anti-join rewrite
    family (a distinct physical operator from q68's NOT EXISTS
    regular anti-join: NOT IN must treat a NULL on either side as
    "unknown", so Catalyst plans a null-aware anti join unless it
    can prove non-nullability).

    Scale: part's brand/size filters broadcast-prune lineitem before
    the distinct-count shuffle; the excluded supplier set is tiny and
    broadcast. count(DISTINCT) plans partial distinct per group
    before the final exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    excluded = supp.filter(F.col("s_name").like("%3%")).select("s_suppkey")
    pf = part.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    li_kept = li.join(
        excluded, li.l_suppkey == excluded.s_suppkey, "left_anti"
    )
    return (
        li_kept.join(F.broadcast(pf), li_kept.l_partkey == pf.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "q107_returned_item_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                 AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
           c.c_acctbal, n.n_name, c.c_mktsegment
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q107_returned_item_revenue(spark, sf_dir):
    """TPC-H-Q10-style returned-item reporting: top-20 customers by
    revenue lost to returns in a six-month window.

    Plan at scale: both the returnflag filter and the orderdate
    window push to the scans; orders joins lineitem on the one
    mandatory orderkey shuffle; nation (25 rows) broadcasts; the
    top-20 is TakeOrderedAndProject. Revenue is rounded per-item to
    6 dp then summed as DECIMAL(18,6), so the customer ranking is
    summation-order-exact across engines.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    item = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    ).cast("decimal(18,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "n_name")
        .agg(F.round(F.sum(item).cast("double"), 2).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
            "c_mktsegment",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q108_discounted_revenue_dnf",
    oracle="""
    SELECT round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                 AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q108_discounted_revenue_dnf(spark, sf_dir):
    """TPC-H-Q19-style discounted revenue with an OR-of-ANDs (DNF)
    join predicate mixing both tables' columns.

    Plan at scale: Catalyst extracts the single-table conjuncts from
    the DNF — the p_brand/p_size disjunction prunes part AT THE SCAN
    (PushedFilters carries the Or), and the l_quantity range union
    (1..30) prunes lineitem — before the equi-join on partkey; the
    mixed residual evaluates post-join. Without that extraction this
    family degenerates to a filter over the full join product.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    item = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    ).cast("decimal(18,6)")
    return j.filter(cond).agg(
        F.round(F.sum(item).cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@query(
    "q109_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume) AS DOUBLE), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(extract(year FROM l.l_shipdate) AS INT) AS l_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount), 6)
                  AS DECIMAL(18,6)) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q109_volume_shipping(spark, sf_dir):
    """TPC-H-Q7-style volume shipping: trade volume between a
    SYMMETRIC nation pair, by ship year.

    Plan at scale: both nation dims broadcast; the OR'd pair
    predicate evaluates as a residual on the broadcast joins (no
    blow-up — it prunes after two hash probes); the only shuffles
    are the lineitem⋈orders fact join and the 4-group agg. Year
    extraction is a scan-stage projection. Volume rounds per item to
    6 dp and sums as DECIMAL(18,6) for cross-engine exactness.
    """
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    ).cast("decimal(18,6)")
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(F.sum(volume).cast("double"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q115_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q115_order_priority_check(spark, sf_dir):
    """TPC-H-Q4-style order priority checking: orders in a quarter
    with at least one lineitem shipped after the order date, counted
    per priority.

    The correlated EXISTS carries a NON-equi conjunct
    (l_shipdate > o_orderdate) on top of the key equality — Catalyst
    rewrites it to a left-semi join with the inequality as the join
    residual, so the subquery never executes per row and lineitem
    shuffles once on orderkey. The quarter filter prunes orders at
    the scan before the join.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q116_price_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 25000) * 25000 AS DOUBLE) AS bucket_low,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(18,6)))
                 AS DOUBLE), 2) AS total_value
    FROM orders
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def q116_price_histogram(spark, sf_dir):
    """Exact equi-width histogram of order values (25k buckets) —
    the deterministic profiling twin of Spark's approximate
    `histogram_numeric`: bucket = floor(value/width), one
    combiner-reduced agg, bucket count bounded by the value range.
    Per-bucket sums go through DECIMAL(18,6) so totals are
    summation-order-exact.
    """
    from maston_spark.relational import histogram_exact

    o = load_table(spark, sf_dir, "orders")
    hist = histogram_exact(o, "o_totalprice", 25000.0)
    sums = o.groupBy(
        F.floor(F.col("o_totalprice") / 25000).cast("long").alias("bucket")
    ).agg(
        F.round(
            F.sum(
                F.round(F.col("o_totalprice"), 6).cast("decimal(18,6)")
            ).cast("double"),
            2,
        ).alias("total_value")
    )
    return (
        hist.join(sums, "bucket")
        .select(
            "bucket", "bucket_low",
            F.col("n_rows").alias("n_orders"), "total_value",
        )
        .orderBy("bucket")
    )


@query(
    "q140_waiting_supplier",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
    cand AS (
      SELECT * FROM late l1
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey))
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM cand JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q140_waiting_supplier(spark, sf_dir):
    """TPC-H Q21-style "suppliers who kept orders waiting": late
    line items (shipped >60 days after the order date) in
    multi-supplier orders where that supplier was the ONLY late one.
    The hardest subquery plan in the catalog: a fact⋈fact equi join
    (lineitem⋈orders on orderkey) feeding BOTH a semi join (another
    supplier exists on the order) and an anti join (no OTHER late
    supplier on the order) against the same fact. All three joins
    key on l_orderkey — at test SF Catalyst broadcasts the smaller
    projections and sort-merges the anti stage; at cluster scale AQE
    plans shuffle joins that share the orderkey partitioning, so the
    chain costs one fact exchange, never a cartesian. The supplier
    name lookup broadcasts, and the final top-20 is
    TakeOrderedAndProject (only 20 rows cross the last stage). Adapted predicate: the synthetic lineitem carries no
    commit/receipt dates, so "late" is shipdate > orderdate + 60d.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 60 days"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("__k"), F.col("l_suppkey").alias("__s")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("__lk"), F.col("l_suppkey").alias("__ls")
    )
    cand = late.join(
        others,
        (late.l_orderkey == others.__k) & (late.l_suppkey != others.__s),
        "leftsemi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("__lk"))
        & (F.col("l_suppkey") != F.col("__ls")),
        "left_anti",
    )
    return (
        cand.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q143_cdc_upsert",
    oracle="""
    WITH ch AS (
      SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
             o_totalprice + 100.0 AS o_totalprice,
             o_orderdate, o_orderpriority, 'U' AS op, 1 AS seq
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, 'D', 2
      FROM orders WHERE o_orderkey % 7 = 3),
    u AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, 'I' AS op, -1 AS seq
      FROM orders
      UNION ALL SELECT * FROM ch),
    r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                       ORDER BY seq DESC) AS rn
          FROM u)
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM r WHERE rn = 1 AND op <> 'D'
    """,
)
def q143_cdc_upsert(spark, sf_dir):
    """CDC MERGE maintenance: apply an update+delete change stream
    (derived deterministically from the orders table: every 10th key
    repriced, every key ≡3 mod 7 deleted, deletes sequenced after
    updates) to the orders snapshot — latest change per key wins.
    One union + one key shuffle. See
    :func:`maston_spark.relational.cdc_apply`."""
    from maston_spark.relational import cdc_apply

    o = load_table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    deletes = o.filter(F.col("o_orderkey") % 7 == 3).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
        F.lit("D").alias("op"), F.lit(2).alias("seq"),
    )
    return cdc_apply(
        o, updates.unionByName(deletes), key_cols=["o_orderkey"], seq_col="seq"
    )


@query(
    "q159_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
                                 AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey),
    mx AS (SELECT max(total_rev) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey, mx
    WHERE r.total_rev = mx.m
    ORDER BY s.s_suppkey
    """,
)
def q159_top_supplier(spark, sf_dir):
    """TPC-H-Q15-style top supplier: the supplier(s) whose revenue in
    one quarter equals the maximum over the per-supplier revenue
    view — the scalar-max-over-an-aggregate-view de-correlation
    shape (Q15's CREATE VIEW + MAX subquery).

    Spark-first shape: the revenue view is ONE map-side-combinable
    agg over the date-pruned scan (the shipdate predicate reaches
    the parquet scan); the max is a 1-row agg broadcast back — never
    a per-row subquery. Equality on the max is exact because revenue
    rounds through DECIMAL(18,4) before the comparison (ties — the
    Q15 subtlety — surface deterministically).
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                    ).cast("decimal(18,4)")
                ).cast("double"),
                2,
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("__m"))
    return (
        sup.join(rev, sup.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("__m"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@query(
    "q160_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*) AS a
      FROM customer WHERE c_acctbal > 0),
    rich AS (
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer, avg_bal WHERE c_acctbal > avg_bal.a),
    dormant AS (
      SELECT r.* FROM rich r
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = r.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01'))
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_custs,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_bal
    FROM dormant GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q160_dormant_customers(spark, sf_dir):
    """TPC-H-Q22-style sales opportunity: above-average-balance
    customers with NO recent orders, aggregated per market segment —
    the scalar-avg subquery + anti-join + segment rollup composition
    (Q22's phone-prefix grouping adapted to this schema's
    mktsegment).

    Spark-first shape: the average is a 1-row decimal-exact agg
    broadcast into the filter (never per-row); the "no recent
    orders" predicate is a LEFT ANTI join against the date-pruned
    orders scan (Catalyst's NOT EXISTS rewrite — the date predicate
    pushes to the orders scan, so at 100 TB the anti side reads only
    the recent partitions); the final rollup is one combiner agg on
    |segments| groups.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__a")
    )
    rich = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__a"))
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        rich.join(
            recent, rich.c_custkey == recent.o_custkey, "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )
