"""Relational operator coverage over the driver's TPC-H-ish testdata.

The reference has almost no relational surface (SURVEY.md §2.4: its
joins/aggregations are implicit in queue bookkeeping), but a complete
analytics engine needs the standard categories — scans, projections,
filters, hash/broadcast joins, anti joins, aggregations, rollups,
windows, top-k, string/date functions, sessionization.  Each query
here is one category's representative, written scale-first:

- dimension tables (region/nation/customer) joined via `broadcast()`;
- top-k via window rank, which Spark executes as a partial top-k per
  partition (WindowGroupLimit) before the shuffle;
- sessionization as a lag/cumsum window — the batch equivalent of
  Structured Streaming's session_window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: wide aggregation with computed measures (tests
    map-side partial aggregation + multiple aggregates per group)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + agg + top-k (join order / top-k sort).

    No broadcast hints: orders and customer grow with the corpus, so a
    forced broadcast OOMs executors at scale.  AQE picks broadcast vs
    shuffled-hash/SMJ from runtime sizes (and at sf0.01 it still
    broadcasts the filtered sides on its own)."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a broadcast dimension chain
    (region -> nation) — the canonical star-join plan.

    Only the true fixed-cardinality dimensions (region, nation) carry
    broadcast hints.  orders/customer/supplier grow with the corpus:
    forcing them broadcast is the textbook scale-killer, so their join
    strategy is left to AQE's runtime size statistics."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def window_top_orders_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Window ranking: top-3 orders by price per customer."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window breadth: lag/lead, ntile, percent_rank, and
    date arithmetic against the previous order — one pass, one window
    sort per customer."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_date = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.datediff(F.col("o_orderdate"), prev_date).alias("days_since_prev"),
        F.month("o_orderdate").alias("order_month"),
    )


def rollup_orders_by_status_month(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rollup (grouping sets): order counts by (status, month) with
    subtotals and grand total."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "month", F.date_format(F.col("o_orderdate"), "yyyy-MM")
        )
        .rollup("o_orderstatus", "month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
            F.grouping_id().cast("long").alias("grouping_level"),
        )
        .select(
            "o_orderstatus", "month", "n_orders", "total_price",
            "grouping_level",
        )
    )


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube (full grouping-sets lattice): order counts over every
    combination of (status, priority) including both marginals and the
    grand total — completes the grouping family next to rollup (one
    hierarchy) and pivot (columns)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.grouping_id().cast("long").alias("grouping_level"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "n_orders", "avg_price",
            "grouping_level",
        )
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (set difference): customers with no orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(
            orders.select("o_custkey").distinct(),
            cust.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_name", "c_nationkey")
    )


def part_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex surface: LIKE, regexp_extract, split, substring."""
    part = _t(spark, sf_dir, "part")
    return part.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        F.substring("p_brand", 1, 6).alias("brand_prefix"),
        F.size(F.split("p_name", " ")).cast("long").alias("name_words"),
    )


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling windows (batch twin of the streaming agg):
    10-minute windows per event_type."""
    ev = _t(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def events_sessionize(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Sessionization via lag + cumulative sum — the batch equivalent
    of session_window(ts, gap): a new session starts when the gap to
    the previous event of the same user exceeds `gap_minutes`."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the parquet; NTZ -> long needs an
    # intermediate timestamp cast (session TZ is pinned UTC).
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_break = ev.withColumn(
        "is_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sess = with_break.withColumn(
        "session_no", F.sum("is_new_session").over(w)
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )


def distinct_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: exact distinct users per event type (at
    100 TB you would swap in approx_count_distinct; exact kept here so
    the DuckDB oracle can value-match)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def outer_join_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-preserving aggregation: every nation
    with its customer count and order revenue — nations with no
    customers keep a row (zero counts), which an inner join would
    drop.  The nation side is the broadcast dimension."""
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    cust_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left"
    )
    # No broadcast hint: nation is the PRESERVED side of the left join
    # (Spark cannot broadcast the outer side); it is tiny, so AQE picks
    # the right strategy on its own.
    return (
        nation.join(
            cust_orders,
            nation.n_nationkey == cust_orders.c_nationkey,
            "left",
        )
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias(
                "revenue"
            ),
        )
    )


def semi_join_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (TPC-H Q4 shape): count orders per priority that have
    at least one returned lineitem — EXISTS as a left-semi join, so
    the probe side never duplicates rows no matter how many lineitems
    match."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    returned = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def customer_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator surface (INTERSECT / EXCEPT): customers who ordered
    in both 1996 and 1997 vs. only in 1996.  Spark plans both as
    distinct-respecting joins (left-semi / left-anti after aggregation)
    — no full materialization of either cohort."""
    orders = _t(spark, sf_dir, "orders")

    def cohort(lo: str, hi: str) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(lo))
            & (F.col("o_orderdate") < F.lit(hi))
        ).select("o_custkey")

    c96 = cohort("1996-01-01", "1997-01-01")
    c97 = cohort("1997-01-01", "1998-01-01")
    both = c96.intersect(c97).select(
        F.lit("both").alias("cohort"), "o_custkey"
    )
    only96 = c96.subtract(c97).select(
        F.lit("only_1996").alias("cohort"), "o_custkey"
    )
    return both.unionByName(only96)


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts, status rows x priority columns (explicit
    pivot values so the plan stays single-pass, no value-discovery
    scan)."""
    orders = _t(spark, sf_dir, "orders")
    priorities = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", priorities)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"p{i + 1}")
        for i, p in enumerate(priorities)
    ]
    return pv.select(*cols)


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): lineitems whose
    quantity is below 20% of their part's average quantity, grouped by
    brand.  Written as SQL on purpose — the point is the ENGINE path:
    Catalyst must decorrelate the per-part average into an aggregate +
    join (a per-row subquery over a 100 TB lineitem would be O(n^2)
    scans); a plan test pins that no Subquery node survives and the
    executed plan is pure joins + aggregates.  The quantity boundary
    is FP-safe: quantities are integral, so avg and 0.2*avg are
    bit-identical across engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q17_lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("_q17_part")
    return spark.sql("""
        SELECT p.p_brand,
               count(*) AS n_small,
               round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM _q17_lineitem l JOIN _q17_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size <= 10
          AND l.l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity)
            FROM _q17_lineitem l2 WHERE l2.l_partkey = p.p_partkey)
        GROUP BY p.p_brand
    """)


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested correlated subquery (TPC-H Q20 shape): suppliers who
    shipped more than 15% of some PROMO part's total shipped quantity
    — an IN-subquery whose HAVING holds a correlated scalar aggregate
    over the same fact table.  Catalyst must rewrite BOTH levels into
    joins (per-part totals as an aggregate joined back, the IN as a
    left-semi); a per-row evaluation over a 100 TB lineitem would be
    O(n^2).  FP-safe: quantities are integral, so per-part sums are
    exact and 0.15*sum is the same double on both engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q20_lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("_q20_part")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("_q20_supplier")
    return spark.sql("""
        SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 4) AS acctbal
        FROM _q20_supplier s
        WHERE s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM _q20_lineitem l JOIN _q20_part p
            ON p.p_partkey = l.l_partkey
          WHERE p.p_type = 'PROMO'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING sum(l.l_quantity) > 0.15 * (
            SELECT sum(l2.l_quantity) FROM _q20_lineitem l2
            WHERE l2.l_partkey = l.l_partkey)
        )
    """)


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery + count-distinct rollup (TPC-H Q16 shape):
    distinct suppliers per (brand, type, size) over selected parts,
    excluding flagged suppliers.  NOT IN carries the three-valued-
    logic trap — one NULL in the subquery empties the result — which
    both engines must resolve identically (s_suppkey is non-null
    here; the plan must still rewrite the NOT IN to a null-aware
    anti join, never a per-row probe)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q16_lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("_q16_part")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("_q16_supplier")
    return spark.sql("""
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM _q16_lineitem l JOIN _q16_part p
          ON p.p_partkey = l.l_partkey
        WHERE p.p_size IN (1, 5, 10, 15, 20)
          AND p.p_type <> 'PROMO'
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM _q16_supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
    """)


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN over a grouped-HAVING subquery (TPC-H Q18 shape): orders
    whose total line quantity exceeds 300, with customer attribution.
    The subquery aggregates the SAME fact table the outer query
    joins — Catalyst must evaluate it once as an aggregate feeding a
    left-semi join, not per outer row.  Quantities are integral, so
    the HAVING boundary is exact on both engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q18_lineitem")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_q18_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_q18_customer")
    return spark.sql("""
        SELECT c.c_name, o.o_orderkey, o.o_orderdate,
               round(o.o_totalprice, 4) AS totalprice,
               round(sum(l.l_quantity), 4) AS total_qty
        FROM _q18_customer c
        JOIN _q18_orders o ON c.c_custkey = o.o_custkey
        JOIN _q18_lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l2.l_orderkey FROM _q18_lineitem l2
          GROUP BY l2.l_orderkey HAVING sum(l2.l_quantity) > 300)
        GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """)


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + anti-correlated NOT EXISTS (TPC-H Q22
    shape): customers with an above-average (positive-balance)
    account balance who never placed an URGENT order, per market
    segment.  The scalar average becomes a broadcast single-row
    cross join; the NOT EXISTS a left-anti join — no per-row probes.
    The avg boundary is safe here: the measured min |acctbal - avg|
    gap is >= 0.07 at every SF, 10 orders above cross-engine FP
    noise."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_q22_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_q22_orders")
    return spark.sql("""
        SELECT c.c_mktsegment,
               count(*) AS n_customers,
               round(sum(c.c_acctbal), 4) AS total_acctbal
        FROM _q22_customer c
        WHERE c.c_acctbal > (
            SELECT avg(c2.c_acctbal) FROM _q22_customer c2
            WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (
            SELECT 1 FROM _q22_orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
        GROUP BY c.c_mktsegment
    """)


def rolling_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (the frame type the rest of the suite
    doesn't cover): per customer, the rolling 30-DAY order revenue —
    a VALUE-based frame over event time, not a row count, so sparse
    and dense order histories aggregate the same wall-clock span.
    Ordering key is integer epoch days on both engines, making the
    frame arithmetic bit-identical."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 4).alias("rev_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the generalization rollup/cube are
    sugar for: exactly the requested aggregation levels ((status,
    priority), (status), grand total) in ONE scan + one expand-based
    aggregate, with grouping() flags disambiguating real NULLs from
    aggregated-away dimensions."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 4) AS revenue
        FROM _gs_orders
        GROUP BY GROUPING SETS (
            (o_orderstatus, o_orderpriority), (o_orderstatus), ()
        )
    """)


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations —
    the nation dimension joins TWICE in different roles (supplier's
    vs customer's nation), the aliasing case a single-join suite
    never exercises.  Both roles broadcast (fixed-cardinality dim);
    the symmetric pair filter applies after both joins."""
    li = _t(spark, sf_dir, "lineitem").filter(
        # half-open range, NOT year(): a year()-wrapped column never
        # reaches PushedFilters, so parquet row-group min/max skipping
        # on l_shipdate (the dominant pruning at 100 TB) would be lost
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue")
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part
    import volume per year — a conditional aggregate RATIO
    (sum(CASE)/sum) over a 6-way join where nation again plays two
    roles (supplier nation feeds the share flag, customer nation
    routes through region for the filter)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = _t(spark, sf_dir, "orders").filter(
        # half-open range so the predicate reaches the parquet scan
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sn_key"),
        F.col("n_name").alias("_supp_nation"),
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_cn_key"),
        F.col("n_regionkey").alias("_c_regionkey"),
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .join(
            F.broadcast(region),
            F.col("_c_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("_supp_nation") == "NATION_3", vol)
                    .otherwise(F.lit(0.0))
                )
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 4).alias("total_volume"),
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: the testdata has no partsupp, so
    profit = discounted revenue without supply cost): per supplier
    nation and order year, revenue from parts whose name matches a
    substring — LIKE-filtered dimension join + two-level grouping
    with year extraction."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("sum_profit")
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned items in a quarter, ranked
    by lost revenue — join + agg + top-k where the grouping key is
    WIDE (customer attributes ride the groupBy instead of a re-join
    after aggregation)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
            "n_name",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no l_shipmode/commit/receipt dates
    in the testdata, so the bucket is ship delay vs order date):
    per delay bucket, how many lines belong to high- vs low-priority
    orders — the CASE-WHEN-inside-aggregate pattern."""
    li = _t(spark, sf_dir, "lineitem").filter(
        # half-open range so the predicate reaches the parquet scan
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    orders = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.when(delay > 60, F.lit("SLOW"))
            .otherwise(F.lit("FAST"))
            .alias("delay_bucket")
        )
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: the PROMO share of one month's revenue — a single
    global conditional-aggregate ratio (no grouping at all: tests the
    partial-aggregate path collapsing to one row without a global
    sort)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("p_type") == "PROMO", vol)
                    .otherwise(F.lit(0.0))
                )
                * 100.0
                / F.sum(vol),
                6,
            ).alias("promo_revenue_pct"),
            F.round(F.sum(vol), 4).alias("total_revenue"),
        )
    )


def q19_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under a DISJUNCTION of conjunctive brackets
    (brand x size-range x quantity-range) — the predicate shape that
    defeats naive single-column pushdown; the join keeps one equi-key
    (partkey) with the brackets as a residual filter, never a nested
    loop."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    brackets = (
        ((b == "Brand#13") & q.between(1, 11) & sz.between(1, 5))
        | ((b == "Brand#22") & q.between(10, 20) & sz.between(1, 10))
        | ((b == "Brand#25") & q.between(20, 30) & sz.between(1, 15))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(brackets)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: 'late' = shipped >90 days after the
    order date, since the testdata has no commit/receipt dates): the
    sole supplier who shipped late on a finalized multi-supplier
    order — EXISTS plus NOT EXISTS over the same fact table,
    correlated on the join key.  Written as SQL on purpose: Catalyst
    must turn the EXISTS into a left-semi and the NOT EXISTS into a
    left-anti join evaluated ONCE each (a per-row probe over a 100 TB
    lineitem is O(n^2)); the plan test pins zero surviving Subquery
    nodes.  The late flag is computed in a shared late-flag frame so
    both existence legs stay LOCAL predicates — the exact correlation
    structure of the original query.

    The late-flag frame is referenced THREE times (driving leg +
    both existence legs); Spark inlines SQL CTEs per reference, which
    would re-scan lineitem+orders three times at 100 TB, so it is
    materialized once as a PERSISTED narrow projection ((orderkey,
    suppkey, late) — three columns regardless of fact width) exposed
    as a temp view; the cache is registered on the result for the
    caller-owned unpersist_deps lifecycle, and the plan test pins the
    single-file-scan-per-table shape."""
    from pyspark import StorageLevel

    from ..cacheutil import register_persisted

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    ll = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("late"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ll.createOrReplaceTempView("_q21_ll")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("_q21_supplier")
    out = spark.sql("""
        SELECT s.s_name, count(*) AS numwait
        FROM _q21_supplier s
        JOIN _q21_ll l1 ON s.s_suppkey = l1.l_suppkey
        WHERE l1.late = 1
          AND EXISTS (
            SELECT 1 FROM _q21_ll l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM _q21_ll l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.late = 1)
        GROUP BY s.s_name
    """)
    return register_persisted(out, ll)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-table filter + global aggregate — the pure
    predicate-pushdown case (date range, discount band, quantity cap
    all reach the scan; no join, no grouping, one partial-agg
    collapse).  The date filter is a half-open range on the raw
    column, NOT year(col)==Y: a function-wrapped column survives only
    as a post-scan residual, losing parquet row-group min/max
    skipping on the date — the dominant pruning at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts INCLUDING
    zero-order customers — a LEFT OUTER join aggregated twice (count
    per customer, then customers per count).  The zero bucket is the
    point: an inner join silently drops it (the count(o_orderkey)
    over the null-extended side is what keeps it)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — a
    derived revenue view consumed TWICE (once as the row source, once
    under max()).  Spark inlines a CTE per reference, which would scan
    lineitem twice at 100 TB, so the supplier-sized revenue frame is
    persisted and the 1-row max attaches as a broadcast cross join
    (the same scalar-attach shape as tfidf's corpus total); cache
    registered for caller-owned release."""
    from pyspark import StorageLevel

    from ..cacheutil import register_persisted

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("total_revenue")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    out = (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )
    return register_persisted(out, rev)


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic TPC-H `partsupp` synthesized from `part` ×
    supplier-count (the testdata ships no partsupp parquet; reference
    shapes Q2/Q11 need one).  Four suppliers per part via closed-form
    arithmetic — suppkey striding by s_cnt/4 spreads each part's
    suppliers across the key space, availqty/supplycost derive from an
    md5 counter (the one hash Spark and DuckDB share), and supplycost
    is INTEGER CENTS so every downstream min/sum is exact integer
    arithmetic (FP summation order differs across engines; integers
    don't).  Scale shape: narrow — one part scan, a 4-element
    posexplode, and a broadcast 1-row supplier count; no shuffle."""
    part = _t(spark, sf_dir, "part").select("p_partkey")
    s_cnt = _t(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).cast("long").alias("_s_cnt")
    )
    base = part.crossJoin(F.broadcast(s_cnt)).select(
        "p_partkey",
        "_s_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("_i"),
    )
    h = F.conv(
        F.substring(
            F.md5((F.col("p_partkey") * 4 + F.col("_i")).cast("string")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    step = F.greatest(
        F.floor(F.col("_s_cnt") / 4).cast("long"), F.lit(1).cast("long")
    )
    return base.select(
        F.col("p_partkey").alias("ps_partkey"),
        ((F.col("p_partkey") + F.col("_i") * step) % F.col("_s_cnt"))
        .cast("long")
        .alias("ps_suppkey"),
        (h % 9999 + 1).cast("int").alias("ps_availqty"),
        (h % 100000 + 100).cast("long").alias("ps_supplycost_cents"),
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier(s)
    offering the region-wide MINIMUM supply cost — the classic
    correlated scalar subquery over a shared join subtree.  Written as
    SQL so Catalyst decorrelates the per-part min into an aggregate +
    join; the shared `eligible` frame (outer query + subquery) is
    persisted and registered as a view, because Spark inlines SQL CTEs
    per reference (two consumers would scan partsupp/supplier twice).
    Completes the 22/22 TPC-H shape set together with Q11."""
    from pyspark import StorageLevel

    from ..cacheutil import register_persisted

    ps = synth_partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "ps_partkey", "ps_supplycost_cents", "s_acctbal", "s_name",
            "n_name",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    eligible.createOrReplaceTempView("_q2_eligible")
    _t(spark, sf_dir, "part").createOrReplaceTempView("_q2_part")
    out = spark.sql("""
        SELECT round(e.s_acctbal, 2) AS s_acctbal, e.s_name, e.n_name,
               p.p_partkey, p.p_name,
               CAST(e.ps_supplycost_cents AS BIGINT) AS supplycost_cents
        FROM _q2_part p JOIN _q2_eligible e ON p.p_partkey = e.ps_partkey
        WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
          AND e.ps_supplycost_cents = (
            SELECT min(e2.ps_supplycost_cents) FROM _q2_eligible e2
            WHERE e2.ps_partkey = p.p_partkey)
        ORDER BY s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
        LIMIT 100
    """)
    return register_persisted(out, eligible)


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value within one region,
    kept only when above a GLOBAL scalar threshold (HAVING vs a
    subquery over the same frame).  The threshold is 1.5× the mean
    per-part value rather than TPC-H's fixed 0.0001 fraction — a fixed
    fraction degenerates to the empty set as the part count scales
    (verified: 0 rows at sf0.1), while a mean-relative cut is
    scale-free.  All value arithmetic stays in integer cents (exact on
    both engines; FP sums are order-dependent).  The shared `national`
    frame feeds both the aggregate and the threshold: persisted +
    viewed so the synth scan runs once."""
    from pyspark import StorageLevel

    from ..cacheutil import register_persisted

    ps = synth_partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    national = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    national.createOrReplaceTempView("_q11_national")
    out = spark.sql("""
        SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_cents
        FROM _q11_national
        GROUP BY ps_partkey
        HAVING sum(v) > (
            SELECT 1.5 * sum(v) / count(DISTINCT ps_partkey)
            FROM _q11_national)
        ORDER BY value_cents DESC, ps_partkey
    """)
    return register_persisted(out, national)
