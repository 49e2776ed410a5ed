"""Warehouse analytics driver queries (brief extensions; TPC-H-shaped).

The reference's analytical surface is Athena SQL over curated parquet
(``AWS_Athena_queries.sql``, ``Athena_queries_for_reports.sql``); these
queries exercise the same engine machinery — star joins, semi/anti
joins with non-equi residuals, HAVING pushups, OR-of-ANDs predicate
pushdown, scalar-subquery broadcasts — against the driver's TPC-H-ish
testdata, in the classic TPC-H query shapes (Q4/Q7/Q10/Q14/Q18/Q19/Q22;
r11 added the Q21/Q17/Q15 hard trio; r12 added Q13's outer-join count
distribution, the Q2/Q20/Q11/Q16 shapes over a DERIVED partsupp analog,
Q5's cyclic join graph, and Q8's share-within-group; r13 added Q9's
multi-fact profit bridge — completing the classic set) adapted to the
columns the testdata actually has; plus the adjacent
warehouse staples: EXCEPT/INTERSECT set algebra (SURVEY §2.7 closure),
percent-of-total windows, CUBE grouping sets, the full ranking-window
family, calendar-spine gap filling with forward fill, market-basket
pair support, and last-touch conversion attribution.

Scale notes apply throughout:
- ``nation``/``region`` are genuinely tiny → explicit ``F.broadcast``.
- ``customer``/``supplier``/``part`` are "small" only at test SF; the
  plans leave them as plain equi-joins so AQE broadcasts them locally
  but a 1000-executor run falls back to shuffle joins on the same key
  the downstream agg groups by (no extra exchange).
- Money sums go through :func:`..plans.sqlsum.dsum` (exact
  DECIMAL(28,6) accumulation cast back to DOUBLE) so both engines'
  order-independent sums agree bit-for-bit.
- Every emitted cell is BIGINT / INTEGER / DOUBLE / VARCHAR / TIMESTAMP
  — the driver-hash-safe set (r2 lesson).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_table
from .sqlsum import _dsum, dsum, floordiv

# ---------------------------------------------------------- order_priority --
# TPC-H Q4 shape: how many orders per priority class shipped late?
# Late = some lineitem shipped more than LATE_DAYS after the order date
# (the testdata has no commit/receipt dates — ship-vs-order lag is the
# analog). The EXISTS becomes a LEFT SEMI join with an equi key
# (orderkey) plus a non-equi residual — one keyed shuffle, no fan-out,
# and the date window prunes the orders scan before the join.
OP_START = "1997-01-01"
OP_END = "1997-07-01"
LATE_DAYS = 60


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(OP_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(OP_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


_ORDER_PRIORITY_SQL = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{OP_START}'
  AND o_orderdate < TIMESTAMP '{OP_END}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------- returned_items --
# TPC-H Q10 shape: revenue lost to returned items per customer, top 20.
# lineitem filters on returnflag BEFORE the join (pushdown), orders on
# the quarter window; customer/nation attach after the per-customer agg
# so the wide name columns never ride through the big shuffle.
RET_START = "1997-01-01"
RET_END = "1997-04-01"
RET_TOP_K = 20


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(RET_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(RET_END).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(RET_TOP_K)
    )


_RETURNED_ITEMS_SQL = f"""
WITH per_cust AS (
  SELECT o.o_custkey,
         {_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '{RET_START}'
    AND o.o_orderdate < TIMESTAMP '{RET_END}'
  GROUP BY o.o_custkey
)
SELECT c.c_custkey, c.c_name, n.n_name, p.revenue
FROM per_cust p
JOIN customer c ON p.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY p.revenue DESC, c.c_custkey ASC
LIMIT {RET_TOP_K}
"""


# ------------------------------------------------------------ nation_trade --
# TPC-H Q7 shape: bilateral trade volume — revenue by (supplier nation,
# customer nation) for one ship year. Two dim attachments (supplier,
# customer→nation) around the one big lineitem⨝orders shuffle; output is
# bounded at 25×25 rows so the final agg is trivially small.
NT_START = "1997-01-01"
NT_END = "1998-01-01"


def q_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(NT_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(NT_END).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_n = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp_n, F.col("l_suppkey") == supp_n.s_suppkey)
        .join(cust_n, orders.o_custkey == cust_n.c_custkey)
        .groupBy("supp_nation", "cust_nation")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_NATION_TRADE_SQL = f"""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       {_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '{NT_START}'
  AND l.l_shipdate < TIMESTAMP '{NT_END}'
GROUP BY ns.n_name, nc.n_name
"""


# ------------------------------------------------------------ promo_revenue --
# TPC-H Q14 shape: share of revenue from promo-class parts in a ship
# window. Single joined agg; the ratio divides two exact decimal sums
# (cast back to double) so both engines produce the identical double.
PR_START = "1997-09-01"
PR_END = "1997-11-01"


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(PR_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(PR_END).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            dsum(promo_rev).alias("promo_revenue"),
            dsum(rev).alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
                "promo_pct"
            ),
        )
    )


_PROMO_REVENUE_SQL = f"""
WITH sums AS (
  SELECT
    {_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")} AS promo_revenue,
    {_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS total_revenue
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{PR_START}'
    AND l.l_shipdate < TIMESTAMP '{PR_END}'
)
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_pct
FROM sums
"""


# ------------------------------------------------------------- large_orders --
# TPC-H Q18 shape: orders whose total quantity exceeds a threshold, with
# the customer attached. The HAVING collapses lineitem to ~0.2% of
# orders BEFORE the joins, so orders/customer only ever see the
# surviving keys (semi-join-sized probe side). l_quantity is
# integer-valued, so the double sum is exact in any order — emitted as
# BIGINT.
LO_MIN_QTY = 300


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .filter(F.col("total_qty") > LO_MIN_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


_LARGE_ORDERS_SQL = f"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {LO_MIN_QTY}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------- bracket_revenue --
# TPC-H Q19 shape: revenue under an OR-of-ANDs bracket predicate over
# part attributes × lineitem quantity. The p_* legs push into the part
# scan as a single OR filter; the mixed part+lineitem residual applies
# post-join. One equi-join on partkey, one scalar agg.
BRACKETS = (
    # (brand, max p_size, qty lo, qty hi)
    ("Brand#12", 5, 1.0, 11.0),
    ("Brand#23", 10, 10.0, 20.0),
    ("Brand#3", 15, 20.0, 30.0),
)


def q_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    joined = li.join(part, li.l_partkey == part.p_partkey)
    pred = None
    for brand, size_hi, qlo, qhi in BRACKETS:
        leg = (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(1, size_hi))
            & (F.col("l_quantity").between(qlo, qhi))
        )
        pred = leg if pred is None else (pred | leg)
    return joined.filter(pred).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


def _bracket_sql() -> str:
    legs = "\n   OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN 1 AND {s} "
        f"AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for b, s, qlo, qhi in BRACKETS
    )
    return f"""
SELECT {_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE {legs}
"""


# -------------------------------------------------------- dormant_customers --
# TPC-H Q22 shape: above-average-balance customers with no recent
# orders, rolled up by nation. Three cheap pieces: a scalar average
# (exact decimal accumulation → identical double in both engines,
# broadcast as a literal predicate), a LEFT ANTI join against the
# date-pruned orders scan, and a 25-group rollup.
DC_CUTOFF = "2000-01-01"


def q_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(DC_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    # Exact global mean of positive balances: decimal sum / count, both
    # engines round the same division the same way. Stays in-plan as a
    # broadcast nested-loop join against a 1-row side (no driver
    # collect, no second scan trigger).
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("__avg_bal")
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .drop("__avg_bal")
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_dormant"),
            dsum(F.col("c_acctbal")).alias("acctbal_sum"),
        )
    )


_DORMANT_SQL = f"""
WITH avg_bal AS (
  SELECT {_dsum("c_acctbal")} / CAST(COUNT(*) AS BIGINT) AS v
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_dormant,
       {_dsum("c.c_acctbal")} AS acctbal_sum
FROM customer c
WHERE c.c_acctbal > (SELECT v FROM avg_bal)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{DC_CUTOFF}'
  )
GROUP BY c.c_nationkey
"""


# ----------------------------------------------------------------- set_ops --
# SURVEY §2.7 closure (the reference has no set operations; extension):
# distinct EXCEPT / INTERSECT over (user, epoch-day) activity sets —
# "days a user clicked but didn't buy" style funnel set algebra. Each
# branch is a distinct-collapsed projection of the SAME date-pruned
# scan; Spark plans EXCEPT/INTERSECT as LeftAnti/LeftSemi over the
# distinct sets (no sort-based set operator), so the cost is two
# hash-dedups + membership joins on the (user, day) key.
SO_A = "click"
SO_B = "purchase"


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    day = F.expr(floordiv("unix_millis(ts)", 86400000))
    base = events.select(
        "event_type", F.col("user_id"), day.alias("day")
    )
    a = base.filter(F.col("event_type") == SO_A).select("user_id", "day").distinct()
    b = base.filter(F.col("event_type") == SO_B).select("user_id", "day").distinct()
    tag = lambda df, t: df.agg(F.count(F.lit(1)).alias("n_user_days")).select(  # noqa: E731
        F.lit(t).alias("relation"), "n_user_days"
    )
    return (
        tag(a.subtract(b), f"{SO_A}_only")
        .unionAll(tag(a.intersect(b), "both"))
        .unionAll(tag(b.subtract(a), f"{SO_B}_only"))
    )


_SET_OPS_SQL = f"""
WITH a AS (
  SELECT DISTINCT user_id, CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day
  FROM events WHERE event_type = '{SO_A}'
),
b AS (
  SELECT DISTINCT user_id, CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day
  FROM events WHERE event_type = '{SO_B}'
)
SELECT '{SO_A}_only' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_user_days
FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
UNION ALL
SELECT 'both', CAST(COUNT(*) AS BIGINT)
FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT '{SO_B}_only', CAST(COUNT(*) AS BIGINT)
FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
"""


# ------------------------------------------------------------ revenue_share --
# Percent-of-total window: each nation's share of its region's order
# revenue. The grouped sum stays DECIMAL through the 25-row window
# partition (exact in any order in both engines) and only casts to
# double for the final share division — identical operands, identical
# quotient. One customer-keyed shuffle for the big agg; the window runs
# over 25 rows.


def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("__rev"))
    )
    w = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name",
        "n_name",
        F.col("__rev").cast("double").alias("revenue"),
        (
            F.col("__rev").cast("double") / F.sum("__rev").over(w).cast("double")
        ).alias("region_share"),
    )


_REVENUE_SHARE_SQL = """
WITH per_nation AS (
  SELECT r.r_name, n.n_name,
         SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT r_name, n_name,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(rev AS DOUBLE)
         / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE) AS region_share
FROM per_nation
"""


# ------------------------------------------------------------- cube_summary --
# CUBE grouping sets over (orderstatus, priority): all four
# granularities in ONE Expand + one shuffle instead of four passes
# (time_rollup's ROLLUP argument, completed for the full lattice).
# Grouped-out dimensions render as the literal 'ALL' — no NULL cells
# reach the driver hash.


def q_cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cube = orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )
    return cube.select(
        F.when(F.col("g_status") == 1, "ALL")
        .otherwise(F.col("o_orderstatus"))
        .alias("orderstatus"),
        F.when(F.col("g_priority") == 1, "ALL")
        .otherwise(F.col("o_orderpriority"))
        .alias("orderpriority"),
        "n_orders",
        "total_price",
        "g_status",
        "g_priority",
    )


_CUBE_SUMMARY_SQL = f"""
SELECT
  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END
    AS orderstatus,
  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END
    AS orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  {_dsum("o_totalprice")} AS total_price,
  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ------------------------------------------------------------ rank_windows --
# SURVEY §2.5 completion: the full ranking-window family over one
# partition pass — rank / dense_rank / percent_rank / cume_dist on a
# COARSE key (balance bands of 1000, so ties are real and the rank
# variants actually differ) plus ntile / lag / lead on the tie-broken
# total order. Two window specs, ONE c_nationkey shuffle (same
# partition key; Spark evaluates both over the sorted run). Edge-row
# lag/lead coalesce to -1 — no NULL cells reach the driver hash.


def q_rank_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    band = F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)")
    base = cust.select("c_custkey", "c_nationkey", band.alias("bal_band"))
    wr = Window.partitionBy("c_nationkey").orderBy("bal_band")
    wt = Window.partitionBy("c_nationkey").orderBy("bal_band", "c_custkey")
    return base.select(
        "c_custkey",
        "c_nationkey",
        "bal_band",
        F.rank().over(wr).alias("rnk"),
        F.dense_rank().over(wr).alias("dense_rnk"),
        F.percent_rank().over(wr).alias("pct_rnk"),
        F.cume_dist().over(wr).alias("cume"),
        F.ntile(4).over(wt).alias("quartile"),
        F.coalesce(F.lag("bal_band").over(wt), F.lit(-1)).alias("prev_band"),
        F.coalesce(F.lead("bal_band").over(wt), F.lit(-1)).alias("next_band"),
    )


_RANK_WINDOWS_SQL = """
SELECT c_custkey, c_nationkey, bal_band,
  RANK() OVER wr AS rnk,
  DENSE_RANK() OVER wr AS dense_rnk,
  PERCENT_RANK() OVER wr AS pct_rnk,
  CUME_DIST() OVER wr AS cume,
  NTILE(4) OVER wt AS quartile,
  COALESCE(LAG(bal_band) OVER wt, -1) AS prev_band,
  COALESCE(LEAD(bal_band) OVER wt, -1) AS next_band
FROM (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
  FROM customer
)
WINDOW
  wr AS (PARTITION BY c_nationkey ORDER BY bal_band),
  wt AS (PARTITION BY c_nationkey ORDER BY bal_band, c_custkey)
"""


# ---------------------------------------------------------------- gap_fill --
# Calendar-spine gap filling with forward fill (last observation
# carried forward) — the standard densify step before any time-series
# model sees event data. The spine is generated IN-PLAN per user
# (sequence + explode between that user's own min/max day — no
# driver-side date loop, no cross join against a global calendar), and
# the fill is one `last(ignorenulls)` running window over the same
# user-keyed shuffle the daily rollup produced. Day 1 of every user is
# an observation by construction, so v_filled is never NULL. Restricted
# to one event type so per-user day gaps genuinely occur at the gate SF.
GF_START = "2024-01-01"
GF_END = "2024-02-01"
GF_TYPE = "purchase"


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit(GF_START).cast("timestamp"))
        & (F.col("ts") < F.lit(GF_END).cast("timestamp"))
        & (F.col("event_type") == GF_TYPE)
    )
    from ..operators.staging import staged_persist

    # Persisted: the daily rollup feeds both the spine bounds and the
    # fill join — without it each subtree re-scans events (the NANOS
    # timestamp column defeats the vectorized reader, so that scan is
    # the expensive part of this query). Generation-bounded (r16): see
    # operators/staging.py.
    daily = staged_persist(
        events.select(
            "user_id",
            F.expr(floordiv("unix_millis(ts)", 86400000)).alias("day"),
            "value",
        )
        .groupBy("user_id", "day")
        .agg(dsum(F.col("value")).alias("v")),
        "gap_fill.daily",
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("__lo"), F.max("day").alias("__hi"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(__lo, __hi)")).alias("day"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.col("v").isNotNull().cast("int").alias("observed"),
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
    )


def _gap_fill_sql() -> str:
    return f"""
WITH daily AS (
  SELECT user_id,
         CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day,
         {_dsum("value")} AS v
  FROM events
  WHERE ts >= TIMESTAMP '{GF_START}' AND ts < TIMESTAMP '{GF_END}'
    AND event_type = '{GF_TYPE}'
  GROUP BY user_id, CAST(epoch_ms(ts) AS BIGINT) // 86400000
),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi)) AS day
  FROM (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY user_id)
)
SELECT s.user_id, s.day,
       CAST(d.v IS NOT NULL AS INTEGER) AS observed,
       last_value(d.v IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS v_filled
FROM spine s
LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


# ------------------------------------------------------------ basket_pairs --
# Market-basket co-occurrence support counts: baskets are (user, day)
# event-type sets (≤5 distinct types, so the in-row pair fan-out is
# bounded at C(5,2)=10 — generated by a nested HOF over the collected
# set, never a self-join of the event stream). The classic association-
# mining support table, computed with one basket shuffle + one
# map-side-combining pair agg.


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    baskets = (
        events.select(
            "user_id",
            F.expr(floordiv("unix_millis(ts)", 86400000)).alias("day"),
            "event_type",
        )
        .groupBy("user_id", "day")
        .agg(F.sort_array(F.collect_set("event_type")).alias("__items"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(__items, (x, i) ->"
                " transform(slice(__items, i + 2, size(__items)),"
                " y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("support"))
    )


_BASKET_PAIRS_SQL = """
WITH baskets AS (
  SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day,
         list_sort(list(DISTINCT event_type)) AS items
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT unnest(flatten(list_transform(items, (x, i) ->
           list_transform(items[i + 1:], y -> {'a': x, 'b': y})))) AS p
  FROM baskets
)
SELECT p.a AS item_a, p.b AS item_b, CAST(COUNT(*) AS BIGINT) AS support
FROM pairs GROUP BY p.a, p.b
"""


# ------------------------------------------------------------- attribution --
# Last-touch conversion attribution: each purchase is credited to the
# user's most recent non-purchase event (the running
# `last(ignorenulls)` window over the one user-keyed shuffle — never an
# inequality self-join of the stream against itself). Purchases with no
# preceding touch credit 'none' with gap -1: no NULL cells.


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_millis(ts)").alias("ms"),
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_ms = F.when(F.col("event_type") != "purchase", F.col("ms"))
    return (
        base.select(
            "event_id",
            "user_id",
            "event_type",
            "ms",
            F.last(touch, ignorenulls=True).over(w).alias("__t"),
            F.last(touch_ms, ignorenulls=True).over(w).alias("__tms"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("__t"), F.lit("none")).alias("attributed_to"),
            F.coalesce(F.col("ms") - F.col("__tms"), F.lit(-1)).alias("gap_ms"),
        )
    )


_ATTRIBUTION_SQL = """
SELECT event_id, user_id,
       COALESCE(t, 'none') AS attributed_to,
       COALESCE(ms - tms, -1) AS gap_ms
FROM (
  SELECT event_id, user_id, event_type, ms,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER w AS t,
    last_value(CASE WHEN event_type <> 'purchase' THEN ms END
               IGNORE NULLS) OVER w AS tms
  FROM (
    SELECT event_id, user_id, event_type,
           CAST(epoch_ms(ts) AS BIGINT) AS ms
    FROM events
  )
  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
WHERE event_type = 'purchase'
"""


# --------------------------------------------------------- profile_columns --
# Dataset profiling: one scan computes min / max / exact mean / null
# count for every numeric lineitem measure, then a stack/UNPIVOT turns
# the 1×(4·k) aggregate row into k tidy rows. The whole profile is ONE
# job over ONE pass (Spark fuses all aggregates into a single partial+
# final hash agg) — the anti-pattern this replaces is k separate
# describe() passes over a 100 TB table. Means divide a decimal-exact
# sum by the NON-NULL count, so both engines emit the identical double
# and nullable measures are not biased low.
PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in PROFILE_COLS:
        aggs += [
            F.min(c).alias(f"__min_{c}"),
            F.max(c).alias(f"__max_{c}"),
            dsum(F.col(c)).alias(f"__sum_{c}"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}"),
        ]
    wide = li.agg(*aggs)
    # mean = sum / NON-NULL count (nullif guards the all-null column:
    # mean is NULL, not a division error). Dividing by total rows would
    # bias the mean low the day a nullable measure is profiled.
    legs = ", ".join(
        f"'{c}', __min_{c}, __max_{c},"
        f" __sum_{c} / nullif(__n - __nulls_{c}, 0), __nulls_{c}"
        for c in PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {legs})"
            " AS (column_name, min_v, max_v, mean_v, n_nulls)"
        ),
        F.col("__n").alias("n_rows"),
    )


def _profile_sql() -> str:
    legs = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, MIN({c}) AS min_v, MAX({c}) AS max_v,"
        f" {_dsum(c)} / NULLIF(COUNT({c}), 0) AS mean_v,"
        f" CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,"
        f" CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem"
        for c in PROFILE_COLS
    )
    return legs


# ----------------------------------------------------------- late_suppliers --
# TPC-H Q21 shape (the hardest classic plan: multi-join + EXISTS +
# NOT EXISTS self-joins on lineitem): suppliers who were the SOLE late
# shipper on a finished multi-supplier order. "Late" follows the Q4
# adaptation (ship > orderdate + LATE_DAYS; the testdata has no
# commit/receipt dates); numwait counts distinct waiting ORDERS per
# supplier (the one documented delta from Q21's per-lineitem count).
#
# Spark-first rewrite of the two correlated subqueries: after the one
# lineitem⨝orders(F) shuffle, BOTH the "exists another supplier" and
# the "no other late supplier" tests are per-order set aggregates —
# collect_set windows over the SAME l_orderkey partitioning, so the
# whole EXISTS/NOT EXISTS pair rides the join's exchange and lineitem
# is shuffled exactly ONCE (the textbook form shuffles it three times:
# l1, the semi join, the anti join — tests pin the single exchange).
# Per-order sets are bounded by lines-per-order (~7 in TPC-H), so the
# collect_set state is O(1) per order at any corpus size.
LS_LATE_DAYS = 60
LS_TOP_K = 100


def q_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    from pyspark.sql import Window as W

    flagged = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LS_LATE_DAYS} DAYS")
        ).alias("late"),
    )
    w = W.partitionBy("l_orderkey")
    stats = flagged.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("late"), F.col("l_suppkey"))
            ).over(w)
        ).alias("n_late_supp"),
    )
    waiting = (
        stats.filter(
            F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    per_supp = waiting.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("numwait")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        per_supp.join(supp, per_supp.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name", "numwait")
        # s_suppkey tiebreak: s_name is unique in TPC-H but the LIMIT
        # boundary must be deterministic on ANY data
        .orderBy(
            F.col("numwait").desc(),
            F.col("s_name").asc(),
            F.col("s_suppkey").asc(),
        )
        .limit(LS_TOP_K)
    )


_LATE_SUPPLIERS_SQL = f"""
SELECT s.s_suppkey, s.s_name, n.n_name,
       CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders o ON l1.l_orderkey = o.o_orderkey
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL {LS_LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL {LS_LATE_DAYS} DAY
  )
GROUP BY s.s_suppkey, s.s_name, n.n_name
ORDER BY numwait DESC, s.s_name ASC, s.s_suppkey ASC
LIMIT {LS_TOP_K}
"""


# --------------------------------------------------------- small_qty_revenue --
# TPC-H Q17 shape (correlated aggregate subquery): yearly revenue from
# "small-quantity" lineitems of one part class — lines under 20% of
# their part's average quantity. The textbook form scans lineitem twice
# (outer + correlated avg per part); the Spark-first rewrite joins the
# broadcast-filtered part dim once, then the per-part average is a
# decimal-sum window over the SAME l_partkey shuffle the filter reads —
# one lineitem scan, one exchange. The avg uses the decimal-sum
# pattern (DOUBLE l_quantity: order-independent exact sum, then one
# IEEE divide both engines replay bit-for-bit).
SQR_BRAND = "Brand#4"
SQR_TYPE = "SMALL"


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == SQR_BRAND) & (F.col("p_type") == SQR_TYPE))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    w = W.partitionBy("l_partkey")
    part_avg = (
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    kept = joined.withColumn("__avg", part_avg).filter(
        F.col("l_quantity") < 0.2 * F.col("__avg")
    )
    return kept.agg(
        (dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
    )


_SMALL_QTY_REVENUE_SQL = f"""
SELECT {_dsum("l.l_extendedprice")} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = '{SQR_BRAND}' AND p.p_type = '{SQR_TYPE}'
  AND l.l_quantity < 0.2 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,6))) AS DOUBLE)
           / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
  )
"""


# -------------------------------------------------------------- top_supplier --
# TPC-H Q15 shape (scalar-max subquery over a derived revenue view):
# the supplier(s) achieving the maximum quarterly revenue. The view
# aggregates lineitem once per supplier (decimal sums — ties and the
# max compare on EXACT values, so "= max" is engine-stable); the
# scalar max folds the view to ONE row and broadcast-joins back — no
# single-partition pass anywhere (a first-draft unpartitioned window
# over the view was a funnel: |suppliers| is 10^9 at TPC-H SF100k, and
# WindowExec buffers the whole partition on one task). The view is
# localCheckpoint-ed (the connected_components house pattern) because
# its two consumers' subtrees are NOT canonically identical — the row
# side's supplier join pushes isnotnull(l_suppkey) below the exchange,
# defeating AQE's ReusedExchange — so without the checkpoint the
# lineitem scan (the dominant cost at 100 TB) would run twice. The
# checkpoint materializes |suppliers| slim rows once; pinned by
# tests/test_plan_quality.py::test_top_supplier_single_corpus_scan.
TS_START = "1997-01-01"
TS_END = "1997-04-01"


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(TS_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(TS_END).cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    ).localCheckpoint()
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    top = rev.join(F.broadcast(mx), rev.total_revenue == mx.__mx).drop(
        "__mx"
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        top.join(supp, top.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_TOP_SUPPLIER_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey,
         {_dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TS_START}'
    AND l_shipdate < TIMESTAMP '{TS_END}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


# ------------------------------------------------ order_count_distribution --
# TPC-H Q13 shape (the classic outer-join aggregate, the last of the
# "hard plan" trio the warehouse suite was missing): distribution of
# customers by order count INCLUDING the zero-order customers — the one
# shape a plain inner join + groupBy cannot express. Q13 filters orders
# inside the JOIN's ON clause (on o_comment; the testdata analog drops
# 1-URGENT orders) so filtered-out customers still surface at count 0.
#
# Spark-first: pre-aggregate orders to per-customer counts FIRST (one
# o_custkey exchange over the big table, map-side combined), then LEFT
# join customer onto the counts — the join carries ONE row per customer
# instead of one row per order, and the final distribution groupBy is a
# tiny-cardinality map-side-combined agg. The textbook
# join-then-double-groupBy plan shuffles every ORDER row through the
# join; this one never moves an order row past its first aggregation.
# At 1000 executors both inputs hash-partition on the same custkey and
# the counts side is |customers-with-orders| rows, never |orders|.
OCD_EXCLUDED_PRIORITY = "1-URGENT"


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != OCD_EXCLUDED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    counts = cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left"
    ).select(F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("c_count"))
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_ORDER_COUNT_DIST_SQL = f"""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '{OCD_EXCLUDED_PRIORITY}'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ------------------------------------------------------------ derived partsupp --
# The driver testdata has no partsupp table, so the Q2/Q20 shapes run
# over a DERIVED analog: one row per distinct (l_partkey, l_suppkey)
# pair observed in lineitem, with deterministic availability and cost
# columns computed from the keys by integer formulas both engines
# replay exactly, plus the 1997 shipped-quantity total Q20's correlated
# subquery needs (l_quantity is integral in the testdata — the sum
# stays in exact BIGINT arithmetic on both sides). ONE lineitem scan,
# ONE (partkey, suppkey) exchange feeds every derived column; unused
# columns are pruned by Catalyst when a query selects a subset.
PS_SHIP_START = "1997-01-01"
PS_SHIP_END = "1998-01-01"


def _ps_supplycost_col(partkey: F.Column, suppkey: F.Column) -> F.Column:
    """Deterministic per-unit supply cost of a (partkey, suppkey) pair.

    Single source of truth for the formula: :func:`derived_partsupp`
    materializes it as the ps_supplycost column, and the Q9 shape
    (:func:`q_product_profit`) projects it directly onto lineitem rows
    — because the cost is a pure function of the pair key, the
    lineitem⨝partsupp join IS this projection.
    """
    return ((partkey * 31 + suppkey * 17) % 50000 + 1).cast("long")


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in_year = (
        F.col("l_shipdate") >= F.lit(PS_SHIP_START).cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit(PS_SHIP_END).cast("timestamp"))
    return (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum(
                F.when(in_year, F.col("l_quantity").cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("ps_shipped_1997")
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            "ps_shipped_1997",
            (
                (F.col("ps_partkey") * 37 + F.col("ps_suppkey") * 101) % 1000
                + 1
            )
            .cast("long")
            .alias("ps_availqty"),
            _ps_supplycost_col(
                F.col("ps_partkey"), F.col("ps_suppkey")
            ).alias("ps_supplycost"),
        )
    )


_PS_CTE = f"""ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '{PS_SHIP_START}'
                        AND l_shipdate < TIMESTAMP '{PS_SHIP_END}'
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
           AS ps_shipped_1997,
         CAST(((l_partkey * 37 + l_suppkey * 101) % 1000) + 1 AS BIGINT)
           AS ps_availqty,
         CAST(((l_partkey * 31 + l_suppkey * 17) % 50000) + 1 AS BIGINT)
           AS ps_supplycost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)"""


# ---------------------------------------------------------- min_cost_supplier --
# TPC-H Q2 shape (correlated MIN over a dimension chain): for each part
# of one type, the region's cheapest supplier(s). The textbook form
# evaluates the partsupp⨝supplier⨝nation⨝region chain TWICE (outer
# query + correlated MIN subquery); the Spark-first rewrite builds the
# region-eligible (part, supplier, cost) set once and turns the
# correlated MIN into a per-part min window over it, then keeps the
# rows equal to their part's min — one pass, exact BIGINT cost compare.
#
# Exchange budget at scale: the ps aggregation shuffles lineitem once
# on the pair key; the part and supplier joins are plain equi-joins
# (AQE broadcasts them at test SF; at SF100k they shuffle on the
# partkey/suppkey the testdata dims are keyed by); nation⨝region is
# genuinely tiny → explicit broadcast; the min window adds ONE
# ps_partkey exchange whose partitions are bounded by
# suppliers-per-part (never a funnel). LIMIT 100 with a full tiebreak
# (acctbal DESC, n_name, s_name, p_partkey) keeps the boundary
# deterministic on any data.
MCS_TYPE = "STANDARD"
MCS_REGION = "EUROPE"
MCS_TOP_K = 100


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ps = derived_partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey", "ps_supplycost"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == MCS_TYPE)
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == MCS_REGION
    )
    geo = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    eligible = (
        ps.join(part, ps.ps_partkey == part.p_partkey)
        .join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(geo), supp.s_nationkey == F.col("n_nationkey"))
    )
    w = W.partitionBy("ps_partkey")
    best = eligible.withColumn(
        "__min", F.min("ps_supplycost").over(w)
    ).filter(F.col("ps_supplycost") == F.col("__min"))
    return (
        best.select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "ps_supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(MCS_TOP_K)
    )


_MIN_COST_SUPPLIER_SQL = f"""
WITH {_PS_CTE},
geo AS (
  SELECT n_nationkey, n_name
  FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{MCS_REGION}'
),
eligible AS (
  SELECT p.p_partkey, s.s_acctbal, s.s_name, g.n_name, ps.ps_supplycost
  FROM ps
  JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_type = '{MCS_TYPE}'
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN geo g ON g.n_nationkey = s.s_nationkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
FROM eligible e
WHERE ps_supplycost = (
  SELECT MIN(ps_supplycost) FROM eligible e2
  WHERE e2.p_partkey = e.p_partkey
)
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT {MCS_TOP_K}
"""


# ----------------------------------------------------------- excess_suppliers --
# TPC-H Q20 shape (the nested correlated-IN chain): suppliers in one
# region holding EXCESS availability — more than half the 1997 shipped
# quantity — of some name-pattern part family. The textbook form nests
# three INs (supplier IN (partsupp IN (part) AND avail > 0.5·correlated
# SUM))); the Spark-first rewrite is a semi-join chain over the derived
# ps table: ps LEFT SEMI part(name LIKE) on partkey, the correlated SUM
# is already a ps column (same pair-key exchange as the availability
# row itself — zero extra lineitem scans), the excess filter compares
# 2·avail > shipped in exact BIGINT (no 0.5 float boundary), and the
# distinct qualifying suppkeys semi-join supplier. Pairs with NO 1997
# shipments are excluded (shipped > 0) — mirroring the textbook NULL
# comparison semantics where the correlated SUM over zero rows is NULL.
# Geography rides a broadcast nation⨝region (a region filter instead
# of Q20's single nation: the sf0.001 smoke corpus has only 10
# suppliers, and a one-nation filter is empty there).
EXP_NAME_PATTERN = "small%"
EXP_REGION = "EUROPE"


def q_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey", "ps_availqty", "ps_shipped_1997"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(EXP_NAME_PATTERN))
        .select("p_partkey")
    )
    excess = (
        ps.join(part, ps.ps_partkey == part.p_partkey, "left_semi")
        .filter(
            (F.col("ps_shipped_1997") > 0)
            & (2 * F.col("ps_availqty") > F.col("ps_shipped_1997"))
        )
        .select("ps_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == EXP_REGION
    )
    geo = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(excess, supp.s_suppkey == excess.ps_suppkey, "left_semi")
        .join(F.broadcast(geo), supp.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


_EXCESS_SUPPLIERS_SQL = f"""
WITH {_PS_CTE}
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{EXP_REGION}'
  AND s.s_suppkey IN (
    SELECT ps_suppkey FROM ps
    WHERE ps_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE '{EXP_NAME_PATTERN}'
    )
    AND ps_shipped_1997 > 0
    AND 2 * ps_availqty > ps_shipped_1997
  )
ORDER BY s.s_suppkey
"""


# ----------------------------------------------------------- part_value_share --
# TPC-H Q11 shape (GROUP BY + HAVING against a global scalar from the
# SAME aggregate): parts whose region-held inventory value exceeds a
# multiple of the region's MEAN part value — the textbook form
# evaluates the partsupp⨝supplier⨝nation chain twice (per-part sums +
# the scalar). Spark-first: the per-part aggregate view is built once
# and localCheckpoint-ed (the Q15 house pattern — its two consumers'
# subtrees are not canonically identical, so without it the lineitem
# scan runs twice), the scalar folds the view to ONE row and
# broadcast-nested-loop joins back as the HAVING predicate. All value
# arithmetic stays exact-integer: the threshold compare is
# value·2 > 5·(total DIV count) — i.e. > 2.5× the floored mean — with
# DIV flooring identically in both engines on positive sums. (Q11's
# literal fraction-of-total HAVING empties as |parts| grows — 0 rows
# already at sf0.1's 20k parts — so the scale-robust mean multiple is
# the deliberate delta; probed 8/158/619 rows at sf0.001/0.01/0.1.)
PVS_REGION = "EUROPE"


def q_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir).select(
        "ps_partkey",
        "ps_suppkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("__v"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == PVS_REGION
    )
    geo = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    per_part = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(geo), supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("ps_partkey")
        .agg(F.sum("__v").alias("part_value"))
        .localCheckpoint()
    )
    total = per_part.agg(
        F.sum("part_value").alias("__t"), F.count(F.lit(1)).alias("__n")
    )
    return (
        per_part.join(
            F.broadcast(total),
            F.col("part_value") * 2 > 5 * F.expr("__t DIV __n"),
        )
        .select("ps_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), F.col("ps_partkey").asc())
    )


_PART_VALUE_SHARE_SQL = f"""
WITH {_PS_CTE},
eligible AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{PVS_REGION}'
),
per_part AS (
  SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS part_value
  FROM eligible GROUP BY ps_partkey
)
SELECT ps_partkey, part_value
FROM per_part
WHERE part_value * 2 > 5 * (
  (SELECT CAST(SUM(part_value) AS BIGINT) FROM per_part)
  // (SELECT COUNT(*) FROM per_part)
)
ORDER BY part_value DESC, ps_partkey ASC
"""


# ------------------------------------------------------ local_supplier_volume --
# TPC-H Q5 shape (the cyclic join graph): revenue from orders where the
# CUSTOMER and the SUPPLIER sit in the same nation of one region — the
# classic query whose join graph has a cycle (customer→order→lineitem→
# supplier plus the c_nationkey = s_nationkey closure), so no tree of
# binary joins avoids a residual equality.
#
# Spark-first: the region constraint is pushed BELOW the big joins on
# both cycle legs — customer AND supplier are each pre-filtered to the
# region's nations via a broadcast of the tiny nation⨝region table —
# so the three large exchanges (orders⨝customer on custkey,
# lineitem⨝orders on orderkey, ⨝supplier on suppkey) each carry only
# region-resident rows (~1/|regions| of the corpus); the nationkey
# cycle closes as a residual equality on the last join, and the final
# per-nation aggregate is bounded by |nations|.
LSV_REGION = "ASIA"
LSV_START = "1996-01-01"
LSV_END = "1997-01-01"


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == LSV_REGION
    )
    geo = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(geo.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey", "c_nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(geo), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(LSV_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(LSV_END).cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


_LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n.n_name, {_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND r.r_name = '{LSV_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{LSV_START}'
  AND o.o_orderdate < TIMESTAMP '{LSV_END}'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name ASC
"""


# ------------------------------------------------------ supplier_part_counts --
# TPC-H Q16 shape (anti-join + multi-key COUNT DISTINCT): how many
# qualified suppliers can provide each (brand, type, size) part class,
# excluding a supplier denylist — Q16's NOT IN correlated subquery. The
# Spark-first form is a LEFT ANTI join against the (bounded) denylist
# — identical semantics here because s_suppkey is non-null, dodging
# NOT IN's three-valued-logic trap — then COUNT(DISTINCT ps_suppkey)
# per part class over the derived-partsupp pair table: Spark plans the
# distinct-agg as the standard two-phase expand (partial distinct on
# (class, suppkey), then count), both exchanges carrying slim rows.
SPC_EXCL_BRAND = "Brand#1"
SPC_EXCL_TYPE_PREFIX = "PROMO"
SPC_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)
SPC_DENY_ACCTBAL = 1000.0  # suppliers below this are "complaint" analogs


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir).select("ps_partkey", "ps_suppkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != SPC_EXCL_BRAND)
            & ~F.col("p_type").startswith(SPC_EXCL_TYPE_PREFIX)
            & F.col("p_size").isin(*SPC_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    deny = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < SPC_DENY_ACCTBAL)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(deny), ps.ps_suppkey == deny.s_suppkey, "left_anti")
        .join(part, ps.ps_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


_SUPPLIER_PART_COUNTS_SQL = f"""
WITH {_PS_CTE}
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> '{SPC_EXCL_BRAND}'
  AND p.p_type NOT LIKE '{SPC_EXCL_TYPE_PREFIX}%'
  AND p.p_size IN {SPC_SIZES}
  AND ps.ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < {SPC_DENY_ACCTBAL}
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_type ASC, p.p_size ASC
"""


# ------------------------------------------------------------- market_share --
# TPC-H Q8 shape (share-within-group): one nation's share of a region's
# market for one part type, per order year. The classic two-sum
# pattern: numerator (CASE-guarded revenue) and denominator (total
# revenue) are BOTH decimal-sum aggregates of the SAME joined pass —
# never a second scan, never a join of two aggregates — and the share
# is one IEEE divide both engines replay bit-for-bit. Market membership
# (customer in region) rides a broadcast semi-filter below the big
# joins (the Q5 leg pattern); the supplier's nation name arrives via a
# broadcast nation join and only feeds the CASE. Final group count is
# |years| — trivially bounded.
#
# Deliberate delta from the literal Q8 (r12 advice): TPC-H restricts
# o_orderdate to 1995-1996; this adaptation groups over ALL order years
# (the testdata spans 1995-2001 — the full span gives 7 output groups
# instead of 2, a better group-count probe) — both engines run the
# same unwindowed form, oracle-verified.
MS_REGION = "AMERICA"
MS_NATION = "NATION_6"
MS_TYPE = "ECONOMY"


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == MS_REGION
    )
    geo = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(geo),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == MS_TYPE)
        .select("p_partkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
    )
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    num = dsum(F.when(F.col("supp_nation") == MS_NATION, F.col("__rev")))
    return (
        joined.groupBy("o_year")
        .agg(
            (F.coalesce(num, F.lit(0.0)) / dsum(F.col("__rev"))).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


_MARKET_SHARE_SQL = f"""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
       COALESCE({_dsum(f"CASE WHEN n2.n_name = '{MS_NATION}' THEN l.l_extendedprice * (1 - l.l_discount) END")}, 0.0)
         / {_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS mkt_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{MS_TYPE}'
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n1.n_regionkey AND r.r_name = '{MS_REGION}'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
GROUP BY o_year
ORDER BY o_year
"""


# ------------------------------------------------------------ product_profit --
# TPC-H Q9 shape (the multi-fact profit bridge): profit per (nation,
# year) for one part-name family, where profit needs BOTH fact-side
# revenue (l_extendedprice·(1−l_discount)) and the partsupp-side unit
# cost (ps_supplycost·l_quantity) — the classic five-join bridge
# lineitem⨝partsupp⨝part⨝supplier(⨝nation)⨝orders.
#
# Spark-first: the testdata's partsupp is DERIVED and its
# ps_supplycost is a pure integer formula of the (partkey, suppkey)
# pair key (`_ps_supplycost_col`), so the textbook pair-key join
# lineitem⨝partsupp is ALGEBRAICALLY a projection — every lineitem row
# already carries both key columns, and joining back a value that is a
# deterministic function of them buys nothing but a second lineitem
# scan (to build ps) plus a pair-key exchange of the whole fact table.
# The plan therefore computes the cost column inline: ONE lineitem
# scan, ZERO pair-key exchanges. The DuckDB oracle keeps the literal
# six-table form (ps CTE joined on the pair key) — the row-identical
# verdict is the proof of the rewrite. With a real partsupp BASE table
# this leg becomes a (partkey, suppkey) shuffle join of lineitem
# against a table ~|lineitem|/4 rows — still the right plan, just no
# longer free.
#
# Exchange budget at scale: name filter pushed to the part scan
# (StringContains row-group pruning), part join on partkey (AQE
# broadcasts at test SF; shuffles on partkey at SF100k),
# supplier⨝nation broadcast (bounded dims), orders join on orderkey is
# the one unavoidable big exchange, final aggregate bounded by
# |nations|·|years| groups. Profit stays a per-row double expression
# both engines evaluate identically (2dp·2dp product minus an exact
# integer — inside dsum's 6dp-exact class) summed through
# DECIMAL(28,6).
PP_NAME_TOKEN = "anvil"


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(PP_NAME_TOKEN))
        .select("p_partkey")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    cost = _ps_supplycost_col(F.col("l_partkey"), F.col("l_suppkey"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - cost * F.col("l_quantity")
        ).alias("__profit"),
    )
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy("nation", "o_year")
        .agg(dsum(F.col("__profit")).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


_PRODUCT_PROFIT_SQL = f"""
WITH {_PS_CTE}
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
       {_dsum(
           "l.l_extendedprice * (1 - l.l_discount)"
           " - ps.ps_supplycost * l.l_quantity"
       )} AS sum_profit
FROM lineitem l
JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%{PP_NAME_TOKEN}%'
GROUP BY nation, o_year
ORDER BY nation ASC, o_year DESC
"""


WAREHOUSE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "order_priority": q_order_priority,
    "returned_items": q_returned_items,
    "nation_trade": q_nation_trade,
    "promo_revenue": q_promo_revenue,
    "large_orders": q_large_orders,
    "bracket_revenue": q_bracket_revenue,
    "dormant_customers": q_dormant_customers,
    "set_ops": q_set_ops,
    "revenue_share": q_revenue_share,
    "cube_summary": q_cube_summary,
    "rank_windows": q_rank_windows,
    "gap_fill": q_gap_fill,
    "basket_pairs": q_basket_pairs,
    "attribution": q_attribution,
    "profile_columns": q_profile_columns,
    "late_suppliers": q_late_suppliers,
    "small_qty_revenue": q_small_qty_revenue,
    "top_supplier": q_top_supplier,
    "order_count_distribution": q_order_count_distribution,
    "min_cost_supplier": q_min_cost_supplier,
    "excess_suppliers": q_excess_suppliers,
    "part_value_share": q_part_value_share,
    "local_supplier_volume": q_local_supplier_volume,
    "supplier_part_counts": q_supplier_part_counts,
    "market_share": q_market_share,
    "product_profit": q_product_profit,
}

WAREHOUSE_ORACLE: dict[str, str] = {
    "order_priority": _ORDER_PRIORITY_SQL,
    "returned_items": _RETURNED_ITEMS_SQL,
    "nation_trade": _NATION_TRADE_SQL,
    "promo_revenue": _PROMO_REVENUE_SQL,
    "large_orders": _LARGE_ORDERS_SQL,
    "bracket_revenue": _bracket_sql(),
    "dormant_customers": _DORMANT_SQL,
    "set_ops": _SET_OPS_SQL,
    "revenue_share": _REVENUE_SHARE_SQL,
    "cube_summary": _CUBE_SUMMARY_SQL,
    "rank_windows": _RANK_WINDOWS_SQL,
    "gap_fill": _gap_fill_sql(),
    "basket_pairs": _BASKET_PAIRS_SQL,
    "attribution": _ATTRIBUTION_SQL,
    "profile_columns": _profile_sql(),
    "late_suppliers": _LATE_SUPPLIERS_SQL,
    "small_qty_revenue": _SMALL_QTY_REVENUE_SQL,
    "top_supplier": _TOP_SUPPLIER_SQL,
    "order_count_distribution": _ORDER_COUNT_DIST_SQL,
    "min_cost_supplier": _MIN_COST_SUPPLIER_SQL,
    "excess_suppliers": _EXCESS_SUPPLIERS_SQL,
    "part_value_share": _PART_VALUE_SHARE_SQL,
    "local_supplier_volume": _LOCAL_SUPPLIER_VOLUME_SQL,
    "supplier_part_counts": _SUPPLIER_PART_COUNTS_SQL,
    "market_share": _MARKET_SHARE_SQL,
    "product_profit": _PRODUCT_PROFIT_SQL,
}
