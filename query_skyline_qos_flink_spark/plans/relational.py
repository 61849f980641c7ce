"""General relational coverage — the operator classes the reference lacks
entirely (SURVEY.md §2.3: joins, windows, top-k, set ops, grouping sets)
and that this engine inherits from Spark SQL/Catalyst.

Money/quantity aggregates are computed in integer cents
(``round(x*100) -> bigint``): double summation is order-dependent and Spark
partial aggregation would never hash-match duckdb's scan order, while
integer sums are associative and exact.  The same trick keeps window frames
and top-k ties deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.joins import asof_join, range_join_binned
from ..operators.prefix import ntile_by_rank
from ..session import epoch_micros, epoch_micros_sql, load
from .corpus import register


def _cents(col):
    return F.round(F.col(col) * 100).cast("bigint")


@register(
    "r1_agg_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
  count(*) AS n_rows,
  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
  CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
  count(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_returnflag, l_linestatus
""".strip(),
    doc="TPC-H Q1-shaped aggregation (partial+final agg, count distinct); "
    "integer-cents arithmetic for exact oracle parity",
)
def r1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents("l_quantity")).alias("sum_qty_c"),
        F.sum(_cents("l_extendedprice")).alias("sum_price_c"),
        F.sum(_cents("l_discount")).alias("sum_disc_c"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@register(
    "r2_join_topk_revenue",
    """
WITH rev AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
         count(DISTINCT o.o_orderkey) AS n_orders
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY c.c_custkey, c.c_mktsegment)
SELECT c_custkey, c_mktsegment, revenue_c, n_orders FROM rev
ORDER BY revenue_c DESC, c_custkey LIMIT 10
""".strip(),
    doc="3-way join + aggregate + deterministic top-k (broadcast join for "
    "the small dim; ties broken by custkey)",
)
def r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.sum(_cents("l_extendedprice")).alias("revenue_c"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )
    return rev.orderBy(F.col("revenue_c").desc(), F.col("c_custkey")).limit(10)


@register(
    "r3_window_running",
    """
SELECT event_id, user_id,
  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
  CAST(sum(CAST(round(value * 100) AS BIGINT))
    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_value_c
FROM events
""".strip(),
    doc="Per-user running aggregates (window functions over event time)",
)
def r3(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # micro-precision ordering like epoch_us, tolerant of both ts encodings
    w = Window.partitionBy("user_id").orderBy(epoch_micros(ev), "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.sum(_cents("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "run_value_c"
        ),
    )


@register(
    "r4_semi_anti_join",
    """
SELECT c.c_custkey, c.c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""".strip(),
    doc="Semi-join + anti-join composition (EXISTS / NOT EXISTS): customers "
    "with orders but none finalized",
)
def r4(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(
            o.where(F.col("o_orderstatus") == "F"),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_mktsegment")
    )


@register(
    "r6_orders_by_year",
    """
SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderstatus,
  count(*) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
FROM orders GROUP BY year(o_orderdate), o_orderstatus
""".strip(),
    doc="Date-function aggregation (year extraction over timestamp column)",
)
def r6(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year"), "o_orderstatus"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_cents("o_totalprice")).alias("sum_price_c"),
    )


@register(
    "r7_json_extract",
    """
SELECT event_type,
  count(*) AS n,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
""".strip(),
    doc="Semi-structured columns: JSON field extraction from the events "
    "props payload, aggregated per event type",
)
def r7(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "r8_setops_nations",
    """
SELECT n_nationkey FROM (
  SELECT c_nationkey AS n_nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
EXCEPT
SELECT n_nationkey FROM nation WHERE n_regionkey = 0
""".strip(),
    doc="Set operations: INTERSECT of customer/supplier nations minus one "
    "region's nations (EXCEPT)",
)
def r8(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    n0 = (
        load(spark, sf_dir, "nation")
        .where(F.col("n_regionkey") == 0)
        .select("n_nationkey")
    )
    return c.intersect(s).exceptAll(n0).distinct()


@register(
    "r5_rollup_counts",
    """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""".strip(),
    doc="Grouping sets (ROLLUP) — multi-level aggregates in one pass",
)
def r5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


# events (2024) all postdate orders (1995-2001), so a naive "last order per
# customer, ignoring time" would pass an un-rebased as-of gate.  Re-base each
# event onto a deterministic day inside the order era (its hour-of-stream mod
# the era length) so matches genuinely interleave: some events land before
# their user's first order (NULL path), others mid-history.  Pure integer
# arithmetic, replicated verbatim in the oracle.
_ORDER_ERA_START_DAY = 9131  # 1995-01-01 as days since epoch
_ORDER_ERA_DAYS = 2400


@register(
    "r11_asof_join",
    f"""
WITH ob AS (SELECT o_custkey AS user_id,
                   epoch_us(o_orderdate) // 86400000000 AS od,
                   max(o_orderkey) AS last_orderkey,
                   arg_max(CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey) AS last_price_c
            FROM orders GROUP BY 1, 2),
     e AS (SELECT event_id, user_id,
                  {_ORDER_ERA_START_DAY} + (epoch_us(ts) // 3600000000) % {_ORDER_ERA_DAYS} AS ed
           FROM events)
SELECT e.event_id, e.user_id, CAST(e.ed AS BIGINT) AS event_day,
       COALESCE(ob.last_orderkey, -1) AS last_orderkey,
       CAST(COALESCE(ob.od, -1) AS BIGINT) AS order_day,
       COALESCE(ob.last_price_c, -1) AS last_price_c
FROM e ASOF LEFT JOIN ob ON e.user_id = ob.user_id AND e.ed >= ob.od
""".strip(),
    doc="Backward as-of join (events enriched with the customer's latest "
    "order at or before the event day) — Spark lacks ASOF JOIN, so the "
    "operator is a union + carry-forward window (one shuffle on the key, "
    "zero join operators in the plan, no range explosion; the Flink "
    "temporal-join shape). Right side pre-deduped to one row per "
    "(customer, day) by max orderkey; event days deterministically "
    "re-based into the order era so the gate exercises interleaving and "
    "the NULL (no-prior-order) path; oracle is duckdb's native ASOF LEFT "
    "JOIN",
)
def r11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    # hour-of-stream mod era -> day number (tolerant of both ts encodings)
    e = ev.select(
        "event_id",
        "user_id",
        F.expr(
            f"{_ORDER_ERA_START_DAY} + "
            f"({epoch_micros_sql(ev)} div 3600000000) % {_ORDER_ERA_DAYS}"
        ).alias("ed"),
    )
    # one row per (customer, day): struct max picks the largest orderkey and
    # carries ITS price (orderkey leads the struct and is unique)
    ob = (
        o.groupBy(
            F.col("o_custkey").alias("user_id"),
            F.expr("unix_timestamp(o_orderdate) div 86400").alias("od"),
        )
        .agg(F.max(F.struct("o_orderkey", _cents("o_totalprice").alias("pc"))).alias("s"))
        .select(
            "user_id",
            "od",
            F.col("s.o_orderkey").alias("last_orderkey"),
            F.col("s.pc").alias("last_price_c"),
        )
    )
    return asof_join(
        e,
        ob,
        on=["user_id"],
        left_time="ed",
        right_time="od",
        value_cols=["last_orderkey", "od", "last_price_c"],
    ).select(
        "event_id",
        "user_id",
        F.col("ed").alias("event_day"),
        # no-prior-order -> sentinel -1 (all real keys/days/prices are
        # positive): a NULL-bearing bigint column exports through the
        # gate's Arrow comparator as float64 and could never hash-match
        F.coalesce("last_orderkey", F.lit(-1).cast("bigint")).alias("last_orderkey"),
        F.coalesce("od", F.lit(-1).cast("bigint")).alias("order_day"),
        F.coalesce("last_price_c", F.lit(-1).cast("bigint")).alias("last_price_c"),
    )


_RANGE_JOIN_WINDOW_US = 60 * 1_000_000  # look back 60 s


@register(
    "r12_range_join",
    f"""
WITH e AS (SELECT event_id, epoch_us(ts) AS us,
                  CAST(round(value * 100) AS BIGINT) AS vc FROM events)
SELECT a.event_id,
       CAST(count(b.us) AS BIGINT) AS n_prev_60s,
       COALESCE(max(b.vc), -1) AS max_prev_vc
FROM e a LEFT JOIN e b ON b.us BETWEEN a.us - {_RANGE_JOIN_WINDOW_US} AND a.us - 1
GROUP BY a.event_id
""".strip(),
    doc="Pure range join (no equi key): for each event, count + max of ALL "
    "events in the preceding 60 s. Spark plans a bare inequality join as a "
    "cartesian product, so the operator bins both sides by a 60 s bucket, "
    "probes the <=2 overlapping bins per left row (explode of a JVM "
    "sequence) and refines with the exact BETWEEN — cost scales with rows "
    "per bin, never |L|x|R|; plan-asserted cartesian-free. Half-open "
    "window [t-60s, t) keeps each event out of its own neighborhood",
)
def r12(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # micro-precision like epoch_us, tolerant of both ts encodings
    e = ev.select(
        "event_id", epoch_micros(ev).alias("us"), _cents("value").alias("vc")
    )
    pairs = range_join_binned(
        e.select("event_id", F.col("us").alias("l_us")),
        e.select(F.col("us").alias("r_us"), F.col("vc").alias("r_vc")),
        left_time="l_us",
        right_time="r_us",
        lo=-_RANGE_JOIN_WINDOW_US,
        hi=-1,
    )
    agg = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("r_vc").alias("max_prev_vc")
    )
    return (
        e.select("event_id")
        .join(agg, "event_id", "left")
        .select(
            "event_id",
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_prev_60s"),
            # no-predecessor -> sentinel -1 (vc >= 1 for real events): a
            # NULL-bearing bigint would export as float64 in the gate
            F.coalesce("max_prev_vc", F.lit(-1).cast("bigint")).alias("max_prev_vc"),
        )
    )


_SESSION_GAP_US = 240 * 60 * 1_000_000  # 4 h inactivity closes a session


@register(
    "r9_sessionize",
    f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s FROM l),
s AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM f)
SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(event_id) AS BIGINT) AS first_event,
       CAST(max(event_id) AS BIGINT) AS last_event,
       CAST(sum(vc) AS BIGINT) AS sum_value_c
FROM s GROUP BY user_id, session_id
""".strip(),
    doc="Sessionization (classic large-scale event-pipeline op): per-user "
    "sessions split at > 4 h inactivity via lag + running sum of boundary "
    "flags; one shuffle on user_id serves the lag, the running sum AND the "
    "final per-session aggregate (same partition key throughout)",
)
def r9(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # micro-precision like epoch_us, tolerant of both ts encodings
    us = epoch_micros(ev)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = ev.select("user_id", "event_id", us.alias("us"), _cents("value").alias("vc"))
    flagged = e.select(
        "*",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > _SESSION_GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("new_s"),
    )
    sess = flagged.select(
        "*",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        F.sum("vc").alias("sum_value_c"),
    )


@register(
    "r10_percentiles",
    """
WITH e AS (SELECT event_type, event_id,
                  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n FROM e)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN vc END) AS BIGINT) AS median_c,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN vc END) AS BIGINT) AS p90_c
FROM r GROUP BY event_type
""".strip(),
    doc="Exact discrete percentiles (median, p90) per event type by rank "
    "position — integer positions ((n+1) div 2, ceil(9n/10) as (9n+9) div "
    "10) so both engines select the identical row; one shuffle on the "
    "group key serves the rank window and the final pivot-aggregate",
)
def r10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    e = ev.select("event_type", "event_id", _cents("value").alias("vc"))
    w = Window.partitionBy("event_type").orderBy("vc", "event_id")
    wp = Window.partitionBy("event_type")
    r = e.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    med = F.expr("(n + 1) div 2")
    p90 = F.expr("(9 * n + 9) div 10")
    return r.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        F.max(F.when(F.col("rn") == med, F.col("vc"))).alias("median_c"),
        F.max(F.when(F.col("rn") == p90, F.col("vc"))).alias("p90_c"),
    )


@register(
    "r13_regional_revenue",
    """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_mc,
       CAST(count(*) AS BIGINT) AS n_items
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON s_suppkey   = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""".strip(),
    doc="TPC-H Q5-shaped 6-table join: per-nation revenue where the "
    "customer and supplier share a nation, one region only. All four "
    "dims broadcast (region/nation/customer/supplier), so the only "
    "shuffle is lineitem-orders; revenue in exact integer "
    "milli-cents: price_c * (100 - disc_pct)",
)
def r13(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev_mc = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev_mc).alias("revenue_mc"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "r14_subquery_avg",
    """
WITH pa AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qc,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey)
SELECT l.l_partkey,
       CAST(count(*) AS BIGINT) AS n_below,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
FROM lineitem l JOIN pa ON pa.l_partkey = l.l_partkey
WHERE 5 * CAST(round(l.l_quantity * 100) AS BIGINT) * pa.cnt < pa.sum_qc
GROUP BY l.l_partkey
""".strip(),
    doc="TPC-H Q17-shaped correlated scalar subquery, decorrelated: "
    "lineitems whose quantity is below 20%% of their part's average. "
    "The per-part average never materializes as a float: qty < 0.2 * "
    "sum/cnt is evaluated as 5*qty_c*cnt < sum_c in exact BIGINT "
    "cents. The join strategy is size-picked by Catalyst/AQE: the "
    "per-part aggregate broadcasts while it fits, and degrades to a "
    "shuffled join on l_partkey (both sides hashed on the same key) "
    "when it does not — no hint pins either choice, so the plan "
    "survives a 100x scale-up unchanged",
)
def r14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = li.groupBy("l_partkey").agg(
        F.sum(_cents("l_quantity")).alias("sum_qc"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(pa, "l_partkey")
        .where(F.lit(5) * _cents("l_quantity") * F.col("cnt") < F.col("sum_qc"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_below"),
            F.sum(_cents("l_extendedprice")).alias("price_c"),
        )
    )


@register(
    "r15_grouping_sets",
    """
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(CAST(year(o_orderdate) AS BIGINT), -1) AS o_year,
       CAST(GROUPING(o_orderstatus, year(o_orderdate)) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, year(o_orderdate)), (o_orderstatus), ())
""".strip(),
    doc="GROUPING SETS with grouping_id: per (status, year), per status, "
    "and grand total in one logical aggregate (Spark expands to a "
    "single Expand + hash-agg, one shuffle for all three sets). "
    "Rolled-up key columns are COALESCEd to sentinels on both sides: "
    "'<all>' for the string, -1 for the year (the driver's "
    "Arrow fetch turns null-bearing int64 into float64, which can "
    "never hash-match Spark's BIGINT rendering)",
)
def r15(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("bigint")
    )
    return (
        o.groupingSets(
            [["o_orderstatus", "o_year"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_year",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents("o_totalprice")).alias("total_c"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_year", F.lit(-1)).alias("o_year"),
            "gid",
            "n_orders",
            "total_c",
        )
    )


@register(
    "r16_lag_delta",
    """
WITH d AS (
  SELECT o_custkey, o_orderkey, o_orderstatus,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders)
SELECT o_custkey, o_orderkey,
       COALESCE(day - lag(day) OVER w, -1) AS gap_days,
       COALESCE(lead(o_orderstatus) OVER w, '<none>') AS next_status
FROM d WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey)
""".strip(),
    doc="lag/lead window functions: per-customer day gaps between "
    "consecutive orders and the next order's status. Day arithmetic "
    "in integer epoch-days (Spark unix_timestamp div 86400 == duckdb "
    "epoch_us // 86400000000); NULL lag/lead frames COALESCEd to "
    "sentinels for the Arrow int64 reason above. One shuffle on "
    "o_custkey; the sort is per-partition within the window",
)
def r16(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        (F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("bigint").alias("day"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(F.col("day") - F.lag("day").over(w), F.lit(-1)).alias("gap_days"),
        F.coalesce(F.lead("o_orderstatus").over(w), F.lit("<none>")).alias(
            "next_status"
        ),
    )


_PRIORITIES = [
    ("1-URGENT", "urgent_c"),
    ("2-HIGH", "high_c"),
    ("3-MEDIUM", "medium_c"),
    ("4-NOT SPECIFIED", "notspec_c"),
    ("5-LOW", "low_c"),
]


@register(
    "r17_pivot_priority",
    "SELECT o_orderstatus AS status,\n"
    + ",\n".join(
        "       CAST(COALESCE(sum(CASE WHEN o_orderpriority = '" + val + "' "
        "THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) "
        "AS " + alias
        for val, alias in _PRIORITIES
    )
    + "\nFROM orders GROUP BY o_orderstatus",
    doc="Pivot (long->wide): total order value in cents per status row x "
    "priority column. The pivot values are pinned explicitly, so Spark "
    "skips the distinct-values discovery job and the schema is fixed at "
    "plan time — one Expand-free hash aggregate, one shuffle on the "
    "grouping key; missing cells COALESCE to 0 on both sides",
)
def r17(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", _cents("o_totalprice").alias("price_c")
    )
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", [val for val, _ in _PRIORITIES])
        .agg(F.sum("price_c"))
    )
    return piv.select(
        F.col("o_orderstatus").alias("status"),
        *[
            F.coalesce(F.col("`" + val + "`"), F.lit(0)).alias(alias)
            for val, alias in _PRIORITIES
        ],
    )


@register(
    "r18_ntile_deciles",
    """
WITH d AS (
  SELECT c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
         ntile(10) OVER (ORDER BY CAST(round(c_acctbal * 100) AS BIGINT),
                         c_custkey) AS decile
  FROM customer)
SELECT decile, CAST(count(*) AS BIGINT) AS n,
       CAST(min(bal_c) AS BIGINT) AS min_bal_c,
       CAST(max(bal_c) AS BIGINT) AS max_bal_c
FROM d GROUP BY decile
""".strip(),
    doc="ntile decile bucketing over account balance (cents, custkey "
    "tie-break makes the total order unique so bucket boundaries are "
    "engine-independent). ntile needs a total order by definition, but NOT "
    "a single-task window: global rank is assembled from range-bucketed "
    "pieces (operators/prefix.py::ntile_by_rank) and the tile follows by "
    "closed-form rank arithmetic — scale-safe where ntile() OVER "
    "(ORDER BY ...) is not",
)
def r18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", _cents("c_acctbal").alias("bal_c")
    )
    return (
        ntile_by_rank(c, ["bal_c", "c_custkey"], 10, "decile")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("bal_c").alias("min_bal_c"),
            F.max("bal_c").alias("max_bal_c"),
        )
        .select(F.col("decile").cast("int"), "n", "min_bal_c", "max_bal_c")
    )


@register(
    "r19_range_frame",
    """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS tss,
         CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events)
SELECT event_id, user_id,
       CAST(sum(value_c) OVER (PARTITION BY user_id ORDER BY tss
                               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS hour_sum_c,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY tss
                           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS hour_n
FROM e
""".strip(),
    doc="RANGE-frame window (value-based, not row-based): per user, the "
    "rolling 1-hour sum/count of event values ordered by event-time "
    "seconds. RANGE frames are tie-safe where ROWS frames are not: "
    "events sharing a timestamp get identical frame results, so no "
    "tie-break column is needed for exactness. One shuffle on user_id",
)
def r19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ev = ev.select(
        "event_id",
        "user_id",
        F.expr(f"{epoch_micros_sql(ev)} div 1000000").alias("tss"),
        _cents("value").alias("value_c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tss")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum("value_c").over(w).alias("hour_sum_c"),
        F.count(F.lit(1)).over(w).alias("hour_n"),
    )


@register(
    "r20_recursive_cte",
    """
WITH RECURSIVE anc AS (
  SELECT DISTINCT user_id AS u, user_id AS cur, 0 AS depth
  FROM events
  UNION ALL
  SELECT u, cur // 2, depth + 1 FROM anc WHERE cur > 0
)
SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(u) AS BIGINT) AS min_u, CAST(max(u) AS BIGINT) AS max_u
FROM anc GROUP BY depth
""".strip(),
    doc="Recursive CTE (WITH RECURSIVE, new in Spark 4.x): walk each "
    "events user up its binary ancestry chain (u -> u div 2 until 0) "
    "and aggregate per depth — the hierarchical-traversal query class "
    "(org charts, category trees, reachability) that needed driver-side "
    "iteration before recursive CTEs landed. Depth is bounded by "
    "log2(max user_id) (~17 at sf0.1), so the recursion is ~17 "
    "self-union rounds, each a metadata-cheap distinct-free union; "
    "integer-only output keeps the oracle hash exact",
)
def r20(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("__r20_events")
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
          SELECT DISTINCT user_id AS u, user_id AS cur, 0 AS depth
          FROM __r20_events
          UNION ALL
          SELECT u, cur div 2, depth + 1 FROM anc WHERE cur > 0
        )
        SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(min(u) AS BIGINT) AS min_u, CAST(max(u) AS BIGINT) AS max_u
        FROM anc GROUP BY depth
        """
    )


_R21_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "r21_unpivot_measures",
    "SELECT measure, CAST(count(*) AS BIGINT) AS n_rows,\n"
    "       CAST(sum(val_c) AS BIGINT) AS sum_c,\n"
    "       CAST(min(val_c) AS BIGINT) AS min_c, CAST(max(val_c) AS BIGINT) AS max_c\n"
    "FROM (\n"
    + "\nUNION ALL\n".join(
        f"  SELECT '{m}' AS measure, CAST(round({m} * 100) AS BIGINT) AS val_c "
        f"FROM lineitem WHERE {m} IS NOT NULL"
        for m in _R21_MEASURES
    )
    + "\n) u GROUP BY measure",
    doc="Unpivot (wide->long) via the native DataFrame.unpivot API: melt "
    "the four lineitem measures into (measure, value) rows and aggregate "
    "per measure — the schema-normalization shape for feeding generic "
    "profilers. Spark plans unpivot as a single Expand node riding the "
    "scan (one pass, rows x4 only after column pruning to the four "
    "measures), then one map-side-combined aggregate; cents-integer "
    "casts keep the oracle hash exact. Oracle states the same thing as "
    "UNION ALL branches",
)
def r21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        *[_cents(m).alias(m) for m in _R21_MEASURES]
    )
    long = li.unpivot([], _R21_MEASURES, "measure", "val_c").where(
        F.col("val_c").isNotNull()
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("val_c").cast("bigint").alias("sum_c"),
        F.min("val_c").cast("bigint").alias("min_c"),
        F.max("val_c").cast("bigint").alias("max_c"),
    )


@register(
    "r22_topn_per_group",
    """
WITH rev AS (
  SELECT n.n_name, l.l_partkey,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS revenue_c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY 1, 2),
r AS (SELECT n_name, l_partkey, revenue_c,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY revenue_c DESC, l_partkey) AS rnk
      FROM rev)
SELECT n_name, CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST(revenue_c AS BIGINT) AS revenue_c, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
""".strip(),
    doc="Per-group top-n (top-3 parts by revenue per supplier nation) — "
    "the OTHER top-k pattern: r2's global top-k compiles to "
    "TakeOrderedAndProject, while per-group ranking is a rank window "
    "PARTITIONED BY the group key (parallel by key, no single-task "
    "window, no global sort); supplier/nation dims broadcast; cents "
    "integers keep the hash float-free",
)
def r22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", _cents("l_extendedprice").alias("cents")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(F.sum("cents").alias("revenue_c"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("revenue_c").desc(), F.col("l_partkey")
    )
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "n_name",
            F.col("l_partkey").cast("bigint").alias("l_partkey"),
            F.col("revenue_c").cast("bigint").alias("revenue_c"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@register(
    "r23_salted_skew_join",
    """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_c
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""".strip(),
    doc="Skew-tolerant salted equi-join under the hard oracle gate: "
    "lineitem (the hot side, salted pmod(hash(row), 8)) joins orders "
    "(replicated x8 so every (key, salt) exists once) and aggregates "
    "per priority — row-identical to the plain join, which IS the "
    "oracle, so the salting machinery itself is hash-verified. The "
    "pattern for known-skew keys where AQE's runtime skew split isn't "
    "available (streaming micro-batches) — "
    "operators/joins.py::salted_join; cents integers keep the hash "
    "float-free",
)
def r23(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", _cents("l_extendedprice").alias("cents")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li, o.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"],
        n_salts=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("cents").cast("bigint").alias("revenue_c"),
    )


@register(
    "r24_event_funnel",
    """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.t > s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.t) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.t > s2.t2 GROUP BY 1)
SELECT s1.user_id, CAST(s1.t1 AS BIGINT) AS t1_us,
       CAST(COALESCE(s2.t2, -1) AS BIGINT) AS t2_us,
       CAST(COALESCE(s3.t3, -1) AS BIGINT) AS t3_us
FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
        LEFT JOIN s3 ON s3.user_id = s1.user_id
""".strip(),
    doc="Event funnel (view -> click -> purchase): per-user earliest "
    "timestamp of each step, where step i+1 must occur strictly AFTER "
    "the user's step-i time — the classic product-analytics sequential "
    "pattern over event logs (conversion/latency reports derive from "
    "these rows). Chained min-aggregate + equi-join shape: each step is "
    "one groupBy(user) min over the step-filtered events joined to the "
    "previous step's times — shuffles key on user_id only, no window, "
    "no ordered collect. Epoch-micros bigints keep the hash float-free; "
    "users stalling mid-funnel surface as -1 later steps "
    "(COALESCEd LEFT joins — a NULL-bearing bigint column would export "
    "to pandas as float64 and break the comparator's int/float "
    "distinction, the r11/r12/r16 convention). ts goes through session.epoch_micros "
    "(dtype-dispatching, UTC)",
)
def r24(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type", epoch_micros(ev).alias("t")
    )
    s1 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
    )
    s2 = (
        e.join(s1, "user_id")
        .where((F.col("event_type") == "click") & (F.col("t") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    s3 = (
        e.join(s2, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("t") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            F.col("t1").cast("bigint").alias("t1_us"),
            F.coalesce(F.col("t2"), F.lit(-1)).cast("bigint").alias("t2_us"),
            F.coalesce(F.col("t3"), F.lit(-1)).cast("bigint").alias("t3_us"),
        )
    )


@register(
    "r25_cohort_retention",
    """
WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
c AS (SELECT user_id, min(d) AS cohort_d FROM e GROUP BY 1),
a AS (SELECT DISTINCT e.user_id, c.cohort_d, e.d - c.cohort_d AS offset_d
      FROM e JOIN c USING (user_id))
SELECT CAST(cohort_d AS BIGINT) AS cohort_d, CAST(offset_d AS BIGINT) AS offset_d,
       CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY 1, 2
""".strip(),
    doc="Cohort retention matrix (the other classic product-analytics "
    "report): users bucketed by first-active day, then distinct active "
    "users per (cohort, day-offset) cell. Shape: one groupBy(user) min "
    "for cohorts, an equi-join back, a DISTINCT on (user, cohort, "
    "offset) and the cell rollup — every shuffle keys on user_id or the "
    "small cell key, no window, no ordered collect. Integer day "
    "arithmetic on epoch micros (floor division) is engine-exact; ts "
    "goes through session.epoch_micros (dtype-dispatching, UTC)",
)
def r25(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # truncating division (cast toward zero), matching DuckDB's integer
    # `//` which TRUNCATES (-7 // 2 == -3, not floor's -4) — the r16
    # day-bucket idiom; a pre-1970 timestamp would bucket identically
    e = ev.select(
        "user_id",
        (epoch_micros(ev) / F.lit(86400000000)).cast("bigint").alias("d"),
    )
    c = e.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    a = (
        e.join(c, "user_id")
        .select("user_id", "cohort_d", (F.col("d") - F.col("cohort_d")).alias("offset_d"))
        .distinct()
    )
    # d is bigint at the source, so cohort_d/offset_d are already long
    return a.groupBy("cohort_d", "offset_d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


_R26_ORACLE = """
SELECT * FROM (
  SELECT 'fk_orders_custkey' AS check_name,
         CAST((SELECT count(*) FROM orders o LEFT JOIN customer c
               ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT) AS n_violations,
         CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_checked
  UNION ALL
  SELECT 'fk_lineitem_orderkey',
         CAST((SELECT count(*) FROM lineitem l LEFT JOIN orders o
               ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT),
         CAST((SELECT count(*) FROM lineitem) AS BIGINT)
  UNION ALL
  SELECT 'fk_customer_nationkey',
         CAST((SELECT count(*) FROM customer c LEFT JOIN nation n
               ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL) AS BIGINT),
         CAST((SELECT count(*) FROM customer) AS BIGINT)
  UNION ALL
  SELECT 'pk_orders_unique',
         CAST((SELECT count(*) FROM (SELECT o_orderkey FROM orders
               GROUP BY 1 HAVING count(*) > 1)) AS BIGINT),
         CAST((SELECT count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
  UNION ALL
  SELECT 'docs_text_nonempty',
         CAST((SELECT count(*) FROM documents
               WHERE text IS NULL OR length(trim(text)) = 0) AS BIGINT),
         CAST((SELECT count(*) FROM documents) AS BIGINT)
  UNION ALL
  SELECT 'lineitem_ship_after_order',
         CAST((SELECT count(*) FROM lineitem l JOIN orders o
               ON l.l_orderkey = o.o_orderkey
               WHERE l.l_shipdate < o.o_orderdate) AS BIGINT),
         CAST((SELECT count(*) FROM lineitem l JOIN orders o
               ON l.l_orderkey = o.o_orderkey) AS BIGINT)
  UNION ALL
  SELECT 'customer_acctbal_nonneg',
         CAST((SELECT count(*) FROM customer WHERE c_acctbal < 0) AS BIGINT),
         CAST((SELECT count(*) FROM customer) AS BIGINT)
)
""".strip()


@register(
    "r26_integrity_checks",
    _R26_ORACLE,
    doc="Data-quality constraint suite (the validation pass every ingest "
    "pipeline runs before publishing a snapshot): referential integrity "
    "(3 FK orphan checks), key uniqueness, non-empty content, a "
    "temporal-order rule, and a domain rule — one (check_name, "
    "n_violations, n_checked) row each. Two checks FIRE on the fixture "
    "by design (the generator ships lines before their order date; "
    "TPC-H allows negative balances), so the gate proves violation "
    "counting, not just zeros. Shapes: FK checks pre-aggregate the fact "
    "side to distinct keys before the anti join (the shuffle carries "
    "|keys|, not |rows|); uniqueness is one partial-agg groupBy; domain "
    "rules are conditional-sum scan aggregates; the temporal rule is "
    "the one genuine fact-to-fact equi-join, co-locatable on a bucketed "
    "layout. All-bigint output",
)
def r26(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    d = load(spark, sf_dir, "documents")

    def row(name: str, violations: DataFrame, checked: DataFrame) -> DataFrame:
        # each branch is a 1-row agg; the cross join of two 1-row frames
        # is trivially broadcast
        v = violations.select(F.col("n").alias("n_violations"))
        k = checked.select(F.col("n").alias("n_checked"))
        return v.crossJoin(k).select(
            F.lit(name).alias("check_name"),
            F.col("n_violations").cast("bigint"),
            F.col("n_checked").cast("bigint"),
        )

    def cnt(df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n"))

    # FK orphans: aggregate the fact side to (key, count) FIRST so the
    # anti join shuffles |distinct keys| rows, then sum the counts of the
    # unmatched keys — same result as an anti join on raw rows at a
    # fraction of the shuffle (NULL keys never match an equi-join, so
    # they count as violations on both engines)
    def fk_orphans(fact: DataFrame, fk: str, dim: DataFrame, pk: str) -> DataFrame:
        per_key = fact.groupBy(F.col(fk).alias("__k")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        orphan = per_key.join(
            dim.select(F.col(pk).alias("__k")).distinct(), "__k", "left_anti"
        )
        return orphan.agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("n"))

    dup_pk = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    distinct_pk = o.agg(F.countDistinct("o_orderkey").alias("n"))
    empty_text = d.where(
        F.col("text").isNull() | (F.length(F.trim("text")) == 0)
    ).agg(F.count(F.lit(1)).alias("n"))
    # the temporal rule is the suite's one fact-to-fact join — run it ONCE
    # and take both counts from the same pass (a conditional sum + a
    # count), instead of two independent aggregate subtrees re-executing
    # the join
    ship_row = (
        li.select("l_orderkey", "l_shipdate")
        .join(
            o.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .agg(
            F.sum(
                F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
            ).alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )
        .select(
            F.lit("lineitem_ship_after_order").alias("check_name"),
            F.col("n_violations").cast("bigint"),
            F.col("n_checked").cast("bigint"),
        )
    )
    acct_neg = c.where(F.col("c_acctbal") < 0).agg(F.count(F.lit(1)).alias("n"))

    out = row("fk_orders_custkey", fk_orphans(o, "o_custkey", c, "c_custkey"), cnt(o))
    for args in (
        ("fk_lineitem_orderkey", fk_orphans(li, "l_orderkey", o, "o_orderkey"), cnt(li)),
        ("fk_customer_nationkey", fk_orphans(c, "c_nationkey", n, "n_nationkey"), cnt(c)),
        ("pk_orders_unique", dup_pk, distinct_pk),
        ("docs_text_nonempty", empty_text, cnt(d)),
        ("customer_acctbal_nonneg", acct_neg, cnt(c)),
    ):
        out = out.unionByName(row(*args))
    return out.unionByName(ship_row)
