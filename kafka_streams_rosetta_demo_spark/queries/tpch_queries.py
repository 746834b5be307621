"""TPC-H decision-support shapes (adapted) — relational stress queries.

The reference (a two-app Kafka Streams demo; see SURVEY.md §2.8 "explicitly
absent") has no multi-way join planner, no decorrelated subqueries, no
outer-join distributions. Spark has them all natively, so the engine declares
the classic TPC-H decision-support suite — adapted to the generator's schema
(no partsupp table, no comment/phone/container columns) — as first-class
oracle-backed queries. The suite is COMPLETE: all 22 classic shapes are
registered (Q1 lives in relational_queries.py as ``agg_pricing_summary``;
the other 21 are here). Each one exercises a distinct optimizer path the
rest of the registry doesn't cover at this composition depth: correlated-min
decorrelation (Q2), deterministic top-k over a 3-way join (Q3), correlated
EXISTS with a cross-side date residual (Q4), snowflake join chains with
residual cross-dimension equality (Q5), the minimal pushdown scan-aggregate
(Q6), disjunctive join-pair predicates (Q7), ratio-of-conditional-sums
market share (Q8), three-table profit expressions under a LIKE dim filter
(Q9), scalar-threshold HAVING over a grouped agg (Q11), fact–fact join with
cross-side residual + conditional counts (Q12), left-outer count
distributions (Q13), scalar-max join-back (Q15), NOT-IN as broadcast anti
join (Q16), decorrelated per-group averages (Q17), having-sum semi-joins
(Q18), per-side disjunction splitting (Q19), nested two-grain aggregation
thresholds (Q20), EXISTS + NOT EXISTS self-joins (Q21), and anti-join +
scalar-aggregate gating (Q22). Schema adaptations (no partsupp, no
commit/receipt dates, no shipmode/phone/comment): the part–supplier
relation derives from lineitem, supply cost proxies from s_acctbal (Q2) or
60%-of-retail (Q9), lateness is ship-lag beyond a fixed day count
(Q4/Q12/Q21), and availqty share becomes shipped-volume share (Q20) — each
docstring states its adaptation.

Float discipline (stricter than round()): every money aggregate quantizes to
integer CENTS per row — ``floor(x * 100 + 0.5)`` as BIGINT — *before* the
sum, so the aggregate is order-free and bit-identical across engines and
partitionings. Ratios are integer ppm via DIV on the cent sums (both engines
floor the same non-negative integers). Correlated-average comparisons are
rewritten into pure-integer cross-multiplication (``5·qty·n < Σqty`` for
``qty < 0.2·avg``), so no float boundary can flip a row's membership.

Scale notes per query; dimension joins broadcast (region/nation always;
supplier-sized dims under the auto threshold, shuffle otherwise via AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _cents(col: F.Column) -> F.Column:
    """Exact integer cents: floor(x*100 + 0.5). Both engines evaluate the
    identical IEEE double expression per row, so the quantized value — and
    therefore any sum of it, in any order — is bit-stable."""
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


_REV_CENTS_SQL = "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


def _rev_cents() -> F.Column:
    return _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (snowflake chain + cross-dimension residual)
# ---------------------------------------------------------------------------


@register(
    "tpch_q5_local_supplier",
    oracle=f"""
SELECT n_name,
       CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where supplier and customer share the
    nation, nations restricted to one region, orders to one year.

    Scale: the region→nation→supplier chain collapses to a broadcast-sized
    enriched supplier dim (5 nations' suppliers) probed by the lineitem scan
    map-side; the only big shuffles are lineitem⋈orders (orderkey) and
    ⋈customer (custkey); the year filter pushes into the orders scan before
    its shuffle; the c_nationkey = s_nationkey residual is evaluated in the
    join stage, never materializing the non-local pairs."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (disjunctive join-pair predicate)
# ---------------------------------------------------------------------------


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS revenue_cents
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey
  AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by direction and year.

    Scale: both nation filters reduce to 2-value IN-lists applied to the
    broadcast-enriched supplier and customer dims BEFORE the fact joins, so
    only the two nations' rows ever enter the shuffles; the disjunctive
    pair predicate then drops the two same-nation directions as a residual
    on the already-tiny joined stream."""
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share (ratio of conditional cent sums, integer ppm)
# ---------------------------------------------------------------------------


@register(
    "tpch_q8_market_share",
    oracle=f"""
WITH vol AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         {_REV_CENTS_SQL} AS vol_cents,
         CASE WHEN n1.n_name = 'NATION_3' THEN {_REV_CENTS_SQL} ELSE 0 END AS nat_cents
  FROM part, lineitem, supplier, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey
    AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey
    AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND n2.n_regionkey = r_regionkey
    AND r_name = 'EUROPE'
    AND p_type = 'STANDARD'
)
SELECT o_year,
       CAST(sum(nat_cents) AS BIGINT) AS nation_cents,
       CAST(sum(vol_cents) AS BIGINT) AS total_cents,
       CAST((CAST(sum(nat_cents) AS BIGINT) * 1000000)
            // CAST(sum(vol_cents) AS BIGINT) AS BIGINT) AS mkt_share_ppm
FROM vol
GROUP BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of STANDARD-part revenue sold into one
    region, by order year — the ratio-of-conditional-sums shape.

    Scale: both sums come out of ONE aggregation pass (no second scan for
    the denominator); the share is integer ppm on the cent sums, so the
    division is engine-exact. Part/supplier/customer dims broadcast after
    their filters; the p_type filter prunes lineitem via the partkey join.
    Join order matters here and CBO reordering is off by default: the
    selective EUROPE-customer filter applies to ORDERS FIRST (a broadcast
    semi-reduction to ~1/5 of orders), so the one big join — lineitem
    against orders — sees the reduced side; ordered the naive way
    (lineitem ⋈ full orders, filter after) the SMJ shuffles 5× the rows
    for the identical answer. At bench SF the reduced orders side drops
    under the broadcast threshold and AQE elides that shuffle entirely.
    The ppm multiply stays under long overflow through ~sf1k cent sums;
    beyond that the two cent columns are still exact and the ratio moves to
    128-bit driver-side arithmetic on the handful of year rows."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD").select("p_partkey")
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    rev = _rev_cents()
    orders_eu = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_orderdate"
    )
    vol = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders_eu, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("vol_cents"),
            F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0)).alias(
                "nat_cents"
            ),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.sum("nat_cents").alias("nation_cents"),
            F.sum("vol_cents").alias("total_cents"),
        )
        .select(
            "o_year",
            "nation_cents",
            "total_cents",
            F.expr("nation_cents * 1000000L DIV total_cents").alias("mkt_share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned items (filtered multi-join top-k)
# ---------------------------------------------------------------------------


@register(
    "tpch_q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND c_nationkey = n_nationkey
  AND l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top 20 customers by revenue lost to returns in a quarter.

    Scale: the returnflag filter pushes into the lineitem scan and the
    quarter filter into orders, both before their orderkey shuffle; nation
    broadcasts; the top-k plans as TakeOrderedAndProject over the grouped
    stream (no global sort materialization). Deterministic tiebreak on
    c_custkey."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer + two-level agg)
# ---------------------------------------------------------------------------


@register(
    "tpch_q13_order_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed 0, 1, 2, … non-urgent orders —
    the left-outer distribution shape (customers with zero orders must
    surface, so the filter lives in the join condition, not a WHERE).

    Scale: one custkey shuffle joins and counts in the same exchange (the
    groupBy reuses the join's hash partitioning); the second aggregation
    runs on a customer-cardinality input collapsed to ≤ max-order-count
    groups map-side."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue share (conditional ratio, single row)
# ---------------------------------------------------------------------------


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_CENTS_SQL} ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS total_cents,
       CAST((CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_CENTS_SQL} ELSE 0 END) AS BIGINT)
             * 1000000)
            // CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS BIGINT) AS promo_ppm
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: fraction of one month's revenue from PROMO parts, as
    integer ppm on exact cent sums.

    Scale: the month filter pushes into the lineitem scan; part broadcasts
    (partkey + type only after pruning); numerator and denominator come out
    of ONE global aggregation whose partials collapse map-side to a single
    row per task."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev_cents()
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
                "promo_cents"
            ),
            F.sum(rev).alias("total_cents"),
        )
        .select(
            "promo_cents",
            "total_cents",
            F.expr("promo_cents * 1000000L DIV total_cents").alias("promo_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity orders (decorrelated per-group average, exact integers)
# ---------------------------------------------------------------------------


@register(
    "tpch_q17_small_quantity",
    oracle="""
WITH brand AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
),
stats AS (
  SELECT l_partkey AS sk,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
         count(*) AS n
  FROM brand GROUP BY l_partkey
)
SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) // 7
         AS BIGINT) AS avg_yearly_cents
FROM brand JOIN stats ON l_partkey = sk
WHERE CAST(l_quantity AS BIGINT) * 5 * n < qty_sum
""",
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from orders of less than 20% of a part's average
    quantity — the correlated-aggregate shape, decorrelated into a per-part
    stats aggregate joined back.

    The ``qty < 0.2·avg(qty)`` comparison is rewritten as the pure-integer
    cross-multiplication ``5·qty·n < Σqty`` (quantities are whole numbers),
    so row membership can never flip on a float boundary between engines.

    Scale: the brand filter shrinks part to a broadcast dim BEFORE lineitem
    is touched; the stats aggregate and the join-back share the same partkey
    hash partitioning (one shuffle, reused); output is one row."""
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    brand = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    stats = brand.groupBy(F.col("l_partkey").alias("sk")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        brand.join(stats, F.col("l_partkey") == F.col("sk"))
        .where(F.col("l_quantity").cast("long") * 5 * F.col("n") < F.col("qty_sum"))
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("total_cents"))
        .select(
            "total_cents",
            F.expr("total_cents DIV 7").alias("avg_yearly_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (having-sum semi-join)
# ---------------------------------------------------------------------------


@register(
    "tpch_q18_large_volume",
    oracle="""
WITH big AS (
  SELECT l_orderkey AS bk, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 150
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big JOIN orders ON bk = o_orderkey
         JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: the 100 biggest orders above a total-quantity threshold —
    the HAVING-sum subquery shape (threshold 150 at this generator's ~4
    lines/order; TPC-H's 300 assumes 7).

    Scale: the quantity rollup collapses lineitem to order grain with
    map-side partials before its one shuffle; the surviving keys (a tiny
    fraction) drive the joins, and the final top-100 plans as
    TakeOrderedAndProject. Deterministic tiebreak on o_orderkey."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("bk") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (anti-join + scalar-aggregate gate)
# ---------------------------------------------------------------------------


@register(
    "tpch_q22_sales_opportunity",
    oracle="""
WITH pos AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pos,
         CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM customer WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > 0
),
elig AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
  FROM customer, pos
  WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * n_pos > sum_cents
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
FROM elig JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
GROUP BY n_name
""",
)
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: nations' wealthy-but-lapsed customers — above-average
    positive balance (scalar-aggregate gate) with no order in the data's
    final year (anti-join; "no orders ever" is vacuous under this generator
    — every customer orders — so the recency cutoff keeps the anti-join
    doing real work), grouped by nation (phone-prefix grouping adapted to
    nation; the schema has no phone column).

    The above-average test runs in exact cents via cross-multiplication
    (``bal_cents·n > Σcents``), so no float-average boundary can disagree
    between engines. The positive-balance gate is the SAME cents
    expression on both sides (``floor(bal*100+0.5) > 0``) — definitional
    parity, not dependent on the generator emitting 2-decimal balances.

    Scale: the positive-balance average is ONE scalar row broadcast into the
    customer scan (bounded model state, no collect of data rows); the
    lapsed check is a left-anti shuffle join on custkey against the orders
    key column only (the date filter pushes into the orders scan before the
    shuffle); nation broadcasts."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _cents(F.col("c_acctbal")).alias("bal_cents")
    )
    pos = (
        cust.where(F.col("bal_cents") > 0)
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum("bal_cents").alias("sum_cents"),
        )
        .withColumn("k", F.lit(1))
    )
    elig = (
        cust.withColumn("k", F.lit(1))
        .join(F.broadcast(pos), "k")
        .where(F.col("bal_cents") * F.col("n_pos") > F.col("sum_cents"))
        .select("c_custkey", "c_nationkey", "bal_cents")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-07-01")
        .select("o_custkey")
    )
    nation = _t(spark, sf_dir, "nation")
    return (
        elig.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").alias("totacctbal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute join predicate)
# ---------------------------------------------------------------------------


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25
        AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35
        AND l_quantity BETWEEN 20 AND 30))
""",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three OR-ed (brand, size-range,
    quantity-range) branches — the disjunctive join-predicate shape that
    punishes planners which can't separate the common equi-key from the
    per-branch residuals (a naive evaluation becomes a cartesian filter).

    Written as one declared disjunction, NOT pre-split unions: Catalyst
    extracts ``p_partkey = l_partkey`` as the hash-join key, derives the
    implied single-side constraints (brand IN-list + size bound on the
    part scan, quantity bound on the lineitem scan — constraint
    propagation through the OR), and evaluates the three-branch residual
    in the join stage. Filtered part broadcasts; lineitem never shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(1, 35)
            & q.between(20, 30)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg(
            F.sum(_rev_cents()).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated-min subquery, decorrelated)
# ---------------------------------------------------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eursup AS (
  SELECT s_suppkey, s_name, n_name,
         CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
  FROM supplier, nation, region
  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    AND r_name = 'EUROPE'),
cand AS (
  SELECT p_partkey, p_brand, s_name, n_name, bal_cents
  FROM ps
  JOIN part ON l_partkey = p_partkey
  JOIN eursup ON l_suppkey = s_suppkey
  WHERE p_type = 'STANDARD' AND p_size <= 5),
mn AS (SELECT p_partkey AS pk, min(bal_cents) AS min_bal
       FROM cand GROUP BY p_partkey)
SELECT p_partkey, p_brand, s_name, n_name, bal_cents
FROM cand JOIN mn ON p_partkey = pk AND bal_cents = min_bal
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted: cheapest qualifying supplier per part — the
    correlated ``= (SELECT min(..) .. WHERE correlated)`` pattern,
    decorrelated into a grouped min joined back on equality. The generator
    has no partsupp table, so the part–supplier relation derives from
    lineitem (``DISTINCT (l_partkey, l_suppkey)``) and supplier account
    balance stands in for supply cost; ties at the minimum return every
    tied supplier, exactly like the original.

    Scale: the pair-derivation distinct is ONE shuffle on a two-long key;
    the region-filtered supplier dim and the size/type-filtered part dim
    both broadcast; the grouped min and the join-back reuse the same
    partkey partitioning (AQE coalesces); the min table is keys+one long,
    never wide rows."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eursup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name", _cents(F.col("s_acctbal")).alias("bal_cents"))
    )
    parts = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 5))
        .select("p_partkey", "p_brand")
    )
    cand = pairs.join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    ).join(F.broadcast(eursup), F.col("l_suppkey") == F.col("s_suppkey"))
    mn = cand.groupBy(F.col("p_partkey").alias("pk")).agg(
        F.min("bal_cents").alias("min_bal")
    )
    return cand.join(
        mn, (F.col("p_partkey") == F.col("pk")) & (F.col("bal_cents") == F.col("min_bal"))
    ).select("p_partkey", "p_brand", "s_name", "n_name", "bal_cents")


# ---------------------------------------------------------------------------
# Q3 — shipping priority (deterministic top-10)
# ---------------------------------------------------------------------------


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS revenue_cents,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-revenue top-10 per order for one market segment
    (o_shippriority is absent from the generator; o_orderpriority carries
    the same role in the output). The LIMIT boundary is made deterministic
    by the (revenue DESC, orderkey ASC) total order — both engines return
    the identical 10 rows, not an arbitrary tie cut.

    Scale: segment-filtered customer broadcasts into the orders scan (both
    date filters push to parquet); the only big shuffle is
    lineitem⋈orders on orderkey; the top-10 runs as
    TakeOrderedAndProject — per-partition heaps, 10 rows to the driver,
    never a global sort."""
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (correlated EXISTS → semi join)
# ---------------------------------------------------------------------------


@register(
    "tpch_q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
""",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority distribution of orders with at least one
    late line — a correlated EXISTS whose predicate references BOTH sides
    (l_shipdate vs o_orderdate + 90 days; the generator lacks
    commit/receipt dates, so ship-lag beyond 90 days is the lateness
    test). Spark plans it as a left-semi join with the cross-side residual
    in the join condition, deduplicating matches for free.

    Scale: semi join shuffles only (orderkey, orderdate) against
    (orderkey, shipdate) — two columns a side; the half-year filter pushes
    into the orders scan before its shuffle; the final agg is 5 groups
    with map-side partials."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    waiting = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return waiting.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan-aggregate)
# ---------------------------------------------------------------------------


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT))
         AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: discount-revenue forecast — the canonical pure
    scan-aggregate, zero joins. Exists to pin the *minimal* plan: all four
    predicates and both referenced columns must reach the parquet scan
    (PushedFilters + 4-column ReadSchema), one whole-stage-codegen span,
    one exchange carrying exactly one partial-agg row per task. If this
    query ever shuffles data rows, scan pushdown broke.

    The discount band compares the stored double against the same literals
    in both engines — no epsilon, no rounding ambiguity — and revenue
    quantizes to integer cents per row before the order-free sum."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue_cents"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (name-LIKE dim filter, 4-way join, year rollup)
# ---------------------------------------------------------------------------


@register(
    "tpch_q9_product_profit",
    oracle=f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum({_REV_CENTS_SQL}
                - CAST(l_quantity AS BIGINT)
                  * CAST(floor(p_retailprice * 60 + 0.5) AS BIGINT))
         AS BIGINT) AS profit_cents
FROM part, lineitem, supplier, orders, nation
WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%red%'
GROUP BY 1, 2
""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on a product line, by supplier nation and order
    year. The generator has no partsupp, so unit supply cost is modeled as
    60% of the part's retail price quantized to cents — keeping Q9's
    defining feature: the profit expression mixes columns from THREE
    tables (lineitem price/discount/quantity, part cost, via the join),
    so no single-table pre-aggregation is possible and the optimizer must
    order a 4-way join under a non-selective LIKE dim filter.

    Scale: the LIKE-filtered part and the supplier→nation chain broadcast;
    lineitem⋈orders on orderkey is the one big shuffle (orders prunes to
    two columns); per-(nation, year) partial aggregation collapses
    everything map-side after the joins."""
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select(
            "p_partkey",
            # exactly the oracle's expression (p*60, NOT p*0.6*100 — those
            # differ in the last ulp and can flip the floor at .5 boundaries)
            F.floor(F.col("p_retailprice") * 60 + F.lit(0.5))
            .cast("long")
            .alias("cost_unit_cents"),
        )
    )
    nation = _t(spark, sf_dir, "nation")
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    profit = _rev_cents() - F.col("l_quantity").cast("long") * F.col("cost_unit_cents")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).alias("profit_cents"))
    )


# ---------------------------------------------------------------------------
# Q11 — important part values (scalar-aggregate threshold over a grouped agg)
# ---------------------------------------------------------------------------


@register(
    "tpch_q11_important_parts",
    oracle=f"""
WITH v AS (
  SELECT l_partkey, CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS value_cents
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_7'
  GROUP BY l_partkey),
t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM v)
SELECT l_partkey, value_cents
FROM v, t
WHERE value_cents * 1000 > total_cents
""",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts representing a significant share of one nation's
    traded value — a HAVING threshold computed by an uncorrelated scalar
    subquery over the SAME grouped aggregate. No partsupp in this
    generator, so value is discounted lineitem revenue through that
    nation's suppliers. The share test is integer cross-multiplication
    (``value·1000 > total``), never a float fraction.

    Scale: the nation-filtered supplier dim broadcasts into the lineitem
    scan; ONE shuffle groups by partkey; the grouped result is computed
    once, its grand total reduces to a single row broadcast back via a
    literal key (bounded model state — Q22's pattern), so the threshold
    probe is map-side over the already-materialized aggregate, not a
    recompute."""
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    v = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev_cents()).alias("value_cents"))
    )
    total = v.agg(F.sum("value_cents").alias("total_cents")).withColumn("k", F.lit(1))
    return (
        v.withColumn("k", F.lit(1))
        .join(F.broadcast(total), "k")
        .where(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select("l_partkey", "value_cents")
    )


# ---------------------------------------------------------------------------
# Q12 — late-shipment priority split (join + conditional counts)
# ---------------------------------------------------------------------------


@register(
    "tpch_q12_late_priority",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
""",
)
def tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: how many critical- vs normal-priority orders ride on late
    lines (the generator has no shipmode/commit/receipt columns, so the
    3-value l_returnflag is the line-grain category and ship-lag > 60 days
    the lateness test — the shape Q12 exercises survives: a fact–fact join
    whose residual compares columns across the join, feeding paired
    conditional counts).

    Scale: both l_shipdate range filters push to parquet before the one
    orderkey shuffle; orders prunes to three columns; the conditional
    counts are map-side partials into 3 groups."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar max over a derived revenue view)
# ---------------------------------------------------------------------------


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey),
m AS (SELECT max(total_revenue_cents) AS mx FROM rev)
SELECT s_suppkey, s_name, total_revenue_cents
FROM supplier, rev, m
WHERE s_suppkey = supplier_no AND total_revenue_cents = mx
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the quarter's top revenue supplier — the original's
    CREATE VIEW + scalar max + join-back, expressed as one plan. Integer
    cents make the max unambiguous; ties (impossible to rule out) return
    every tied supplier, as the original does.

    Scale: ONE shuffle groups lineitem by suppkey (the quarter filter
    pushes to parquet first); the max reduces the grouped result to a
    single broadcast row (Q22's literal-key pattern); supplier joins
    broadcast. The revenue view is computed once — threshold probe and
    join-back both run over the materialized aggregate."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_cents()).alias("total_revenue_cents")
    )
    mx = rev.agg(F.max("total_revenue_cents").alias("mx")).withColumn("k", F.lit(1))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn("k", F.lit(1))
        .join(F.broadcast(mx), "k")
        .where(F.col("total_revenue_cents") == F.col("mx"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier counts by part attributes (NOT-IN → broadcast anti join)
# ---------------------------------------------------------------------------


@register(
    "tpch_q16_part_supplier_counts",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def tpch_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many suppliers can provide parts of given
    brand/type/size combos, excluding a blacklist — the NOT-IN subquery
    planned as an anti join (safe here: s_suppkey is never NULL, so NOT-IN
    and anti-join semantics coincide; the original's complaint-comment
    blacklist is adapted to negative account balance). Part–supplier
    pairs derive from lineitem, as in Q2.

    Scale: the blacklist is a handful of keys — broadcast anti join, no
    shuffle for the exclusion; the pair-distinct and the count-distinct
    share the (partkey, suppkey) grain, so Catalyst plans one exchange for
    both; the 8-value size IN and the two <> filters push into the
    broadcast part dim before it ships."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    parts = (
        _t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#13")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        pairs.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — dominant-share suppliers (nested aggregation → threshold join)
# ---------------------------------------------------------------------------


@register(
    "tpch_q20_dominant_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_ps
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'SMALL'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey),
tot AS (SELECT l_partkey AS pk, CAST(sum(qty_ps) AS BIGINT) AS qty_p
        FROM shipped GROUP BY l_partkey)
SELECT DISTINCT s_suppkey, s_name, n_name
FROM shipped
JOIN tot ON l_partkey = pk
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE qty_ps * 4 > qty_p
""",
)
def tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers positioned to promote a product line — the
    original's ``availqty > 0.5·shipped`` correlated threshold, adapted
    (no partsupp/availqty) to "supplier shipped >25% of the part's yearly
    volume": a nested aggregation at two grains of the SAME relation,
    thresholded by integer cross-multiplication, then semi-deduplicated
    into a supplier list.

    Scale: the type-filtered part dim broadcasts into the year-pruned
    lineitem scan; the (partkey, suppkey) rollup is the one data shuffle;
    the per-part total regroups the already-collapsed rollup (tiny);
    quantities are integral by generator contract — pinned by casting
    BEFORE the sum so any future fractional row truncates identically in
    both engines."""
    part = (
        _t(spark, sf_dir, "part").where(F.col("p_type") == "SMALL").select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_ps"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty_ps").alias("qty_p")
    )
    nation = _t(spark, sf_dir, "nation")
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        shipped.join(tot, F.col("l_partkey") == F.col("pk"))
        .where(F.col("qty_ps") * 4 > F.col("qty_p"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS self-joins)
# ---------------------------------------------------------------------------


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 120 DAY)
SELECT s_name, n_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name, n_name
""",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers solely responsible for late finished orders —
    the suite's hardest shape: a fact joined against ITSELF twice, once as
    a positive EXISTS (some other supplier contributed to the order) and
    once as a negative NOT EXISTS (no other supplier was late), both with
    the inequality correlation ``l2.suppkey <> l1.suppkey``. Lateness is
    ship-lag > 120 days (no receipt/commit dates in this generator).

    Scale: the late set is computed ONCE and reused for both the probe
    side and the NOT-EXISTS side (the original scans lineitem three
    times); the semi and anti joins shuffle only (orderkey, suppkey)
    pairs, with the <> correlation as a join residual — never a
    cartesian; supplier→nation broadcasts onto the final 100-group agg."""
    orders_f = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    solely_late = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        ).join(
            late_others,
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    nation = _t(spark, sf_dir, "nation")
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        solely_late.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
