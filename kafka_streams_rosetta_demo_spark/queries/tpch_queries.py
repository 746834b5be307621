"""TPC-H decision-support shapes (adapted) — relational stress queries.

The reference (a two-app Kafka Streams demo; see SURVEY.md §2.8 "explicitly
absent") has no multi-way join planner, no decorrelated subqueries, no
outer-join distributions. Spark has them all natively, so the engine declares
the classic TPC-H decision-support suite — adapted to the generator's schema
(no partsupp table, no comment/phone/container columns) — as first-class
oracle-backed queries. Each one exercises a distinct optimizer path the rest
of the registry doesn't cover at this composition depth: snowflake join
chains with residual cross-dimension equality (Q5), disjunctive join-pair
predicates (Q7), ratio-of-conditional-sums market share (Q8), left-outer
count distributions (Q13), decorrelated per-group averages (Q17), having-sum
semi-joins (Q18), and anti-join + scalar-aggregate gating (Q22).

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
    vol = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
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
