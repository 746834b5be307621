"""Golden-output tests from the reference's fixtures (FIXTURES.md §1-§4).

Mirrors ``CallsEnrichedAppTest.testJoin``
(``CallsEnrichedAppTest.java:82-157``) — the end-to-end topology run against
hand-built rows with golden assertions — plus the two cases the reference
never covers: the aggregation itself and the left join's null side.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_streams_rosetta_demo_spark.operators.joins import enrich_calls_with_customers
from kafka_streams_rosetta_demo_spark.operators.windowed_agg import (
    unwrap_window,
    windowed_call_agg,
)
from kafka_streams_rosetta_demo_spark.schemas import CALLS_RAW, CUSTOMER_AGGREGATE


def _ts(h, m):
    return dt.datetime(2009, 1, 16, h, m, 0)


@pytest.fixture(scope="module")
def calls_fixture(spark):
    # FIXTURES.md §1 — 5 calls in one window for one caller (golden aggregate
    # count=5/max=3/total=12/avg=2, CallsEnrichedAppTest.java:118-121), a
    # caller with no customer row, and the next window.
    rows = [
        ("600000000", 3, _ts(16, 32)),
        ("600000000", 2, _ts(16, 40)),
        ("600000000", 3, _ts(16, 45)),
        ("600000000", 2, _ts(16, 50)),
        ("600000000", 2, _ts(16, 55)),
        ("611111111", 7, _ts(16, 33)),
        ("600000000", 9, _ts(17, 5)),
    ]
    return spark.createDataFrame(rows, CALLS_RAW)


@pytest.fixture(scope="module")
def customers_fixture(spark):
    # FIXTURES.md §3 — the single customer from CallsEnrichedAppTest.java:104-112.
    rows = [(None, "600000000", "0000000R", 0, 0, "", "")]
    return spark.createDataFrame(rows, CUSTOMER_AGGREGATE)


def test_windowed_agg_golden(calls_fixture):
    agg = unwrap_window(windowed_call_agg(calls_fixture))
    got = {
        (r["id_telef_origen"], r["window_start"]): (
            r["calls_count"],
            r["max_duracion_origen"],
            r["total_duracion_origen"],
            r["avg_duracion_origen"],
        )
        for r in agg.collect()
    }
    # the intended-semantics golden aggregate (CallsEnrichedAppTest.java:118-121)
    assert got[("600000000", _ts(16, 0))] == (5, 3, 12, 2)
    assert got[("611111111", _ts(16, 0))] == (1, 7, 7, 7)
    assert got[("600000000", _ts(17, 0))] == (1, 9, 9, 9)
    assert len(got) == 3


def test_enriched_join_golden(calls_fixture, customers_fixture):
    agg = unwrap_window(windowed_call_agg(calls_fixture))
    out = enrich_calls_with_customers(agg, customers_fixture)
    rows = {(r["id_telef_origen"], r["window_start_ts"]): r.asDict() for r in out.collect()}

    # matched side — CallsEnrichedAppTest.java:124-138 golden record
    m = rows[("600000000", "16/01/2009 16:00")]
    assert m["window_end_ts"] == "16/01/2009 17:00"
    assert (m["calls_count"], m["max_duracion_origen"]) == (5, 3)
    assert (m["total_duracion_origen"], m["avg_duracion_origen"]) == (12, 2)
    assert m["doc_cliente"] == "0000000R"
    assert m["cliente_orange"] == 0 and m["days_excliente"] == 0
    assert m["operador_actual"] == "" and m["riesgo"] == ""

    # null side — untested in the reference (CallCustomerJoiner.java:24-28)
    n = rows[("611111111", "16/01/2009 16:00")]
    assert n["doc_cliente"] == "Unknown"
    assert n["cliente_orange"] == 0 and n["days_excliente"] == 0
    assert n["operador_actual"] == "Unknown" and n["riesgo"] == "Unknown"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "doc_cliente" in df.columns and "window_start_ts" in df.columns


def test_filter_not_null(spark):
    from kafka_streams_rosetta_demo_spark.operators.rekey import filter_not_null

    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, v string")
    assert filter_not_null(df, "v").count() == 1
