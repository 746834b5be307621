"""Batch source/sink format surface: JSON/CSV round-trips with explicit
schemas, permissive corrupt-line policy, and the sharded parquet writer's
layout guarantees (file count, colocation, determinism)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from kafka_streams_rosetta_demo_spark.sources.formats import (
    read_table,
    shard_column,
    write_sharded_parquet,
    write_table,
)
from kafka_streams_rosetta_demo_spark.sources.parquet import load_table


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_avro_round_trip_preserves_rows(spark, sf_smoke, tmp_path):
    """Genuine JVM Avro container files via the FQCN file format (the short
    name needs the absent spark-avro DataSourceRegister), readable back
    with the same explicit schema AND by the jar-less pure-Python OCF
    reader — the batch twin of the reference's Avro topic values."""
    from kafka_streams_rosetta_demo_spark.streaming.avro_codec import read_ocf

    nation = load_table(spark, sf_smoke, "nation")
    path = str(tmp_path / "nation_avro")
    write_table(nation.coalesce(1), path, "avro")
    back = read_table(spark, path, nation.schema, "avro")
    cols = nation.columns
    assert _sorted_rows(back, cols) == _sorted_rows(nation, cols)

    # cross-check with the standalone codec (JVM default codec is snappy,
    # which needs a native lib — rewrite uncompressed for the Python read)
    spark.conf.set("spark.sql.avro.compression.codec", "uncompressed")
    try:
        write_table(nation.coalesce(1), path, "avro")
    finally:
        spark.conf.unset("spark.sql.avro.compression.codec")
    (part,) = glob.glob(f"{path}/part-*.avro")
    _, recs = read_ocf(part)
    got = sorted(tuple(r[c] for c in cols) for r in recs)
    assert got == _sorted_rows(nation, cols)


def test_avro_reader_schema_projects_columns(spark, sf_smoke, tmp_path):
    """Schema-on-read with a NARROWER reader schema must project (Avro
    reader schema resolution) — the column-pruning contract every other
    format surface honors."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    nation = load_table(spark, sf_smoke, "nation")
    path = str(tmp_path / "nation_avro_proj")
    write_table(nation, path, "avro")
    narrow = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
        ]
    )
    back = read_table(spark, path, narrow, "avro")
    assert back.columns == ["n_nationkey", "n_name"]
    assert _sorted_rows(back, back.columns) == _sorted_rows(
        nation.select("n_nationkey", "n_name"), ["n_nationkey", "n_name"]
    )


def test_orc_round_trip_preserves_rows(spark, sf_smoke, tmp_path):
    nation = load_table(spark, sf_smoke, "nation")
    path = str(tmp_path / "nation_orc")
    write_table(nation, path, "orc")
    back = read_table(spark, path, nation.schema, "orc")
    cols = nation.columns
    assert _sorted_rows(back, cols) == _sorted_rows(nation, cols)


def test_json_round_trip_preserves_rows(spark, sf_smoke, tmp_path):
    nation = load_table(spark, sf_smoke, "nation")
    path = str(tmp_path / "nation_json")
    write_table(nation, path, "json")
    back = read_table(spark, path, nation.schema, "json")
    cols = nation.columns
    assert _sorted_rows(back, cols) == _sorted_rows(nation, cols)


def test_csv_round_trip_preserves_rows(spark, sf_smoke, tmp_path):
    # customer has strings with punctuation + doubles — the columns CSV
    # quoting/parsing actually gets wrong when it goes wrong.
    cust = load_table(spark, sf_smoke, "customer")
    path = str(tmp_path / "cust_csv")
    write_table(cust, path, "csv")
    back = read_table(spark, path, cust.schema, "csv")
    cols = cust.columns
    assert _sorted_rows(back, cols) == _sorted_rows(cust, cols)


def test_json_corrupt_line_yields_null_row_not_failure(spark, tmp_path):
    # Permissive read: a malformed line must become a null row (the batch
    # analog of LogAndContinueExceptionHandler), never a job failure.
    src = tmp_path / "events.json"
    src.write_text('{"k": "a", "v": 1}\n{not json at all\n{"k": "b", "v": 2}\n')
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([StructField("k", StringType()), StructField("v", LongType())])
    df = read_table(spark, str(src), schema, "json")
    rows = df.collect()
    assert len(rows) == 3
    good = [(r.k, r.v) for r in rows if r.k is not None]
    dropped = [r for r in rows if r.k is None and r.v is None]
    assert sorted(good) == [("a", 1), ("b", 2)]
    assert len(dropped) == 1  # observable drop count, S5-style


def test_sharded_write_layout_and_round_trip(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    n_shards = 8
    path = str(tmp_path / "docs_sharded")
    write_sharded_parquet(docs, path, key_col="doc_id", n_shards=n_shards,
                          sort_within=["doc_id"])

    # one directory per shard, exactly one parquet file in each
    shard_dirs = sorted(glob.glob(f"{path}/_shard=*"))
    assert len(shard_dirs) == n_shards
    for d in shard_dirs:
        assert len(glob.glob(f"{d}/*.parquet")) == 1

    back = spark.read.parquet(path)
    # rows survive intact and every row sits in the shard its key hashes to
    cols = docs.columns
    assert _sorted_rows(back, cols) == _sorted_rows(docs, cols)
    misplaced = back.where(
        F.col("_shard") != shard_column(F.col("doc_id"), n_shards)
    ).count()
    assert misplaced == 0


def test_shard_assignment_is_deterministic_and_balanced(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    n_shards = 8
    counts = (
        docs.groupBy(shard_column(F.col("doc_id"), n_shards).alias("s"))
        .count()
        .collect()
    )
    assert len(counts) == n_shards
    total = sum(r["count"] for r in counts)
    # md5 is uniform: no shard should exceed 2x the fair share even at sf0.001
    assert max(r["count"] for r in counts) <= 2 * total / n_shards


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_static_partition_pruning(spark, sf_smoke, tmp_path):
    # A literal predicate on the partition column must become a partition
    # filter (directory-level skip), not a row filter after a full scan.
    from kafka_streams_rosetta_demo_spark.sources.formats import (
        write_partitioned_parquet,
    )

    orders = load_table(spark, sf_smoke, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "orders_by_month")
    write_partitioned_parquet(orders, path, ["o_month"], sort_within=["o_orderkey"])

    # layout: one directory per month, exactly one file in each (the
    # repartition-by-partition-col contract — no small-file explosion)
    month_dirs = sorted(glob.glob(f"{path}/o_month=*"))
    assert month_dirs
    assert all(len(glob.glob(f"{d}/*.parquet")) == 1 for d in month_dirs)

    fact = spark.read.parquet(path)
    target = sorted(d.rsplit("=", 1)[1] for d in month_dirs)[0]
    q = fact.where(F.col("o_month") == target)
    plan = _executed_plan(q)
    assert "PartitionFilters" in plan and f"o_month#" in plan.split("PartitionFilters")[1][:120]
    expected = orders.where(F.col("o_month") == target).count()
    assert q.count() == expected


def test_partitioned_join_dynamic_partition_pruning(spark, sf_smoke, tmp_path):
    # Joining the partitioned fact to a *filtered* dimension must prune the
    # fact scan at runtime (dynamicpruningexpression reusing the dim's
    # broadcast) — the scan-avoidance path that makes a 100 TB star join
    # read only the qualifying partitions.
    from kafka_streams_rosetta_demo_spark.sources.formats import (
        write_partitioned_parquet,
    )

    orders = load_table(spark, sf_smoke, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "orders_by_month_dpp")
    write_partitioned_parquet(orders, path, ["o_month"])
    fact = spark.read.parquet(path)

    dim = (
        fact.select("o_month").distinct()
        .withColumn("mm", F.substring("o_month", 6, 2))
    )
    j = (
        fact.join(F.broadcast(dim.where(F.col("mm") == "03")), "o_month")
        .groupBy("o_month")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "dynamicpruningexpression" in _executed_plan(j)
    got = {r["o_month"]: r["n"] for r in j.collect()}
    exp = {
        r["o_month"]: r["n"]
        for r in orders.where(F.substring("o_month", 6, 2) == "03")
        .groupBy("o_month")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp


def _rowgroup_prune_fraction(path, col_a, lo_a, hi_a, col_b, lo_b, hi_b):
    """Fraction of parquet row groups whose min/max stats let a reader SKIP
    them for the box predicate a in [lo_a, hi_a] AND b in [lo_b, hi_b] —
    exactly the footer-stats test a scan performs."""
    import glob as _glob

    import pyarrow.parquet as pq

    total = skipped = 0
    for f in _glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = md.schema.names
        ia, ib = names.index(col_a), names.index(col_b)
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sa, sb = g.column(ia).statistics, g.column(ib).statistics
            total += 1
            if sa.max < lo_a or sa.min > hi_a or sb.max < lo_b or sb.min > hi_b:
                skipped += 1
    assert total > 0
    return skipped / total


def test_zorder_layout_prunes_box_predicates_on_both_dims(spark, sf_smoke, tmp_path):
    """Z-order clustering must make row-group min/max stats selective on
    BOTH keyed columns: for a small 2-D box predicate, most row groups of
    the z-ordered layout are skippable, while a layout sorted on an
    unrelated column skips (nearly) none. Pinned on the actual parquet
    footers, not plan text."""
    from kafka_streams_rosetta_demo_spark.sources.formats import (
        write_zordered_parquet,
    )

    ev = load_table(spark, sf_smoke, "events").select("event_id", "user_id", "value")
    zpath = str(tmp_path / "z")
    # granularity comes from file count (each file = one curve segment /
    # one row group at this scale); 32 files ~ a 32-cell space partition
    write_zordered_parquet(ev, zpath, ["user_id", "value"], n_files=32)
    upath = str(tmp_path / "u")
    ev.repartition(32).sortWithinPartitions("event_id").write.mode(
        "overwrite"
    ).parquet(upath)

    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    umin, umax, vmin, vmax = stats
    # a ~1/16-area box in the middle of the domain
    lo_u = umin + (umax - umin) * 0.4
    hi_u = umin + (umax - umin) * 0.65
    lo_v = vmin + (vmax - vmin) * 0.4
    hi_v = vmin + (vmax - vmin) * 0.65
    z_skip = _rowgroup_prune_fraction(zpath, "user_id", lo_u, hi_u, "value", lo_v, hi_v)
    u_skip = _rowgroup_prune_fraction(upath, "user_id", lo_u, hi_u, "value", lo_v, hi_v)
    assert z_skip > u_skip, (z_skip, u_skip)
    assert z_skip >= 0.5, f"z-order skipped only {z_skip:.0%} of row groups"


def test_compact_parquet_collapses_small_files(spark, sf_smoke, tmp_path):
    """A 64-file micro-batch-style layout must compact to the byte-sized
    target file count with identical content. Target is set to half the
    input bytes so the expected count (2) is size-derived, not hardcoded
    behavior."""
    from kafka_streams_rosetta_demo_spark.sources.formats import compact_parquet
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    docs = load_table(spark, sf_smoke, "documents")
    docs.repartition(64).write.parquet(src)
    import os

    n_small = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_small == 64
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    n = compact_parquet(spark, src, out, target_file_bytes=total // 2 + 1)
    n_out = sum(f.endswith(".parquet") for f in os.listdir(out))
    assert n == n_out == 2
    a = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    b = sorted(r.doc_id for r in docs.collect())
    assert a == b


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Lakehouse schema evolution: a later ingest batch adds a column; a
    mergeSchema read must surface the union schema with nulls for the old
    files — the behavior a 100 TB append-only corpus relies on when a new
    metadata field lands mid-history. Also pins the default (no-merge)
    read serving the FIRST footer's schema, which is why the engine's
    sources always pass an explicit schema or opt into merging."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    ).write.mode("overwrite").parquet(p)
    spark.range(5, 8).select(
        F.col("id").alias("doc_id"),
        F.lit("de").alias("lang"),
        F.lit(0.9).alias("quality"),
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"doc_id", "lang", "quality"}
    assert merged.count() == 8
    assert merged.where(F.col("quality").isNull()).count() == 5
    rows = {r.doc_id: r.quality for r in merged.collect()}
    assert rows[6] == 0.9 and rows[1] is None


def test_parquet_merge_schema_absorbs_column_add(spark, tmp_path):
    """Schema drift across snapshot generations: an old file without a
    column and a new file with it must read as the UNION schema under
    mergeSchema, the old rows NULL-filled — the 100 TB landing-zone
    contract where a column addition must not force a historical rewrite.
    Default reads (no mergeSchema) pick one footer; never rely on that."""
    old = str(tmp_path / "gen" / "old.parquet")
    new = str(tmp_path / "gen" / "new.parquet")
    spark.range(3).selectExpr("id AS doc_id", "id * 10 AS n_chars").coalesce(
        1
    ).write.parquet(old)
    spark.range(3, 6).selectExpr(
        "id AS doc_id", "id * 10 AS n_chars", "'en' AS lang"
    ).coalesce(1).write.parquet(new)

    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")  # generations live in subdirs
        .parquet(str(tmp_path / "gen"))
    )
    assert sorted(f.name for f in merged.schema.fields) == [
        "doc_id",
        "lang",
        "n_chars",
    ]
    rows = {r.doc_id: (r.n_chars, r.lang) for r in merged.collect()}
    assert rows[0] == (0, None) and rows[5] == (50, "en")
    # and the drifted column still filters/prunes: predicate on the new
    # column must not error on old files (NULL never matches)
    assert merged.where(F.col("lang") == "en").count() == 3
