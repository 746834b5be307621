"""Property-based tests (hypothesis) for the stateful operator semantics.

The reference ships no randomized testing at all (SURVEY §5); these
properties pin the operators against tiny pure-Python models on adversarial
inputs hypothesis finds (empty groups, equal timestamps, gap-boundary
events, single-row windows) that the fixture data may never contain.
Sessions are scoped small (``max_examples`` low, one Spark job per example)
to keep the suite fast.
"""

from __future__ import annotations

import pytest
import datetime as dt
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_streams_rosetta_demo_spark.operators.joins import asof_join
from kafka_streams_rosetta_demo_spark.operators.state import latest_per_key
from kafka_streams_rosetta_demo_spark.operators.windowed_agg import (
    unwrap_window,
    windowed_call_agg,
)

BASE = dt.datetime(2024, 1, 1)

# (key, minutes-offset, duration) event tuples; offsets inside a few hours so
# windows collide; duplicate offsets are likely (equal-timestamp ties).
events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=300),
        st.integers(min_value=0, max_value=50),
    ),
    min_size=1,
    max_size=40,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (k, dur, BASE + dt.timedelta(minutes=m))
            for k, m, dur in rows
        ],
        "id_telef_origen string, duracion_origen long, event_ts timestamp",
    )


@given(rows=events_strategy)
@SETTINGS
def test_windowed_agg_matches_python_model(spark, rows):
    got = {
        (r.id_telef_origen, r.window_start): (
            r.calls_count,
            r.max_duracion_origen,
            r.total_duracion_origen,
            r.avg_duracion_origen,
        )
        for r in unwrap_window(windowed_call_agg(_df(spark, rows))).collect()
    }

    model: dict = defaultdict(list)
    for k, m, dur in rows:
        ts = BASE + dt.timedelta(minutes=m)
        win = ts.replace(minute=0, second=0, microsecond=0)
        model[(k, win)].append(dur)
    expected = {
        key: (len(ds), max(ds), sum(ds), sum(ds) // len(ds))
        for key, ds in model.items()
    }
    assert got == expected


@given(rows=events_strategy)
@SETTINGS
def test_latest_per_key_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [
            (k, BASE + dt.timedelta(minutes=m), i, float(dur))
            for i, (k, m, dur) in enumerate(rows)
        ],
        "k string, ts timestamp, seq long, v double",
    )
    got = {
        r.k: (r.last_ts, r.last_seq, r.last_v)
        for r in latest_per_key(df, "k", "ts", "seq", ["ts", "seq", "v"]).collect()
    }
    best: dict = {}
    for i, (k, m, dur) in enumerate(rows):
        ts = BASE + dt.timedelta(minutes=m)
        cand = (ts, i, float(dur))
        if k not in best or (cand[0], cand[1]) > (best[k][0], best[k][1]):
            best[k] = cand
    assert got == best


@given(rows=events_strategy)
@SETTINGS
def test_asof_join_matches_python_model(spark, rows):
    """Probe = every event; ref = events with even seq. The carry-forward
    implementation must agree with the obvious quadratic model, including
    equal-timestamp ties (ref at probe ts counts; max (ts, seq) wins)."""
    tagged = [
        (k, BASE + dt.timedelta(minutes=m), i, float(dur))
        for i, (k, m, dur) in enumerate(rows)
    ]
    df = spark.createDataFrame(tagged, "k string, ts timestamp, seq long, v double")
    probe = df.select("k", "ts", "seq")
    ref = df.where("seq % 2 = 0").select("k", "ts", "seq", "v")
    out = {
        r.seq: (r.asof_seq, r.asof_v)
        for r in asof_join(
            probe, ref, key="k", ts_col="ts", seq_col="seq", ref_value_cols=["seq", "v"]
        ).collect()
    }
    refs = [t for t in tagged if t[2] % 2 == 0]
    for k, ts, seq, _v in tagged:
        matches = [r for r in refs if r[0] == k and r[1] <= ts]
        want = max(matches, key=lambda r: (r[1], r[2]), default=None)
        got = out[seq]
        if want is None:
            assert got == (None, None), seq
        else:
            assert got == (want[2], want[3]), seq


def test_salted_join_equals_plain_join(spark):
    """salted_equi_join must be answer-identical to the plain equi-join for
    inner AND left shapes — including unmatched probe keys (which must
    still null-extend, not vanish) and varying salt widths."""
    from kafka_streams_rosetta_demo_spark.operators.joins import salted_equi_join

    left = spark.createDataFrame(
        [(k, v) for k in ("hot", "hot", "hot", "cold", "orphan") for v in range(3)],
        "k string, v long",
    )
    right = spark.createDataFrame(
        [("hot", 1.5), ("cold", 2.5), ("unprobed", 9.9)], "k string, w double"
    )
    for salt in (1, 4, 7):
        for how in ("inner", "left"):
            plain = sorted(map(tuple, left.join(right, "k", how).collect()))
            salted = sorted(
                map(tuple, salted_equi_join(left, right, "k", salt=salt, how=how).collect())
            )
            assert salted == plain, (salt, how)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=25
    )
)
@SETTINGS
@pytest.mark.slow  # full-suite lane: r15 fast lane must fit the driver's verify window
def test_keep_best_survivors_matches_python_model(spark, edges):
    """connected_components → keep_best_survivors must agree with a
    union-find + per-component argmax model on arbitrary small graphs,
    including quality ties (smaller id wins) and singleton-free inputs."""
    from hypothesis import assume

    from kafka_streams_rosetta_demo_spark.operators.graph import (
        connected_components,
        keep_best_survivors,
    )

    edges = [(a, b) for a, b in edges if a != b]
    assume(edges)
    nodes = sorted({n for e in edges for n in e})
    qmap = {n: (n * 37) % 11 for n in nodes}  # deterministic, collision-rich
    edf = spark.createDataFrame(edges, "src long, dst long")
    qdf = spark.createDataFrame(list(qmap.items()), "doc_id long, n_chars long")
    labels = connected_components(edf)
    got = {
        r.cluster_id: (r.n_members, r.keep_doc_id, r.keep_quality)
        for r in keep_best_survivors(labels, qdf).collect()
    }

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # root stays the min id
    comps = defaultdict(list)
    for n in nodes:
        comps[find(n)].append(n)
    want = {}
    for root, members in comps.items():
        best = max(members, key=lambda n: (qmap[n], -n))
        want[min(members)] = (len(members), best, qmap[best])
    assert got == want


@given(
    word_lists=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=3, max_size=8),
        min_size=2,
        max_size=12,
    )
)
@SETTINGS
@pytest.mark.slow  # full-suite lane: r15 fast lane must fit the driver's verify window
def test_prefix_filter_cross_recall_property(spark, word_lists):
    """The cross-set prefix filter's recall guarantee must hold on arbitrary
    tiny-vocabulary corpora (worst case for prefix filtering: everything
    shares shingles), for every true probe-corpus pair at J >= t."""
    from kafka_streams_rosetta_demo_spark.operators.textsim import (
        prefix_filter_pairs_cross,
        with_shingles,
    )

    docs = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sh = with_shingles(df, k=3)
    got = {
        (r.id_a, r.id_b)
        for r in prefix_filter_pairs_cross(
            sh.where("doc_id % 2 = 0"), sh.where("doc_id % 2 = 1"), threshold=0.6
        ).collect()
    }
    sets = {
        i: {" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)}
        for i, ws in enumerate(word_lists)
    }
    for a in sets:
        for b in sets:
            if a % 2 == 0 and b % 2 == 1:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and inter / union >= 0.6:
                    assert (a, b) in got, (a, b)


# ---------------------------------------------------------------------------
# Multimodal batch functions: Arrow-level property tests (no Spark round
# trip per example — the mapInPandas bodies take plain pandas frames, so
# hypothesis can sweep payload shapes the parquet fixtures never produce:
# empty, sub-frame, sub-bucket, non-square).
# ---------------------------------------------------------------------------


@given(
    st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=8)
)
@settings(max_examples=60, deadline=None)
def test_frame_sample_batches_match_twin(payloads):
    import pandas as pd

    from kafka_streams_rosetta_demo_spark.operators.multimodal import (
        expected_frames,
        frame_sample_batches,
    )

    pdf = pd.DataFrame(
        {"doc_id": range(len(payloads)), "content": payloads}
    )
    (out,) = list(frame_sample_batches(iter([pdf])))
    got = [
        (int(r.doc_id), int(r.frame_idx), bytes(r.frame))
        for r in out.itertuples()
    ]
    expected = [
        f for i, p in enumerate(payloads) for f in expected_frames(i, p)
    ]
    assert got == expected


@given(
    st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=8)
)
@settings(max_examples=60, deadline=None)
def test_resample_batches_match_twin(payloads):
    import pandas as pd

    from kafka_streams_rosetta_demo_spark.operators.multimodal import (
        expected_resample,
        resample_batches,
    )

    pdf = pd.DataFrame(
        {"doc_id": range(len(payloads)), "content": payloads}
    )
    (out,) = list(resample_batches(iter([pdf])))
    got = [
        (int(r.doc_id), int(r.bucket), int(r.value)) for r in out.itertuples()
    ]
    expected = [
        (i, k, v)
        for i, p in enumerate(payloads)
        for k, v in expected_resample(p)
    ]
    assert got == expected


@given(
    st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=8)
)
@settings(max_examples=60, deadline=None)
def test_resize_batches_match_twin(payloads):
    import pandas as pd

    from kafka_streams_rosetta_demo_spark.operators.multimodal import (
        expected_resize,
        resize_batches,
    )

    pdf = pd.DataFrame(
        {"doc_id": range(len(payloads)), "content": payloads}
    )
    (out,) = list(resize_batches(iter([pdf])))
    got = {
        int(r.doc_id): (int(r.side), bytes(r.pixels)) for r in out.itertuples()
    }
    expected = {
        i: exp
        for i, p in enumerate(payloads)
        if (exp := expected_resize(p)) is not None
    }
    assert got == expected


# ---------------------------------------------------------------------------
# Round-5 operators: PageRank / triangles / CMS against pure-Python models
# ---------------------------------------------------------------------------

graph_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=8)
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


@given(pairs=graph_strategy)
@SETTINGS
@pytest.mark.slow  # full-suite lane: r15 fast lane must fit the driver's verify window
def test_pagerank_matches_python_model(spark, pairs):
    from kafka_streams_rosetta_demo_spark.operators.graph import pagerank

    und = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    edges = und + [(b, a) for a, b in und]
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    ranks = {n: 1_000_000_000 for n in deg}
    for _ in range(5):
        summed = defaultdict(int)
        for s, d in edges:
            summed[d] += ranks[s] // deg[s]
        ranks = {n: 150_000_000 + (85 * summed.get(n, 0)) // 100 for n in deg}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_scaled for r in pagerank(df).collect()}
    assert got == ranks


@given(pairs=graph_strategy)
@SETTINGS
def test_triangle_counts_match_python_model(spark, pairs):
    from itertools import combinations

    from kafka_streams_rosetta_demo_spark.operators.graph import triangle_counts

    und = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    eset = set(und)
    nodes = sorted({n for e in und for n in e})
    expected = defaultdict(int)
    for x, y, z in combinations(nodes, 3):
        if (x, y) in eset and (y, z) in eset and (x, z) in eset:
            expected[x] += 1
            expected[y] += 1
            expected[z] += 1

    df = spark.createDataFrame(und, "a long, b long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == dict(expected)


words_strategy = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=60
)


@given(words=words_strategy)
@SETTINGS
def test_cms_never_undercounts_property(spark, words):
    from collections import Counter

    from kafka_streams_rosetta_demo_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    items = spark.createDataFrame([(w,) for w in words], "word string")
    sketch = cms_build(items, "word", depth=2, width=16)  # tiny: force collisions
    keys = items.distinct()
    est = {
        r.word: r.cms_est for r in cms_estimate(sketch, keys, "word", depth=2, width=16).collect()
    }
    true = Counter(words)
    assert est.keys() == set(true)
    for w, n in true.items():
        assert est[w] >= n, f"CMS undercounted {w!r}: {est[w]} < {n}"


# ---------------------------------------------------------------------------
# Bloom filter: no false negatives, ever
# ---------------------------------------------------------------------------

keys_strategy = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=60,
)


@given(keys=keys_strategy)
@SETTINGS
@pytest.mark.slow  # full-suite lane: r15 fast lane must fit the driver's verify window
def test_bloom_prune_never_drops_a_member(spark, keys):
    """The property bloom pruning's exactness rests on: every key that went
    into the filter MUST pass the probe (false negatives impossible —
    including empty strings, unicode-boundary ASCII, duplicate keys). A
    hash-mismatch between build and probe sides (different seed, mask, or
    modulus) is exactly the bug class this catches."""
    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.operators.sketches import (
        bloom_build_words,
        bloom_prune,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    words = bloom_build_words(df, "k")
    kept = bloom_prune(df, F.col("k"), words).count()
    assert kept == len(keys), "bloom dropped a member key"


# ---------------------------------------------------------------------------
# Distributed global rank == naive total order
# ---------------------------------------------------------------------------

vals_strategy = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=50
)


@given(vals=vals_strategy)
@SETTINGS
@pytest.mark.slow  # full-suite lane: r15 fast lane must fit the driver's verify window
def test_global_rank_matches_sorted_order(spark, vals):
    """The offset-composition rank must equal the naive single-task total
    order for ANY input — duplicates (tiebreaker column), negatives,
    all-equal values, single rows. Catches off-by-one in the prefix-sum
    offsets and any rank/count layout mismatch (the bug class the internal
    localCheckpoint exists to prevent)."""
    from pyspark.sql import functions as F

    from kafka_streams_rosetta_demo_spark.operators.ordering import global_rank

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r.id: r.global_rank
        for r in global_rank(df, [F.col("v"), F.col("id")], n_partitions=4).collect()
    }
    expected = {
        i: rank + 1
        for rank, (v, i) in enumerate(sorted((v, i) for i, v in enumerate(vals)))
    }
    assert got == expected


# ---------------------------------------------------------------------------
# SCD2 point-in-time join vs a pure-Python model
# ---------------------------------------------------------------------------

scd2_events = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2"]),
        st.integers(min_value=0, max_value=120),  # minutes offset
        st.sampled_from(["status", "purchase"]),
    ),
    min_size=1,
    max_size=30,
)


@given(evs=scd2_events)
@SETTINGS
@pytest.mark.slow  # full-suite lane: r15 fast lane must fit the driver's verify window
def test_scd2_point_in_time_matches_python_model(spark, evs):
    """Half-open-interval semantics under adversarial inputs hypothesis
    likes: equal-timestamp version ties (earlier id gets the empty
    [ts, ts) window), purchases exactly ON a version boundary (belong to
    the NEW version), purchases before any version (null match), users
    with no versions at all."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [
        (i, u, BASE + dt.timedelta(minutes=m), typ)
        for i, (u, m, typ) in enumerate(evs)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp, event_type string")

    dim = (
        df.where(F.col("event_type") == "status")
        .select(
            "user_id",
            F.col("event_id").alias("status_id"),
            F.col("ts").alias("valid_from"),
        )
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                Window.partitionBy("user_id").orderBy("valid_from", "status_id")
            ),
        )
    )
    fact = df.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    cond = (
        (dim["user_id"] == fact["user_id"])
        & (fact["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (fact["ts"] < dim["valid_to"]))
    )
    got = {
        r.purchase_id: r.status_id
        for r in fact.join(dim, cond, "left")
        .select("purchase_id", "status_id")
        .collect()
    }

    # python model: versions sorted by (ts, id); purchase matches the last
    # version with valid_from <= ts whose successor (if any) is > ts
    versions: dict = {}
    for i, (u, m, typ) in enumerate(evs):
        if typ == "status":
            versions.setdefault(u, []).append((BASE + dt.timedelta(minutes=m), i))
    for u in versions:
        versions[u].sort()
    expected = {}
    for i, (u, m, typ) in enumerate(evs):
        if typ != "purchase":
            continue
        ts = BASE + dt.timedelta(minutes=m)
        match = None
        vs = versions.get(u, [])
        for j, (vf, vid) in enumerate(vs):
            vt = vs[j + 1][0] if j + 1 < len(vs) else None
            if ts >= vf and (vt is None or ts < vt):
                match = vid
        expected[i] = match
    assert got == expected


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),
            st.lists(st.sampled_from("abcd"), min_size=0, max_size=8),
        ),
        min_size=1,
        max_size=12,
    )
)
@SETTINGS
@pytest.mark.slow  # full-suite lane: r15 fast lane must fit the driver's verify window
def test_source_similarity_matches_python_set_model(spark, docs):
    """The source-bitmask Jaccard rollup must equal the naive per-source
    distinct-shingle set model on arbitrary tiny corpora — including docs
    too short to shingle, sources with empty shingle sets (they must not
    emit pairs with union 0), and fully-mirrored sources (ppm exactly
    1_000_000). The model hashes shingles with the same md5_long the
    engine ships on the wire, so the comparison is definitional."""
    import hashlib

    from kafka_streams_rosetta_demo_spark.operators.textsim import (
        source_similarity_matrix,
    )

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    df = spark.createDataFrame(
        [(s, " ".join(ws)) for s, ws in docs], "source string, text string"
    )
    got = {
        (r.source_a, r.source_b): (r.inter_shingles, r.union_shingles, r.jaccard_ppm)
        for r in source_similarity_matrix(df, k=3).collect()
    }

    sets: defaultdict[str, set] = defaultdict(set)
    for s, ws in docs:
        if len(ws) >= 3:
            sets[s] |= {h(" ".join(ws[j : j + 3])) for j in range(len(ws) - 2)}
    srcs = sorted({s for s, _ in docs})
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union:
                want[(a, b)] = (inter, union, inter * 1_000_000 // union)
    assert got == want


# ---------------------------------------------------------------------------
# bin_bucketed_range_join: equals the naive quadratic model on adversarial
# inputs (empty windows, bin-boundary times, windows spanning many bins,
# duplicate timestamps) the fixture data may never contain.
# ---------------------------------------------------------------------------

range_join_strategy = st.tuples(
    # windows: (id, start, length) — length 0 (empty), exactly one bin,
    # several bins; starts land on and off bin boundaries (bin width 100)
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=1000),
            st.sampled_from([0, 1, 99, 100, 101, 250, 400]),
        ),
        min_size=1,
        max_size=12,
    ),
    # probes: (id, t) with likely duplicates and boundary values
    st.lists(
        st.tuples(
            st.integers(min_value=100, max_value=120),
            st.integers(min_value=0, max_value=1400),
        ),
        min_size=1,
        max_size=25,
    ),
)


@given(data=range_join_strategy)
@SETTINGS
def test_bin_bucketed_range_join_matches_naive_model(spark, data):
    from kafka_streams_rosetta_demo_spark.operators.joins import (
        bin_bucketed_range_join,
    )

    windows, probes = data
    wdf = spark.createDataFrame(
        [(i, s, s + ln) for i, s, ln in windows], "win_id long, ws long, we long"
    )
    pdf = spark.createDataFrame(probes, "probe_id long, t long")
    got = sorted(
        (r["win_id"], r["ws"], r["probe_id"], r["t"])
        for r in bin_bucketed_range_join(wdf, pdf, "ws", "we", "t", 100).collect()
    )
    want = sorted(
        (wi, s, pi, t)
        for wi, s, ln in windows
        for pi, t in probes
        if s <= t < s + ln
    )
    assert got == want


@given(
    word_lists=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=10),
        min_size=2,
        max_size=8,
    ),
    run=st.lists(st.sampled_from("pqrstu"), min_size=6, max_size=9),
    data=st.data(),
)
@SETTINGS
def test_winnowing_guarantee_property(spark, word_lists, run, data):
    """The winnowing theorem on arbitrary corpora: plant a shared run of
    >= w + k - 1 = 6 words (from a vocabulary disjoint from the background
    docs) at a random position inside two random documents — the two MUST
    share at least one selected fingerprint, whatever surrounds the run.
    This is the match guarantee both winnowing screens rely on, pinned on
    the production operator over inputs the parquet fixtures never contain
    (empty docs, doc-sized runs, runs at either boundary)."""
    from kafka_streams_rosetta_demo_spark.operators.textsim import (
        winnow_fingerprints,
    )

    a_idx = data.draw(st.integers(0, len(word_lists) - 1))
    b_idx = data.draw(
        st.integers(0, len(word_lists) - 1).filter(lambda i: i != a_idx)
    )
    docs = []
    for i, ws in enumerate(word_lists):
        if i in (a_idx, b_idx):
            pos = data.draw(st.integers(0, len(ws)))
            ws = ws[:pos] + run + ws[pos:]
        docs.append((i, " ".join(ws)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=3, w=4)
    a = {r.f for r in fps.where(f"doc_id = {a_idx}").collect()}
    b = {r.f for r in fps.where(f"doc_id = {b_idx}").collect()}
    assert a & b, (
        f"docs {a_idx}/{b_idx} share a {len(run)}-word run but no fingerprint"
    )


# ---------------------------------------------------------------------------
# BPE train/encode parity: Python trainer vs the DuckDB oracle replay
# (round 10) — no Spark in the loop, so examples are cheap; the property
# pins the cross-engine determinism contract (arg-max tie-breaks, the
# single-pass fold, codepoint-level base symbols incl. non-ASCII) on
# adversarial vocabularies the corpus never contains.
# ---------------------------------------------------------------------------

# letters + digits + a few multi-byte codepoints (é ß 中) — UTF-8 byte
# order equals codepoint order, so Python tuple compare and DuckDB binary
# collation must tie-break merges identically even here.
_BPE_ALPHABET = "abcé ß中01"


word_counts_strategy = st.lists(
    st.tuples(
        st.text(
            alphabet=[c for c in _BPE_ALPHABET if c != " "],
            min_size=1,
            max_size=6,
        ),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(wc=word_counts_strategy)
@settings(max_examples=40, deadline=None)
def test_bpe_training_matches_duckdb_oracle_replay(wc):
    import duckdb

    from kafka_streams_rosetta_demo_spark.operators.bpe import (
        bpe_oracle_merge_table,
        bpe_oracle_with,
        bpe_oracle_word_tokens,
        encode_word,
        train_bpe,
    )

    n_merges = 8
    merges_py = train_bpe(wc, n_merges=n_merges)

    con = duckdb.connect()
    # one document per vocabulary word, repeated cnt times -> the oracle's
    # corpus word counts equal wc exactly
    con.execute("CREATE TABLE documents (text VARCHAR)")
    for w, c in wc:
        con.execute("INSERT INTO documents VALUES (?)", [" ".join([w] * c)])

    mt = con.execute(bpe_oracle_merge_table(n_merges)).fetchall()
    merges_sql = [(lhs, rhs) for _rank, lhs, rhs, _m in sorted(mt)]
    assert merges_sql == merges_py, (wc, merges_py, merges_sql)

    wt = dict(
        con.execute(
            f"WITH {bpe_oracle_with(n_merges)},\n"
            f"{bpe_oracle_word_tokens(n_merges)}\n"
            "SELECT word, n_toks FROM wt"
        ).fetchall()
    )
    for w, _ in wc:
        toks = encode_word(w, merges_py)
        assert "".join(toks) == w
        assert wt[w] == len(toks), (w, toks, wt[w], merges_py)


# ---------------------------------------------------------------------------
# DoReMi integer fit vs a float multiplicative-weights reference
# ---------------------------------------------------------------------------

# Domains are generated as (n_bigrams, avg nll per bigram) and multiplied
# into the fit's (n, nll_sum) form, so every example is physically shaped:
# a per-bigram average NLL cannot exceed ln(corpus bigrams) nats (~41 at
# 1e18 bigrams; 50 here for slack). The r14 envelope guard
# (DOREMI_EXCESS_SAFE_MICRO, operators/doremi.py) REFUSES excesses past
# ~4e9 micro-nats — the old unconstrained nll_sum strategy (1e13 on one
# bigram = a 1e13-micro-nat average) generated impossible inputs that now
# correctly trip the refusal; that refusal has its own cross-engine pin in
# test_round14_ops.py, and THIS property covers the fit inside the
# envelope.
doremi_domains_strategy = st.lists(
    st.tuples(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        st.integers(min_value=1, max_value=10**9),  # n_bigrams
        st.integers(min_value=0, max_value=50_000_000),  # avg nll micro/bigram
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
).map(lambda ds: [(s, n, n * avg) for s, n, avg in ds])


@given(domains=doremi_domains_strategy)
@settings(max_examples=120, deadline=None)
def test_doremi_integer_fit_tracks_float_reference(domains):
    """The ppm-quantized multiplicative-weights fit must (a) order final
    weights exactly like an un-quantized float implementation of the same
    linearized-Hedge update wherever the float weights are separated beyond
    quantization noise, (b) be monotone in excess (a strictly harder domain
    never ends lighter), and (c) keep the weights a smoothed
    sub-distribution (floor dust only ever loses mass; smoothing floors
    every domain above zero)."""
    from kafka_streams_rosetta_demo_spark.operators.doremi import (
        DOREMI_ETA_PPM,
        DOREMI_ITERS,
        DOREMI_SMOOTH_PPM,
        doremi_excess,
        doremi_fit,
    )

    excess, _, uniform = doremi_excess(domains)
    w_int = doremi_fit(domains)

    # float reference: same linear-payoff Hedge update, no quantization
    eta = DOREMI_ETA_PPM / 1e6
    c = DOREMI_SMOOTH_PPM / 1e6
    u = 1.0 / len(domains)
    w_f = {s: u for s, _, _ in domains}
    for _ in range(DOREMI_ITERS):
        raw = {s: w_f[s] * (1.0 + eta * excess[s] / 1e6) for s in w_f}
        tot = sum(raw.values())
        w_f = {s: (1 - c) * raw[s] / tot + c * u for s in w_f}

    srcs = sorted(w_int)
    total = sum(w_int.values())
    assert total <= 1_000_000
    floor = DOREMI_SMOOTH_PPM * (1_000_000 // len(domains)) // 1_000_000
    for s in srcs:
        assert floor - 1 <= w_int[s] <= 1_000_000, (s, w_int[s])
    for a in srcs:
        for b in srcs:
            if excess[a] > excess[b]:
                assert w_int[a] >= w_int[b], (a, b, excess, w_int)
            # (a): order agreement beyond quantization noise (ppm floors
            # lose <= ~1e-6 per round; 1e-4 is far outside that envelope)
            if w_f[a] - w_f[b] > 1e-4:
                assert w_int[a] >= w_int[b], (a, b, w_f, w_int)
