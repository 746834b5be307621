"""Round-11 additions, second wave: the preference / ranking-eval family
(X155–X158 + streaming twin) — integer Bradley–Terry fit properties, nDCG
discount discipline, label-propagation freezing, and the cross-micro-batch
state carry of the streaming pair emitter."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_rosetta_demo_spark.operators.preference import (
    BT_SCALE,
    MAX_BT_ITEMS,
    fit_bradley_terry,
    ndcg_discount_micro,
    quantize_wins_ppm,
)

# ---------------------------------------------------------------------------
# Bradley–Terry fit: unit + property coverage
# ---------------------------------------------------------------------------


def test_bt_total_dominance_ranks_first():
    wins = {("a", "b"): 400, ("a", "c"): 300, ("b", "c"): 200, ("c", "b"): 100}
    fitted = fit_bradley_terry(quantize_wins_ppm(wins))
    thetas = {i: t for i, (t, _, _) in fitted.items()}
    assert thetas["a"] > thetas["b"] > thetas["c"]


def test_bt_symmetric_matrix_is_uniform():
    wins = {
        ("a", "b"): 100, ("b", "a"): 100,
        ("b", "c"): 100, ("c", "b"): 100,
        ("a", "c"): 100, ("c", "a"): 100,
    }
    fitted = fit_bradley_terry(quantize_wins_ppm(wins))
    thetas = {t for _, (t, _, _) in fitted.items()}
    # all equal up to the integer normalization remainder
    assert max(thetas) - min(thetas) <= 3


def test_bt_item_cap_enforced():
    wins = {(f"i{k}", f"j{k}"): 10_000 for k in range(MAX_BT_ITEMS + 1)}
    with pytest.raises(ValueError, match="items"):
        fit_bradley_terry(quantize_wins_ppm(wins))


def test_quantize_wins_ppm_bounds():
    wins = {("a", "b"): 3, ("b", "a"): 1}
    q = quantize_wins_ppm(wins)
    assert q == {("a", "b"): 750_000, ("b", "a"): 250_000}
    assert sum(q.values()) <= BT_SCALE
    assert quantize_wins_ppm({}) == {}


def _float_bt(wins_ppm: dict, iterations: int = 20) -> dict:
    """Float MM reference on the SAME quantized matrix — isolates the
    integer-arithmetic error of the shipped fit from quantization error."""
    items = sorted({x for p in wins_ppm for x in p})
    k = len(items)
    w = {i: float(sum(n for (a, _), n in wins_ppm.items() if a == i)) for i in items}
    n_sym = {
        (i, j): float(wins_ppm.get((i, j), 0) + wins_ppm.get((j, i), 0))
        for i in items
        for j in items
        if i != j
    }
    th = {i: float(BT_SCALE) for i in items}
    for _ in range(iterations):
        new = {}
        for i in items:
            denom = sum(
                n_sym[(i, j)] * BT_SCALE / (th[i] + th[j])
                for j in items
                if j != i and n_sym[(i, j)] > 0 and th[i] + th[j] > 0
            )
            new[i] = w[i] * BT_SCALE / denom if denom > 0 else th[i]
        tot = sum(new.values())
        th = {i: new[i] * k * BT_SCALE / tot for i in items}
    return th


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.sampled_from(["a", "b", "c", "d"]),
        ).filter(lambda p: p[0] != p[1]),
        st.integers(min_value=50, max_value=5000),
        min_size=2,
        max_size=12,
    )
)
def test_bt_integer_fit_tracks_float_reference(wins):
    """The integer MM trajectory stays within float-reference tolerance.
    Each floor division loses up to 1 absolute unit per term; over 20
    iterations the loss is a few units at θ≈1e6 scale but ACCUMULATES in
    absolute terms for near-zero thetas (shut-out items), so the band is
    relative with an absolute floor — and the RANKING (what the query
    publishes) must match wherever the reference separates items by more
    than that band."""
    q = quantize_wins_ppm(wins)
    if not q:
        return
    fitted = fit_bradley_terry(q)
    ref = _float_bt(q)
    for item, (theta, _, _) in fitted.items():
        assert abs(theta - ref[item]) <= max(32.0, 5e-3 * ref[item]), (
            item, theta, ref[item],
        )
    int_order = sorted(fitted, key=lambda i: (-fitted[i][0], i))
    sep = sorted(ref, key=lambda i: (-ref[i], i))
    # compare ranking only over pairs the float reference clearly separates
    for hi_pos, hi in enumerate(sep):
        for lo in sep[hi_pos + 1 :]:
            if ref[hi] - ref[lo] > 2e-2 * ref[hi] + 64:
                assert int_order.index(hi) < int_order.index(lo), (hi, lo)


def test_bt_wins_and_comparisons_consistent():
    wins = {("a", "b"): 700, ("b", "a"): 300, ("a", "c"): 500}
    fitted = fit_bradley_terry(quantize_wins_ppm(wins))
    # total wins across items == total comparisons counted once per side / 2
    total_wins = sum(w for _, (_, w, _) in fitted.items())
    total_comps = sum(c for _, (_, _, c) in fitted.items())
    assert total_comps == 2 * total_wins  # each comparison appears on 2 items


# ---------------------------------------------------------------------------
# nDCG discount discipline
# ---------------------------------------------------------------------------


def test_ndcg_discounts_golden():
    import math

    disc = ndcg_discount_micro(10)
    assert disc[0] == 1_000_000  # rank 1: 1/log2(2) == 1
    assert all(a > b for a, b in zip(disc, disc[1:]))  # strictly decreasing
    for r, d in enumerate(disc, start=1):
        assert d == int(1_000_000 / math.log2(r + 1) + 0.5)


# ---------------------------------------------------------------------------
# Label propagation: freezing + determinism on a hand-built graph
# ---------------------------------------------------------------------------


def test_label_propagation_rounds_freeze_and_min_break(spark, sf_smoke):
    """Structural invariants on the registered query's output: seeds are
    round 0 with their own lang; every later-round label equals the MIN
    label among the previous round's labeled neighbors; rounds only grow."""
    from kafka_streams_rosetta_demo_spark.queries import load_all

    reg = load_all()
    out = {
        r["doc_id"]: (r["label"], r["labeled_round"])
        for r in reg["graph_label_propagation"].fn(spark, sf_smoke).collect()
    }
    from kafka_streams_rosetta_demo_spark.queries.artifacts import jaccard_pairs_075
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_smoke, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    edges: dict[int, set[int]] = {}
    for r in jaccard_pairs_075(spark, sf_smoke).collect():
        edges.setdefault(r["doc_a"], set()).add(r["doc_b"])
        edges.setdefault(r["doc_b"], set()).add(r["doc_a"])

    seeds = {d for d in langs if d % 7 == 0}
    assert seeds <= set(out)
    for d in seeds:
        assert out[d] == (langs[d], 0)
    labeled = {d: lbl for d, (lbl, rnd) in out.items() if rnd == 0}
    for rnd in (1, 2, 3):
        new = {}
        for d, (lbl, r2) in out.items():
            if r2 != rnd:
                continue
            nb = [labeled[n] for n in edges.get(d, ()) if n in labeled]
            assert nb, f"doc {d} labeled in round {rnd} with no labeled neighbor"
            assert lbl == min(nb), (d, lbl, min(nb))
            new[d] = lbl
        labeled.update(new)
    assert set(labeled) == set(out)


# ---------------------------------------------------------------------------
# Streaming pair emitter: cross-micro-batch state carry
# ---------------------------------------------------------------------------


def test_streaming_pref_pairs_cross_batch_equals_batch(spark, sf_smoke, tmp_path):
    """Split events into 3 time-ordered files (3 micro-batches under
    maxFilesPerTrigger=1): the emitted pair multiset must equal the batch
    lag-window derivation over the same data — which requires the state
    store to carry each user's boundary event between batches (proven
    below: per-file independent pairing yields strictly fewer pairs)."""
    from kafka_streams_rosetta_demo_spark.queries.preference_queries import (
        wins_from_events,
    )
    from kafka_streams_rosetta_demo_spark.sources.parquet import (
        events_schema,
        load_table,
        normalize_event_ts,
    )
    from kafka_streams_rosetta_demo_spark.streaming.runner import (
        file_stream,
        run_append_query_to_df,
    )
    from kafka_streams_rosetta_demo_spark.streaming.stateful import (
        preference_pair_emitter,
    )

    ev = load_table(spark, sf_smoke, "events")
    rows = ev.orderBy("ts", "event_id").collect()
    third = (len(rows) + 2) // 3
    out = tmp_path / "stream"
    out.mkdir()
    chunks = []
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        chunks.append(chunk)
        part_dir = tmp_path / f"part{i}"
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part_dir))
        (pf,) = Path(part_dir).glob("part-*.parquet")
        shutil.copy(pf, out / f"{i}.parquet")  # write order == batch order

    stream = normalize_event_ts(
        file_stream(
            spark, str(out), events_schema(spark, f"{out}/0.parquet"),
            max_files_per_trigger=1,
        )
    )
    emitted = run_append_query_to_df(
        preference_pair_emitter(stream),
        str(tmp_path / "ckpt"),
        str(tmp_path / "sink"),
    )
    got = sorted(
        (r["winner"], r["loser"], r["count"])
        for r in emitted.groupBy("winner", "loser").count().collect()
    )
    expected = sorted(
        (r["winner"], r["loser"], r["n"])
        for r in wins_from_events(spark.read.parquet(str(out))).collect()
    )
    assert got == expected

    # the split is load-bearing: pairing each file independently loses the
    # boundary comparisons, so cross-batch carry is what made `got` right
    per_file_total = sum(
        r["n"]
        for i in range(3)
        for r in wins_from_events(
            spark.createDataFrame(chunks[i], ev.schema)
        ).collect()
    )
    assert per_file_total < sum(n for _, _, n in expected)


# ---------------------------------------------------------------------------
# MaxSim: third-implementation cross-check (numpy, independent of both
# engines — a quantization-order bug SHARED by query and oracle would pass
# the parity gate; this would catch it)
# ---------------------------------------------------------------------------


def test_maxsim_matches_numpy_reference(spark, sf_smoke):
    import numpy as np

    from kafka_streams_rosetta_demo_spark.queries import load_all
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    rows = (
        load_table(spark, sf_smoke, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    docs: dict[int, list[int]] = {}
    for vid in vecs:
        docs.setdefault(vid // 8, []).append(vid)
    q_docs = [d for d in docs if d < 2]
    c_docs = [d for d in docs if d >= 2]

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    expected = {}
    for qd in q_docs:
        scores = []
        for cd in c_docs:
            s = 0
            for qt in sorted(docs[qd]):
                mx = max(cos(vecs[qt], vecs[ct]) for ct in docs[cd])
                s += int(np.floor(mx * 1_000_000 + 0.5))
            scores.append((cd, s))
        scores.sort(key=lambda x: (-x[1], x[0]))
        expected[qd] = scores[:5]

    got: dict[int, list] = {}
    out = load_all()["search_maxsim_late_interaction"].fn(spark, sf_smoke).collect()
    for r in sorted(out, key=lambda r: (r["query_doc"], r["rank"])):
        got.setdefault(r["query_doc"], []).append((r["doc_id"], r["maxsim_micro"]))
    assert got == expected


def test_l_diversity_flags_are_consistent(spark, sf_smoke):
    from kafka_streams_rosetta_demo_spark.queries import load_all

    out = load_all()["privacy_l_diversity"].fn(spark, sf_smoke).collect()
    assert out
    for r in out:
        assert r["l_distinct"] >= 1 and r["l_distinct"] <= r["group_size"]
        assert r["at_risk"] == (r["l_distinct"] < 2)


def test_pref_pair_emitter_state_is_one_row_per_user(spark, sf_smoke, tmp_path):
    """The bounded-keyed-state claim MEASURED (the round-9/10 eviction-curve
    discipline): after each micro-batch the pair emitter's state store holds
    exactly one row per user seen so far — never per event, never growing
    with the stream's volume."""
    from kafka_streams_rosetta_demo_spark.sources.parquet import (
        events_schema,
        load_table,
        normalize_event_ts,
    )
    from kafka_streams_rosetta_demo_spark.streaming.runner import (
        checkpoint_tmpdir,
        file_stream,
    )
    from kafka_streams_rosetta_demo_spark.streaming.stateful import (
        preference_pair_emitter,
    )

    ev = load_table(spark, sf_smoke, "events")
    rows = ev.orderBy("ts", "event_id").collect()
    third = (len(rows) + 2) // 3
    out = tmp_path / "stream"
    out.mkdir()
    users_by_batch = []
    seen: set[int] = set()
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        seen |= {r["user_id"] for r in chunk}
        users_by_batch.append(len(seen))
        part_dir = tmp_path / f"part{i}"
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part_dir))
        (pf,) = Path(part_dir).glob("part-*.parquet")
        shutil.copy(pf, out / f"{i}.parquet")

    stream = normalize_event_ts(
        file_stream(
            spark, str(out), events_schema(spark, f"{out}/0.parquet"),
            max_files_per_trigger=1,
        )
    )
    with checkpoint_tmpdir("ckpt_prefstate_") as ckpt:
        q = (
            preference_pair_emitter(stream)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _bid: df.count())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        curve = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in q.recentProgress
            if p.get("stateOperators")
        ]
    assert curve == users_by_batch, (curve, users_by_batch)


def test_planted_clone_id_envelope_holds(spark, sf_smoke, sf_correctness):
    """The planted-clone constructions (dedup_exact +1M, embedding dups +1M,
    cross-lingual mirrors +2M/+3M, expectation clones +3M/+4M, orphan
    orders +5M/+10M) assume base ids stay below 1,000,000 — otherwise clone
    ids collide across injection families and the observability contracts
    degrade silently (parity would still pass, since the oracle replays the
    same collision). Make the envelope LOUD: if the generator ever grows
    past it, this fails and the shifts must be re-derived."""
    from kafka_streams_rosetta_demo_spark.sources.parquet import load_table

    for sf in (sf_smoke, sf_correctness):
        for table, col in (("documents", "doc_id"), ("embeddings", "vec_id"),
                           ("orders", "o_orderkey"), ("customer", "c_custkey")):
            mx = load_table(spark, sf, table).agg({col: "max"}).first()[0]
            assert mx < 1_000_000, (sf, table, mx)
