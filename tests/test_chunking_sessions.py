"""Chunking, sequence packing, and sessionization properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_graph_analysis_with_spark_spark.operators import chunking, sessions


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


def test_doc_chunks_reassemble(spark):
    texts = [
        " ".join(f"w{i}" for i in range(n)) for n in (1, 5, 64, 65, 200)
    ] + [""]
    docs = _docs(spark, texts)
    chunks = chunking.doc_chunks(docs, max_tokens=64).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        # chunk ids are dense from 0; every chunk but the last is full
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        assert all(r["n_tokens"] == 64 for r in rows[:-1])
        assert 1 <= rows[-1]["n_tokens"] <= 64 or texts[doc_id] == ""
        # concatenating chunks reproduces the document
        assert " ".join(r["chunk_text"] for r in rows) == texts[doc_id]


def test_doc_chunks_empty_doc_emits_one_chunk(spark):
    rows = chunking.doc_chunks(_docs(spark, [""]), max_tokens=8).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == ""


def test_pack_documents_offsets_and_continuity(spark):
    texts = [" ".join(f"w{i}" for i in range(n)) for n in range(1, 120)]
    packed = chunking.pack_documents(
        _docs(spark, texts), budget=100, n_buckets=4
    ).collect()
    assert len(packed) == len(texts)
    for r in packed:
        assert 0 <= r["offset_in_pack"] < 100
    # within a bucket, starts are a prefix-sum: total tokens == max start
    # + its doc's tokens, and pack ids are consistent with the offsets
    by_bucket: dict[int, list] = {}
    for r in packed:
        by_bucket.setdefault(r["pack_id"] // chunking.PACK_STRIDE, []).append(r)
    for rows in by_bucket.values():
        starts = sorted(
            (r["pack_id"] % chunking.PACK_STRIDE) * 100 + r["offset_in_pack"]
            for r in rows
        )
        sizes = sorted(r["n_tokens"] for r in rows)
        assert starts[0] == 0
        assert sum(sizes) == max(
            s + r["n_tokens"]
            for r in rows
            for s in [
                (r["pack_id"] % chunking.PACK_STRIDE) * 100 + r["offset_in_pack"]
            ]
        )


def test_pack_documents_partitioning_invariant(spark):
    texts = [" ".join(f"w{i}" for i in range(n)) for n in range(1, 80)]
    docs = _docs(spark, texts)
    r1 = sorted(map(tuple, chunking.pack_documents(docs, 64, 4).collect()))
    r2 = sorted(
        map(tuple, chunking.pack_documents(docs.repartition(13), 64, 4).collect())
    )
    assert r1 == r2


def test_sessionize_gap_splits(spark):
    us = 1_000_000
    rows = [
        # user 1: two sessions (gap of 2h between event 2 and 3)
        (1, 1, 0 * us),
        (2, 1, 60 * us),
        (3, 1, 7200 * 1_000_000 + 60 * us),
        # user 2: one session, single event
        (4, 2, 0),
    ]
    ev = spark.createDataFrame(
        [(e, u, t * 1000, 1.0) for e, u, t in rows],
        "event_id LONG, user_id LONG, ts LONG, value DOUBLE",
    )
    got = {
        (r["user_id"], r["session_id"]): r
        for r in sessions.sessionize_events(ev, gap_us=30 * 60 * us).collect()
    }
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    assert got[(1, 1)]["n_events"] == 2
    assert got[(1, 1)]["start_us"] == 0 and got[(1, 1)]["end_us"] == 60 * us
    assert got[(1, 2)]["n_events"] == 1
    assert got[(2, 1)]["n_events"] == 1


def test_sessionize_boundary_gap_keeps_session(spark):
    # a silence of exactly gap_us does NOT split (strict > comparison)
    ev = spark.createDataFrame(
        [(1, 1, 0, 1.0), (2, 1, 1000 * 1000, 1.0)],
        "event_id LONG, user_id LONG, ts LONG, value DOUBLE",
    )
    got = sessions.sessionize_events(ev, gap_us=1000).collect()
    assert len(got) == 1 and got[0]["n_events"] == 2


def test_chunks_plan_is_shuffle_free(spark):
    docs = _docs(spark, ["a b c d e"])
    plan = (
        chunking.doc_chunks(docs, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_funnel_ordering_semantics(spark):
    """Step i+1 counts only at-or-after the earliest step-i event;
    same-instant events count (>= semantics); users with no step-1
    event report 0 steps and a NULL first time."""
    us = 1000  # event_micros on a nanos-long ts divides by 1000
    ev = spark.createDataFrame(
        [
            # user 1: clean view -> click -> purchase
            (10, 1, 100 * us, "view"),
            (11, 1, 200 * us, "click"),
            (12, 1, 300 * us, "purchase"),
            # user 2: click BEFORE the first view must not count; the
            # purchase needs a qualifying click, so depth stays 1
            (20, 2, 100 * us, "click"),
            (21, 2, 200 * us, "view"),
            (22, 2, 300 * us, "purchase"),
            # user 3: no view at all -> depth 0
            (30, 3, 100 * us, "purchase"),
            # user 4: view and click at the SAME instant both count
            (40, 4, 100 * us, "view"),
            (41, 4, 100 * us, "click"),
        ],
        "event_id LONG, user_id LONG, ts LONG, event_type STRING",
    )
    got = {
        r["user_id"]: (r["steps_completed"], r["t_first_us"])
        for r in sessions.funnel_steps(ev).collect()
    }
    assert got == {
        1: (3, 100),
        2: (1, 200),
        3: (0, None),
        4: (2, 100),
    }


def test_length_buckets_boundaries_and_batches(spark):
    """Half-open boundary semantics, dense per-bucket batch numbering,
    fixed batch size, and partitioning invariance."""
    texts = (
        ["w"] * 3                             # 1 token  -> bucket 0
        + [" ".join(["w"] * 16)] * 5          # 16       -> bucket 1 (>= 16)
        + [" ".join(["w"] * 255)] * 2         # 255      -> bucket 2
        + [" ".join(["w"] * 300)] * 4         # 300      -> bucket 3
    )
    docs = _docs(spark, texts)
    got = chunking.length_buckets(docs, boundaries=(16, 64, 256), batch_size=2)
    rows = got.collect()
    by_bucket: dict[int, list] = {}
    for r in rows:
        assert r["batch_id"] // 1_000_000 == r["bucket"]
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert {b: len(v) for b, v in by_bucket.items()} == {0: 3, 1: 5, 2: 2, 3: 4}
    for b, members in by_bucket.items():
        batches: dict[int, list] = {}
        for r in members:
            batches.setdefault(r["batch_id"], []).append(r["pos_in_batch"])
        ids = sorted(batches)
        assert ids == list(range(b * 1_000_000, b * 1_000_000 + len(ids)))
        for bid in ids[:-1]:
            assert sorted(batches[bid]) == [0, 1]  # full batches
        assert sorted(batches[ids[-1]]) == list(range(len(batches[ids[-1]])))
    # assignment is a pure function of content — repartition-invariant
    again = chunking.length_buckets(
        docs.repartition(7), boundaries=(16, 64, 256), batch_size=2
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))
