"""Structured-Streaming incremental ingest tests: micro-batch drops fold
into generations; replays are idempotent; readers see newest-wins."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest


def _drop(spark, input_dir, docs, part):
    rows = []
    for did, text in docs.items():
        rows.append({
            "url": f"http://s{did % 3}.example/p/{did}.html",
            "warc_ts": dt.datetime(2024, 1, 1) + dt.timedelta(minutes=did),
            "html": f"<html><body><p>{text}</p></body></html>".encode(),
            "text": text, "lang": "en", "doc_id": did,
        })
    (spark.createDataFrame(pd.DataFrame(rows))
     .coalesce(1).write.mode("append").parquet(input_dir))


@pytest.mark.parametrize("dummy", [0])
def test_stream_ingest_two_drops(spark, small_conf, tmp_index, tmp_path,
                                 dummy):
    from open_source_search_engine_spark.query.executor import search_all
    from open_source_search_engine_spark.streaming.ingest import stream_index

    input_dir = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)

    _drop(spark, input_dir, {1: "alpha beta", 2: "beta gamma"}, 0)
    stream_index(spark, input_dir, tmp_index, ckpt, conf=small_conf)
    got = {r["doc_id"] for r in
           search_all(spark, tmp_index, "beta", conf=small_conf).collect()}
    assert got == {1, 2}

    # second drop re-crawls doc 2 and adds doc 3
    _drop(spark, input_dir, {2: "delta only now", 3: "beta epsilon"}, 1)
    stream_index(spark, input_dir, tmp_index, ckpt, conf=small_conf)
    got = {r["doc_id"] for r in
           search_all(spark, tmp_index, "beta", conf=small_conf).collect()}
    assert got == {1, 3}  # doc 2's old content shadowed
    got2 = {r["doc_id"] for r in
            search_all(spark, tmp_index, "delta", conf=small_conf).collect()}
    assert got2 == {2}

    # re-running with nothing new is a no-op (checkpoint + resume)
    stream_index(spark, input_dir, tmp_index, ckpt, conf=small_conf)
    got3 = {r["doc_id"] for r in
            search_all(spark, tmp_index, "beta", conf=small_conf).collect()}
    assert got3 == {1, 3}


def test_stream_then_compact(spark, small_conf, tmp_index, tmp_path):
    from open_source_search_engine_spark.index.build import compact_index
    from open_source_search_engine_spark.query.executor import (
        IndexReader,
        search_all,
    )
    from open_source_search_engine_spark.streaming.ingest import stream_index

    input_dir = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)
    _drop(spark, input_dir, {1: "mu nu", 2: "nu xi"}, 0)
    stream_index(spark, input_dir, tmp_index, ckpt, conf=small_conf)
    _drop(spark, input_dir, {3: "nu omicron"}, 1)
    stream_index(spark, input_dir, tmp_index, ckpt, conf=small_conf)

    compact_index(spark, tmp_index, conf=small_conf)
    rd = IndexReader(spark, tmp_index, small_conf)
    assert len(rd.gens) == 1
    got = {r["doc_id"] for r in
           search_all(spark, tmp_index, "nu", conf=small_conf).collect()}
    assert got == {1, 2, 3}


def test_streaming_term_trends_watermark(spark, tmp_path):
    """Watermark + windowed agg: windows finalize (append) only once
    the watermark passes; a too-late row is dropped, an in-grace late
    row is counted."""
    from open_source_search_engine_spark.streaming.trends import (
        streaming_term_trends,
    )

    inp = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "trends")
    os.makedirs(inp, exist_ok=True)

    def drop(rows):
        import pandas as pd
        (spark.createDataFrame(pd.DataFrame(rows))
         .coalesce(1).write.mode("append").parquet(inp))

    t0 = dt.datetime(2024, 1, 1, 10, 0)

    def row(did, ts, text):
        return {"url": f"http://s.example/p/{did}.html", "warc_ts": ts,
                "html": b"<html></html>", "text": text, "lang": "en",
                "doc_id": did}

    # batch 1: two docs in the 10:00 window
    drop([row(1, t0, "alpha beta"),
          row(2, t0 + dt.timedelta(minutes=30), "alpha")])
    streaming_term_trends(spark, inp, ckpt, out, window="1 hour",
                          watermark="1 hour")
    # batch 2: advances the watermark far past the 10:00 window AND
    # carries a too-late 08:30 row — its window END (09:00) precedes
    # the batch-entry watermark (10:30 - 1h = 09:30), so it is dropped
    drop([row(3, t0 + dt.timedelta(hours=5), "gamma"),
          row(4, t0 - dt.timedelta(minutes=90), "alpha")])
    streaming_term_trends(spark, inp, ckpt, out, window="1 hour",
                          watermark="1 hour")
    got = {(r["window_start"].hour, r["tok"]): r["n"]
           for r in spark.read.parquet(out).collect()}
    # 10:00 window finalized with both docs' tokens
    assert got[(10, "alpha")] == 2
    assert got[(10, "beta")] == 1
    # too-late 08:30 row was NOT admitted (window end < watermark)
    assert (8, "alpha") not in got
    # gamma's 15:00 window is still open (watermark hasn't passed it)
    assert (15, "gamma") not in got


def test_streaming_url_seen_stateful(spark, tmp_path):
    """Cross-batch URL dedup (crawl-frontier first-seen filter): a URL
    re-dropped in a later micro-batch is suppressed; state survives
    between availableNow runs via the persisted _seen table."""
    from open_source_search_engine_spark.streaming.urlseen import (
        seen_output,
        streaming_url_seen,
    )

    inp = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "seen")
    os.makedirs(inp, exist_ok=True)

    def drop(pairs):
        import pandas as pd
        rows = [{"url": u, "warc_ts": dt.datetime(2024, 1, 1),
                 "html": b"x", "text": "t", "lang": "en", "doc_id": d}
                for u, d in pairs]
        (spark.createDataFrame(pd.DataFrame(rows))
         .coalesce(1).write.mode("append").parquet(inp))

    drop([("http://a.example/1", 1), ("http://a.example/2", 2),
          ("http://b.example/1", 3)])
    streaming_url_seen(spark, inp, ckpt, out)
    # second drop: two repeats + one new
    drop([("http://a.example/1", 10), ("http://b.example/1", 30),
          ("http://a.example/3", 4)])
    streaming_url_seen(spark, inp, ckpt, out)
    got = {r["url"]: r["doc_id"]
           for r in seen_output(spark, out).collect()}
    assert got == {"http://a.example/1": 1, "http://a.example/2": 2,
                   "http://b.example/1": 3, "http://a.example/3": 4}


def test_stream_auto_compact_policy(spark, small_conf, tmp_index,
                                    tmp_path):
    """min_to_merge applies the RdbBase merge-scheduling policy inside
    the fold: generations compact automatically once the live count
    reaches the threshold, and queries stay newest-wins through it."""
    from open_source_search_engine_spark.query.executor import (
        IndexReader,
        search_all,
    )
    from open_source_search_engine_spark.streaming.ingest import (
        stream_index,
    )

    input_dir = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir, exist_ok=True)
    _drop(spark, input_dir, {1: "rho sigma", 2: "sigma tau"}, 0)
    stream_index(spark, input_dir, tmp_index, ckpt, conf=small_conf,
                 min_to_merge=2)
    rd = IndexReader(spark, tmp_index, small_conf)
    assert len(rd.gens) == 1  # gen 0 folded... still one live gen

    _drop(spark, input_dir, {2: "upsilon only", 3: "sigma phi"}, 1)
    stream_index(spark, input_dir, tmp_index, ckpt, conf=small_conf,
                 min_to_merge=2)
    rd2 = IndexReader(spark, tmp_index, small_conf)
    assert len(rd2.gens) == 1  # batch gen + prior gen compacted to one
    got = {r["doc_id"] for r in
           search_all(spark, tmp_index, "sigma",
                      conf=small_conf).collect()}
    assert got == {1, 3}  # doc 2 re-crawl shadowed through compaction
    got2 = {r["doc_id"] for r in
            search_all(spark, tmp_index, "upsilon",
                       conf=small_conf).collect()}
    assert got2 == {2}


def test_streaming_near_dup_filter(spark, tmp_path):
    """Cross-batch near-dup admission gate: an intra-batch near-dup is
    rejected (exact-verified LSH), a later-batch near-dup of an
    admitted doc is rejected via band collision + signature agreement,
    and a genuinely new doc is admitted."""
    from open_source_search_engine_spark.streaming.dedupstream import (
        admitted_output,
        streaming_near_dup_filter,
    )

    inp = str(tmp_path / "drops2")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "adm")
    os.makedirs(inp, exist_ok=True)

    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    a2 = "alpha beta gamma delta epsilon zeta eta theta iota mu"
    b = "one two three four five six seven eight nine ten"
    c = "totally different content lives in this document right here ok"

    def drop(rows):
        import pandas as pd
        recs = [{"url": f"http://x.example/{d}", "warc_ts":
                 dt.datetime(2024, 1, 1), "html": b"x", "text": t,
                 "lang": "en", "doc_id": d} for d, t in rows]
        (spark.createDataFrame(pd.DataFrame(recs))
         .coalesce(1).write.mode("append").parquet(inp))

    # batch 1: a and its near-dup a2 (intra-batch), plus b
    drop([(1, a), (2, a2), (3, b)])
    streaming_near_dup_filter(spark, inp, ckpt, out)
    got = {r["doc_id"] for r in admitted_output(spark, out).collect()}
    assert got == {1, 3}
    # batch 2: another near-dup of a (cross-batch), plus new doc c
    drop([(10, a2), (11, c)])
    streaming_near_dup_filter(spark, inp, ckpt, out)
    got = {r["doc_id"] for r in admitted_output(spark, out).collect()}
    assert got == {1, 3, 11}


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Cross-batch session continuity: sessions chain over micro-batch
    boundaries (within-gap events continue the persisted session, gaps
    open new ones), and the streamed result equals the batch operator
    run over the full event set."""
    from open_source_search_engine_spark.ops.events import sessionize
    from open_source_search_engine_spark.streaming.sessions import (
        session_output,
        streaming_sessionize,
    )

    inp = str(tmp_path / "edrops")
    ckpt = str(tmp_path / "eckpt")
    out = str(tmp_path / "esess")
    os.makedirs(inp, exist_ok=True)
    base = dt.datetime(2024, 1, 1)

    def drop(rows):
        import pandas as pd
        recs = [{"event_id": i, "user_id": u, "event_type": "view",
                 "value": 1.0, "props": "{}",
                 "ts": base + dt.timedelta(seconds=s)}
                for i, u, s in rows]
        (spark.createDataFrame(pd.DataFrame(recs))
         .coalesce(1).write.mode("append").parquet(inp))

    # drop 1: user 1 at t=0,10; user 2 at t=0
    drop([(0, 1, 0), (1, 1, 10), (2, 2, 0)])
    streaming_sessionize(spark, inp, ckpt, out, gap_seconds=30)
    # drop 2: user 1 continues (t=20, gap 10) then breaks (t=1000);
    # user 2 breaks (t=500); user 3 is new
    drop([(3, 1, 20), (4, 1, 1000), (5, 2, 500), (6, 3, 0)])
    streaming_sessionize(spark, inp, ckpt, out, gap_seconds=30)

    got = {r["event_id"]: r["session_idx"]
           for r in session_output(spark, out).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1}

    # equivalence with the batch operator over the union
    full = spark.read.parquet(inp)
    want = {r["event_id"]: r["session_idx"]
            for r in sessionize(full, gap_seconds=30).collect()}
    assert got == want
