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
