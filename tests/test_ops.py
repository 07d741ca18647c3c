"""Training-data ops tests: dedup / simhash / fingerprints / ANN /
multimodal plumbing, checked against independent pandas/numpy math."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

TEXTS = {
    1: "alpha beta gamma delta epsilon zeta",
    2: "alpha beta gamma delta epsilon eta",   # near-dup of 1
    3: "one two three four five six seven",
    4: "alpha beta gamma delta epsilon zeta",  # exact dup of 1
    5: "totally different content right here now",
}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            [{"doc_id": k, "text": v, "lang": "en"} for k, v in TEXTS.items()]
        )
    )


def _shingles(text, n=3):
    ts = text.split()
    return {" ".join(ts[i:i + n]) for i in range(len(ts) - n + 1)}


def _jac(a, b):
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(docs):
    from open_source_search_engine_spark.ops.dedup import exact_dup_groups

    rows = exact_dup_groups(docs).collect()
    assert len(rows) == 1
    assert rows[0]["n_dups"] == 2 and rows[0]["min_doc_id"] == 1


def test_ngram_jaccard_pairs(docs):
    from open_source_search_engine_spark.ops.dedup import ngram_jaccard_pairs

    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    want = {}
    ids = sorted(TEXTS)
    for i in ids:
        for j in ids:
            if i < j:
                jv = _jac(TEXTS[i], TEXTS[j])
                if jv >= 0.3:
                    want[(i, j)] = round(jv, 4)
    assert got == want


def test_decontaminate_flags_ngram_overlap(spark):
    """decontaminate() must flag exactly the (train, eval) pairs sharing
    an n-gram, count distinct shared shingles, and ignore docs shorter
    than n tokens; verified against a pure-python shingle join."""
    from open_source_search_engine_spark.ops.dedup import decontaminate

    train = {
        10: "the quick brown fox jumps over the lazy dog today",
        11: "a completely unrelated training document goes right here",
        12: "short doc",  # < n tokens: no shingles
        13: "the quick brown fox jumps over the lazy dog today again",
    }
    evals = {
        90: "watch the quick brown fox jumps over the lazy dog today ok",
        91: "nothing in common with any training text at all friend",
    }
    n = 5
    tr = spark.createDataFrame(
        pd.DataFrame([{"doc_id": k, "text": v} for k, v in train.items()]))
    ev = spark.createDataFrame(
        pd.DataFrame([{"doc_id": k, "text": v} for k, v in evals.items()]))
    got = {(r["doc_id"], r["eval_id"]): r["n_shared"]
           for r in decontaminate(tr, ev, n=n).collect()}
    want = {}
    for tid, ttxt in train.items():
        for eid, etxt in evals.items():
            shared = _shingles(ttxt, n) & _shingles(etxt, n)
            if shared:
                want[(tid, eid)] = len(shared)
    assert got == want and want  # non-vacuous
    # shuffle-free eval side: the plan broadcasts the eval shingles
    plan = decontaminate(tr, ev, n=n)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_minhash_lsh_finds_all_pairs_here(docs):
    from open_source_search_engine_spark.ops.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    exact = {(r["doc_a"], r["doc_b"]) for r in
             ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in
           minhash_lsh_pairs(docs, threshold=0.3).collect()}
    # pairs here have jaccard >= 0.4: banding (32 perms, r=4) finds them
    assert lsh == exact


def test_simhash_near_dups_close(docs):
    from open_source_search_engine_spark.ops.textstats import simhash

    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    d_close = bin(sh[1] ^ sh[2]).count("1")
    d_far = bin(sh[1] ^ sh[5]).count("1")
    assert sh[1] == sh[4]  # identical text -> identical sketch
    assert d_close < d_far


def test_simhash_hamming_pairs(docs):
    from open_source_search_engine_spark.ops.textstats import (
        simhash,
        simhash_hamming_pairs,
    )

    sh = simhash(docs)
    vals = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    want = set()
    ids = sorted(vals)
    for i in ids:
        for j in ids:
            if i < j and bin(vals[i] ^ vals[j]).count("1") <= 3:
                want.add((i, j))
    got = {(r["doc_a"], r["doc_b"])
           for r in simhash_hamming_pairs(sh, max_dist=3).collect()}
    assert got == want
    assert (1, 4) in got


def test_fingerprint_order_sensitive(spark):
    from open_source_search_engine_spark.ops.textstats import doc_fingerprint

    df = spark.createDataFrame(
        pd.DataFrame([
            {"doc_id": 1, "text": "alpha beta gamma"},
            {"doc_id": 2, "text": "gamma beta alpha"},
            {"doc_id": 3, "text": "alpha beta gamma"},
        ]))
    fp = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(df).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]  # same bag, different order


def test_token_stats(docs):
    from open_source_search_engine_spark.ops.textstats import doc_token_stats

    row = {r["doc_id"]: r for r in doc_token_stats(docs).collect()}
    assert row[1]["n_tokens"] == 6
    assert row[1]["n_types"] == 6
    assert row[1]["ttr"] == 1.0
    assert row[3]["n_tokens"] == 7


def test_bpe_token_stats(spark):
    from open_source_search_engine_spark.ops.textstats import (
        bpe_token_stats,
    )

    df = spark.createDataFrame(
        pd.DataFrame([
            # "hello" " world" -> 2 pieces; "rare0042" -> "rare"+"0042";
            # "x-y" -> " x" "-" "y"
            {"doc_id": 1, "text": "hello world"},
            {"doc_id": 2, "text": "rare0042 x-y"},
        ]))
    row = {r["doc_id"]: r for r in bpe_token_stats(df).collect()}
    assert row[1]["n_ws_tokens"] == 2 and row[1]["n_bpe_pieces"] == 2
    assert row[1]["bpe_per_ws"] == 1.0
    assert row[2]["n_ws_tokens"] == 2 and row[2]["n_bpe_pieces"] == 5
    assert row[2]["bpe_per_ws"] == 2.5


def test_repetition_stats(spark):
    from open_source_search_engine_spark.ops.textstats import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        pd.DataFrame([
            # tokens: a b a b a -> 5 tokens, 2 distinct
            # bigrams: "a b","b a","a b","b a" -> top freq 2 of 4
            # trigrams: "a b a","b a b","a b a" -> dup'd: "a b a" x2 of 3
            {"doc_id": 1, "text": "a b a b a"},
            {"doc_id": 2, "text": "x"},           # too short for grams
        ]))
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 5
    assert r1["dup_token_frac"] == 0.6
    assert r1["top_bigram_frac"] == 0.5
    assert r1["dup_trigram_frac"] == round(2 / 3, 4)
    r2 = rows[2]
    assert r2["n_tokens"] == 1 and r2["dup_token_frac"] == 0.0
    assert r2["top_bigram_frac"] is None
    assert r2["dup_trigram_frac"] is None


def test_redact_pii(spark):
    from open_source_search_engine_spark.ops.textstats import redact_pii

    df = spark.createDataFrame(
        pd.DataFrame([
            {"doc_id": 1,
             "text": "mail bob.smith+x@corp.example.co or 10.1.2.3 "
                     "or call +44 20 7946 0958 now"},
            {"doc_id": 2, "text": "no pii here"},
        ]))
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r1 = rows[1]
    assert r1["n_email"] == 1 and r1["n_ip"] == 1 and r1["n_phone"] == 1
    assert r1["clean_text"] == \
        "mail <EMAIL> or <IP> or call <PHONE> now"
    r2 = rows[2]
    assert (r2["n_email"], r2["n_ip"], r2["n_phone"]) == (0, 0, 0)
    assert r2["clean_text"] == "no pii here"


def test_chunk_documents(spark):
    from open_source_search_engine_spark.ops.textstats import (
        chunk_documents,
    )

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        pd.DataFrame([
            {"doc_id": 1, "text": words},       # 10 tokens
            {"doc_id": 2, "text": "only three tokens"},
        ]))
    out = chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: stride 3, starts 0,3,6 (9 > 10-1-1=8 stops) -> wait:
    # greatest(10-1-1, 0)=8 so starts 0,3,6 and last window w6..w9
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_id"] for r in c1] == [0, 1, 2]
    assert c1[0]["chunk_text"] == "w0 w1 w2 w3"
    assert c1[1]["chunk_text"] == "w3 w4 w5 w6"
    assert c1[2]["chunk_text"] == "w6 w7 w8 w9"
    assert [r["n_chunk_tokens"] for r in c1] == [4, 4, 4]
    # doc 2: 3 tokens < chunk -> single chunk, full text
    c2 = by_doc[2]
    assert len(c2) == 1 and c2[0]["chunk_text"] == "only three tokens"
    assert c2[0]["n_chunk_tokens"] == 3
    # every token index is covered by at least one chunk
    import pytest
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_detect_language(spark):
    from open_source_search_engine_spark.ops.textstats import detect_language

    df = spark.createDataFrame(
        pd.DataFrame([
            {"doc_id": 1, "text": "the cat sat on the mat and it was good"},
            {"doc_id": 2, "text": "der hund ist nicht das problem und so"},
            {"doc_id": 3, "text": "qqq www eee rrr"},
        ]))
    got = {r["doc_id"]: r["predicted_lang"]
           for r in detect_language(df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "xx"


def test_ann_brute_force(spark):
    from open_source_search_engine_spark.ops.ann import (
        brute_force_topk,
        cosine_scores,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(50), "embedding": list(map(list, vecs))}))
    q = [float(x) for x in vecs[0]]
    got = {r["vec_id"]: r["cos"] for r in cosine_scores(emb, q).collect()}
    qn = np.linalg.norm(np.array(q))
    for i in range(50):
        v = vecs[i].astype(np.float64)
        want = float(v @ np.array(q) / (np.linalg.norm(v) * qn))
        assert got[i] == pytest.approx(round(want, 4), abs=2e-4)
    top = brute_force_topk(emb, q, 5).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cos"] == 1.0
    scores = [r["cos"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_ann_lsh_contains_query_vector(spark):
    from open_source_search_engine_spark.ops.ann import rp_lsh_topk

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(80, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(80), "embedding": list(map(list, vecs))}))
    q = [float(x) for x in vecs[3]]
    top = rp_lsh_topk(emb, q, 5).collect()
    # the identical vector always lands in the query's bucket
    assert top[0]["vec_id"] == 3 and top[0]["cos"] == 1.0


def test_ann_pandas_path_matches_catalyst(spark):
    from open_source_search_engine_spark.ops.ann import brute_force_topk

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(50), "embedding": list(map(list, vecs))}))
    q = [float(x) for x in vecs[7]]
    a = [(r["vec_id"], r["cos"])
         for r in brute_force_topk(emb, q, 10).collect()]
    b = [(r["vec_id"], r["cos"])
         for r in brute_force_topk(emb, q, 10, impl="pandas").collect()]
    assert a == b and a[0] == (7, 1.0)


def test_ann_ivf_inline_and_indexed(spark, tmp_path):
    from open_source_search_engine_spark.ops.ann import (
        build_ivf_index,
        ivf_assign,
        ivf_centroids,
        ivf_topk,
        ivf_topk_indexed,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(60), "embedding": list(map(list, vecs))}))
    cents = ivf_centroids(emb, 4)
    assert len(cents) == 4 and len(cents[0]) == 8
    # every vector gets exactly one cell in [0, 4)
    cells = {r["vec_id"]: r["cell"] for r in ivf_assign(emb, cents).collect()}
    assert set(cells) == set(range(60))
    assert all(0 <= c < 4 for c in cells.values())
    # a centroid vector is assigned to its own cell (cos 1.0 beats all
    # non-identical centroids in this random set)
    assert cells[2] == 2
    q = [float(x) for x in vecs[2]]
    top = ivf_topk(emb, q, 5, n_cells=4, nprobe=2).collect()
    assert top[0]["vec_id"] == 2 and top[0]["cos"] == 1.0
    # persisted probe == inline result
    idx = str(tmp_path / "ivf")
    cents2 = build_ivf_index(emb, idx, n_cells=4)
    top2 = ivf_topk_indexed(spark, idx, cents2, q, 5, nprobe=2).collect()
    assert [(r["vec_id"], r["cos"]) for r in top] == \
           [(r["vec_id"], r["cos"]) for r in top2]


def test_ivf_kmeans_training(spark, tmp_path):
    from open_source_search_engine_spark.ops.ann import (
        build_ivf_index,
        ivf_assign,
        ivf_train_kmeans,
        ivf_topk_indexed,
    )

    # 4 well-separated direction clusters in 8-d
    rng = np.random.default_rng(11)
    centers = np.eye(4, 8) * 10.0
    vecs, ids = [], []
    for ci in range(4):
        for j in range(20):
            vecs.append(centers[ci] + rng.normal(scale=0.3, size=8))
            ids.append(ci * 20 + j)
    vecs = np.array(vecs, dtype=np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": list(map(list, vecs))}))

    cents = ivf_train_kmeans(emb, 4, n_iter=5)
    # deterministic: retraining yields the identical quantizer
    assert ivf_train_kmeans(emb, 4, n_iter=5) == cents
    # trained cells recover the planted clusters: every ground-truth
    # cluster lands in exactly one cell (purity 1.0 on separated data)
    cells = {r["vec_id"]: r["cell"] for r in ivf_assign(emb, cents).collect()}
    for ci in range(4):
        got = {cells[ci * 20 + j] for j in range(20)}
        assert len(got) == 1
    # trained quantizer feeds the same persisted-index probe path
    idx = str(tmp_path / "ivf_km")
    build_ivf_index(emb, idx, n_cells=4, centroids=cents)
    q = [float(x) for x in vecs[5]]
    top = ivf_topk_indexed(spark, idx, cents, q, 5, nprobe=1).collect()
    assert top[0]["vec_id"] == 5 and top[0]["cos"] == 1.0


def test_multimodal_plumbing(docs):
    from open_source_search_engine_spark.ops.multimodal import (
        GIF_HEADER_LEN,
        PNG_HEADER_LEN,
        decode_image_meta,
        decode_image_pixels,
        to_binary_payload,
    )

    pay = to_binary_payload(docs)
    meta = {r["doc_id"]: r for r in decode_image_meta(pay).collect()}
    for did, text in TEXTS.items():
        hdr = PNG_HEADER_LEN if did % 2 == 0 else GIF_HEADER_LEN
        assert meta[did]["n_bytes"] == len(text.encode()) + hdr
        # dims PARSED back out of the real container header bytes
        assert meta[did]["width"] == did % 640 + 1
        assert meta[did]["height"] == did * 7 % 480 + 1
        assert meta[did]["format"] == ("png" if did % 2 == 0 else "gif")
    # header-only containers hold no IDAT raster: the real decoder
    # (round 3) classifies them undecodable instead of raising — a
    # 100-TB decode stage must tolerate junk rows without failing
    px = decode_image_pixels(pay).collect()
    assert all(r["format"] == "undecodable" for r in px)


def test_image_header_parse_roundtrip():
    from open_source_search_engine_spark.ops.multimodal import (
        parse_image_header,
        synth_image_payload,
    )

    fmt, w, h = parse_image_header(synth_image_payload(42, b"body"))
    assert (fmt, w, h) == ("png", 42 % 640 + 1, 42 * 7 % 480 + 1)
    fmt, w, h = parse_image_header(synth_image_payload(7, b"x"))
    assert (fmt, w, h) == ("gif", 7 % 640 + 1, 7 * 7 % 480 + 1)
    # real-world magics still classified
    assert parse_image_header(b"\xff\xd8\xff\xe0" + b"0" * 30)[0] == "jpeg"
    assert parse_image_header(b"plain text")[0] == "unknown"


def test_minhash_coeffs_deterministic():
    from open_source_search_engine_spark.ops.dedup import _perm_coeffs

    a = _perm_coeffs(8)
    b = _perm_coeffs(8)
    assert a == b
    assert len({c for c, _ in a}) == 8


def test_hash60_matches_md5(spark):
    from open_source_search_engine_spark.ops.textstats import hash60

    df = spark.createDataFrame(pd.DataFrame({"t": ["key", "value", "zz"]}))
    got = {r["t"]: r["h"] for r in
           df.select("t", hash60(F.col("t")).alias("h")).collect()}
    for t in ("key", "value", "zz"):
        want = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        assert got[t] == want


def test_embedding_dup_pairs(spark):
    """RP-LSH near-dup pairs: subset of the exact all-pairs baseline,
    perfect recall on (near-)identical vectors, hot-bucket cap drops
    over-full buckets."""
    import numpy as np

    from open_source_search_engine_spark.ops.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_exact,
    )

    rng = np.random.RandomState(7)
    dim = 16
    base = rng.randn(dim)
    rows = []
    # 0/1: identical; 2: tiny perturbation of base; 3..12: random
    rows.append({"vec_id": 0, "embedding": [float(x) for x in base]})
    rows.append({"vec_id": 1, "embedding": [float(x) for x in base]})
    rows.append({"vec_id": 2, "embedding":
                 [float(x) for x in base + 0.01 * rng.randn(dim)]})
    for i in range(3, 13):
        rows.append({"vec_id": i, "embedding":
                     [float(x) for x in rng.randn(dim)]})
    emb = spark.createDataFrame(pd.DataFrame(rows))

    exact = {(r["vec_a"], r["vec_b"]): r["cos"]
             for r in embedding_dup_pairs_exact(emb, 0.9).collect()}
    assert (0, 1) in exact and exact[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in exact and (1, 2) in exact

    lsh = {(r["vec_a"], r["vec_b"]): r["cos"]
           for r in embedding_dup_pairs(
               emb, 0.9, dim=dim, bits=4, tables=8).collect()}
    # identical sign patterns -> identical buckets -> certain recall
    assert set(lsh) == set(exact)
    for k, v in lsh.items():
        assert v == pytest.approx(exact[k])

    # max_bucket=0 drops every bucket -> no candidates at all
    none = embedding_dup_pairs(emb, 0.9, dim=dim, bits=4, tables=8,
                               max_bucket=0).count()
    assert none == 0


def test_resize_images_header_roundtrip(spark):
    """resize_images rewrites REAL container headers (PNG IHDR + CRC32,
    GIF screen descriptor); decode_image_meta re-parses the new dims
    from the bytes — a true binary round-trip, no shared formula."""
    from open_source_search_engine_spark.ops.multimodal import (
        decode_image_meta,
        resize_images,
        synth_image_payload,
    )

    rows = [{"doc_id": d,
             "payload": synth_image_payload(d, f"body{d}".encode())}
            for d in range(1, 7)]
    pl = spark.createDataFrame(pd.DataFrame(rows))
    resized = resize_images(pl, 100, 50)
    meta = {r["doc_id"]: r for r in decode_image_meta(resized).collect()}
    for d in range(1, 7):
        assert meta[d]["width"] == 100 and meta[d]["height"] == 50
        assert meta[d]["format"] == ("png" if d % 2 == 0 else "gif")
    # PNG CRC is genuinely recomputed: corrupting it breaks zlib check
    import struct
    import zlib

    png = [bytes(r["payload"]) for r in resized.collect()
           if bytes(r["payload"]).startswith(b"\x89PNG")][0]
    data = png[12:16] + png[16:29]          # "IHDR" + 13 data bytes
    (crc,) = struct.unpack(">I", png[29:33])
    assert crc == (zlib.crc32(data) & 0xFFFFFFFF)


def test_frame_sample(spark):
    from open_source_search_engine_spark.ops.multimodal import (
        frame_sample,
        synth_video_payload,
    )

    rows = [{"doc_id": 1, "payload": synth_video_payload(1, 7)},
            {"doc_id": 2, "payload": synth_video_payload(2, 3)},
            {"doc_id": 3, "payload": b"not a video"}]
    pl = spark.createDataFrame(pd.DataFrame(rows))
    got = frame_sample(pl, stride=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_ix"])
    assert sorted(by_doc[1]) == [0, 3, 6]
    assert sorted(by_doc[2]) == [0]
    assert 3 not in by_doc                       # corrupt skipped
    # sampled frame bytes are the real container frames
    from open_source_search_engine_spark.ops.multimodal import _VID_MAGIC
    import hashlib

    f3 = next(bytes(r["frame"]) for r in got
              if r["doc_id"] == 1 and r["frame_ix"] == 3)
    want = hashlib.md5(b"1:3").digest()
    assert f3.startswith(want)


def test_extract_features_shape(spark):
    from open_source_search_engine_spark.ops.multimodal import (
        extract_features,
    )

    pl = spark.createDataFrame(pd.DataFrame(
        [{"doc_id": 1, "payload": b"abc"}, {"doc_id": 2, "payload": b"xyz"}]))
    got = {r["doc_id"]: r["features"]
           for r in extract_features(pl, dim=8).collect()}
    assert len(got[1]) == 8 and len(got[2]) == 8
    assert all(-1.0 <= x < 1.0 for x in got[1])
    # deterministic: same payload -> same vector
    got2 = {r["doc_id"]: r["features"]
            for r in extract_features(pl, dim=8).collect()}
    assert got == got2


def test_dup_clusters_chain_and_random(spark):
    # closure over a chain (worst case for plain label propagation) plus
    # a random graph, both checked against a brute-force union-find
    import random

    from open_source_search_engine_spark.ops.dedup import dup_clusters

    def uf_components(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in range(n_nodes)}

    rng = random.Random(99)
    chain = [(i, i + 1) for i in range(0, 40)]           # one long chain
    rand = [(rng.randrange(50, 200), rng.randrange(50, 200))
            for _ in range(120)]
    edges = chain + [(a, b) for a, b in rand if a != b]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {(r.doc_id, r.canonical_id, r.cluster_size)
           for r in dup_clusters(df).collect()}

    comp = uf_components(200, edges)
    members = {}
    in_graph = {a for a, _ in edges} | {b for _, b in edges}
    for node in in_graph:
        members.setdefault(comp[node], set()).add(node)
    want = set()
    for root, ms in members.items():
        canon = min(ms)
        for m in ms:
            want.add((m, canon, len(ms)))
    assert got == want


def test_deterministic_split_and_sample(spark):
    from open_source_search_engine_spark.ops.sampling import (
        BUCKETS,
        deterministic_sample,
        deterministic_split,
        split_thresholds,
    )

    df = spark.createDataFrame(
        [(i, f"document text number {i}") for i in range(400)]
        + [(1000, "document text number 7")],  # exact dup of doc 7
        "doc_id long, text string")
    out = deterministic_split(df)
    rows = {r.doc_id: r.split for r in out.collect()}
    # exact-dup texts share a split (leakage guard)
    assert rows[7] == rows[1000]
    # roughly the requested proportions
    n = len(rows)
    assert sum(1 for s in rows.values() if s == "train") > 0.8 * n
    assert set(rows.values()) <= {"train", "val", "test"}
    # rerun is identical (determinism across plans)
    assert {r.doc_id: r.split for r in
            deterministic_split(df.repartition(7)).collect()} == rows

    # nested sampling: the 5% sample is a subset of the 20% sample
    s5 = {r.doc_id for r in deterministic_sample(df, 0.05).collect()}
    s20 = {r.doc_id for r in deterministic_sample(df, 0.20).collect()}
    assert s5 <= s20 and len(s20) < 400

    import pytest

    with pytest.raises(ValueError):
        split_thresholds([("a", 0.5), ("b", 0.4)])
    assert split_thresholds([("a", 1 / 3), ("b", 1 / 3), ("c", 1 / 3)])[-1] \
        == ("c", BUCKETS)


def test_dup_clusters_star_and_deep_chain_converge(spark):
    # the two adversarial shapes: a giant star centered at the HIGHEST id
    # (skew: one node holds every edge) and a deep chain (diameter >>
    # O(log^2 n) rounds would allow for plain label propagation)
    from open_source_search_engine_spark.ops.dedup import dup_clusters

    star = [(10_000, i) for i in range(1, 600)]       # center 10k, min 1
    chain = [(20_000 + i, 20_001 + i) for i in range(200)]
    df = spark.createDataFrame(star + chain, "doc_a long, doc_b long")
    out = dup_clusters(df, max_rounds=16).collect()
    by_canon = {}
    for r in out:
        by_canon.setdefault(r.canonical_id, set()).add(r.doc_id)
    assert set(by_canon) == {1, 20_000}
    assert by_canon[1] == set(range(1, 600)) | {10_000}
    assert by_canon[20_000] == set(range(20_000, 20_201))
    assert all(r.cluster_size == len(by_canon[r.canonical_id]) for r in out)


def test_png_codec_roundtrip_all_filters():
    """Minimal stdlib PNG codec (RFC 2083): every spec filter
    (None/Sub/Up/Average/Paeth — encoder uses row % 5) must round-trip
    random rasters bit-exactly, RGB and grayscale."""
    import numpy as np

    from open_source_search_engine_spark.ops.multimodal import (
        png_decode,
        png_encode,
    )

    rng = np.random.default_rng(11)
    for shape in [(7, 5, 3), (12, 31, 3), (5, 1, 3), (9, 4), (1, 1, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = png_decode(png_encode(px))
        assert np.array_equal(got, px), shape


def test_png_decode_rejects_corruption():
    import numpy as np
    import pytest as _pytest

    from open_source_search_engine_spark.ops.multimodal import (
        png_decode,
        png_encode,
    )

    blob = bytearray(png_encode(
        np.zeros((4, 4, 3), dtype=np.uint8)))
    blob[40] ^= 0xFF  # flip a byte inside a chunk -> CRC must catch it
    with _pytest.raises(ValueError):
        png_decode(bytes(blob))


def test_decode_image_pixels_spark(spark):
    """decode_image_pixels: real IDAT inflate + de-filter inside
    mapInPandas; undecodable (header-only) payloads yield null dims
    instead of failing the job."""
    import numpy as np

    from open_source_search_engine_spark.ops.multimodal import (
        decode_image_pixels,
        synth_png_raster_payload,
        to_binary_payload,
        to_png_raster_payload,
    )

    docs = spark.createDataFrame(
        [(d, f"text {d}") for d in range(1, 21)], "doc_id long, text string")
    rows = decode_image_pixels(to_png_raster_payload(docs)).collect()
    assert len(rows) == 20
    for r in rows:
        d = r["doc_id"]
        assert r["format"] == "png"
        assert r["width"] == d % 16 + 1
        assert r["height"] == d * 7 % 16 + 1
        px = np.frombuffer(r["pixels"], np.uint8).reshape(
            r["height"], r["width"], 3)
        x = np.arange(r["width"]).reshape(1, -1, 1)
        y = np.arange(r["height"]).reshape(-1, 1, 1)
        c = np.arange(3).reshape(1, 1, 3)
        assert np.array_equal(
            px, ((x + 2 * y + 3 * c + d) % 256).astype(np.uint8))
        assert r["px_sum"] == int(px.astype(np.int64).sum())
    # header-only containers (meta corpus) are not decodable rasters
    junk = decode_image_pixels(to_binary_payload(docs)).collect()
    assert all(r["format"] == "undecodable" and r["width"] is None
               for r in junk)


def test_line_dedup_removes_cross_doc_lines(spark):
    from open_source_search_engine_spark.ops.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "unique alpha\nshared footer\nmore text"),
         (2, "other body\nshared footer"),
         (3, "shared footer\nonly dup here\nshared footer"),
         (4, "totally distinct")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(docs, min_df=2).collect()}
    assert out[1]["clean_text"] == "unique alpha\nmore text"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "other body"
    # every occurrence removed, order of survivors preserved
    assert out[3]["clean_text"] == "only dup here"
    assert out[3]["n_removed"] == 2
    assert out[4]["clean_text"] == "totally distinct"
    assert out[4]["n_removed"] == 0


def test_line_dedup_min_chars_keeps_blanks(spark):
    from open_source_search_engine_spark.ops.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "a b c\n\nx"), (2, "d e f\n\ny")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(docs, min_df=2,
                                              min_chars=1).collect()}
    # the blank line occurs in both docs but is below min_chars: kept
    assert out[1]["clean_text"] == "a b c\n\nx"
    assert out[1]["n_removed"] == 0


def test_novelty_scores(spark):
    from open_source_search_engine_spark.ops.dedup import novelty_scores

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in novelty_scores(docs, n=3).collect()}
    # doc1 shingles: "a b c" (shared with doc2), "b c d" (unique)
    assert out[1]["n_shingles"] == 2 and out[1]["n_shared"] == 1
    assert out[1]["shared_frac"] == 0.5
    assert out[3]["n_shared"] == 0 and out[3]["shared_frac"] == 0.0


def test_stratified_sample_nested_and_balanced(spark):
    from open_source_search_engine_spark.ops.sampling import (
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, "t", "en" if i % 3 else "da") for i in range(60)],
        "doc_id long, text string, lang string")
    s5 = stratified_sample(docs, 5, ["lang"])
    s10 = stratified_sample(docs, 10, ["lang"])
    got5 = {(r["lang"], r["doc_id"]) for r in s5.collect()}
    got10 = {(r["lang"], r["doc_id"]) for r in s10.collect()}
    assert len(got5) == 10 and len(got10) == 20  # 2 langs, balanced
    assert got5 <= got10  # nested in n
    # deterministic across invocations
    assert got5 == {(r["lang"], r["doc_id"]) for r in
                    stratified_sample(docs, 5, ["lang"]).collect()}


def test_keywords_tfidf_ranking(spark):
    import math

    from open_source_search_engine_spark.ops.textstats import (
        keywords_tfidf,
    )

    docs = spark.createDataFrame(
        [(1, "apple apple banana common"),
         (2, "cherry common"),
         (3, "durian common common")],
        "doc_id long, text string")
    out = [(r["term"], r["tfidf"], r["rank"])
           for r in keywords_tfidf(docs, top_k=2)
           .where(F.col("doc_id") == 1)
           .orderBy("rank").collect()]
    # df: apple 1, banana 1, common 3 -> idf ln(3/1)=1.0986, ln(3/3)=0
    assert out[0][0] == "apple"
    assert out[0][1] == round(2 * math.log(3.0), 6)
    assert out[1][0] == "banana"  # tf 1, beats zero-idf 'common'
    assert [o[2] for o in out] == [1, 2]


def test_gopher_quality_filter(spark):
    from open_source_search_engine_spark.ops.textstats import (
        gopher_quality_filter,
    )

    good = ("the quick brown fox jumps over a lazy dog and then it "
            "runs on for quite a while longer because the rule wants "
            "fifty words minimum so this sentence keeps going with "
            "more plain english words to cross the threshold easily "
            "and a few extra for safe margin okay done now truly")
    docs = spark.createDataFrame(
        [(1, good),
         (2, "short doc"),                       # fails min_words
         (3, " ".join(["####"] * 60)),           # symbols + no alpha
         (4, " ".join(["zz"] * 60))],            # mean len + stopwords
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality_filter(docs).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["ok_words"] is False
    assert out[3]["keep"] is False
    assert out[3]["ok_symbols"] is False and out[3]["ok_alpha"] is False
    assert out[4]["keep"] is False and out[4]["ok_stops"] is False
    # signals are emitted, not just verdicts
    assert out[1]["n_words"] >= 50
    assert 3.0 <= out[1]["mean_word_len"] <= 10.0


def test_c4_quality_filter(spark):
    from open_source_search_engine_spark.ops.textstats import (
        c4_quality_filter,
    )

    good = ("this is a perfectly fine sentence.\n"
            "another line with enough words here!\n"
            'a third quoted line with many words."\n'
            "short one.")
    docs = spark.createDataFrame(
        [(1, good),
         (2, "no terminal punctuation at all\nnot here either"),
         (3, "lorem ipsum dolor sit amet something here.\n"
             "two more lines that are fine right here.\n"
             "and a third full line ending properly too."),
         (4, "var x = { a: 1 }. this looks like code leaked in.\n"
             "second line with enough words here too.\n"
             "third line with plenty of words as well.")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_quality_filter(docs).collect()}
    assert out[1]["keep"] is True
    assert out[1]["n_kept_lines"] == 3  # "short one." has < 5 words
    assert "short one." not in out[1]["clean_text"]
    assert out[2]["keep"] is False and out[2]["n_kept_lines"] == 0
    assert out[3]["keep"] is False and out[3]["has_badword"] is True
    assert out[4]["keep"] is False and out[4]["has_brace"] is True


def test_substring_dedup_first_occurrence_kept(spark):
    from open_source_search_engine_spark.ops.dedup import substring_dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h unique one tail"),
         (2, "x y a b c d e f g h z w q r s t"),
         (3, "no shared window content here at all today ok"),
         (4, "too short"),
         (5, "rep rep rep rep rep rep rep rep rep rep")],
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in substring_dedup(docs, window=8, min_count=2).collect()}
    # first occurrence (doc 1) keeps the duplicated span verbatim
    assert out[1]["n_removed_tokens"] == 0
    assert out[1]["clean_text"].startswith("a b c d e f g h")
    # later occurrence loses exactly the 8 covered tokens
    assert out[2]["n_removed_tokens"] == 8
    assert out[2]["clean_text"] == "x y z w q r s t"
    # unique doc untouched; sub-window doc passes through whole
    assert out[3]["n_removed_tokens"] == 0
    assert out[4]["n_removed_tokens"] == 0
    assert out[4]["clean_text"] == "too short"
    # within-doc repetition is also deduplicated (overlapping windows
    # erode the keeper span down to the unrepeated prefix)
    assert out[5]["n_removed_tokens"] == 9
    assert out[5]["clean_text"] == "rep"


def test_lm_quality_buckets(spark):
    from open_source_search_engine_spark.ops.textstats import (
        lm_quality_buckets,
    )

    common = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, common, "en") for i in range(1, 5)]
        + [(5, "zxqj vvkw qqqz jjjx wwwv kkkq zzzj xxxq vvvw qqqk", "en")],
        "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in lm_quality_buckets(docs).collect()}
    # the gibberish doc has the highest cross-entropy -> tail
    assert out[5]["bucket"] == "tail"
    assert out[1]["bucket"] == "head"  # rank tertiles, doc_id tie-break
    assert out[5]["cross_entropy"] > out[1]["cross_entropy"]
    # explicit-cutoff mode is map-only and honors the thresholds
    fixed = {r["doc_id"]: r["bucket"]
             for r in lm_quality_buckets(
                 docs, cutoffs=(out[1]["cross_entropy"],
                                out[1]["cross_entropy"])).collect()}
    assert fixed[1] == "head" and fixed[5] == "tail"
    # a disjoint LM corpus exercises the OOV floor without crashing
    lm_src = docs.where("doc_id <= 2")
    scored = lm_quality_buckets(docs.where("doc_id = 5"), lm_docs=lm_src,
                                cutoffs=(1.0, 2.0)).collect()
    assert scored[0]["bucket"] == "tail"


def test_dsir_importance_prefers_target_like_docs(spark):
    from open_source_search_engine_spark.ops.sampling import (
        dsir_importance,
    )

    target = spark.createDataFrame(
        [(100 + i, "physics energy quantum field theory lattice")
         for i in range(3)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "physics energy quantum field notes"),
         (2, "cooking pasta recipe tomato basil sauce"),
         (3, "energy field theory quantum lattice physics"),
         (4, "celebrity gossip fashion week highlights")],
        "doc_id long, text string")
    out = dsir_importance(raw, target, n_buckets=512)
    rows = {r["doc_id"]: r for r in out.collect()}
    # target-like docs outrank off-domain docs
    assert {rows[1]["dsir_rank"], rows[3]["dsir_rank"]} == {1, 2}
    assert rows[2]["logw"] < min(rows[1]["logw"], rows[3]["logw"])
    # k selects exactly the top-k with ranks 1..k
    top2 = dsir_importance(raw, target, n_buckets=512, k=2).collect()
    assert sorted(r["dsir_rank"] for r in top2) == [1, 2]
    assert {r["doc_id"] for r in top2} == {1, 3}


def test_url_quality_filter(spark):
    from open_source_search_engine_spark.ops.urlfilter import (
        url_quality_filter,
    )

    rows = [
        (1, "http://good.example/articles/cooking.html"),
        (2, "http://banned.example/anything.html"),
        (3, "http://ok.example/free-casino-spins.html"),
        (4, "http://ok.example/" + "x" * 300),
        (5, "http://ok.example/123456789012345678901234567890.html"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_quality_filter(
        df, blocked_domains=["banned.example"],
        max_digit_frac=0.3).collect()}
    assert out[1]["keep"] is True and out[1]["domain"] == "good.example"
    assert out[2]["blocked_domain"] is True and out[2]["keep"] is False
    assert out[3]["n_badwords"] == 1 and out[3]["keep"] is False
    assert out[4]["too_long"] is True and out[4]["keep"] is False
    assert out[5]["digit_frac"] > 0.3 and out[5]["keep"] is False
    # DataFrame blocklist path: one broadcast join, same verdicts
    bl = spark.createDataFrame([("banned.example",)], "domain string")
    out2 = {r["doc_id"]: r["blocked_domain"]
            for r in url_quality_filter(df, blocked_domains=bl).collect()}
    assert out2[2] is True and out2[1] is False


def test_substring_dedup_differential_random(spark):
    """Differential pin: substring_dedup over 60 random small docs must
    equal a direct pure-python evaluation of the rule (span hash ->
    count+first occurrence -> coverage removal)."""
    import random

    rng = random.Random(20260819)
    vocab = [f"w{i}" for i in range(12)]
    docs = {}
    for d in range(1, 61):
        n = rng.randint(2, 30)
        docs[d] = " ".join(rng.choice(vocab) for _ in range(n))
    W = 5

    # pure-python reference
    spans = {}
    for d in sorted(docs):
        ts = docs[d].split()
        for s in range(0, max(0, len(ts) - W + 1)):
            key = " ".join(ts[s:s + W])
            spans.setdefault(key, []).append((d, s))
    want = {}
    for d in sorted(docs):
        ts = docs[d].split()
        rem = set()
        for s in range(0, max(0, len(ts) - W + 1)):
            occ = spans[" ".join(ts[s:s + W])]
            if len(occ) >= 2 and occ[0] != (d, s):
                rem.update(range(s, s + W))
        kept = [t for i, t in enumerate(ts) if i not in rem]
        want[d] = (len(ts), len(ts) - len(kept), " ".join(kept))

    from open_source_search_engine_spark.ops.dedup import substring_dedup

    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed_tokens"],
                         r["clean_text"])
           for r in substring_dedup(df, window=W, min_count=2).collect()}
    assert got == want


def test_remove_contaminated_policy(spark):
    from open_source_search_engine_spark.ops.dedup import (
        remove_contaminated,
    )

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "a completely unrelated training document goes right here"),
         (3, "short doc")],
        "doc_id long, text string")
    evals = spark.createDataFrame(
        [(90, "watch the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string")
    kept = {r["doc_id"]
            for r in remove_contaminated(train, evals, n=5).collect()}
    assert kept == {2, 3}  # doc 1 shares 5-grams; doc 3 too short to flag


def test_pack_sequences_differential(spark):
    """pack_sequences == a pure-python concat-and-chunk evaluation,
    exercising the multi-bucket prefix-sum path (bucket_width smaller
    than the doc_id range)."""
    from open_source_search_engine_spark.ops.textstats import (
        pack_sequences,
    )

    rng = np.random.default_rng(7)
    rows = []
    for d in range(60):
        k = int(rng.integers(1, 40))
        rows.append({"doc_id": d * 3,  # sparse ids
                     "text": " ".join(f"w{j}" for j in range(k))})
    docs = spark.createDataFrame(pd.DataFrame(rows))
    L, SEP = 64, 1
    got = {r["doc_id"]: r for r in
           pack_sequences(docs, seq_len=L, sep_tokens=SEP,
                          bucket_width=16).collect()}

    off = 0
    for r in sorted(rows, key=lambda x: x["doc_id"]):
        n = len(r["text"].split(" "))
        g = got[r["doc_id"]]
        assert g["n_tokens"] == n
        assert g["tok_off"] == off
        assert g["seq_first"] == off // L
        assert g["seq_last"] == (off + n - 1) // L
        off += n + SEP
    # every sequence index between first and last is contiguous corpus
    # coverage: doc i's seq_first is <= doc i-1's seq_last + 1
    ordered = [got[r["doc_id"]]
               for r in sorted(rows, key=lambda x: x["doc_id"])]
    for a, b in zip(ordered, ordered[1:]):
        assert b["seq_first"] - a["seq_last"] <= 1


def test_semdedup_keeps_low_centroid_sim(spark):
    """SemDedup hand trace: 2 pick-first centroids (vecs 0/1), one
    near-dup pair per cell. In each pair the paper rule keeps the
    member with the LOWER centroid cosine — so the centroid itself
    (ccos=1.0) is the one dropped."""
    from open_source_search_engine_spark.ops.dedup import semdedup

    rows = [
        {"vec_id": 0, "embedding": [1.0, 0.0, 0.0, 0.0]},   # centroid c0
        {"vec_id": 1, "embedding": [0.0, 1.0, 0.0, 0.0]},   # centroid c1
        {"vec_id": 2, "embedding": [1.0, 0.1, 0.0, 0.0]},   # dup of 0
        {"vec_id": 3, "embedding": [0.9, 0.5, 0.0, 0.0]},   # cell 0, uniq
        {"vec_id": 4, "embedding": [0.1, 1.0, 0.0, 0.0]},   # dup of 1
        {"vec_id": 5, "embedding": [0.0, 0.5, 0.9, 0.0]},   # cell 1, uniq
    ]
    emb = spark.createDataFrame(pd.DataFrame(rows))
    out = {r["vec_id"]: r for r in
           semdedup(emb, threshold=0.98, n_cells=2).collect()}

    assert {v: out[v]["cell"] for v in range(6)} == {
        0: 0, 2: 0, 3: 0, 1: 1, 4: 1, 5: 1}
    # centroids score 1.0 against themselves
    assert out[0]["centroid_cos"] == pytest.approx(1.0)
    assert out[1]["centroid_cos"] == pytest.approx(1.0)
    # dup pairs (0,2) and (1,4): the LOWER-ccos member survives
    assert {v: out[v]["keep"] for v in range(6)} == {
        0: 0, 2: 1, 3: 1, 1: 0, 4: 1, 5: 1}

    # threshold above every pairwise cos -> everything kept
    all_kept = semdedup(emb, threshold=1.01, n_cells=2).collect()
    assert all(r["keep"] == 1 for r in all_kept)


def test_pq_encode_and_adc(spark):
    """PQ sanity: a vector that IS a codebook entry encodes to that
    code in every subspace; ADC of the query against its own code is
    ~cos=1; IVF-PQ probe == PQ-flat restricted to the probe cells."""
    import numpy as np

    from open_source_search_engine_spark.ops.ann import (
        build_ivfpq_index,
        ivf_centroids,
        ivfpq_topk_indexed,
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    rng = np.random.RandomState(11)
    dim, n = 16, 40
    rows = [{"vec_id": i,
             "embedding": [float(x) for x in rng.randn(dim)]}
            for i in range(n)]
    emb = spark.createDataFrame(pd.DataFrame(rows))
    cbs = pq_codebooks(emb, n_sub=4, n_codes=8)
    codes = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(emb, cbs).collect()}
    assert set(codes) == set(range(n))
    # vec_ids 0..7 ARE the codebook entries -> each encodes to itself
    for c in range(8):
        assert codes[c] == [c, c, c, c]

    qv = rows[3]["embedding"]  # query = codebook entry 3
    top = pq_adc_topk(pq_encode(emb, cbs), cbs, qv, k=5).collect()
    assert top[0]["vec_id"] == 3
    assert top[0]["adc"] == pytest.approx(1.0, abs=2e-4)

    import shutil
    import tempfile
    d = tempfile.mkdtemp(prefix="osse_test_ivfpq_")
    try:
        cents = ivf_centroids(emb, 4)
        build_ivfpq_index(emb, d, n_cells=4, n_sub=4, n_codes=8,
                          centroids=cents, codebooks=cbs)
        probed = ivfpq_topk_indexed(spark, d, cents, cbs, qv, k=5,
                                    nprobe=4).collect()  # all cells
        flat = pq_adc_topk(pq_encode(emb, cbs), cbs, qv, k=5).collect()
        assert [(r["vec_id"], r["adc"]) for r in probed] == \
               [(r["vec_id"], r["adc"]) for r in flat]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bloom_filter_dedup_matches_sequential(spark):
    """Differential pin: the distributed min-order-per-bit formulation
    must equal a literal sequential test-then-insert Bloom pass
    (false positives included) on a random corpus sized to saturate
    the filter."""
    import hashlib
    import random

    from open_source_search_engine_spark.ops.dedup import (
        MERSENNE_P,
        _perm_coeffs,
        bloom_filter_dedup,
    )

    rng = random.Random(5)
    words = [f"w{i}" for i in range(30)]
    docs = []
    paras_by_doc = []
    for d in range(20):
        paras = []
        for _ in range(rng.randint(2, 6)):
            if paras_by_doc and rng.random() < 0.3:
                # re-use an earlier paragraph -> guaranteed exact dup
                src = rng.choice(paras_by_doc)
                paras.append(rng.choice(src))
            else:
                paras.append(" ".join(rng.choice(words)
                                      for _ in range(rng.randint(2, 5))))
        paras_by_doc.append(paras)
        docs.append({"doc_id": d, "text": "\n".join(paras)})
    df = spark.createDataFrame(pd.DataFrame(docs))

    m_bits, k = 64, 3  # tiny filter -> false positives guaranteed
    coeffs = _perm_coeffs(k, seed="osse-bff")

    def positions(para):
        x = int(hashlib.md5(para.encode()).hexdigest()[:15], 16) % MERSENNE_P
        return [(a * x + b) % MERSENNE_P % m_bits for a, b in coeffs]

    bits = set()
    expected = {}
    for d, paras in enumerate(paras_by_doc):
        for i, p in enumerate(paras):
            ps = positions(p)
            expected[(d, i)] = 0 if all(b in bits for b in ps) else 1
            bits.update(ps)

    got = {(r["doc_id"], r["para_idx"]): r["keep"]
           for r in bloom_filter_dedup(df, m_bits=m_bits,
                                       k_hashes=k).collect()}
    assert got == expected
    # the tiny filter must actually have produced false positives:
    # some dropped paragraph has no earlier identical occurrence
    seen = set()
    fp = 0
    for d, paras in enumerate(paras_by_doc):
        for i, p in enumerate(paras):
            if expected[(d, i)] == 0 and p not in seen:
                fp += 1
            seen.add(p)
    assert fp > 0


def test_pagerank_fixed_point(spark):
    """Cycle invariance (uniform stationary rank) + differential pin
    against a literal pure-python fixed-point iteration on an
    asymmetric graph."""
    from open_source_search_engine_spark.ops.graph import pagerank

    S = 10 ** 9

    # 3-cycle: outdeg 1 everywhere -> rank stays exactly at scale
    cyc = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 0]}))
    got = {r["node"]: r["rank_fp"] for r in pagerank(cyc, 5).collect()}
    assert got == {0: S, 1: S, 2: S}

    # asymmetric: hub 0 -> 1,2,3; 1 -> 2; 2 -> 0; 3 dangling
    e = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 0)]
    df = spark.createDataFrame(pd.DataFrame(e, columns=["src", "dst"]))

    nodes = {0, 1, 2, 3}
    outdeg = {0: 3, 1: 1, 2: 1}
    r = {v: S for v in nodes}
    base = S * 15 // 100
    for _ in range(5):
        mass = {v: 0 for v in nodes}
        for s, d in e:
            mass[d] += r[s] // outdeg[s]
        r = {v: base + 85 * mass[v] // 100 for v in nodes}

    got = {x["node"]: x["rank_fp"] for x in pagerank(df, 5).collect()}
    assert got == r
    assert got[2] > got[3]  # two in-links beat the dangling leaf


def test_hits_fixed_point(spark):
    """Differential pin vs a pure-python fixed-point HITS loop, plus
    the structural expectation: on 0->{1,2,3}, 1->2, 2->0 the sole
    3-outlink hub (0) must dominate hubs and the doubly-cited node (2)
    must dominate authorities."""
    from open_source_search_engine_spark.ops.graph import hits

    S = 10 ** 6
    e = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 0)]
    df = spark.createDataFrame(pd.DataFrame(e, columns=["src", "dst"]))

    nodes = {0, 1, 2, 3}
    h = {v: S for v in nodes}
    a = {}
    for _ in range(5):
        ra = {v: 0 for v in nodes}
        for s_, d_ in e:
            ra[d_] += h[s_]
        am = max(ra.values()) or 1
        a = {v: ra[v] * S // am for v in nodes}
        rh = {v: 0 for v in nodes}
        for s_, d_ in e:
            rh[s_] += a[d_]
        hm = max(rh.values()) or 1
        h = {v: rh[v] * S // hm for v in nodes}

    got = {r["node"]: (r["hub_fp"], r["auth_fp"])
           for r in hits(df, 5).collect()}
    assert got == {v: (h[v], a[v]) for v in nodes}
    assert got[0][0] == S and all(got[v][0] < S for v in (1, 2, 3))
    assert got[2][1] == S
    assert got[3][0] == 0  # dangling leaf: no out-links -> hub 0


def test_similar_docs_ranks_shared_vocabulary(spark):
    """MLT sanity: a near-copy of the query doc outranks a doc sharing
    one term, docs sharing nothing are absent, the query doc itself is
    excluded, and sim == 1.0 for an exact duplicate."""
    from open_source_search_engine_spark.ops.textstats import similar_docs

    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},
        {"doc_id": 1, "text": "alpha beta gamma delta"},       # exact dup
        {"doc_id": 2, "text": "alpha beta zzz yyy"},           # half
        {"doc_id": 3, "text": "alpha qqq rrr sss"},            # one term
        {"doc_id": 4, "text": "www xxx uuu vvv"},              # disjoint
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = similar_docs(df, query_doc_id=0, k=10).collect()
    by_id = {r["doc_id"]: r["sim"] for r in got}
    assert 0 not in by_id and 4 not in by_id
    assert by_id[1] == pytest.approx(1.0)
    assert by_id[1] > by_id[2] > by_id[3]
    assert [r["doc_id"] for r in got] == sorted(
        by_id, key=lambda d: (-by_id[d], d))


def test_bpe_train_matches_reference_loop(spark):
    """Differential pin: the distributed BPE trainer must produce the
    exact merge sequence of a literal pure-python Sennrich loop (same
    counting, same tie-breaks) on a corpus with repeats, and
    bpe_word_pieces must re-segment the vocabulary identically."""
    from collections import Counter

    from open_source_search_engine_spark.ops.textstats import (
        bpe_train,
        bpe_word_pieces,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low newer wide lowest",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))

    words = Counter(w for t in texts for w in t.split())
    vocab = {w: list(w) + ["</w>"] for w in words}

    def ref_merges(n):
        v = {w: list(s) for w, s in vocab.items()}
        out = []
        for rank in range(n):
            pc = Counter()
            for w, syms in v.items():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += words[w]
            if not pc:
                break
            (l, r), n_ = min(pc.items(),
                             key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            if n_ < 2:
                break
            out.append((rank, l, r, l + r))
            for w, syms in v.items():
                ns, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == l
                            and syms[i + 1] == r):
                        ns.append(l + r)
                        i += 2
                    else:
                        ns.append(syms[i])
                        i += 1
                v[w] = ns
        return out, v

    exp, exp_vocab = ref_merges(12)
    got = [(r["rank"], r["left"], r["right"], r["merged"])
           for r in bpe_train(df, n_merges=12).orderBy("rank").collect()]
    assert got == exp

    pieces = {r["word"]: list(r["pieces"]) for r in
              bpe_word_pieces(df, [(l, r) for _, l, r, _ in exp]).collect()}
    assert pieces == exp_vocab


def test_mixture_sample_sqrt_allocation(spark):
    """alpha=0.5 mixing on a skewed 2-source corpus: quotas follow
    integer sqrt weights, small source upweighted vs its corpus share,
    nested in n_target, explicit-weights override honored."""
    from open_source_search_engine_spark.ops.sampling import (
        mixture_sample,
    )

    rows = ([{"doc_id": i, "lang": "en", "text": "x"} for i in range(90)]
            + [{"doc_id": 90 + i, "lang": "da", "text": "x"}
               for i in range(10)])
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = mixture_sample(df, n_target=60).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r)
    # w_en = floor(sqrt(90)) = 9, w_da = 3 -> quotas 60*9//12=45, 15;
    # da holds only 10 docs, so it contributes all 10 (quota capped by
    # availability)
    assert len(by["en"]) == 45 and len(by["da"]) == 10
    assert all(r["quota"] == 45 for r in by["en"])
    assert all(r["quota"] == 15 for r in by["da"])
    # da corpus share is 10% but gets 25% of the sample (upweighted)
    # nesting: the n_target=24 sample is a subset of the 60 sample
    small = {(r["lang"], r["doc_id"])
             for r in mixture_sample(df, n_target=24).collect()}
    big = {(r["lang"], r["doc_id"]) for r in out}
    assert small < big and len(small) == 24  # 18 en + 6 da
    # explicit weights: force 1:1
    even = mixture_sample(df, n_target=20,
                          weights={"en": 1, "da": 1}).collect()
    cnt = {}
    for r in even:
        cnt[r["lang"]] = cnt.get(r["lang"], 0) + 1
    assert cnt == {"en": 10, "da": 10}


def test_sessionize_gap_rule(spark):
    """Hand-traced gaps: events at t=0,10,20 then 100 (gap 80 > 30)
    then 105 form two sessions; a second user is independent; rollup
    aggregates match."""
    import datetime as dt

    from open_source_search_engine_spark.ops.events import (
        session_rollup,
        sessionize,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        {"event_id": i, "user_id": u, "value": 1.0,
         "ts": base + dt.timedelta(seconds=s)}
        for i, (u, s) in enumerate([
            (1, 0), (1, 10), (1, 20), (1, 100), (1, 105),
            (2, 0), (2, 1000)])]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {r["event_id"]: r["session_idx"]
           for r in sessionize(df, gap_seconds=30).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 2}

    roll = {(r["user_id"], r["session_idx"]):
            (r["n_events"], r["duration_secs"])
            for r in session_rollup(df, gap_seconds=30).collect()}
    assert roll == {(1, 1): (3, 20), (1, 2): (2, 5),
                    (2, 1): (1, 0), (2, 2): (1, 0)}


def test_funnel_strict_ordering(spark):
    """Hand trace: a purchase BEFORE the first view must not count;
    same-second steps don't advance; partial progress recorded."""
    import datetime as dt

    from open_source_search_engine_spark.ops.events import funnel

    base = dt.datetime(2024, 1, 1)

    def ev(i, u, t, secs):
        return {"event_id": i, "user_id": u, "event_type": t,
                "ts": base + dt.timedelta(seconds=secs)}

    rows = [
        # user 1: full ordered funnel
        ev(0, 1, "view", 0), ev(1, 1, "click", 10), ev(2, 1, "purchase", 20),
        # user 2: purchase precedes view -> only view+click count
        ev(3, 2, "purchase", 0), ev(4, 2, "view", 10), ev(5, 2, "click", 20),
        # user 3: click same second as view -> not strictly after
        ev(6, 3, "view", 0), ev(7, 3, "click", 0),
        # user 4: never views
        ev(8, 4, "click", 0), ev(9, 4, "purchase", 10),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {r["user_id"]: r["steps_completed"]
           for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert got == {1: 3, 2: 2, 3: 1, 4: 0}


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing invariants: expected density ~2/(w+1), rightmost-min
    tie rule, and the paper's guarantee — any shared span of
    >= k+w-1 tokens yields at least one shared fingerprint."""
    from open_source_search_engine_spark.ops.textstats import (
        winnow_fingerprints,
    )

    shared = "q w e r t y u i o p a s d f g h"          # 16 tokens
    rows = [
        {"doc_id": 0, "text": "one two " + shared + " three four"},
        {"doc_id": 1, "text": "alpha beta gamma " + shared},
        {"doc_id": 2, "text": "totally disjoint words here live now ok yes"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    fp = winnow_fingerprints(df, k=5, w=4).collect()
    by = {}
    for r in fp:
        by.setdefault(r["doc_id"], set()).add(r["fp"])
    # guarantee: docs 0 and 1 share the 16-token span (>= 5+4-1=8)
    assert by[0] & by[1]
    assert not (by[0] & by[2]) and not (by[1] & by[2])
    # density: selected distinct picks << total k-grams
    n_grams_0 = len(rows[0]["text"].split()) - 4
    assert len([r for r in fp if r["doc_id"] == 0]) < n_grams_0


def test_collocations_pmi(spark):
    """A pair that always co-occurs exclusively gets the max PMI;
    min_count filters rare pairs."""
    from open_source_search_engine_spark.ops.textstats import collocations

    rows = [{"doc_id": i,
             "text": "zig zag foo " + ("bar " if i % 2 else "baz ")
                     + "foo qux"} for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = collocations(df, min_count=5, top_k=10).collect()
    pairs = [(r["w1"], r["w2"]) for r in got]
    # 'zig zag' occurs 10x and zig/zag appear nowhere else -> top PMI
    assert pairs[0] == ("zig", "zag")
    assert all(r["c_xy"] >= 5 for r in got)
    assert ("foo", "bar") in pairs  # exactly 5x -> passes min_count
    # raising min_count drops it
    strict = [(r["w1"], r["w2"]) for r in
              collocations(df, min_count=6, top_k=10).collect()]
    assert ("foo", "bar") not in strict and ("zig", "zag") in strict


def test_hll_cardinality_accuracy(spark):
    """HLL estimate within the standard error envelope on known
    cardinalities, registers merge by max (split-then-merge equals
    whole-set build)."""
    from open_source_search_engine_spark.ops.sketches import (
        hll_cardinality,
        hll_registers,
    )

    n = 50000
    vals = spark.range(n).selectExpr("concat('v', id) as v")
    est = hll_cardinality(vals, "v", p=12).collect()[0]["estimate"]
    assert abs(est - n) / n < 0.05  # sigma ~1.04/sqrt(4096) = 1.6%

    # mergeability: max-combine of two halves' registers == whole build
    a = hll_registers(vals.where("id < 25000"), "v")
    b = hll_registers(vals.where("id >= 25000"), "v")
    merged = (a.unionAll(b).groupBy("bucket")
              .agg(F.max("register").alias("register")))
    whole = hll_registers(vals, "v")
    assert (merged.exceptAll(whole).count() == 0
            and whole.exceptAll(merged).count() == 0)


def test_countmin_upper_bound(spark):
    """CMS never underestimates; exact when uncrowded; width crush
    forces collisions and over-estimates (still an upper bound)."""
    from open_source_search_engine_spark.ops.sketches import (
        countmin_build,
        countmin_estimate,
    )

    rows = [{"tok": f"t{i % 20}"} for i in range(400)]  # each 20x
    df = spark.createDataFrame(pd.DataFrame(rows))
    probes = df.distinct()
    est = {r["value"]: r["est"] for r in countmin_estimate(
        countmin_build(df, "tok"), probes, "tok").collect()}
    assert est == {f"t{i}": 20 for i in range(20)}

    tight = {r["value"]: r["est"] for r in countmin_estimate(
        countmin_build(df, "tok", depth=2, width=4), probes, "tok",
        depth=2, width=4).collect()}
    assert all(v >= 20 for v in tight.values())
    assert any(v > 20 for v in tight.values())


def test_semdedup_differential_random(spark):
    """Random-vector differential: the distributed SemDedup must equal
    a literal pure-python evaluation of the rule (pick-first centroids,
    rounded argmax-cos assignment with lowest-cell ties, (ccos, id)
    rank, upper-triangular >= tau drop)."""
    import math

    import numpy as np

    from open_source_search_engine_spark.ops.dedup import semdedup

    rng = np.random.RandomState(23)
    dim, n, n_cells, tau = 8, 60, 4, 0.8
    vecs = [list(map(float, rng.randn(dim))) for _ in range(n)]
    # plant near-dups so the drop path fires
    for a, b in ((10, 40), (11, 41), (12, 42)):
        vecs[b] = [x + 0.01 for x in vecs[a]]
    df = spark.createDataFrame(pd.DataFrame(
        {"vec_id": range(n), "embedding": vecs}))

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(num / (na * nb), 4)

    cents = vecs[:n_cells]
    cell, ccos = {}, {}
    for i, v in enumerate(vecs):
        cs = [cos(v, c) for c in cents]
        best = max(cs)
        cell[i] = cs.index(best)
        ccos[i] = best
    order = {}
    for c in range(n_cells):
        mem = sorted((i for i in range(n) if cell[i] == c),
                     key=lambda i: (ccos[i], i))
        for r, i in enumerate(mem):
            order[i] = r
    keep = {}
    for i in range(n):
        mates = [j for j in range(n)
                 if cell[j] == cell[i] and order[j] < order[i]]
        keep[i] = 0 if any(cos(vecs[i], vecs[j]) >= tau
                           for j in mates) else 1

    got = {r["vec_id"]: (r["cell"], r["keep"]) for r in
           semdedup(df, threshold=tau, n_cells=n_cells).collect()}
    assert got == {i: (cell[i], keep[i]) for i in range(n)}
    assert sum(k for _, k in got.values()) < n  # planted dups dropped


def test_textrank_keywords(spark):
    """Graph-centrality keyword sanity: the hub token adjacent to
    everything outranks peripheral tokens; per-doc isolation (a second
    doc's scores are unaffected by the first); top_k honored."""
    from open_source_search_engine_spark.ops.textstats import (
        textrank_keywords,
    )

    rows = [
        # 'hub' neighbors every other token; others only touch hub
        {"doc_id": 0, "text": "hub aa hub bb hub cc hub dd"},
        # identical structure with different tokens -> identical ranks
        {"doc_id": 1, "text": "nub xx nub yy nub zz nub ww"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = textrank_keywords(df, top_k=2).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append((r["rank"], r["term"],
                                               r["rank_fp"]))
    for d in (0, 1):
        by[d].sort()
        assert len(by[d]) == 2
    assert by[0][0][1] == "hub" and by[1][0][1] == "nub"
    # isomorphic graphs -> identical fixed-point scores
    assert [s for _, _, s in by[0]] == [s for _, _, s in by[1]]


def test_label_propagation_communities(spark):
    """Two 4-cliques joined by a single bridge resolve to two
    communities labeled by each clique's minimum node; an isolated
    directed sink keeps its own label."""
    from open_source_search_engine_spark.ops.graph import (
        label_propagation,
    )

    e = []
    for base in (0, 10):
        for a in range(4):
            for b in range(4):
                if a != b:
                    e.append((base + a, base + b))
    e += [(3, 10), (10, 3)]      # bridge
    e += [(0, 99)]               # 99 has in-degree but no clique mass
    df = spark.createDataFrame(pd.DataFrame(e, columns=["src", "dst"]))
    got = {r["node"]: r["community"]
           for r in label_propagation(df, 5).collect()}
    assert all(got[n] == 0 for n in (0, 1, 2, 3))
    assert all(got[n] == 10 for n in (10, 11, 12, 13))
    assert got[99] == 0  # adopts its only in-neighbor's community


def test_site_table_rollup(spark):
    """tagdb-analog per-site rollup: counts, dominant language with
    (count desc, langId asc) tie order, crawl-time span."""
    import datetime as dt

    import pandas as pd

    from open_source_search_engine_spark.ops.sitestats import site_table

    rows = []
    # site a: 3 docs, langs 1,1,9 -> main 1; site b: 2 docs langs 9,1
    # -> tie broken to langId 1; site c: single doc
    for i, (site, lang, ntok, rank) in enumerate([
            ("a.example", 1, 10, 3), ("a.example", 1, 20, 3),
            ("a.example", 9, 5, 3),
            ("b.example", 9, 7, 5), ("b.example", 1, 8, 5),
            ("c.example", 7, 9, 1)]):
        rows.append({"url": f"http://{site}/p/{i}.html",
                     "site_rank": rank, "lang_id": lang,
                     "n_tokens": ntok,
                     "warc_ts": dt.datetime(2024, 1, 1)
                     + dt.timedelta(minutes=i)})
    got = {r["site"]: r for r in
           site_table(spark.createDataFrame(pd.DataFrame(rows)))
           .collect()}
    a, b, c = got["a.example"], got["b.example"], got["c.example"]
    assert (a["n_docs"], a["total_tokens"], a["main_lang_id"],
            a["n_langs"], a["site_rank"]) == (3, 35, 1, 2, 3)
    assert a["last_ts"] - a["first_ts"] == 120
    assert (b["n_docs"], b["main_lang_id"]) == (2, 1)  # tie -> min id
    assert (c["n_docs"], c["main_lang_id"], c["n_langs"]) == (1, 7, 1)


def test_cocitation_related_hand_traced(spark):
    """Dean-Henzinger cocitation over a hand-traced link graph:
    linkers 1,2 -> {a,b}; 3 -> {a,c}; 4 -> {b,c}; 5 -> {a,b,c}.
    common(a,b)=3 (1,2,5), common(a,c)=2 (3,5), common(b,c)=2 (4,5);
    in-degrees a=4, b=4, c=3 -> jaccard ab=3/5, ac=bc=2/5. c's two
    candidates tie on (n_common, jaccard) and break related-ASC."""
    from open_source_search_engine_spark.ops.graph import (
        cocitation_related,
    )

    edges = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"),
             (3, "c"), (4, "b"), (4, "c"), (5, "a"), (5, "b"),
             (5, "c")]
    links = spark.createDataFrame(edges, "src long, dst string")
    rows = cocitation_related(links, k=10, min_common=2).collect()
    got = {(r["site"], r["rank"]): (r["related"], r["n_common"],
                                    r["jaccard"]) for r in rows}
    assert got[("a", 1)] == ("b", 3, 0.6)
    assert got[("a", 2)] == ("c", 2, 0.4)
    assert got[("b", 1)] == ("a", 3, 0.6)
    assert got[("b", 2)] == ("c", 2, 0.4)
    assert got[("c", 1)] == ("a", 2, 0.4)   # tie with b -> asc
    assert got[("c", 2)] == ("b", 2, 0.4)

    # min_common drops the 2-linker pairs
    rows3 = cocitation_related(links, k=10, min_common=3).collect()
    assert {(r["site"], r["related"]) for r in rows3} == {
        ("a", "b"), ("b", "a")}

    # max_out guard: a navigational hub linking 5 sites is excluded
    # from pair counting AND from in-degrees when max_out < 5
    hub = edges + [(9, x) for x in ("a", "b", "c", "d", "e")]
    links_h = spark.createDataFrame(hub, "src long, dst string")
    guarded = cocitation_related(links_h, k=10, min_common=2,
                                 max_out=4).collect()
    assert {(r["site"], r["rank"]): (r["related"], r["n_common"],
                                     r["jaccard"]) for r in guarded} \
        == got


def test_group_keywords_tfidf(spark):
    """Per-group contrastive terms: a term in every group gets idf 0;
    a group-exclusive term tops that group's list."""
    from open_source_search_engine_spark.ops.textstats import (
        group_keywords_tfidf,
    )

    docs = spark.createDataFrame(
        [(1, "alpha alpha shared", "a"),
         (2, "alpha shared", "a"),
         (3, "beta shared beta beta", "b"),
         (4, "gamma shared", "c")],
        "doc_id long, text string, source string")
    rows = group_keywords_tfidf(docs, group_col="source",
                                top_k=2).collect()
    top = {r["group"]: r["term"] for r in rows if r["rank"] == 1}
    assert top == {"a": "alpha", "b": "beta", "c": "gamma"}
    by = {(r["group"], r["term"]): r for r in rows}
    import math
    assert by[("a", "alpha")]["tf"] == 3
    assert by[("a", "alpha")]["df"] == 1
    assert by[("a", "alpha")]["tfidf"] == round(3 * math.log(3.0), 6)
    # 'shared' appears in all 3 groups -> idf ln(3/3) = 0
    shared = [r for r in rows if r["term"] == "shared"]
    assert all(r["tfidf"] == 0.0 for r in shared)
