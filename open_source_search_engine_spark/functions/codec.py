"""Posting-list blob codec: docID-delta varint + positions + packed context.

The reference compresses posting lists with 3-tier key truncation: 18 bytes
for a new termId, 12 for a new docId under the same termId, 6 for another
position of the same (termId, docId) (``Posdb.h:44-48, 228-233``;
merge-time preservation ``RdbList.cpp:2154 posdbMerge_r``). Our equivalent
(SURVEY.md §1.2, §7): one blob per (term_id [, salt]) holding

    header:  version u8 | n_docs varint
    docs:    delta-varint(doc_id ascending)
    tfs:     varint(tf per doc)
    doclens: varint (body token count per doc, for BM25 dl)
    blockmax:for each 128-doc block: varint(max_tf), varint(min_dl)
    pos:     per doc, tf * delta-varint(wordpos ascending)
    ctx:     per doc, tf * 3-byte packed context
             (hg 4b | density 5b | diversity 4b | wordspam 4b | syn 2b,
              field widths from Posdb.h:64-86)
    extra:   per doc varint(siterank<<6|langid) — key rank bits
             (Posdb.h:3-27 r/g bits)

All encode/decode is numpy-vectorized (no per-value Python loops) so a
single executor core sustains millions of postings/sec; blobs are stored
in a parquet/Iceberg ``segments`` table.

Block-max metadata powers block-max WAND at query time
(``PosdbTable.cpp:4494 getMaxPossibleScore`` analog; SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np

CODEC_VERSION = 1
BLOCK = 128  # docs per block-max block


def _varint_encode(values: np.ndarray) -> np.ndarray:
    """Vectorized LEB128 encode of a uint64 array -> uint8 array."""
    v = values.astype(np.uint64, copy=True)
    if len(v) == 0:
        return np.empty(0, dtype=np.uint8)
    # number of 7-bit groups per value (>=1)
    nbits = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    # bit_length via log2 is unsafe at 2^53; use a loop over the 10 possible
    # byte counts instead (bounded, vectorized inside)
    nbytes = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nz = tmp > 0
        nbytes[nz] += 1
        tmp = tmp >> np.uint64(7)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # write byte k of every value that has >= k+1 bytes
    maxb = int(nbytes.max())
    idx = starts.copy()
    shifted = v.copy()
    for k in range(maxb):
        alive = nbytes > k
        b = (shifted[alive] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[alive] - 1) > k
        b[more] |= 0x80
        out[idx[alive]] = b
        idx[alive] += 1
        shifted = shifted >> np.uint64(7)
    return out


def _varint_decode(buf: np.ndarray, count: int, offset: int) -> tuple[np.ndarray, int]:
    """Vectorized LEB128 decode of `count` values starting at `offset`.
    Returns (values uint64, new_offset)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64), offset
    data = buf[offset:]
    cont = (data & 0x80) != 0
    # terminator positions: bytes with high bit clear
    term_idx = np.flatnonzero(~cont)
    if len(term_idx) < count:
        raise ValueError("varint stream truncated")
    ends = term_idx[:count]
    used = int(ends[count - 1]) + 1
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    vals = np.zeros(count, dtype=np.uint64)
    maxlen = int(lens.max())
    for k in range(maxlen):
        alive = lens > k
        b = data[starts[alive] + k].astype(np.uint64)
        vals[alive] |= (b & np.uint64(0x7F)) << np.uint64(7 * k)
    return vals, offset + used


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray,
    positions: np.ndarray,
    ctxs: np.ndarray,
    ranks: np.ndarray,
) -> bytes:
    """Encode one term's postings. Inputs:
    doc_ids/tfs/doclens/ranks: per-doc arrays (doc_ids ascending);
    positions/ctxs: flattened per-position arrays grouped by doc, positions
    ascending within each doc."""
    nd = len(doc_ids)
    doc_ids = doc_ids.astype(np.uint64)
    tfs = tfs.astype(np.uint64)
    header = np.frombuffer(bytes([CODEC_VERSION]), dtype=np.uint8)
    parts = [header, _varint_encode(np.array([nd], dtype=np.uint64))]
    if nd:
        deltas = np.empty(nd, dtype=np.uint64)
        deltas[0] = doc_ids[0]
        deltas[1:] = doc_ids[1:] - doc_ids[:-1]
        parts.append(_varint_encode(deltas))
        parts.append(_varint_encode(tfs))
        parts.append(_varint_encode(doclens.astype(np.uint64)))
        # block-max: per 128-doc block max tf and min doclen
        nblocks = (nd + BLOCK - 1) // BLOCK
        pad = nblocks * BLOCK - nd
        tf_p = np.pad(tfs, (0, pad), constant_values=0).reshape(nblocks, BLOCK)
        dl_p = np.pad(
            doclens.astype(np.uint64), (0, pad),
            constant_values=np.iinfo(np.uint64).max if pad else 0,
        ).reshape(nblocks, BLOCK)
        if pad:
            dl_p[-1, BLOCK - pad:] = dl_p[-1, : BLOCK - pad].max(initial=1)
        parts.append(_varint_encode(tf_p.max(axis=1)))
        parts.append(_varint_encode(dl_p.min(axis=1)))
        # positions: delta within doc; first position of each doc absolute
        pos = positions.astype(np.uint64)
        if len(pos):
            pdelta = np.empty(len(pos), dtype=np.uint64)
            pdelta[0] = pos[0]
            pdelta[1:] = pos[1:] - pos[:-1]
            # reset delta at doc starts
            starts = np.zeros(nd, dtype=np.int64)
            starts[1:] = np.cumsum(tfs[:-1]).astype(np.int64)
            pdelta[starts] = pos[starts]
            parts.append(_varint_encode(pdelta))
            # ctx: 3 bytes each, little-endian of 19-bit packed value
            c = ctxs.astype(np.uint32)
            cb = np.empty((len(c), 3), dtype=np.uint8)
            cb[:, 0] = c & 0xFF
            cb[:, 1] = (c >> 8) & 0xFF
            cb[:, 2] = (c >> 16) & 0xFF
            parts.append(cb.ravel())
        parts.append(_varint_encode(ranks.astype(np.uint64)))
    return b"".join(p.tobytes() for p in parts)


def decode_postings(blob: bytes) -> dict:
    """Full decode -> dict of numpy arrays (inverse of encode_postings)."""
    buf = np.frombuffer(blob, dtype=np.uint8)
    if buf[0] != CODEC_VERSION:
        raise ValueError(f"bad codec version {buf[0]}")
    off = 1
    nd_arr, off = _varint_decode(buf, 1, off)
    nd = int(nd_arr[0])
    if nd == 0:
        z = np.empty(0, dtype=np.uint64)
        return {"doc_ids": z, "tfs": z, "doclens": z, "block_max_tf": z,
                "block_min_dl": z, "positions": z, "ctxs": z, "ranks": z}
    deltas, off = _varint_decode(buf, nd, off)
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    tfs, off = _varint_decode(buf, nd, off)
    doclens, off = _varint_decode(buf, nd, off)
    nblocks = (nd + BLOCK - 1) // BLOCK
    bmax_tf, off = _varint_decode(buf, nblocks, off)
    bmin_dl, off = _varint_decode(buf, nblocks, off)
    npos = int(tfs.sum())
    pdelta, off = _varint_decode(buf, npos, off)
    positions = np.cumsum(pdelta, dtype=np.uint64)
    # undo the per-doc reset: recompute with doc-start breaks
    starts = np.zeros(nd, dtype=np.int64)
    starts[1:] = np.cumsum(tfs[:-1]).astype(np.int64)
    if npos:
        # positions within each doc are cumsum of deltas from doc start
        base = np.repeat(np.arange(nd), tfs.astype(np.int64))
        grp_start = starts[base]
        csum = np.cumsum(pdelta, dtype=np.uint64)
        start_csum = np.zeros(npos, dtype=np.uint64)
        start_csum = csum[grp_start] - pdelta[grp_start]
        positions = csum - start_csum
    cb = buf[off: off + 3 * npos].reshape(npos, 3).astype(np.uint32)
    ctxs = cb[:, 0] | (cb[:, 1] << 8) | (cb[:, 2] << 16)
    off += 3 * npos
    ranks, off = _varint_decode(buf, nd, off)
    return {
        "doc_ids": doc_ids, "tfs": tfs, "doclens": doclens,
        "block_max_tf": bmax_tf, "block_min_dl": bmin_dl,
        "positions": positions, "ctxs": ctxs, "ranks": ranks,
    }


def decode_headers(blob: bytes) -> dict:
    """Decode only doc_ids/tfs/doclens/block-max (skip positions/ctx) —
    the BM25 fast path; positions are only needed for phrase/proximity."""
    buf = np.frombuffer(blob, dtype=np.uint8)
    if buf[0] != CODEC_VERSION:
        raise ValueError(f"bad codec version {buf[0]}")
    off = 1
    nd_arr, off = _varint_decode(buf, 1, off)
    nd = int(nd_arr[0])
    if nd == 0:
        z = np.empty(0, dtype=np.uint64)
        return {"doc_ids": z, "tfs": z, "doclens": z,
                "block_max_tf": z, "block_min_dl": z}
    deltas, off = _varint_decode(buf, nd, off)
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    tfs, off = _varint_decode(buf, nd, off)
    doclens, off = _varint_decode(buf, nd, off)
    nblocks = (nd + BLOCK - 1) // BLOCK
    bmax_tf, off = _varint_decode(buf, nblocks, off)
    bmin_dl, off = _varint_decode(buf, nblocks, off)
    return {"doc_ids": doc_ids, "tfs": tfs, "doclens": doclens,
            "block_max_tf": bmax_tf, "block_min_dl": bmin_dl}


def merge_blobs(blobs: list[bytes], deleted_doc_ids: np.ndarray | None = None) -> bytes:
    """K-way merge of same-term blobs from multiple segment generations,
    newest-wins per docId, dropping deleted docIds (the negative-key
    annihilation of RdbList.cpp:1945-2043 / posdbMerge_r). `blobs` ordered
    oldest -> newest."""
    decoded = [decode_postings(b) for b in blobs]
    all_docs = np.concatenate([d["doc_ids"] for d in decoded])
    gen = np.concatenate(
        [np.full(len(d["doc_ids"]), g, dtype=np.int64) for g, d in enumerate(decoded)]
    )
    # newest generation wins: sort by (doc, gen) and keep last per doc
    order = np.lexsort((gen, all_docs))
    docs_sorted = all_docs[order]
    keep_mask = np.ones(len(order), dtype=bool)
    keep_mask[:-1] = docs_sorted[:-1] != docs_sorted[1:]
    keep = order[keep_mask]
    if deleted_doc_ids is not None and len(deleted_doc_ids):
        dd = np.asarray(deleted_doc_ids, dtype=np.uint64)
        keep = keep[~np.isin(all_docs[keep], dd)]
    # rebuild arrays
    src_of = np.concatenate(
        [np.full(len(d["doc_ids"]), g, dtype=np.int64) for g, d in enumerate(decoded)]
    )
    local_ix = np.concatenate(
        [np.arange(len(d["doc_ids"]), dtype=np.int64) for d in decoded]
    )
    keep = keep[np.argsort(all_docs[keep], kind="stable")]
    out_docs, out_tfs, out_dls, out_ranks = [], [], [], []
    out_pos, out_ctx = [], []
    for k in keep:
        d = decoded[src_of[k]]
        i = local_ix[k]
        tf = int(d["tfs"][i])
        ps = int(np.sum(d["tfs"][:i]))
        out_docs.append(d["doc_ids"][i])
        out_tfs.append(tf)
        out_dls.append(d["doclens"][i])
        out_ranks.append(d["ranks"][i])
        out_pos.append(d["positions"][ps: ps + tf])
        out_ctx.append(d["ctxs"][ps: ps + tf])
    if not out_docs:
        return encode_postings(*[np.empty(0, dtype=np.uint64)] * 6)
    return encode_postings(
        np.array(out_docs, dtype=np.uint64),
        np.array(out_tfs, dtype=np.uint64),
        np.array(out_dls, dtype=np.uint64),
        np.concatenate(out_pos) if out_pos else np.empty(0, dtype=np.uint64),
        np.concatenate(out_ctx) if out_ctx else np.empty(0, dtype=np.uint64),
        np.array(out_ranks, dtype=np.uint64),
    )
