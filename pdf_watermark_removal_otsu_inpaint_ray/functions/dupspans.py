"""Cross-document duplicated n-gram statistics — the exact-substring-dedup
signal of Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022), expressed corpus-scale.

For every document, count how many of its word n-gram OCCURRENCES also
appear elsewhere in the corpus (total corpus occurrences of that gram > 1,
including repeats inside the same document).  The per-doc dup fraction
``n_dup / n_grams`` is the standard "how much of this doc is boilerplate"
curation feature.

Distribution shape (the 100-TB path — nothing corpus-scale touches the
driver):

1. per-batch combiner (``map_batches``): tokenize + gram-hash the batch in
   one vectorized pass (the dedup word→gram polynomial chain, 63-bit), then
   collapse to distinct ``(gram, doc)`` rows with occurrence counts — one
   lexsort + boundary sweep, no per-row Python;
2. coarse ``groupby(gram % num_parts)``: every occurrence of a gram lands
   in exactly one partition, so the per-partition total IS the corpus
   total; rows of grams with total > 1 contribute their count to the doc's
   dup tally (vectorized argsort + ``reduceat``);
3. coarse ``groupby(doc % num_parts)``: per-doc partials from different
   gram partitions sum to the final ``(doc_id, n_grams, n_dup)`` row (one
   C-speed pandas groupby-sum per partition).

Both shuffles carry only int64 triples — never text, never gram strings.

Gram identity is the 63-bit hash of the word-hash tuple (``dedup.
_gram_hashes_flat``, property-tested against a pure-Python spec mirror);
the SQL twin joins on the gram STRING.  A hash collision would merge two
distinct grams — at 63 bits the odds are ~1e-9 even for 10^5 distinct
grams per partition, the standard trade for hash-keyed dedup (same caveat
as ``dedup.exact_dedup``).

Reference analog: the repeated-motif accumulation of the watermark
detector (cross-page persistence, ``watermark_remover.py``), generalized
from "token repeated across pages" to "n-gram repeated across documents".
"""

from __future__ import annotations

from ..config import scaled_parts

import numpy as np
import pyarrow as pa


def _gram_doc_counts(b: pa.Table, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch-local distinct ``(gram_hash, doc_id) -> count`` triple arrays.

    Only FULL n-grams count (a doc with fewer than n words yields none) —
    the exact semantics of the SQL twin's position join, so the short-doc
    single-gram fallback of ``_gram_hashes_flat`` is masked out here.
    """
    from .dedup import _gram_hashes_flat, _word_hashes_flat

    texts = b["text"].to_pylist()
    wh, doc_off = _word_hashes_flat(texts)
    grams, goff = _gram_hashes_flat(wh, doc_off, n)
    counts = np.diff(doc_off)
    rows = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(goff))
    keep = (counts >= n)[rows]
    grams, rows = grams[keep], rows[keep]
    if grams.size == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    ids = np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))[rows]
    order = np.lexsort((ids, grams))
    g_s, d_s = grams[order], ids[order]
    new = np.concatenate(([True], (g_s[1:] != g_s[:-1]) | (d_s[1:] != d_s[:-1])))
    starts = np.nonzero(new)[0]
    cnt = np.diff(np.append(starts, g_s.size)).astype(np.int64)
    return g_s[starts], d_s[starts], cnt


def cross_doc_dup_stats(ds, *, n: int = 3, num_parts: int | None = None):
    """Per-document duplicated-n-gram statistics over a corpus Dataset.

    Returns a Dataset of ``(doc_id, n_grams, n_dup)`` int64 rows — total
    n-gram occurrences and how many of them belong to grams occurring more
    than once corpus-wide.  Documents with fewer than ``n`` words emit no
    row (they have no full gram — same as the SQL twin's GROUP BY).
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def partials(b: pa.Table) -> pa.Table:
        gh, doc, cnt = _gram_doc_counts(b, n)
        return pa.table(
            {
                "gh": pa.array(gh, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "pk": pa.array(gh % num_parts, pa.int64()),
            }
        )

    def per_gram_partition(g: pd.DataFrame) -> pd.DataFrame:
        gh = g["gh"].to_numpy()
        doc = g["doc_id"].to_numpy()
        cnt = g["cnt"].to_numpy()
        order = np.argsort(gh, kind="stable")
        gh_s, doc_s, cnt_s = gh[order], doc[order], cnt[order]
        starts = np.concatenate(([True], gh_s[1:] != gh_s[:-1]))
        run_start = np.nonzero(starts)[0]
        tot = np.add.reduceat(cnt_s, run_start)  # corpus total per gram
        tot_row = np.repeat(tot, np.diff(np.append(run_start, gh_s.size)))
        dup = np.where(tot_row > 1, cnt_s, 0)
        # per-doc partial within this gram partition (C-speed groupby-sum)
        out = (
            pd.DataFrame({"doc_id": doc_s, "n_grams": cnt_s, "n_dup": dup})
            .groupby("doc_id", sort=False)
            .sum()
            .reset_index()
        )
        out["pk2"] = out["doc_id"].to_numpy() % num_parts
        return out

    def per_doc_partition(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g[["doc_id", "n_grams", "n_dup"]]
            .groupby("doc_id", sort=False)
            .sum()
            .reset_index()
        )
        return out.astype({"doc_id": np.int64, "n_grams": np.int64, "n_dup": np.int64})

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(per_gram_partition, batch_format="pandas")
        .groupby("pk2")
        .map_groups(per_doc_partition, batch_format="pandas")
    )


# -- maximal duplicated character spans (the Lee et al. REMOVE step) --------


def _window_grams(b: pa.Table, L: int):
    """All L-byte windows of the batch's texts as an (n_windows, L) uint8
    matrix (zero-copy stride view over the Arrow data buffer) plus each
    window's kept-doc ordinal and 0-based start position, and the kept doc
    ids.  ASCII corpus contract: positions are BYTE offsets (== char
    offsets for the synthetic corpus; the SQL twin's substr() counts
    chars)."""
    txt = b["text"].combine_chunks()
    ids = np.asarray(b["doc_id"], np.int64)
    odt = np.int64 if pa.types.is_large_string(txt.type) else np.int32
    offs = np.frombuffer(txt.buffers()[1], odt)[
        txt.offset : txt.offset + len(txt) + 1
    ].astype(np.int64)
    data = np.frombuffer(txt.buffers()[2], np.uint8)
    flat = np.ascontiguousarray(data[offs[0] : offs[-1]])
    lens = np.diff(offs)
    keep = lens >= L
    doc_starts = np.concatenate(([0], np.cumsum(lens)))
    if not keep.any():
        z = np.zeros(0, np.int64)
        return np.zeros((0, L), np.uint8), z, z, ids[keep]
    n_win = np.where(keep, lens - L + 1, 0)
    doc_of = np.repeat(np.arange(lens.size), n_win)
    pos_in_doc = np.arange(int(n_win.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(n_win)[:-1])), n_win
    )
    abs_start = doc_starts[doc_of] + pos_in_doc
    win = np.lib.stride_tricks.sliding_window_view(flat, L)[abs_start]
    kept_ord = np.cumsum(keep) - 1  # doc ordinal within the kept-doc space
    return win, kept_ord[doc_of], pos_in_doc, ids[keep]


def _fixed_bin(mat: np.ndarray, L: int) -> pa.Array:
    """(n, L) uint8 matrix -> FixedSizeBinary(L) array, one buffer copy."""
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(L), mat.shape[0], [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())]
    )


def _fsb_view(col: pa.ChunkedArray | pa.Array, L: int) -> np.ndarray:
    """FixedSizeBinary(L) column -> (n, L) uint8 view (offset-aware)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    data = np.frombuffer(arr.buffers()[1], np.uint8)
    return data[arr.offset * L : (arr.offset + len(arr)) * L].reshape(-1, L)


def duplicated_char_spans(ds, *, L: int = 24, num_parts: int | None = None, min_docs: int = 2):
    """Maximal cross-document duplicated character spans — the REMOVE step
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (ACL 2022).  ``cross_doc_dup_stats`` computes the per-doc
    statistic; this emits the actual ``(doc_id, span_start, span_end,
    span_len)`` intervals a curation pipeline cuts out.

    A position ``p`` is *duplicated* when the window ``text[p:p+L]``
    occurs in >= ``min_docs`` distinct documents corpus-wide;
    overlapping-or-touching duplicated windows (start gap <= L) merge
    into one maximal span.

    Distribution shape (the 100-TB path):

    1. per-batch combiner: every window of the batch from ONE zero-copy
       stride view; batch-local distinct ``(gram, doc)`` pairs via a void
       lexsort — the shuffle carries distinct pairs (L+8 bytes each),
       never one row per character position;
    2. coarse ``groupby(hash(gram) % num_parts)``: the hash only ROUTES;
       within a partition grams compare by exact bytes (sort + run
       sweep), so the duplicated decision is collision-free.  Grams
       reaching ``min_docs`` distinct docs emit once;
    3. the duplicated-gram set (output-scale: bounded by the corpus'
       shared content, not its size) is collected, sorted, broadcast once
       via ``ray.put``; at extreme duplication volume swap the broadcast
       for a semi-join on the gram bytes (same partitioning — documented
       escape hatch, same trade as the LSH candidate set);
    4. final ``map_batches``: membership via ``searchsorted`` against the
       broadcast set; island merge needs NO sort (window positions are
       generated in doc order) — one boolean gap test per batch.

    Reference analog: M8's span segmentation (watermark_remover.py
    component splits), driven by corpus-level content repetition instead
    of mask geometry.
    """
    num_parts = scaled_parts(64, num_parts)
    import ray

    from .dedup import _mix64

    if L % 8 != 0:
        raise ValueError("L must be a multiple of 8 (uint64 routing hash)")
    gdt = np.dtype((np.void, L))

    def gram_doc_pairs(b: pa.Table) -> pa.Table:
        win, doc_ord, _pos, ids = _window_grams(b, L)
        if win.shape[0] == 0:
            return pa.table(
                {
                    "gram": pa.array([], pa.binary(L)),
                    "doc_id": pa.array([], pa.int64()),
                    "pk": pa.array([], pa.int64()),
                }
            )
        v = np.ascontiguousarray(win).view(gdt).ravel()
        order = np.lexsort((doc_ord, v))
        vs, do = v[order], doc_ord[order]
        first = np.concatenate(([True], (vs[1:] != vs[:-1]) | (do[1:] != do[:-1])))
        grams = np.ascontiguousarray(vs[first]).view(np.uint8).reshape(-1, L)
        # routing key: mix of the gram's uint64 words (identity stays bytes)
        words = grams.view(np.uint64).reshape(grams.shape[0], -1)
        pk = (
            _mix64(words.sum(axis=1, dtype=np.uint64)) % np.uint64(num_parts)
        ).astype(np.int64)
        return pa.table(
            {
                "gram": _fixed_bin(grams, L),
                "doc_id": pa.array(ids[do[first]], pa.int64()),
                "pk": pa.array(pk, pa.int64()),
            }
        )

    def dup_grams_in_partition(g: pa.Table) -> pa.Table:
        raw = _fsb_view(g["gram"], L)
        v = np.ascontiguousarray(raw).view(gdt).ravel()
        d = np.asarray(g["doc_id"], np.int64)
        order = np.lexsort((d, v))
        vs, ds_ = v[order], d[order]
        new_gram = np.concatenate(([True], vs[1:] != vs[:-1]))
        new_pair = np.concatenate(
            ([True], (vs[1:] != vs[:-1]) | (ds_[1:] != ds_[:-1]))
        )
        run_start = np.nonzero(new_gram)[0]
        n_docs = np.add.reduceat(new_pair.astype(np.int64), run_start)
        sel = np.ascontiguousarray(vs[run_start[n_docs >= min_docs]])
        return pa.table(
            {"gram": _fixed_bin(sel.view(np.uint8).reshape(-1, L), L)}
        )

    pairs = ds.map_batches(gram_doc_pairs, batch_format="pyarrow")
    dup = (
        pairs.groupby("pk")
        .map_groups(dup_grams_in_partition, batch_format="pyarrow")
    )
    # output-scale collect of the duplicated-gram set, sorted once
    tabs = ray.get(dup.to_arrow_refs())
    mats = [_fsb_view(t["gram"], L) for t in tabs if t.num_rows]
    if mats:
        dup_sorted = np.sort(
            np.ascontiguousarray(np.concatenate(mats)).view(gdt).ravel()
        )
    else:
        dup_sorted = np.zeros(0, gdt)
    dup_ref = ray.put(dup_sorted)

    def mark_spans(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "span_start": pa.array([], pa.int64()),
                "span_end": pa.array([], pa.int64()),
                "span_len": pa.array([], pa.int64()),
            }
        )
        dup_set = ray.get(dup_ref)
        if dup_set.size == 0:
            return empty
        win, doc_ord, pos, ids = _window_grams(b, L)
        if win.shape[0] == 0:
            return empty
        v = np.ascontiguousarray(win).view(gdt).ravel()
        loc = np.searchsorted(dup_set, v)
        hit = (loc < dup_set.size) & (dup_set[np.minimum(loc, dup_set.size - 1)] == v)
        if not hit.any():
            return empty
        do, p = doc_ord[hit], pos[hit]
        # windows are generated in (doc, pos) order: islands need no sort
        brk = np.concatenate(
            ([True], (do[1:] != do[:-1]) | (p[1:] - p[:-1] > L))
        )
        starts = np.nonzero(brk)[0]
        ends = np.append(starts[1:], do.size) - 1
        span_start = p[starts]
        span_end = p[ends] + L
        return pa.table(
            {
                "doc_id": pa.array(ids[do[starts]], pa.int64()),
                "span_start": pa.array(span_start, pa.int64()),
                "span_end": pa.array(span_end, pa.int64()),
                "span_len": pa.array(span_end - span_start, pa.int64()),
            }
        )

    return ds.map_batches(mark_spans, batch_format="pyarrow")


def strip_duplicated_spans(ds, *, L: int = 24, num_parts: int | None = None, min_docs: int = 2):
    """REWRITE step of exact-substring dedup: cut every maximal duplicated
    span (:func:`duplicated_char_spans`) out of its document — returns
    ``(doc_id, clean_text, n_removed)`` for EVERY input doc (untouched
    docs pass through with ``n_removed = 0``).

    The span set is OUTPUT-scale (bounded by the corpus' shared content,
    exactly like the duplicated-gram set it derives from), so it is
    collected once and broadcast via ``ray.put``; the cut itself is one
    ``map_batches`` pass — per batch, span coverage unions via a +1/-1
    diff + cumsum over the flat byte buffer and the surviving bytes
    rebuild the string column ZERO-COPY through
    ``StringArray.from_buffers`` (no per-doc Python string assembly).
    """
    num_parts = scaled_parts(64, num_parts)
    import ray

    spans = duplicated_char_spans(ds, L=L, num_parts=num_parts, min_docs=min_docs)
    tabs = [t for t in ray.get(spans.to_arrow_refs()) if t.num_rows]
    if tabs:
        sp = pa.concat_tables(tabs)
        sdoc = np.asarray(sp["doc_id"], np.int64)
        sst = np.asarray(sp["span_start"], np.int64)
        sen = np.asarray(sp["span_end"], np.int64)
        o = np.lexsort((sst, sdoc))
        sdoc, sst, sen = sdoc[o], sst[o], sen[o]
    else:
        sdoc = sst = sen = np.zeros(0, np.int64)
    span_ref = ray.put((sdoc, sst, sen))

    def cut(b: pa.Table) -> pa.Table:
        sd, ss, se = ray.get(span_ref)
        txt = b["text"].combine_chunks()
        ids = np.asarray(b["doc_id"], np.int64)
        odt = np.int64 if pa.types.is_large_string(txt.type) else np.int32
        offs = np.frombuffer(txt.buffers()[1], odt)[
            txt.offset : txt.offset + len(txt) + 1
        ].astype(np.int64)
        data = np.frombuffer(txt.buffers()[2], np.uint8)
        flat = data[offs[0] : offs[-1]]
        lens = np.diff(offs)
        doc_starts = np.concatenate(([0], np.cumsum(lens)))
        # this batch's spans, mapped to absolute flat offsets
        lo = np.searchsorted(sd, ids, side="left")
        hi = np.searchsorted(sd, ids, side="right")
        n_sp = hi - lo
        rows = np.repeat(np.arange(ids.size), n_sp)
        idx = np.concatenate(
            [np.arange(l, h) for l, h in zip(lo, hi)]
        ) if rows.size else np.zeros(0, np.int64)
        cover = np.zeros(flat.size + 1, np.int64)
        if rows.size:
            abs_s = doc_starts[rows] + ss[idx]
            abs_e = doc_starts[rows] + se[idx]
            np.add.at(cover, abs_s, 1)
            np.add.at(cover, abs_e, -1)
        covered = np.cumsum(cover[:-1]) > 0
        keep = ~covered
        new_flat = np.ascontiguousarray(flat[keep])
        # prefix-sum segment count (reduceat mishandles zero-length docs)
        cs = np.concatenate(([0], np.cumsum(keep)))
        kept_per_doc = cs[doc_starts[1:]] - cs[doc_starts[:-1]]
        new_offs = np.concatenate(([0], np.cumsum(kept_per_doc))).astype(np.int32)
        clean = pa.StringArray.from_buffers(
            ids.size,
            pa.py_buffer(new_offs.tobytes()),
            pa.py_buffer(new_flat.tobytes()),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "clean_text": clean,
                "n_removed": pa.array(lens - kept_per_doc, pa.int64()),
            }
        )

    return ds.map_batches(cut, batch_format="pyarrow")


def doc_novelty(ds, *, n: int = 3, num_parts: int | None = None):
    """Per-document NOVELTY: of the doc's DISTINCT word n-grams, how many
    first appear in this document (corpus order = doc_id) — the
    "new content contributed per document" curation signal, the per-doc
    dual of the Heaps-law vocab_growth curve and the complement of the
    Lee-et-al dup fraction: a crawl snapshot that re-serves old content
    scores ~0 novelty even when no single gram is frequent enough to trip
    the dup filter.

    Returns ``(doc_id, n_distinct_grams, n_novel)`` int64 rows; docs with
    fewer than ``n`` words emit no row (no full gram — the SQL twin's
    GROUP BY).  Same 100-TB shape as :func:`cross_doc_dup_stats`: distinct
    (gram-hash, doc) combiner per batch, coarse gram-hash partition where
    each gram's run resolves its MIN doc (one lexsort by (gram, doc) —
    first row of the run IS the first-occurrence doc), per-doc partial
    fold; both shuffles carry int64 triples, never text.  Gram identity is
    the 63-bit hash (collision odds ~1e-9; the dup-stats caveat).

    Reference analog: the first-appearance page of a persistent motif in
    the cross-page accumulation chain (watermark_detector.py sticky
    windows), generalized to n-gram first occurrence."""
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def partials(b: pa.Table) -> pa.Table:
        gh, doc, _cnt = _gram_doc_counts(b, n)
        return pa.table(
            {
                "gh": pa.array(gh, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "pk": pa.array(gh % num_parts, pa.int64()),
            }
        )

    def per_gram_partition(g: pd.DataFrame) -> pd.DataFrame:
        gh = g["gh"].to_numpy()
        doc = g["doc_id"].to_numpy()
        order = np.lexsort((doc, gh))
        gh_s, doc_s = gh[order], doc[order]
        first = np.concatenate(([True], gh_s[1:] != gh_s[:-1]))
        # distinct (gram, doc) rows arrive from the combiner; the run's
        # first row (min doc) is the gram's first-occurrence document
        novel = first.astype(np.int64)
        out = (
            pd.DataFrame(
                {"doc_id": doc_s, "n_distinct_grams": 1, "n_novel": novel}
            )
            .groupby("doc_id", sort=False)
            .sum()
            .reset_index()
        )
        out["pk2"] = out["doc_id"].to_numpy() % num_parts
        return out

    def per_doc_partition(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g[["doc_id", "n_distinct_grams", "n_novel"]]
            .groupby("doc_id", sort=False)
            .sum()
            .reset_index()
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(per_gram_partition, batch_format="pandas")
        .groupby("pk2")
        .map_groups(per_doc_partition, batch_format="pandas")
    )
