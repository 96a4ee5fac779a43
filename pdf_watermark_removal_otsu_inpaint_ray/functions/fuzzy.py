"""Edit-distance similarity join (fuzzy self-join over a document corpus).

Finds all same-source pairs within Levenshtein distance ``tau`` — the
string-metric sibling of the MinHash/SimHash near-dup family (reference
analog: the duplicate-page detection idea behind the multi-pass removal
chain, ``watermark_remover.py:174-232``, applied to text instead of masks).
Unlike the sketch paths this join is EXACT: the banding scheme is lossless
for the metric, so the distributed result equals the naive all-pairs twin.

Distribution shape (the 100-TB path):
* **Lossless length banding.** ``|len(a) − len(b)| ≤ tau`` is a hard
  Levenshtein bound, so with band width ``tau+1`` a qualifying pair's bands
  differ by at most 1.  Each doc is emitted to its native band ``k`` and to
  ``k+1``; a pair is evaluated exactly once, in group
  ``g = max(band_a, band_b)`` — no global dedup pass needed.
* **Coarse partitions, vectorized sweep.** Group key (source, g) hashes to
  ``num_parts`` coarse partitions; within a partition one lexsort +
  boundary sweep walks the groups (the `_distinct_pairs` lesson: never a
  per-tiny-group callback).  The shuffle carries (doc_id, text, band) — a
  length-banded fuzzy join cannot avoid shipping the strings it compares,
  but each string travels to at most 2 groups.
* **Cheap lossless prefilter.** Per-pair, the character-bag bound
  ``ed(a,b) ≥ max(#inserts, #deletes)`` from two 128-bin histograms kills
  most non-matches for ~1 µs before the O(n·m) DP runs.
* **Early-abandon banded DP.** The row minimum of the Levenshtein matrix is
  non-decreasing, so the vectorized row DP aborts once it exceeds ``tau``.

Driver traffic is output-scale only (the matched pairs).
"""

from __future__ import annotations

from ..config import scaled_parts

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _mix64, _text_hashes

_HIST_BINS = 128  # ASCII fold: codepoints >= 128 share bins mod 128


def _codepoints(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def _char_hist(cp: np.ndarray) -> np.ndarray:
    return np.bincount(cp % _HIST_BINS, minlength=_HIST_BINS)


def _bag_bound(ha: np.ndarray, hb: np.ndarray) -> int:
    """Lossless lower bound: turning a into b needs at least max(surplus,
    deficit) edits, where surplus/deficit come from the character bags.
    (Folding bins only WEAKENS the bound — still lossless.)"""
    d = ha - hb
    return int(max(d[d > 0].sum(initial=0), -d[d < 0].sum(initial=0)))


def _lev_capped(s: np.ndarray, t: np.ndarray, tau: int) -> int:
    """Exact Levenshtein if ≤ tau, else any value > tau.  Vectorized row DP:
    vertical+diagonal from the previous row, then the horizontal (insert)
    closure as a running min — ``cur[j] = min_i≤j (cur[i] + (j−i))``."""
    n, m = s.size, t.size
    if abs(n - m) > tau:
        return tau + 1
    if n == 0 or m == 0:
        return max(n, m)
    ar = np.arange(m + 1, dtype=np.int64)
    prev = ar.copy()
    for i in range(1, n + 1):
        cur = np.empty(m + 1, np.int64)
        cur[0] = i
        cur[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (t != s[i - 1]))
        cur = np.minimum(cur, np.minimum.accumulate(cur - ar) + ar)
        if cur.min() > tau:  # row min is non-decreasing in i
            return tau + 1
        prev = cur
    return int(prev[m])


def _lev_capped_many(s: np.ndarray, ts: list[np.ndarray], tau: int) -> np.ndarray:
    """`_lev_capped` of one left string against MANY partners at once: the
    partners pad into a (P, m_max) matrix (sentinel −1 never equals a
    codepoint) and every DP row is computed for all still-active partners
    in one set of numpy ops.  Padded columns sit to the RIGHT of each
    partner's true end and the horizontal closure only flows left→right,
    so they can't contaminate the read-out at column m_j.  Partners whose
    row minimum exceeds ``tau`` retire from the active set (the row min is
    non-decreasing), exactly like the scalar early abandon."""
    P = len(ts)
    res = np.full(P, tau + 1, np.int64)
    n = s.size
    m_lens = np.fromiter((t.size for t in ts), np.int64, P)
    fits = np.abs(m_lens - n) <= tau
    if n == 0:
        res[fits] = m_lens[fits]
        return res
    zero = fits & (m_lens == 0)
    res[zero] = n
    act = np.nonzero(fits & (m_lens > 0))[0]
    if act.size == 0:
        return res
    m_max = int(m_lens[act].max())
    T = np.full((act.size, m_max), -1, np.int64)
    for r, p in enumerate(act):
        T[r, : m_lens[p]] = ts[p]
    # Ukkonen diagonal band: a cell (i, j) with |i−j| > tau costs ≥ tau+1,
    # so only columns [i−tau, i+tau] are computed; everything outside holds
    # the placeholder tau+1, which UNDERSTATES true costs (all > tau) but
    # can never pull a readout back under tau (path costs only grow), so
    # the ≤tau/“>tau” classification — all the caller uses — is exact.
    big = np.int32(tau + 1)
    ar = np.arange(m_max + 1, dtype=np.int32)
    prev = np.minimum(ar, big)  # row 0 with the band placeholder applied
    prev = np.broadcast_to(prev, (act.size, m_max + 1)).copy()
    alive = np.arange(act.size)
    for i in range(1, n + 1):
        lo = max(0, i - tau)
        hi = min(m_max, i + tau)  # inclusive column bound
        cur = np.full((alive.size, m_max + 1), big, np.int32)
        if lo == 0:
            cur[:, 0] = min(i, tau + 1)
            c0 = 1
        else:
            c0 = lo
        sl = slice(c0, hi + 1)
        dg = slice(c0 - 1, hi)
        cur[:, sl] = np.minimum(
            np.minimum(prev[:, sl] + 1, big),
            prev[:, dg] + (T[alive, c0 - 1 : hi] != s[i - 1]),
        )
        seg = cur[:, c0 - 1 : hi + 1] - ar[c0 - 1 : hi + 1]
        cur[:, c0 - 1 : hi + 1] = np.minimum(
            cur[:, c0 - 1 : hi + 1],
            np.minimum.accumulate(seg, axis=1) + ar[c0 - 1 : hi + 1],
        )
        if i == n:
            res[act[alive]] = cur[np.arange(alive.size), m_lens[act[alive]]].astype(
                np.int64
            )
            break
        keep = cur[:, sl].min(axis=1) <= tau
        if not keep.all():
            alive = alive[keep]
            cur = cur[keep]
            if alive.size == 0:
                break
        prev = cur
    return np.minimum(res, tau + 1)


def edit_distance_join(ds, *, tau: int = 80, num_parts: int | None = None):
    """All (a, b, dist) with ``a.doc_id < b.doc_id``, equal ``source``, and
    ``levenshtein(a.text, b.text) ≤ tau`` — exact, layout-independent.

    Input needs columns (doc_id, text, source).  Lengths are UNICODE char
    counts (matching SQL ``levenshtein`` semantics).
    """
    num_parts = scaled_parts(128, num_parts)
    import pandas as pd

    width = tau + 1

    def fan_out(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        band = lens // width
        src_h = _text_hashes(b["source"].to_pylist())
        ids = np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))
        idx = np.concatenate([np.arange(len(texts))] * 2)
        g = np.concatenate([band, band + 1])
        pk = (
            (src_h[idx].astype(np.uint64) ^ _mix64(g.astype(np.uint64)))
            % np.uint64(num_parts)
        ).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(pk, pa.int64()),
                "src_h": pa.array(src_h[idx], pa.int64()),
                "g": pa.array(g, pa.int64()),
                "band": pa.array(band[idx], pa.int64()),
                "doc_id": pa.array(ids[idx], pa.int64()),
                "len": pa.array(lens[idx], pa.int64()),
                "text": pa.array([texts[i] for i in idx], pa.string()),
                # carried so a (astronomically unlikely) 63-bit src_h
                # collision can't emit a cross-source pair — the join
                # predicate compares the real strings
                "source": b["source"].take(pa.array(idx, pa.int32())),
            }
        )

    def sweep(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({"a": [], "b": [], "dist": []}, dtype=np.int64)
        order = np.lexsort((part["g"].to_numpy(), part["src_h"].to_numpy()))
        src_h = part["src_h"].to_numpy()[order]
        g = part["g"].to_numpy()[order]
        band = part["band"].to_numpy()[order]
        ids = part["doc_id"].to_numpy()[order]
        lens = part["len"].to_numpy()[order]
        texts = part["text"].to_numpy()[order]
        srcs = part["source"].to_numpy()[order]
        starts = np.nonzero(
            np.concatenate(([True], (src_h[1:] != src_h[:-1]) | (g[1:] != g[:-1])))
        )[0]
        ends = np.concatenate((starts[1:], [len(ids)]))
        out_a, out_b, out_d = [], [], []
        for s0, e0 in zip(starts, ends):
            k = e0 - s0
            if k < 2:
                continue
            gg = g[s0]
            cps = [None] * k
            hists = [None] * k

            def prep(ii: int) -> None:
                if cps[ii] is None:
                    cps[ii] = _codepoints(texts[s0 + ii])
                    hists[ii] = _char_hist(cps[ii])

            # candidate partner lists per LEFT doc, so the DP runs once per
            # left against ALL its partners as one (P, m) matrix — the
            # numpy row overhead amortizes across partners instead of
            # paying ~len(a) tiny-array calls per pair
            for i in range(s0, e0 - 1):
                partners = []
                for j in range(i + 1, e0):
                    # evaluate each pair exactly once: in the MAX of the two
                    # native bands (both copies coexist only there and in
                    # max+1, which this guard skips)
                    if max(band[i], band[j]) != gg:
                        continue
                    if abs(lens[i] - lens[j]) > tau or ids[i] == ids[j]:
                        continue
                    if srcs[i] != srcs[j]:
                        continue
                    ii, jj = i - s0, j - s0
                    prep(ii)
                    prep(jj)
                    if _bag_bound(hists[ii], hists[jj]) > tau:
                        continue
                    partners.append(j)
                if not partners:
                    continue
                dists = _lev_capped_many(
                    cps[i - s0], [cps[j - s0] for j in partners], tau
                )
                for j, d in zip(partners, dists):
                    if d <= tau:
                        a_id, b_id = (
                            (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
                        )
                        out_a.append(a_id)
                        out_b.append(b_id)
                        out_d.append(d)
        return pd.DataFrame(
            {
                "a": np.asarray(out_a, np.int64),
                "b": np.asarray(out_b, np.int64),
                "dist": np.asarray(out_d, np.int64),
            }
        )

    return (
        ds.select_columns(["doc_id", "text", "source"])
        .map_batches(fan_out, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(sweep, batch_format="pandas")
    )


def prefix_dup(ds, *, num_parts: int | None = None):
    """Exact PREFIX-duplicate join: every ordered pair (a, b) where a's
    text is a PROPER prefix of b's text — the truncated-duplicate detector
    (a crawl re-fetch cut mid-document, a chunk of a later full document);
    exact dedup misses these because the hashes differ.

    Distribution shape: one coarse partition on the FIRST CHARACTER — a
    proper prefix (len >= 1) shares its first character with every string
    it prefixes, so all pairs are partition-local by construction (at
    scale, extend the key to the first 2 chars plus a broadcast side pass
    for 1-char docs; alphabet skew is the documented trade).  Within a
    partition: ONE pandas sort, the (n x maxlen) uint8 byte matrix of
    adjacent rows compared in ONE cumprod pass (adjacent LCP lengths —
    strings sort lexicographically, so a prefixes b iff every adjacent
    LCP strictly between them is >= len(a)), then an output-scale frontier
    sweep that extends each candidate run one step per round (rounds =
    longest prefix family, each round fully vectorized).  No text ever
    compares against a non-adjacent text except through the LCP algebra.

    Empty texts are excluded (an empty string is a degenerate prefix of
    everything AND cannot be routed by first char); the corpus has none —
    documented, asserted.

    Reference analog: the dedup-spans keep-first contract (cli.py) applied
    to the containment case the reference's exact matcher cannot see."""
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    from ..sinks.exactly_once import hash_partition_ids

    def add_pk(b: pa.Table) -> pa.Table:
        txt = b["text"].combine_chunks()
        first = pc.utf8_slice_codeunits(txt, 0, 1)
        assert pc.min(pc.utf8_length(txt)).as_py() is None or pc.min(
            pc.utf8_length(txt)
        ).as_py() >= 1, "prefix_dup: empty texts unsupported"
        pk = hash_partition_ids(first, num_parts)
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "text": txt,
                "pk": pa.array(pk, pa.int64()),
            }
        )

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(["text", "doc_id"], kind="stable", ignore_index=True)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        texts = g["text"].to_numpy()
        bs = [t.encode("utf-8") for t in texts]
        lens = np.array([len(x) for x in bs], np.int64)
        n = len(bs)
        maxlen = int(lens.max())
        mat = np.zeros((n, maxlen), np.uint8)
        flat = np.frombuffer(b"".join(bs), np.uint8)
        starts = np.concatenate(([0], np.cumsum(lens[:-1])))
        cols = np.arange(maxlen)
        mask = cols[None, :] < lens[:, None]
        mat[mask] = flat  # row-major fill matches the concatenated order
        # adjacent LCPs: equality cumprod along the byte axis
        eq = (mat[1:] == mat[:-1]).cumprod(axis=1).sum(axis=1)
        lcp = np.minimum(eq, np.minimum(lens[1:], lens[:-1]))
        # frontier sweep: candidate (i, j) survives while the running min
        # of adjacent LCPs over (i, j] stays >= len(i); emit when ALSO
        # len(j) > len(i) (proper prefix).  Each round extends j by one;
        # round count = longest prefix-family run, volume = output scale.
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        i = np.arange(n - 1)
        j = i + 1
        ok = lcp[i] >= lens[i]
        i, j = i[ok], j[ok]
        while i.size:
            hit = lens[j] > lens[i]
            if hit.any():
                out_a.append(ids[i[hit]])
                out_b.append(ids[j[hit]])
            nxt = j + 1 < n
            i, j = i[nxt], j[nxt] + 1
            if i.size:
                ok = lcp[j - 1] >= lens[i]
                i, j = i[ok], j[ok]
        if not out_a:
            return empty
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(sweep, batch_format="pandas")
    )
