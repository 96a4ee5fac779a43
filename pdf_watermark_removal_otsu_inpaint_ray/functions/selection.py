"""Per-group top-k selection — the curation primitive behind "keep the N
best documents per domain/source" in a training-data pipeline.

Ray Data has no native per-group top-k; a ``groupby().map_groups`` alone
would shuffle EVERY row to its group's partition.  This operator instead
pre-trims inside ``map_batches`` first — each batch keeps at most k rows
per group it contains — so the shuffle carries ≤ k × blocks rows per
group, then one final per-group trim finishes the job (the same
partial-then-final shape as the histogram aggregation in stages/detect.py).

Ordering is (score DESC, tie ASC) with an int64 tie-breaker column, so the
result is deterministic and matches a SQL
``row_number() OVER (PARTITION BY g ORDER BY score DESC, tie) <= k`` twin.
The trim kernel is one lexsort + run-boundary rank mask — no per-group
Python.
"""

from __future__ import annotations

from ..config import scaled_parts

import numpy as np
import pyarrow as pa


def _trim_topk(
    t: pa.Table, group: str, score: str, tie: str, k: int
) -> pa.Table:
    """Keep the top-k rows per group value of one in-memory table.

    Vectorized: lexsort by (group, -score, tie), rank rows within each
    group run by position, mask rank < k.  Works on any extra columns.
    """
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return t
    if pa.types.is_integer(t.schema.field(group).type):
        g = np.asarray(t[group].cast(pa.int64()))
    else:  # encode group values to dense int codes (per-table, order-free)
        col = t[group].combine_chunks()
        g = np.asarray(pc.index_in(col, value_set=pc.unique(col)), np.int64)
    s = np.asarray(t[score], np.int64)
    tb = np.asarray(t[tie], np.int64)
    order = np.lexsort((tb, -s, g))
    gs = g[order]
    starts = np.concatenate(([True], gs[1:] != gs[:-1]))
    run_id = np.cumsum(starts) - 1
    run_start = np.nonzero(starts)[0]
    rank = np.arange(gs.size) - run_start[run_id]
    keep = order[rank < k]
    keep.sort()  # preserve input order within the batch
    return t.take(keep)


def topk_per_group(
    ds,
    *,
    group: str,
    score: str,
    tie: str,
    k: int,
    num_parts: int | None = None,
):
    """Distributed top-k per group over a Dataset.

    ``score`` and ``tie`` must be int64-castable (pre-scale floats upstream
    for a deterministic order — see queries.q_length_quantiles for the
    floor(x*100+0.5) convention).  ``group`` may be int64 or string (string
    groups hash to the partition key; the trim itself compares encoded
    group codes, which is order-free and exact).

    Two stages: per-batch partial trim (``map_batches``, ≤ k rows per group
    per block survive) → coarse hash-partition groupby → per-partition
    final trim.  No row set larger than k × blocks per group ever moves,
    and the driver sees nothing.
    """
    num_parts = scaled_parts(64, num_parts)
    import pyarrow.compute as pc

    from ..sinks.exactly_once import hash_partition_ids

    def partial(b: pa.Table) -> pa.Table:
        return _trim_topk(b, group, score, tie, k)

    def add_pk(b: pa.Table) -> pa.Table:
        if pa.types.is_integer(b.schema.field(group).type):
            keys = np.asarray(b[group], np.int64).astype(np.uint64)
            pk = ((keys * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) % np.uint64(
                num_parts
            )
            pk = pk.astype(np.int64)
        else:
            pk = hash_partition_ids(b[group].combine_chunks(), num_parts)
        return b.append_column("pk", pa.array(pk, pa.int64()))

    def final(b: pa.Table) -> pa.Table:
        return _trim_topk(b, group, score, tie, k).drop_columns(["pk"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(final, batch_format="pyarrow")
    )


LEHMER_MULT = 48_271  # MINSTD multiplier — products stay well inside int64
LEHMER_MOD = 2_147_483_647


def hash_sample(ds, *, key: str = "doc_id", rate_pct: int = 20, buckets: int = 100):
    """Deterministic pseudo-random sample: keep rows where
    ``((key * 48271) % 2147483647) % buckets < rate_pct*buckets/100``.

    The Lehmer/MINSTD hash is plain int64 arithmetic, so the EXACT same
    selection is expressible in ANSI SQL (the oracle twin) and is stable
    across runs, partitionings, and cluster sizes — the reproducible-subset
    property a training pipeline needs (epoch subsampling, eval holdouts).
    Pure map_batches filter: no shuffle, streams at full read speed.  O4's
    stride downsample is positional; this one is content-keyed (survives
    repartitioning and compaction)."""
    thresh = rate_pct * buckets // 100

    def pick(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key], np.int64)
        _require_nonneg(k, key)
        keep = ((k * LEHMER_MULT) % LEHMER_MOD) % buckets < thresh
        return b.take(pa.array(np.nonzero(keep)[0], pa.int64()))

    return ds.map_batches(pick, batch_format="pyarrow")


def training_shuffle(ds, *, key: str = "doc_id", seed: int = 0):
    """Deterministic global shuffle for training epochs: rank every row by
    the Lehmer hash of ``key + seed`` and globally sort by
    ``(shuffle_key, key)`` — Ray Data's native sample-based range-partitioned
    sort is the one all-to-all.

    Unlike ``ds.random_shuffle()`` the order is a pure function of data +
    seed: repeatable across runs, cluster sizes, and block layouts, and a
    resumed job reproduces the identical epoch order (the property a
    100-TB training pipeline actually needs — change ``seed`` per epoch).
    The tie-break on ``key`` makes the order total even when two keys
    collide mod 2147483647.  The same arithmetic is plain ANSI SQL, so the
    shuffle order has an exact ORDER BY oracle twin.

    The hash interleaves THREE Lehmer multiplies with xor-shift steps
    (splitmix-style m-x-m-x-m): a single multiplicative congruential step is
    order-preserving on keys below mod/48271 ≈ 44k and lattice-structured
    above (the head of a pure-LCG shuffle comes out as an arithmetic
    progression), and xor-shifts alone only touch the low bits that never
    decide the sort — so linearity is broken BETWEEN multiplies and a
    multiply goes last to spread the nonlinearity across the high bits
    (empirically: irregular head gaps vs the LCG's uniform step).  Every
    intermediate stays inside int64 / SQL BIGINT (max (mod−1)·48271 ≈
    1.0e14 — overflow-free in DuckDB, which errors rather than wraps), and
    xor / ``>>`` compute identically in numpy and DuckDB (verified)."""

    def add_key(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key], np.int64)
        _require_nonneg(k, key)
        sk = ((k + seed) * LEHMER_MULT) % LEHMER_MOD
        sk = sk ^ (sk >> 15)
        sk = (sk * 16807) % LEHMER_MOD
        sk = sk ^ (sk >> 13)
        sk = (sk * LEHMER_MULT) % LEHMER_MOD
        return b.append_column("shuffle_key", pa.array(sk, pa.int64()))

    return ds.map_batches(add_key, batch_format="pyarrow").sort(
        ["shuffle_key", key]
    )


def _require_nonneg(k: np.ndarray, name: str) -> None:
    """The Lehmer-hash SQL-twin contract holds only for keys >= 0: numpy's
    ``%`` returns the sign of the divisor while SQL ``%`` returns the sign
    of the dividend, so a negative key would be kept/cut differently by the
    engine and its oracle.  Fail loudly instead of silently diverging."""
    if k.size and int(k.min()) < 0:
        raise ValueError(
            f"{name} must be non-negative for the Lehmer-hash SQL twin "
            f"(got min={int(k.min())}); remap keys or pre-shift them"
        )


def stratified_split(
    ds,
    *,
    group: str = "source",
    key: str = "doc_id",
    fracs: tuple = (80, 10),
    labels: tuple = ("train", "valid", "test"),
    num_parts: int | None = None,
):
    """Exact per-group train/valid/test split: within each group, rows are
    ranked by (Lehmer(key), key) and cut at EXACT integer proportions —
    0-based rank ``r`` of the group's ``n`` rows gets ``labels[0]`` while
    ``r*100 < fracs[0]*n``, ``labels[1]`` while ``r*100 <
    (fracs[0]+fracs[1])*n``, else ``labels[2]``.  Unlike ``hash_sample``
    (independent per-row coin flips — proportions hold only in
    expectation) the cut is exact per group: the stratification guarantee
    an eval holdout needs on skewed domain mixes, still fully
    deterministic and repartition-stable (rank depends only on key
    hashes, never on block layout).

    Shape: ONE coarse hash partition on the group key (``num_parts`` ≫
    groups per worker → balanced), then one vectorized lexsort + group
    boundary sweep per PARTITION — never a per-group callback (the
    ``grouped_lag`` / ``_distinct_pairs`` lesson).  Exact SQL twin:
    ``row_number() OVER (PARTITION BY g ORDER BY hash, key)`` vs
    ``count(*) OVER (PARTITION BY g)`` integer arithmetic."""
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    from ..sinks.exactly_once import hash_partition_ids

    if len(fracs) != 2 or len(labels) != 3:
        raise ValueError("fracs is the first two cut percentages; 3 labels")
    c1, c2 = int(fracs[0]), int(fracs[0]) + int(fracs[1])

    def add_pk(b: pa.Table) -> pa.Table:
        if pa.types.is_integer(b.schema.field(group).type):
            k = np.asarray(b[group], np.int64).astype(np.uint64)
            pk = (
                ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
                % np.uint64(num_parts)
            ).astype(np.int64)
        else:
            pk = hash_partition_ids(b[group].combine_chunks(), num_parts)
        return b.append_column("pk", pa.array(pk, pa.int64()))

    def split_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key: [], group: [], "split": []})
        gk = g[group].to_numpy()
        k = g[key].to_numpy().astype(np.int64)
        _require_nonneg(k, key)
        h = (k * LEHMER_MULT) % LEHMER_MOD
        idx = np.lexsort((k, h, gk))
        gk, k, h = gk[idx], k[idx], h[idx]
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        starts = np.nonzero(first)[0]
        gid = np.cumsum(first) - 1
        n = np.diff(np.append(starts, len(g)))[gid]
        r = np.arange(len(g), dtype=np.int64) - starts[gid]
        lab = np.where(
            r * 100 < c1 * n, labels[0], np.where(r * 100 < c2 * n, labels[1], labels[2])
        )
        return pd.DataFrame({key: k, group: gk, "split": lab})

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(split_part, batch_format="pandas")
    )


def mix_sources(
    ds,
    weights: dict[str, int],
    *,
    key: str = "doc_id",
    group: str = "source",
    buckets: int = 1000,
):
    """Source-mixture resampling — keep ``weights[source]`` per-mille of
    each source's rows, deterministically (the data-mixing primitive: hit
    target domain proportions without a shuffle or a random state).

    The per-source thresholds are a DIMENSION-scale lookup (one entry per
    domain) resolved per batch with one ``pc.index_in`` C kernel — the
    broadcast-small-side shape; the row decision is the same Lehmer hash
    as :func:`hash_sample`, so the exact selection is SQL-expressible and
    stable across runs, partitionings and cluster sizes.  Pure
    ``map_batches`` filter: no shuffle, streams at read speed.  A row
    whose ``group`` value has no entry in ``weights`` is an error (silent
    drop would skew the mix).
    """
    import pyarrow.compute as pc

    srcs = sorted(weights)
    src_arr = pa.array(srcs, pa.string())
    thr = np.array([int(weights[s]) for s in srcs], np.int64)

    def pick(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key].combine_chunks().cast(pa.int64()))
        _require_nonneg(k, key)
        idx = pc.index_in(b[group].combine_chunks(), value_set=src_arr)
        if idx.null_count:
            bad = b[group].filter(pc.is_null(idx)).unique().to_pylist()
            raise ValueError(f"{group} values without a mix weight: {bad}")
        t = thr[np.asarray(idx, np.int64)]
        keep = ((k * LEHMER_MULT) % LEHMER_MOD) % buckets < t
        return b.take(pa.array(np.nonzero(keep)[0], pa.int64()))

    return ds.map_batches(pick, batch_format="pyarrow")


def sample_per_group(ds, *, group: str = "source", key: str = "doc_id", k: int = 5,
                     num_parts: int | None = None):
    """Deterministic k-row sample per group — the distributed analog of a
    per-domain reservoir sample: keep each group's k smallest rows by
    ``(lehmer_hash(key), key)``.  Unlike a true reservoir it is
    REPRODUCIBLE (content-keyed order, independent of block layout or
    visit order), which is what an auditable training pipeline needs.

    Shape: :func:`topk_per_group` — per-batch partial trim, coarse
    hash-partition final trim; ≤ k × blocks rows per group ever move.
    SQL twin: ``row_number() OVER (PARTITION BY group ORDER BY
    (key*48271)%2147483647, key) <= k``.
    """
    num_parts = scaled_parts(16, num_parts)

    def add_score(b: pa.Table) -> pa.Table:
        kk = np.asarray(b[key].combine_chunks().cast(pa.int64()))
        _require_nonneg(kk, key)
        hv = (kk * LEHMER_MULT) % LEHMER_MOD
        # topk_per_group keeps score DESC; negate for hash-ASC order
        return b.append_column("neg_hv", pa.array(-hv, pa.int64()))

    trimmed = topk_per_group(
        ds.map_batches(add_score, batch_format="pyarrow"),
        group=group, score="neg_hv", tie=key, k=k, num_parts=num_parts,
    )
    return trimmed.drop_columns(["neg_hv"])


def dsir_weights(
    docs_ds,
    *,
    target_sources: tuple[str, ...],
    quant: float = 1_000_000.0,
    hash_buckets: int | None = None,
):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the summed unigram log-likelihood ratio of a TARGET domain vs the whole
    corpus — the targeted-sampling primitive ("upweight docs that look like
    the target distribution").  Returns a Dataset of
    ``(doc_id, n_words, weight_q)`` with ``weight_q = Σ_tokens
    floor(quant * [ln((cnt_T(w)+1)/(n_T+V)) - ln((cnt_A(w)+1)/(n_A+V))] +
    0.5)`` — per-WORD integer quantization before the per-doc sum, so the
    weight is an order-free exact integer that hash-matches the SQL twin.

    Two streaming passes, no corpus-scale shuffle (the bm25_topk shape):

    1. **Unigram counts**: per-batch partials ``(word, cnt_all, cnt_t)``
       via one dictionary-encode + two bincounts (combiner-before-shuffle:
       the shuffle carries one row per (batch, distinct word)), summed by
       the vocab-safe keyed fold (functions/vocabfold.py — the Aggregate
       is bounded to the coarse partition count, never vocabulary
       cardinality).  The folded table rides to the driver — VOCAB-scale,
       not corpus-scale.  At unbounded vocab (real web text) DSIR's own
       answer bounds it: ``hash_buckets=2**20`` hashes words into a
       FIXED-size bucket space before counting (collision-free inputs are
       bit-identical to the unbucketed run — pinned by pytest); the
       scoring scan is unchanged.
    2. **Scoring scan**: per-word log-ratios are computed once driver-side
       with ``math.log`` (libm — bit-identical to DuckDB ``ln``; np.log's
       SIMD path can differ in the last ulp), broadcast as a plain dict
       closure (small side travels once per actor, never per batch), and
       each batch resolves weights with one dictionary-encode + int64
       gather + one weighted bincount — no token leaves its batch.

    Reference analog: the per-page dominant-color ranking scan
    (watermark_detector.py:168-189) is the same corpus-statistic-then-
    score-scan shape; the quantized contributions mirror the engine's
    inpaint strength quantization.
    """
    import math

    import pyarrow.compute as pc

    from .text import _words_with_rows

    tgt_set = pa.array(list(target_sources), pa.string())

    def _bucket_keys(vocab: pa.Array) -> np.ndarray:
        """word -> fixed-size bucket id (the DSIR hashed-feature bound)."""
        from ..sinks.exactly_once import hash_partition_ids

        return hash_partition_ids(vocab.cast(pa.string()), hash_buckets)

    def count_partials(batch: pa.Table) -> pa.Table:
        rows, codes, vocab = _words_with_rows(batch["text"])
        if rows.size == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "cnt_all": pa.array([], pa.int64()),
                    "cnt_t": pa.array([], pa.int64()),
                }
            )
        nv = len(vocab)
        in_t = np.asarray(pc.is_in(batch["source"], value_set=tgt_set))
        cnt_all = np.bincount(codes, minlength=nv)
        cnt_t = np.bincount(codes[in_t[rows]], minlength=nv)
        if hash_buckets is None:
            keys = vocab.cast(pa.string())
        else:
            # pre-combine per bucket inside the partial (bucket-scale)
            bkt = _bucket_keys(vocab)
            ub, inv = np.unique(bkt, return_inverse=True)
            cnt_all = np.bincount(
                inv, weights=cnt_all.astype(np.float64)
            ).astype(np.int64)
            cnt_t = np.bincount(
                inv, weights=cnt_t.astype(np.float64)
            ).astype(np.int64)
            keys = pa.array([str(b) for b in ub], pa.string())
        return pa.table(
            {
                "word": keys,
                "cnt_all": pa.array(cnt_all, pa.int64()),
                "cnt_t": pa.array(cnt_t, pa.int64()),
            }
        )

    from .dedup import _collect_arrow
    from .vocabfold import keyed_fold

    vocab_tbl = _collect_arrow(
        keyed_fold(
            docs_ds.select_columns(["text", "source"]).map_batches(
                count_partials, batch_format="pyarrow"
            ),
            key="word",
            sums=("cnt_all", "cnt_t"),
        ),
        pa.schema(
            [("word", pa.string()), ("cnt_all", pa.int64()),
             ("cnt_t", pa.int64())]
        ),
    )
    words = vocab_tbl["word"].to_pylist()
    c_all = np.asarray(vocab_tbl["cnt_all"], np.int64)
    c_t = np.asarray(vocab_tbl["cnt_t"], np.int64)
    n_all = int(c_all.sum())
    n_t = int(c_t.sum())
    v = len(words)
    den_t = float(n_t + v)
    den_all = float(n_all + v)
    # vocab-scale loop, driver-side, libm log — NOT the hot path
    r_q = {
        w: int(
            math.floor(
                (
                    math.log((int(ct) + 1) / den_t)
                    - math.log((int(ca) + 1) / den_all)
                )
                * quant
                + 0.5
            )
        )
        for w, ca, ct in zip(words, c_all, c_t)
    }

    def score(batch: pa.Table) -> pa.Table:
        rows, codes, vocab = _words_with_rows(batch["text"])
        ids = np.asarray(batch["doc_id"], np.int64)
        if rows.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_words": pa.array([], pa.int64()),
                    "weight_q": pa.array([], pa.int64()),
                }
            )
        n = batch.num_rows
        # batch-local vocab (bounded, already deduped) → per-code ratio
        if hash_buckets is None:
            rq_arr = np.fromiter(
                (r_q[w] for w in vocab.to_pylist()), np.int64, len(vocab)
            )
        else:
            rq_arr = np.fromiter(
                (r_q[str(b)] for b in _bucket_keys(vocab)),
                np.int64,
                len(vocab),
            )
        # weighted bincount: integer contributions ≪ 2^53 → float64 exact
        weight = np.bincount(
            rows, weights=rq_arr[codes].astype(np.float64), minlength=n
        )
        n_words = np.bincount(rows, minlength=n)
        hit = n_words > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[hit], pa.int64()),
                "n_words": pa.array(n_words[hit], pa.int64()),
                "weight_q": pa.array(
                    np.round(weight[hit]).astype(np.int64), pa.int64()
                ),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def weighted_sample(ds, *, key: str = "doc_id", weight: str = "w", k: int = 50):
    """Weighted sampling WITHOUT replacement, deterministic (the
    Efraimidis–Spirakis A-ES scheme): every row gets priority
    ``ln(u) / w`` with ``u = ((key·48271) mod (2³¹−1) + 1) / 2³¹`` — the
    content-keyed Lehmer uniform — and the k highest-priority rows are
    the sample.  Inclusion probability is proportional to weight (the
    exponential-race argument), and because u is a pure function of the
    KEY, the selected set is reproducible across runs, block layouts and
    cluster sizes — the training-data mixing primitive (sample documents
    proportional to quality/length weights) in its auditable form.

    Exactness contract with the SQL twin: ``(h+1)/2³¹`` is a power-of-two
    scaling (exact in float64), ``ln`` is evaluated with ``math.log``
    (libm — bit-identical to DuckDB ``ln``; np.log's SIMD path can differ
    in the last ulp, the dsir_weights precedent) over the batch's DISTINCT
    hash values (batch-scale loop, not the hot path), and the final
    division by the int64 weight is one correctly-rounded IEEE op — so
    even the emitted float64 priority hash-matches the oracle bit-for-bit.

    Shape: per-batch top-k trim → driver merge of ``k × blocks`` rows —
    no shuffle, stream at read speed (the cosine-top-k merge shape).
    Returns (key, weight, priority, rank) ordered by (priority DESC, key).
    """
    import math

    def trim(b: pa.Table) -> pa.Table:
        kk = np.asarray(b[key], np.int64)
        _require_nonneg(kk, key)
        w = np.asarray(b[weight], np.int64)
        if (w <= 0).any():
            raise ValueError("weighted_sample: weights must be positive")
        h = (kk * LEHMER_MULT) % LEHMER_MOD
        u = (h + 1).astype(np.float64) / np.float64(1 << 31)
        hu, inv = np.unique(u, return_inverse=True)
        logu = np.fromiter((math.log(x) for x in hu), np.float64, hu.size)
        pri = logu[inv] / w
        sel = np.lexsort((kk, -pri))[:k]
        return pa.table(
            {
                key: pa.array(kk[sel], pa.int64()),
                weight: pa.array(w[sel], pa.int64()),
                "priority": pa.array(pri[sel], pa.float64()),
            }
        )

    parts = ds.select_columns([key, weight]).map_batches(
        trim, batch_format="pyarrow"
    ).to_pandas()
    kk = parts[key].to_numpy().astype(np.int64)
    w = parts[weight].to_numpy().astype(np.int64)
    pri = parts["priority"].to_numpy().astype(np.float64)
    sel = np.lexsort((kk, -pri))[:k]
    return pa.table(
        {
            key: pa.array(kk[sel], pa.int64()),
            weight: pa.array(w[sel], pa.int64()),
            "priority": pa.array(pri[sel], pa.float64()),
            "rank": pa.array(np.arange(1, sel.size + 1), pa.int64()),
        }
    )
