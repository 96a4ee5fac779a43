"""Streaming per-session aggregates: the batch
``functions/packing.py::grouped_session_stats`` lifted into the
streaming tier — gap-based sessions close the moment the watermark
proves no more rows can join them, and emit ONE aggregate row each
(count, start/end, duration), the Flink session-window shape with an
aggregate trigger.

Rows route to actors by KEY hash; a row enters its key's session only
once the watermark passes its timestamp, so event-time order holds
across sweeps and the session recurrence is a pure left fold: extend
the open session when ``ts − end ≤ gap``, otherwise CLOSE it (emit) and
open a new one.  State per key is exactly ONE open session tuple
``(session_ordinal, start, end, n_events)`` — O(keys), never O(stream);
an open session closes either by a later row's gap or by the
END-OF-STREAM flush.  A session also closes EAGERLY when the watermark
itself passes ``end + gap`` (no row can extend it), which is what bounds
emission latency on a live stream — the sweep checks idle keys against
the advancing watermark even when no row for them arrives.

Within a sweep the batch kernel applies unchanged (lexsort + gap-break
boundary sweep); the carried open session seeds each key's first
segment.  Late rows route to the counted side output; with lateness
covering disorder the emitted row set is byte-equal to the batch twin —
one definition, two execution tiers, one SQL twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .staging import _StagedEmitterBase

_MIN = np.int64(-(1 << 62))


@ray.remote
class SessionStatsActor(_StagedEmitterBase):
    def __init__(
        self,
        *,
        gap: int = 86_400_000_000,
        group_col: str = "user_id",
        ts_col: str = "ts_us",
        seq_col: str = "event_id",
        sink_dir: str | None = None,
        sink_partitions: int = 8,
        sink_stage_rows: int = 32768,
        sink_done: frozenset[int] = frozenset(),
        late_done: frozenset[int] = frozenset(),
        sink_epoch: int = 0,
    ):
        self.gap = int(gap)
        self.group_col, self.ts_col, self.seq_col = group_col, ts_col, seq_col
        self._init_staging(
            sink_dir=sink_dir,
            sink_partitions=sink_partitions,
            sink_stage_rows=sink_stage_rows,
            sink_done=sink_done,
            late_done=late_done,
            sink_epoch=sink_epoch,
        )
        # open-session state, aligned arrays sorted by key
        self._kid = np.zeros(0, np.int64)
        self._sid = np.zeros(0, np.int64)   # ordinal of the OPEN session
        self._start = np.zeros(0, np.int64)
        self._end = np.zeros(0, np.int64)
        self._cnt = np.zeros(0, np.int64)
        self._open = np.zeros(0, bool)
        self._pending: list[pa.Table] = []
        self.finalized_upto = int(_MIN)
        self.n_rows = 0

    def ingest(self, batch: pa.Table, watermark: int) -> list[pa.Table]:
        self.wm = max(self.wm, watermark)
        ts = np.asarray(batch[self.ts_col], np.int64)
        late = ts <= self.finalized_upto
        if late.any():
            lb = batch.filter(pa.array(late))
            self._note_late(
                lb.append_column("doc_id", lb[self.seq_col].cast(pa.int64()))
            )
            batch = batch.filter(pa.array(~late))
        if batch.num_rows:
            self._pending.append(batch)
        return self._sweep(self.wm)

    def _emit_tbl(self, kk, sid, st, en, cnt) -> pa.Table:
        t = pa.table(
            {
                self.group_col: pa.array(kk, pa.int64()),
                "session_id": pa.array(sid, pa.int64()),
                "n_events": pa.array(cnt, pa.int64()),
                "start_us": pa.array(st, pa.int64()),
                "end_us": pa.array(en, pa.int64()),
                "duration_us": pa.array(en - st, pa.int64()),
            }
        )
        if self.sink_dir is not None:
            # (key, session) is unique per emitted row
            t = t.append_column(
                "doc_id",
                pa.array(kk * np.int64(1 << 20) + sid, pa.int64()),
            )
        return t

    def _sweep(self, wm: int) -> list[pa.Table]:
        out: list[pa.Table] = []
        ready = None
        if self._pending:
            pend = pa.concat_tables(self._pending)
            ts = np.asarray(pend[self.ts_col], np.int64)
            ready_mask = ts <= wm
            if ready_mask.any():
                ready = pend.filter(pa.array(ready_mask))
                rest = pend.filter(pa.array(~ready_mask))
                self._pending = [rest] if rest.num_rows else []
        self.finalized_upto = max(self.finalized_upto, wm)

        if ready is not None:
            self.n_rows += int(ready.num_rows)
            keys = np.asarray(ready[self.group_col], np.int64)
            rts = np.asarray(ready[self.ts_col], np.int64)
            seq = np.asarray(ready[self.seq_col], np.int64)
            idx = np.lexsort((seq, rts, keys))
            keys, rts = keys[idx], rts[idx]

            new = np.setdiff1d(np.unique(keys), self._kid, assume_unique=True)
            if new.size:
                merged = np.union1d(self._kid, new)

                def grow(a, fill):
                    g = np.full(merged.size, fill, a.dtype)
                    if self._kid.size:
                        g[np.searchsorted(merged, self._kid)] = a
                    return g

                self._sid = grow(self._sid, 0)
                self._start = grow(self._start, 0)
                self._end = grow(self._end, _MIN)
                self._cnt = grow(self._cnt, 0)
                self._open = grow(self._open, False)
                self._kid = merged

            n = keys.size
            first = np.empty(n, bool)
            first[0] = True
            first[1:] = keys[1:] != keys[:-1]
            run_start = np.nonzero(first)[0]
            run_end = np.append(run_start[1:], n)
            # per-key loop over RUNS (key-scale, vectorized inside): the
            # session fold is a short serial recurrence per key and the
            # per-sweep key count is bounded by the micro-batch key mix
            for rs, re_ in zip(run_start, run_end):
                k = keys[rs]
                ki = int(np.searchsorted(self._kid, k))
                o = rts[rs:re_]
                # does the run's first row EXTEND the carried open session?
                cont = bool(self._open[ki]) and (
                    int(o[0]) - int(self._end[ki]) <= self.gap
                )
                brk = np.empty(o.size, bool)
                brk[0] = True  # segmentation always anchors at position 0
                brk[1:] = (o[1:] - o[:-1]) > self.gap
                st_i = np.nonzero(brk)[0]
                en_i = np.append(st_i[1:], o.size) - 1
                n_seg = st_i.size
                # segment stats
                seg_st = o[st_i].copy()
                seg_en = o[en_i]
                seg_cnt = (en_i - st_i + 1).astype(np.int64)
                if cont:
                    # first segment extends the open session
                    seg_st[0] = self._start[ki]
                    seg_cnt[0] += self._cnt[ki]
                    sid0 = self._sid[ki]
                elif self._open[ki]:
                    # open session closes at the first break
                    out.append(
                        self._emit_tbl(
                            np.array([k]), np.array([self._sid[ki]]),
                            np.array([self._start[ki]]),
                            np.array([self._end[ki]]),
                            np.array([self._cnt[ki]]),
                        )
                    )
                    sid0 = self._sid[ki] + 1
                else:
                    sid0 = self._sid[ki] + 1
                sids = sid0 + np.arange(n_seg, dtype=np.int64)
                # all but the LAST segment are closed by in-sweep gaps
                if n_seg > 1:
                    out.append(
                        self._emit_tbl(
                            np.full(n_seg - 1, k), sids[:-1],
                            seg_st[:-1], seg_en[:-1], seg_cnt[:-1],
                        )
                    )
                self._sid[ki] = sids[-1]
                self._start[ki] = seg_st[-1]
                self._end[ki] = seg_en[-1]
                self._cnt[ki] = seg_cnt[-1]
                self._open[ki] = True

        # eager close: the watermark passed end + gap — no row can extend
        stale = self._open & (self._end + self.gap < wm)
        if stale.any():
            out.append(
                self._emit_tbl(
                    self._kid[stale], self._sid[stale], self._start[stale],
                    self._end[stale], self._cnt[stale],
                )
            )
            self._open[stale] = False
        return self._divert(out)

    def flush(self) -> list[pa.Table]:
        out = self._sweep(1 << 61)
        m = self._open
        if m.any():
            out2 = self._emit_tbl(
                self._kid[m], self._sid[m], self._start[m], self._end[m],
                self._cnt[m],
            )
            self._open[:] = False
            rest = self._divert([out2])
            out.extend(rest)
        return out

    def sink_flush(self) -> int:
        self._flush_sink()
        self._flush_late()
        return int(self._open.sum())

    _CKPT_FIELDS = ("_kid", "_sid", "_start", "_end", "_cnt", "_open",
                    "_pending", "finalized_upto", "n_rows", "n_late", "wm",
                    "_late_mem")

    def checkpoint_state(self) -> bytes:
        import pickle

        self._flush_sink()
        self._flush_late()
        return pickle.dumps({k: getattr(self, k) for k in self._CKPT_FIELDS})

    def restore_state(self, blob: bytes) -> None:
        import pickle

        for k, v in pickle.loads(blob).items():
            setattr(self, k, v)

    def state_stats(self) -> dict:
        return {
            "n_rows": self.n_rows,
            "n_late": self.n_late,
            "state_keys": int(self._kid.size),
            "open_sessions": int(self._open.sum()),
            "pending_rows": int(sum(t.num_rows for t in self._pending)),
        }
