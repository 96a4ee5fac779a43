"""Two-log streaming stateful join state (north star: "stateful join" at
the streaming tier — symmetric hash join with event-time band eviction).

Semantics: emit every pair (l, r) with ``l.key == r.key`` and
``|l.ts - r.ts| <= band`` (the Flink-style interval join).  Each arriving
row probes the OPPOSITE side's buffer and then inserts into its own — a
pair is emitted exactly once, when its second row arrives; the emitted
pair SET is a pure function of the two logs (arrival interleaving only
permutes emission order, which the sinks and the driver compare sort
away).

Watermark-driven eviction bounds state: a buffered row is dropped once
``ts + band <= watermark`` — any future non-late row has ``ts > wm``, so
its band reaches only rows with ``ts > wm - band``, all still buffered.
The buffer per actor is therefore the rows of one band+lateness window of
its key slice, never the log.  Rows arriving with ``ts <= wm`` missed
their probe epoch (their potential partners may already be evicted): they
are LATE — counted, routed, never probed (the same contract as
:mod:`.keyed_state` windows).

Buffers are flat int64 triples (key, seq, ts) compacted sorted-by-key on
each ingest; probes are two ``searchsorted`` calls + one repeat-expand +
one band mask — no per-row Python, no dicts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_MIN = np.int64(-(1 << 62))


def _pair_ids(l_seq: np.ndarray, r_seq: np.ndarray) -> np.ndarray:
    """Deterministic int64 pair id for sink partitioning (assumes seqs fit
    in 31 bits — true of every synthetic log here; document at scale)."""
    return ((l_seq.astype(np.int64) << np.int64(31)) ^ r_seq.astype(np.int64))


@ray.remote
class JoinStateActor:
    """One key-hash slice of the symmetric interval join.  Sides are
    normalized upstream to (key:int64, seq:int64, ts:int64)."""

    def __init__(
        self,
        *,
        band: int,
        sink_dir: str | None = None,
        sink_partitions: int = 8,
        sink_stage_rows: int = 32768,
        sink_done: frozenset[int] = frozenset(),
        late_done: frozenset[int] = frozenset(),
        sink_epoch: int = 0,
    ):
        self.band = band
        self.sink_dir = sink_dir
        self.sink_partitions = sink_partitions
        self.sink_stage_rows = sink_stage_rows
        self._sink_done = sink_done
        self._late_done = late_done
        self.sink_epoch = sink_epoch
        self._sink_buf: list[pa.Table] = []
        self._sink_rows = 0
        self._late_buf: list[pa.Table] = []
        self._late_buf_rows = 0
        # per side (0 = left, 1 = right): compacted arrays sorted by key
        self._k = [np.zeros(0, np.int64), np.zeros(0, np.int64)]
        self._s = [np.zeros(0, np.int64), np.zeros(0, np.int64)]
        self._t = [np.zeros(0, np.int64), np.zeros(0, np.int64)]
        self.wm = int(_MIN)
        self.n_pairs = 0
        self.n_late = 0
        self._late_mem: list[pa.Table] = []

    def _evict(self) -> None:
        for side in (0, 1):
            if self._t[side].size:
                alive = self._t[side] + self.band > self.wm
                if not alive.all():
                    self._k[side] = self._k[side][alive]
                    self._s[side] = self._s[side][alive]
                    self._t[side] = self._t[side][alive]

    def _probe(self, opp: int, keys, seqs, ts):
        """Match probe rows against the opposite buffer; returns the pair
        index arrays (probe_row_idx, buffer_idx) after the band mask."""
        bk = self._k[opp]
        if bk.size == 0 or keys.size == 0:
            return None
        lo = np.searchsorted(bk, keys, "left")
        hi = np.searchsorted(bk, keys, "right")
        cnt = hi - lo
        tot = int(cnt.sum())
        if tot == 0:
            return None
        probe_idx = np.repeat(np.arange(keys.size), cnt)
        starts = np.repeat(lo, cnt)
        offs = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        buf_idx = starts + offs
        ok = np.abs(self._t[opp][buf_idx] - ts[probe_idx]) <= self.band
        if not ok.any():
            return None
        return probe_idx[ok], buf_idx[ok]

    def _insert(self, side: int, keys, seqs, ts) -> None:
        k = np.concatenate([self._k[side], keys])
        s = np.concatenate([self._s[side], seqs])
        t = np.concatenate([self._t[side], ts])
        o = np.argsort(k, kind="stable")
        self._k[side], self._s[side], self._t[side] = k[o], s[o], t[o]

    def ingest(self, side: int, batch: pa.Table, watermark: int) -> tuple[list[pa.Table], int]:
        """Absorb one micro-batch of ``side`` (0 = left, 1 = right):
        late-route, evict, probe the opposite buffer, insert.  Returns
        (emitted pair tables — empty in sink mode, n_late so far)."""
        self.wm = max(self.wm, watermark)
        ts = np.asarray(batch["ts"], np.int64)
        late = ts <= self.wm
        if late.any():
            lb = batch.filter(pa.array(late)).append_column(
                "side", pa.array(np.full(int(late.sum()), side), pa.int64())
            )
            # staged-layout partition key: unique iff seq is unique per log
            # (the operator's stated contract), side bit disambiguates logs
            lb = lb.append_column(
                "doc_id",
                pa.array(
                    (np.asarray(lb["seq"], np.int64) << np.int64(1))
                    | np.int64(side),
                    pa.int64(),
                ),
            )
            self._note_late(lb)
            keep = ~late
            batch = batch.filter(pa.array(keep))
            ts = ts[keep]
        self._evict()
        if batch.num_rows == 0:
            return [], self.n_late
        keys = np.asarray(batch["key"], np.int64)
        seqs = np.asarray(batch["seq"], np.int64)
        opp = 1 - side
        hit = self._probe(opp, keys, seqs, ts)
        out: list[pa.Table] = []
        if hit is not None:
            p_idx, b_idx = hit
            if side == 0:  # probe rows are LEFT
                l_seq, l_ts = seqs[p_idx], ts[p_idx]
                r_seq, r_ts = self._s[opp][b_idx], self._t[opp][b_idx]
                key = keys[p_idx]
            else:  # probe rows are RIGHT
                r_seq, r_ts = seqs[p_idx], ts[p_idx]
                l_seq, l_ts = self._s[opp][b_idx], self._t[opp][b_idx]
                key = keys[p_idx]
            pairs = pa.table(
                {
                    "doc_id": pa.array(_pair_ids(l_seq, r_seq), pa.int64()),
                    "key": pa.array(key, pa.int64()),
                    "l_seq": pa.array(l_seq, pa.int64()),
                    "l_ts": pa.array(l_ts, pa.int64()),
                    "r_seq": pa.array(r_seq, pa.int64()),
                    "r_ts": pa.array(r_ts, pa.int64()),
                }
            )
            self.n_pairs += pairs.num_rows
            out = [pairs]
        self._insert(side, keys, seqs, ts)
        return self._divert(out), self.n_late

    # -- sink plumbing ------------------------------------------------------

    def _divert(self, tables: list[pa.Table]) -> list[pa.Table]:
        if self.sink_dir is None or not tables:
            return tables
        for t in tables:
            if t.num_rows:
                self._sink_buf.append(t)
                self._sink_rows += t.num_rows
        if self._sink_rows >= self.sink_stage_rows:
            self._flush_sink()
        return []

    def _flush_sink(self) -> None:
        if not self._sink_buf:
            return
        from ..sinks.exactly_once import stage_table

        table = pa.concat_tables(self._sink_buf)
        self._sink_buf, self._sink_rows = [], 0
        stage_table(
            self.sink_dir, table, self.sink_partitions, self._sink_done,
            self.sink_epoch,
        )

    def _note_late(self, late_batch: pa.Table) -> None:
        """Count + route a late batch: to the ``<sink_dir>/_late`` staged
        layout in sink mode (bounded actor buffer — never O(stream)), to
        actor memory only in driver-collected mode (small runs/tests)."""
        self.n_late += late_batch.num_rows
        if self.sink_dir is None:
            self._late_mem.append(late_batch)
            return
        self._late_buf.append(late_batch)
        self._late_buf_rows += late_batch.num_rows
        if self._late_buf_rows >= self.sink_stage_rows:
            self._flush_late()

    def _flush_late(self) -> None:
        if not self._late_buf:
            return
        from ..sinks.exactly_once import late_dir, stage_table

        table = pa.concat_tables(self._late_buf)
        self._late_buf, self._late_buf_rows = [], 0
        stage_table(
            late_dir(self.sink_dir), table, self.sink_partitions,
            self._late_done, self.sink_epoch,
        )

    def sink_flush(self) -> int:
        self._flush_sink()
        self._flush_late()
        return self.n_pairs

    def late_rows(self) -> pa.Table | None:
        return pa.concat_tables(self._late_mem) if self._late_mem else None

    def state_stats(self) -> dict:
        return {
            "n_pairs": self.n_pairs,
            "n_late": self.n_late,
            "buffered_left": int(self._k[0].size),
            "buffered_right": int(self._k[1].size),
        }
