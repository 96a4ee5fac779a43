"""Shared staged-emitter plumbing of the streaming state actors.

Output rows divert to the exactly-once staged layout in sink mode (the
driver only commits manifests); late rows route to the ``_late/`` side
output under the same atomic protocol.  Actor memory for both is O(stage
buffer), never O(stream).  Used by the interval/temporal join actors and
the streaming dedup actor (KeyedStateActor predates this and carries its
own staging fields with window-specific routing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIN = np.int64(-(1 << 62))


class _StagedEmitterBase:
    """Shared plumbing of the streaming join actors: output rows divert to
    the exactly-once staged layout in sink mode (driver commits manifests
    only), late rows route to the ``_late/`` side output; actor memory for
    both is O(stage buffer), never O(stream)."""

    def _init_staging(
        self,
        *,
        sink_dir: str | None,
        sink_partitions: int,
        sink_stage_rows: int,
        sink_done: frozenset[int],
        late_done: frozenset[int],
        sink_epoch: int,
    ) -> None:
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
        self.wm = int(_MIN)
        self.n_late = 0
        self._late_mem: list[pa.Table] = []

    def _route_late(self, side: int, batch: pa.Table, ts: np.ndarray):
        """Split off rows with ``ts <= wm``: tag (side, doc_id) and route
        them late; return the surviving (batch, ts)."""
        late = ts <= self.wm
        if not late.any():
            return batch, ts
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
        return batch.filter(pa.array(keep)), ts[keep]

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

    def late_rows(self) -> pa.Table | None:
        return pa.concat_tables(self._late_mem) if self._late_mem else None
