"""Idempotent exactly-once Parquet sink with per-partition lineage manifests.

Engine analog of the reference's single-shot ``images_to_pdf`` writer
(pdf_processor.py:130-155), upgraded for distributed retry + resume
(SURVEY.md S4, §4.2):

* output layout: ``out_dir/part=K/data.parquet`` — one directory per
  hash(doc_id) partition (fixed P → stable layout for resume; never one
  giant file);
* commit protocol per partition: write temp file → fsync → atomic rename →
  write manifest JSON (temp + rename).  A replayed task that finds the
  manifest already committed skips all work (idempotent);
* rows are deduplicated by ``doc_id`` and sorted within the partition, so
  upstream replays cannot duplicate output and bytes are deterministic;
* resume: ``write_exactly_once`` drops rows of already-committed partitions
  before the shuffle, so a restarted job only processes the missing ones.

Exactly-once is verified by the kill-and-replay test (tests/test_sink.py):
a run aborted mid-write, then resumed, yields byte-identical output to an
uninterrupted run.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_HASH_MOD = (1 << 31) - 1
_HASH_BASE = 131
_POW_CACHE: dict[int, np.ndarray] = {}


def _pow_table(n: int) -> np.ndarray:
    cached = _POW_CACHE.get(0)
    if cached is None or cached.size < n:
        size = max(n, 4096)
        p = np.empty(size, dtype=np.int64)
        p[0] = 1
        for i in range(1, size):
            p[i] = (p[i - 1] * _HASH_BASE) % _HASH_MOD
        _POW_CACHE[0] = p
        cached = p
    return cached


def hash_partition_ids(doc_ids: pa.Array | pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    """Vectorized deterministic partition id per doc_id: polynomial hash of
    the utf-8 bytes (mod 2^31-1) over the flattened string buffer — no
    per-row Python."""
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    arr = doc_ids.cast(pa.binary())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(off)
    if lens.sum() == 0:
        return np.zeros(len(arr), dtype=np.int64)
    flat = data[off[0] : off[-1]].astype(np.int64)
    off0 = off - off[0]
    pos = np.arange(flat.size, dtype=np.int64) - np.repeat(off0[:-1], lens)
    term = (flat * _pow_table(int(lens.max()))[pos]) % _HASH_MOD
    starts = np.minimum(off0[:-1], max(flat.size - 1, 0))
    h = np.add.reduceat(term, starts) % _HASH_MOD
    h = np.where(lens > 0, h, 0)
    return h % num_partitions


def _manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, "_manifests", f"part-{part:05d}.json")


def committed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifests")
    out = set()
    if not os.path.isdir(mdir):
        return out
    for f in os.listdir(mdir):
        if f.startswith("part-") and f.endswith(".json"):
            try:
                with open(os.path.join(mdir, f)) as fh:
                    m = json.load(fh)
                if m.get("committed"):
                    out.add(int(m["partition_id"]))
            except (ValueError, OSError):
                continue
    return out


def _atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _commit_partition(
    out_dir: str, part: int, table: pa.Table, fail_partitions: frozenset[int]
) -> pa.Table:
    """Commit one partition: dedup by doc_id, stable sort, temp+fsync+rename,
    manifest.  Idempotent: a committed manifest short-circuits replays."""
    mpath = _manifest_path(out_dir, part)
    if os.path.exists(mpath):
        with open(mpath) as f:
            if json.load(f).get("committed"):
                return _manifest_row(part, "skipped", 0)
    if part in fail_partitions:  # fault injection for the kill test
        raise RuntimeError(f"injected failure before commit of part {part}")
    table = table.sort_by("doc_id")
    ids = np.asarray(table["doc_id"].combine_chunks())
    keep = np.concatenate([[True], ids[1:] != ids[:-1]]) if len(ids) > 1 else np.ones(len(ids), bool)
    table = table.filter(pa.array(keep))

    pdir = os.path.join(out_dir, f"part={part:05d}")
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    final = os.path.join(pdir, "data.parquet")
    tmp = f"{final}.tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    with open(tmp, "rb+") as f:
        os.fsync(f.fileno())
    os.replace(tmp, final)
    fingerprint = f"{table.num_rows}:{int(hash_partition_ids(table['doc_id'], _HASH_MOD).sum())}"
    manifest = {
        "partition_id": part,
        "input_fingerprint": fingerprint,
        "output_file": final,
        "row_count": table.num_rows,
        "committed": True,
    }
    _atomic_write_bytes(mpath, json.dumps(manifest).encode())
    return _manifest_row(part, "committed", table.num_rows)


class _WriterActorImpl:
    """One writer actor owns a slice of the partition space.  Batches stream
    in as appends (spilled incrementally to a temp spill file per partition —
    bounded heap); finalize() sorts/dedups each partition and commits it.

    This replaces a sort-based groupby exchange with a single data movement
    into P writers — the streaming-sink shape that scales (no all-to-all)."""

    SPILL_THRESHOLD = 512 * 1024 * 1024  # per-writer heap bound

    def __init__(self, out_dir: str, fail_partitions: frozenset[int] = frozenset()):
        self.out_dir = out_dir
        self.fail = fail_partitions
        self.buffers: dict[int, list[pa.Table]] = {}
        self.buffered_bytes = 0
        self.spill: dict[int, pq.ParquetWriter] = {}
        self.spill_paths: dict[int, str] = {}

    def append(self, part: int, table: pa.Table) -> None:
        self.buffers.setdefault(part, []).append(table)
        self.buffered_bytes += table.nbytes
        if self.buffered_bytes > self.SPILL_THRESHOLD:
            self._spill_all()

    def _spill_all(self) -> None:
        for part, tables in self.buffers.items():
            if not tables:
                continue
            w = self.spill.get(part)
            if w is None:
                os.makedirs(os.path.join(self.out_dir, "_spill"), exist_ok=True)
                path = os.path.join(
                    self.out_dir, "_spill", f"part-{part:05d}-{uuid.uuid4().hex}.parquet"
                )
                w = pq.ParquetWriter(path, tables[0].schema)
                self.spill[part] = w
                self.spill_paths[part] = path
            w.write_table(pa.concat_tables(tables))
            tables.clear()
        self.buffered_bytes = 0

    def finalize(self) -> list[pa.Table]:
        out = []
        for part in sorted(self.buffers):
            pieces = []
            if part in self.spill:  # large partition: merge spilled + buffered
                self.spill[part].close()
                pieces.append(pq.read_table(self.spill_paths[part]))
            pieces.extend(self.buffers[part])
            data = pa.concat_tables(pieces) if len(pieces) > 1 else pieces[0]
            out.append(_commit_partition(self.out_dir, part, data, self.fail))
            if part in self.spill_paths:
                os.remove(self.spill_paths[part])
        self.buffers.clear()
        self.spill.clear()
        return out


def _manifest_row(part: int, status: str, rows: int) -> pa.Table:
    return pa.table(
        {
            "partition_id": pa.array([part], pa.int32()),
            "status": pa.array([status], pa.string()),
            "row_count": pa.array([rows], pa.int64()),
        }
    )


def write_exactly_once(
    ds,
    out_dir: str,
    *,
    num_partitions: int = 16,
    num_writers: int | None = None,
    resume: bool = True,
    fail_partitions: frozenset[int] = frozenset(),
) -> pa.Table:
    """Write a Dataset to the partitioned exactly-once layout.

    Upstream map tasks split each batch by hash(doc_id) partition and stream
    the slices to ``num_writers`` partition-writer actors (each owning
    ``num_partitions / num_writers`` partitions) — one data movement, no
    sort-based shuffle.  Returns the per-partition commit report.

    With ``resume=True``, rows of already-committed partitions are dropped at
    the source side (a restarted job redoes only missing partitions).
    ``fail_partitions`` is test-only fault injection (raise before commit).
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    done = committed_partitions(out_dir) if resume else set()
    if num_writers is None:
        num_writers = min(num_partitions, 8)
    WriterActor = ray.remote(_WriterActorImpl)
    writers = [
        WriterActor.options(max_concurrency=1).remote(out_dir, fail_partitions)
        for _ in range(num_writers)
    ]

    def route(batch: pa.Table) -> pa.Table:
        part = hash_partition_ids(batch["doc_id"], num_partitions)
        if done:
            keep = ~np.isin(part, list(done))
            batch = batch.filter(pa.array(keep))
            part = part[keep]
        refs = []
        for p in np.unique(part):
            sub = batch.filter(pa.array(part == p))
            refs.append(writers[int(p) % num_writers].append.remote(int(p), sub))
        ray.get(refs)  # ack before the block is considered consumed
        return _manifest_row(-1, "routed", batch.num_rows)

    for _ in ds.map_batches(route, batch_format="pyarrow").iter_batches():
        pass
    reports: list[pa.Table] = []
    errors: list[Exception] = []
    for w in writers:
        try:
            reports.extend(ray.get(w.finalize.remote()))
        except Exception as e:  # propagate after letting healthy writers commit
            errors.append(e)
    for w in writers:
        ray.kill(w)
    if errors:
        raise errors[0]
    return pa.concat_tables(reports) if reports else _manifest_row(-1, "empty", 0).slice(0, 0)


def read_output(out_dir: str):
    """Read back only committed partitions (a crashed run's torn temp files
    are invisible: data.parquet only appears via atomic rename)."""
    import ray.data

    parts = sorted(committed_partitions(out_dir))
    paths = [os.path.join(out_dir, f"part={p:05d}", "data.parquet") for p in parts]
    if not paths:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    return ray.data.read_parquet(paths)
