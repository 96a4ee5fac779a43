"""Model weight manager — the S5 analog of the reference's YOLO model
manager (``model_manager.py:48-137``: custom-path passthrough, cache-dir
reuse, download with progress, temp-file + verify + atomic rename, errors
on unknown models / failed verification).

This engine deploys with NO network, and its "models" are procedurally
generated deterministic checkpoints (functions/learned.py), so the
*download* step becomes a deterministic MATERIALIZATION of the named
weight table — every other semantic is kept: a node-local cache directory,
integrity verification (size + BLAKE2b digest manifest), temp + fsync +
atomic rename installation (a crashed materialization can never be
mistaken for a valid checkpoint), custom absolute paths passed through
untouched, and ``ValueError`` / ``RuntimeError`` on unknown names or
verification failure.  ``load_weights`` memory-maps the cached file, so a
64 MB table is built once per NODE and shared read-only by every actor on
it (vs once per actor when building in ``__init__``).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

import numpy as np

DEFAULT_CACHE_DIR = os.path.join(
    os.environ.get("PDFWM_RAY_CACHE", "/tmp/pdfwm_ray_models")
)

# name -> (builder kwargs, expected element count); digests are recorded in
# the manifest at first materialization (the weights are deterministic, so
# any later divergence means corruption)
MODEL_SPECS: dict[str, dict] = {
    "wm-detector-64m": {"kind": "learned-embedding", "seed": None},  # seed from learned.SEED
}


def _spec_shape(name: str) -> tuple[int, int, int]:
    from .learned import DIM, SEED, VOCAB

    spec = MODEL_SPECS[name]
    seed = spec["seed"] if spec["seed"] is not None else SEED
    return VOCAB, DIM, seed


def _build(name: str) -> np.ndarray:
    from .learned import _build_weights

    _, _, seed = _spec_shape(name)
    return _build_weights(seed)


class ModelManager:
    """Cache / verify / install / load named deterministic checkpoints."""

    def __init__(self, cache_dir: str | None = None, verbose: bool = False):
        self.cache_dir = cache_dir or DEFAULT_CACHE_DIR
        os.makedirs(self.cache_dir, exist_ok=True)
        self.verbose = verbose
        self.n_builds = 0  # diagnostics: how many materializations THIS manager ran

    # -- paths -------------------------------------------------------------

    def _file(self, name: str) -> str:
        return os.path.join(self.cache_dir, f"{name}.npy")

    def _manifest(self, name: str) -> str:
        return self._file(name) + ".json"

    # -- verification (model_manager.py:140-162 analog) --------------------

    def _verify(self, name: str) -> bool:
        path, man = self._file(name), self._manifest(name)
        if not (os.path.exists(path) and os.path.exists(man)):
            return False
        try:
            with open(man) as f:
                m = json.load(f)
            if os.path.getsize(path) != m["size"]:
                return False
            h = hashlib.blake2b(digest_size=16)
            with open(path, "rb") as f:
                while chunk := f.read(1 << 22):
                    h.update(chunk)
            return h.hexdigest() == m["blake2b"]
        except (OSError, ValueError, KeyError):
            return False

    # -- acquire ------------------------------------------------------------

    def get_model_path(self, model_name: str) -> str:
        """Resolve a model to a verified local file (materializing once).

        Mirrors ``model_manager.get_model_path``: absolute existing paths
        pass through; a verified cache entry is reused; unknown names raise
        ``ValueError``; a failed verification after materialization raises
        ``RuntimeError``.
        """
        if os.path.isabs(model_name) and os.path.exists(model_name):
            return model_name
        if model_name not in MODEL_SPECS:
            raise ValueError(
                f"Unknown model: {model_name}. Available models: "
                f"{', '.join(sorted(MODEL_SPECS))}"
            )
        if self._verify(model_name):
            return self._file(model_name)
        return self._materialize(model_name)

    def _materialize(self, name: str) -> str:
        """The no-network 'download': build the deterministic table, write
        temp + fsync, verify, atomic rename, manifest (temp + rename)."""
        weights = _build(name)
        self.n_builds += 1
        path = self._file(name)
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            np.save(f, weights)
            f.flush()
            os.fsync(f.fileno())
        h = hashlib.blake2b(digest_size=16)
        with open(tmp, "rb") as f:
            while chunk := f.read(1 << 22):
                h.update(chunk)
        with open(tmp, "rb") as f:
            got = np.load(f)
        if not np.array_equal(got, weights):  # round-trip integrity check
            os.unlink(tmp)
            raise RuntimeError(f"Model file verification failed for {name}")
        os.replace(tmp, path)
        man_tmp = f"{self._manifest(name)}.tmp-{uuid.uuid4().hex}"
        with open(man_tmp, "w") as f:
            json.dump({"size": os.path.getsize(path), "blake2b": h.hexdigest()}, f)
        os.replace(man_tmp, self._manifest(name))
        return path

    # -- load ---------------------------------------------------------------

    def load_weights(self, model_name: str) -> np.ndarray:
        """Memory-map the verified checkpoint (read-only): one build per
        NODE, shared by every actor via the page cache."""
        return np.load(self.get_model_path(model_name), mmap_mode="r")
