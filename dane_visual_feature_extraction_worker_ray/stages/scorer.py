"""Stateful actor-pool scorer: deterministic feature-vector assembly.

Reference analog: the model is loaded ONCE per worker process
(``/root/reference/worker.py:61`` → ``nn_models.py:282-296``) and the
forward pass maps dense batches to 512-d feature rows
(``feature_extraction.py:17-32``). Here the "model" is a deterministic
seeded projection: a hashed bag-of-words text embedding plus a linear
map of the numeric window/as-of features → ``fixed_size_list<float32>``
of width ``cfg.feature_dim``.

Used as ``ds.map_batches(FeatureScorer, fn_constructor_kwargs=...,
concurrency=N, batch_size=B)`` — state built in ``__init__`` (once per
actor), batches scored in ``__call__`` (vectorized numpy; the token
aggregation is a sorted ``np.add.reduceat``, no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import FeatureConfig
from ..functions.hashing import hash64

_NUMERIC_COLS = [
    "lag_ts_delta_s",
    "session_id",
    "turn_in_session",
    "w_turn_count",
    "w_tool_rate",
    "w_latency_mean_s",
    "tw_turn_count",
    "snap_val_asof",
    "snap_age_s",
]
_VOCAB = 1024


class FeatureScorer:
    def __init__(
        self,
        cfg: FeatureConfig | None = None,
        weights_uri: str | None = None,
        cache_dir: str | None = None,
        fetch_fn=None,
    ):
        """``weights_uri``/``cache_dir``/``fetch_fn``: the remote
        model-artifact seam (reference analog: checkpoint + config
        downloaded from object storage when the local copy is absent,
        then cached, ``/root/reference/nn_models.py:247-279``). The
        artifact is an ``.npz`` with ``tok_emb`` (vocab×dim float32)
        and ``num_proj`` (n_num×dim float32); it is fetched AT MOST
        once per node (``fetch_fn(uri, dest_path)``, atomic rename into
        the cache), validated against the expected shapes, and loaded
        once per actor in ``__init__``. Without ``weights_uri`` the
        weights are the deterministic seeded build (no network exists
        in this environment; a production deployment passes a boto3/
        fsspec download as ``fetch_fn``)."""
        cfg = cfg or FeatureConfig()
        self.dim = cfg.feature_dim
        n_num = len(_NUMERIC_COLS) + 2  # + has_snap, has_tool flags
        if weights_uri is not None:
            arrs = self._fetch_and_cache(weights_uri, cache_dir, fetch_fn)
            tok_emb = np.asarray(arrs["tok_emb"], dtype=np.float32)
            num_proj = np.asarray(arrs["num_proj"], dtype=np.float32)
            if tok_emb.shape != (_VOCAB, self.dim) or num_proj.shape != (
                n_num,
                self.dim,
            ):
                raise ValueError(
                    f"weights artifact {weights_uri!r} has shapes "
                    f"{tok_emb.shape}/{num_proj.shape}, expected "
                    f"{(_VOCAB, self.dim)}/{(n_num, self.dim)}"
                )
            self.tok_emb, self.num_proj = tok_emb, num_proj
            return
        rng = np.random.default_rng(cfg.scorer_seed)
        # "weights": loaded once per actor (reference: torch.load once
        # per worker, nn_models.py:282-296)
        self.tok_emb = rng.standard_normal((_VOCAB, self.dim)).astype(
            np.float32
        )
        self.num_proj = (
            rng.standard_normal((n_num, self.dim)) / np.sqrt(n_num)
        ).astype(np.float32)

    @staticmethod
    def _fetch_and_cache(uri: str, cache_dir: str | None, fetch_fn):
        """Resolve the artifact through a content-addressed local cache
        (key = sha256 of the uri): cache hit loads directly; cache miss
        calls ``fetch_fn(uri, tmp_path)`` and atomically renames, so a
        preempted fetch never leaves a half-written artifact that later
        loads (the reference's download-then-use has the same
        validate-before-trust shape, nn_models.py:254-266)."""
        import hashlib
        import os
        import tempfile

        d = cache_dir or os.path.join(
            tempfile.gettempdir(), "graft_model_cache"
        )
        os.makedirs(d, exist_ok=True)
        key = hashlib.sha256(uri.encode()).hexdigest()[:32]
        path = os.path.join(d, f"{key}.npz")
        if not os.path.isfile(path):
            if fetch_fn is None:
                raise NotImplementedError(
                    f"weights artifact {uri!r} is not cached and no "
                    "fetch_fn was given — this environment has no "
                    "network; pass fetch_fn=(uri, dest)->None wrapping "
                    "your object-store download (reference integration "
                    "point: nn_models.py:247-279)"
                )
            tmp = path + f".tmp.{os.getpid()}"
            fetch_fn(uri, tmp)
            if not os.path.isfile(tmp):
                raise FileNotFoundError(
                    f"fetch_fn did not write {tmp} for {uri!r}"
                )
            os.replace(tmp, path)
        return np.load(path)

    # -- text path: hashed bag-of-words mean embedding -----------------
    def _text_vectors(self, texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
        from ..functions.tokenize import ws_tokens

        n = len(texts)
        out = np.zeros((n, self.dim), dtype=np.float32)
        # shared C++ whitespace-split idiom (3.2x the pandas
        # str.split/explode path, measured on the 8.4M-row bench
        # scorer input) — one home in functions/tokenize.py
        row_idx, flat = ws_tokens(texts)
        if len(row_idx) == 0:
            return out
        tok = (hash64(flat.to_pandas()) % np.uint64(_VOCAB)).astype(np.int64)
        emb = self.tok_emb[tok]
        # row_idx is non-decreasing (explode preserves row order)
        starts = np.flatnonzero(
            np.r_[True, row_idx[1:] != row_idx[:-1]]
        )
        sums = np.add.reduceat(emb, starts, axis=0)
        counts = np.diff(np.r_[starts, len(row_idx)]).astype(np.float32)
        rows = row_idx[starts]
        out[rows] = sums / counts[:, None]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = []
        for c in _NUMERIC_COLS:
            arr = batch.column(c).cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            arr = np.nan_to_num(np.asarray(arr, dtype=np.float64), nan=0.0)
            # compress magnitudes, keep determinism
            cols.append(np.sign(arr) * np.log1p(np.abs(arr)))
        has_snap = (
            batch.column("snap_val_asof").is_valid().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.float64)
        has_tool = (
            batch.column("tool").is_valid().to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        num = np.column_stack(cols + [has_snap, has_tool]).astype(np.float32)
        vec = num @ self.num_proj + self._text_vectors(batch.column("text"))
        flat = pa.array(vec.astype(np.float32).ravel(), type=pa.float32())
        fsl = pa.FixedSizeListArray.from_arrays(flat, self.dim)
        return batch.append_column("feature_vec", fsl)


def score_features(
    features_ds,
    cfg: FeatureConfig | None = None,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 8192,
    num_cpus: float = 1,
    num_gpus: float | None = None,
    ray_remote_args: dict | None = None,
    weights_uri: str | None = None,
    cache_dir: str | None = None,
    fetch_fn=None,
):
    """Attach ``feature_vec`` via an actor pool (weights loaded once/actor).

    ``num_gpus``/``ray_remote_args`` thread per-actor device resources
    through to ``map_batches`` — the engine analog of the reference's
    per-worker ``cuda:0`` device pick (``nn_models.py:287``,
    ``feature_extraction.py:19-23``); a GPU deployment passes e.g.
    ``num_gpus=1`` (or a fraction to pack actors per device)."""
    from ..functions.runtime import autoscale_pool

    cfg = cfg or FeatureConfig()
    # pre-started pool with a deadlock-safe floor (see autoscale_pool)
    concurrency = autoscale_pool(concurrency)
    kwargs = dict(ray_remote_args or {})
    if num_gpus is not None:
        kwargs["num_gpus"] = num_gpus
    return features_ds.map_batches(
        FeatureScorer,
        fn_constructor_kwargs={
            "cfg": cfg,
            "weights_uri": weights_uri,
            "cache_dir": cache_dir,
            "fetch_fn": fetch_fn,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        **kwargs,
    )
