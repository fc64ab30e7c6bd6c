"""Multimodal (image/audio) columns as opaque binary + typed metadata.

This mirrors the reference's media path most directly — keyframe JPEG
and spectrogram NPZ readers (``/root/reference/data_handling.py:31-51``),
normalize/resize transforms (``data_handling.py:62-69``), zero-fill of
missing modalities (``data_handling.py:93-109``) and the batched model
forward pass (``feature_extraction.py:17-32``) — re-expressed as Ray
Data stages over a table::

    (asset_id: string, ts: timestamp[us], modality: string,
     payload: binary, width: int32, height: int32, sample_rate: int32)

Real image/audio codecs are NOT available in this container, so the
*decode* step is pluggable: ``decoder="stub"`` produces a
deterministic pseudo-decode from the payload bytes (shape-correct
float32 tensors, stable across runs — good enough to exercise and test
every piece of Ray-side plumbing); ``decoder="real"`` raises
``NotImplementedError`` with the exact integration point documented.
All batch sizing, actor-pool signatures, zero-fill semantics, schema
and output layout are production-shaped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64, rehash64

MODALITY_IMAGE = "image"
MODALITY_AUDIO = "audio"


def media_schema() -> pa.Schema:
    return pa.schema(
        [
            ("asset_id", pa.string()),
            ("ts", pa.timestamp("us")),
            ("modality", pa.string()),
            ("payload", pa.binary()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("sample_rate", pa.int32()),
        ]
    )


def synthesize_media_table(
    n_assets: int = 4,
    frames_per_asset: int = 10,
    seed: int = 42,
    vary_payload_len: bool = False,
) -> pa.Table:
    """Deterministic fake corpus mirroring the reference fixture layout
    (10 keyframes + spectrograms per source, some audio cells missing —
    ``/root/reference/data/input-files/test_source_id/``).
    ``vary_payload_len`` gives every frame a distinct payload size so
    length-derived checks (the driver-gate media oracle) are
    non-constant across rows."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in media_schema().names}
    for a in range(n_assets):
        aid = f"asset-{a:04d}"
        for f in range(frames_per_asset):
            ts = 1_700_000_000_000_000 + f * 1_000_000
            img_len = 200 + 9 * f + a if vary_payload_len else 256
            aud_len = 100 + 5 * f + a if vary_payload_len else 128
            rows["asset_id"].append(aid)
            rows["ts"].append(ts)
            rows["modality"].append(MODALITY_IMAGE)
            rows["payload"].append(rng.bytes(img_len))
            rows["width"].append(64)
            rows["height"].append(64)
            rows["sample_rate"].append(0)
            if rng.random() > 0.2:  # some audio cells deliberately missing
                rows["asset_id"].append(aid)
                rows["ts"].append(ts)
                rows["modality"].append(MODALITY_AUDIO)
                rows["payload"].append(rng.bytes(aud_len))
                rows["width"].append(0)
                rows["height"].append(0)
                rows["sample_rate"].append(24000)
    return pa.table(
        {
            "asset_id": pa.array(rows["asset_id"], pa.string()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "modality": pa.array(rows["modality"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
        }
    )


def _stub_decode(payloads: list[bytes | None], out_dim: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-decode: payload bytes → float32 vector in
    [0, 1). Stands in for jpeg-decode + resize + normalize
    (``data_handling.py:101-109``)."""
    import pandas as pd

    n = len(payloads)
    out = np.zeros((n, out_dim), dtype=np.float32)
    valid = [p is not None and len(p) > 0 for p in payloads]
    if any(valid):
        h = hash64(pd.Series([p if v else b"" for p, v in zip(payloads, valid)]))
        for j in range(out_dim):
            col = rehash64(h, seed=seed + j).astype(np.float64) / 2.0**64
            out[:, j] = col.astype(np.float32)
        out[~np.array(valid)] = 0.0
    return out


def sample_frames(media_ds, every_n: int = 2, num_partitions: int = 32):
    """Deterministic temporal frame sampling: keep every ``every_n``-th
    distinct timestamp per asset (rank in ts order), BOTH modalities of
    a kept timestamp retained. The reference reads all keyframes a
    pre-processor sampled offline (``data_handling.py:31-33``); at
    engine scale this is the knob that cuts decode volume before the
    actor pool.

    Runs as a :func:`hash_grouped_map` on ``asset_id`` — an asset's
    frames co-locate, rank is a vectorized run-length over sorted ts.
    """
    from .exchange import hash_grouped_map

    def _sample(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        order = np.argsort(ts, kind="stable")
        ts_s = ts[order]
        new_ts = np.ones(len(ts_s), dtype=bool)
        new_ts[1:] = ts_s[1:] != ts_s[:-1]
        rank = np.cumsum(new_ts) - 1  # dense rank of each distinct ts
        keep_sorted = (rank % every_n) == 0
        keep = np.zeros(len(ts), dtype=bool)
        keep[order] = keep_sorted
        return g.filter(pa.array(keep))

    return hash_grouped_map(
        media_ds,
        "asset_id",
        _sample,
        num_partitions=num_partitions,
        empty_schema=media_schema(),
    )


def mock_decode_fn(payloads, modality: str, out_dim: int) -> np.ndarray:
    """Reference implementation of the ``decoder="real"`` plug-point
    contract (torchvision-read_image-like: bytes in, float matrix out)
    — deterministic from payload length, used to exercise the real-path
    plumbing in environments without codecs. Swap for a wrapper around
    ``torchvision.io.read_image`` / ``librosa.load`` in production."""
    out = np.zeros((len(payloads), out_dim), dtype=np.float32)
    lens = np.array([len(p) if p else 0 for p in payloads], np.float32)
    valid = lens > 0
    if valid.any():
        out[valid] = (
            (lens[valid, None] % 7.0) + np.arange(out_dim, dtype=np.float32)
        ) / 100.0
    return out


class MediaFeatureExtractor:
    """Actor-pool stage: batched media → per-(asset, ts) feature rows.

    ``__init__`` = the model-load boundary (reference: ``torch.load``
    once per worker, ``nn_models.py:282-296``); ``__call__`` = the
    batched forward pass (batch 256, ``feature_extraction.py:76``).
    Missing audio cells are zero-filled exactly like the reference's
    typed zero tensors (``data_handling.py:93-99``).
    """

    IMAGE_DIM = 32
    AUDIO_DIM = 16

    def __init__(
        self,
        decoder: str = "stub",
        seed: int = 42,
        decode_fn=None,
        project: bool = True,
    ):
        """``decode_fn``: the ``decoder="real"`` plug point. Contract
        (mirrors a torchvision.io.read_image / librosa front-end,
        reference integration point ``data_handling.py:86-109``):
        ``decode_fn(payloads: list[bytes|None], modality: str,
        out_dim: int) -> float32 ndarray (len(payloads), out_dim)``,
        rows for None/empty payloads zero-filled.

        ``project=False`` skips the final dense projection and emits
        the concatenated per-modality decode features directly (the
        reference likewise concatenates per-modality outputs with no
        further head, ``/root/reference/feature_extraction.py:22-31``)
        — this is also what makes the media pipeline SQL-verifiable in
        the driver gate: with the deterministic length-based
        ``mock_decode_fn`` the unprojected features are closed-form in
        ``octet_length(payload)``."""
        if decoder not in ("stub", "real"):
            raise ValueError(decoder)
        if decoder == "real" and decode_fn is None:
            raise NotImplementedError(
                "real codecs are not available in this environment; pass "
                "decode_fn= wrapping torchvision.io.read_image / librosa "
                "(reference integration point: data_handling.py:86-109) "
                "with the (payloads, modality, out_dim) -> float32 matrix "
                "contract"
            )
        self.decoder = decoder
        self.decode_fn = decode_fn
        self.seed = seed
        self.project = project
        rng = np.random.default_rng(seed)
        d = self.IMAGE_DIM + self.AUDIO_DIM
        self.proj = (rng.standard_normal((d, d)) / np.sqrt(d)).astype(
            np.float32
        )

    def _decode(self, payloads, modality: str, out_dim: int, seed: int):
        if self.decoder == "real":
            out = np.asarray(
                self.decode_fn(list(payloads), modality, out_dim),
                dtype=np.float32,
            )
            if out.shape != (len(payloads), out_dim):
                raise ValueError(
                    f"decode_fn returned {out.shape}, expected "
                    f"{(len(payloads), out_dim)}"
                )
            return out
        return _stub_decode(payloads, out_dim, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Arrow/numpy sorted-merge pivot of the two modalities onto
        # (asset_id, ts) — the reference's full-outer modality merge J1
        # (data_handling.py:30-33). No pandas, no per-key lookups:
        # dictionary-encode the asset key (C++), lexsort, run-detect.
        asset = batch.column("asset_id").combine_chunks()
        codes = pc.dictionary_encode(asset).indices.to_numpy().astype(np.int64)
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        is_audio = pc.equal(
            batch.column("modality"), MODALITY_AUDIO
        ).to_numpy(zero_copy_only=False)
        order = np.lexsort((is_audio, ts, codes))
        codes_s, ts_s = codes[order], ts[order]
        aud_s = is_audio[order]
        new_key = np.ones(len(order), dtype=bool)
        new_key[1:] = (codes_s[1:] != codes_s[:-1]) | (ts_s[1:] != ts_s[:-1])
        key_id = np.cumsum(new_key) - 1
        n_keys = int(key_id[-1]) + 1 if len(key_id) else 0
        rep_rows = order[new_key]  # one representative input row per key

        payload_s = batch.column("payload").to_numpy(zero_copy_only=False)[
            order
        ]
        img_payloads = np.full(n_keys, None, dtype=object)
        aud_payloads = np.full(n_keys, None, dtype=object)
        # stable sort puts images before audio within a key; duplicate
        # (asset, ts, modality) rows resolve last-wins (deterministic),
        # mirroring the reference's "last glob hit wins" path index
        img_payloads[key_id[~aud_s]] = payload_s[~aud_s]
        aud_payloads[key_id[aud_s]] = payload_s[aud_s]

        v_img = self._decode(img_payloads, MODALITY_IMAGE, self.IMAGE_DIM, self.seed)
        v_aud = self._decode(aud_payloads, MODALITY_AUDIO, self.AUDIO_DIM, self.seed + 777)
        feats = np.hstack([v_img, v_aud])
        if self.project:
            feats = feats @ self.proj
        audio_present = np.zeros(n_keys, dtype=bool)
        audio_present[key_id[aud_s]] = True
        flat = pa.array(feats.astype(np.float32).ravel(), pa.float32())
        take_idx = pa.array(rep_rows, pa.int64())
        return pa.table(
            {
                "asset_id": pc.take(asset, take_idx),
                "ts": pc.take(batch.column("ts"), take_idx),
                "audio_present": pa.array(audio_present),
                "media_vec": pa.FixedSizeListArray.from_arrays(
                    flat, self.IMAGE_DIM + self.AUDIO_DIM
                ),
            }
        )


def extract_media_features(
    media_ds,
    decoder: str = "stub",
    concurrency: int | tuple[int, int] = 4,
    decode_fn=None,
    num_partitions: int = 32,
    num_cpus: float = 1,
    num_gpus: float | None = None,
    ray_remote_args: dict | None = None,
    project: bool = True,
):
    """Co-locate each asset's rows (both modalities of a timestamp in
    one block) and run the extractor as an actor pool — weights built
    once per actor in ``__init__``, batches scored in ``__call__``.

    Round-3 shape: co-location rides the engine's hash exchange on
    ``asset_id`` (identity kernel — no sort-based Dataset shuffle), and
    the pool AUTOSCALES ``(1, N)``: a fixed pool of N actors deadlocks
    a session with exactly N CPUs (the pool holds every slot and the
    upstream read starves). ``batch_size=None`` keeps one co-located
    partition per call, so the modality pivot in ``__call__`` always
    sees complete (asset, ts) keys.

    GPU placement (reference: per-worker ``cuda:0`` pick,
    ``nn_models.py:287``, ``feature_extraction.py:19-23``): pass
    ``num_gpus=``/``ray_remote_args=`` to pin each actor to a device
    share; Ray then schedules the pool onto GPU nodes.

    Binary payloads are large: scale out with ``num_partitions`` and
    ``concurrency``, keep partitions small (object-store friendly)."""
    from .exchange import hash_exchange

    colocated = hash_exchange(
        media_ds,
        "asset_id",
        num_partitions,
        lambda p, t: t,  # identity: exchange only co-locates
        empty_schema=media_schema(),
    )
    from ..functions.runtime import autoscale_pool

    concurrency = autoscale_pool(concurrency)
    kwargs = dict(ray_remote_args or {})
    if num_gpus is not None:
        kwargs["num_gpus"] = num_gpus
    return colocated.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={
            "decoder": decoder,
            "decode_fn": decode_fn,
            "project": project,
        },
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
        num_cpus=num_cpus,
        **kwargs,
    )
