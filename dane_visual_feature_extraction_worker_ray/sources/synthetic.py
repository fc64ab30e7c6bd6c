"""Deterministic synthetic transcript + snapshot corpus (FIXTURES.md).

Mirrors the reference's golden-fixture strategy
(``/root/reference/data/input-files/test_source_id/``: 10 keyframes,
partial shot coverage, missing-modality cells): seeded, no wall-clock,
deliberately includes

- duplicate ``ts`` pairs (tie-break exercised via ``turn_idx``),
- gaps larger than the session threshold (sessionization),
- a sparse nullable ``tool`` column (~20% non-null → ffill / rates),
- one mega-conversation (~10x median turns → skew salting),
- conversations with no snapshot at all, snapshots strictly after the
  last turn (leakage probes), and first turns before the first snapshot
  (no-prior-match sentinel; reference precedent ``(-1,-1)``,
  ``data_handling.py:128-129``),
- duplicate ``(conv_id, turn_idx)`` rows (ingest exact-dedup path),
- rows written in shuffled order (the engine's sort is actually doing
  work; reference analog: glob order vs ``sorted(timestamps)``,
  ``data_handling.py:31-33``).

Scale knob ``n_convs``; everything else derives deterministically.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["search", "code", "browse", "calc"])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog stream batch merge sort join "
    "window agg filter shuffle spark arrow block actor task object store".split()
)
_BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z


def _random_texts(rng: np.random.Generator, n: int) -> np.ndarray:
    """n deterministic texts of 3-8 seeded words (vectorized concat)."""
    wl = rng.integers(3, 9, size=n)
    widx = rng.integers(0, len(_WORDS), size=(n, 8))
    text = _WORDS[widx[:, 0]].astype("U80")
    for j in range(1, 8):
        grow = wl > j
        appended = np.char.add(np.char.add(text, " "), _WORDS[widx[:, j]])
        text = np.where(grow, appended, text)
    return text.astype(object)


def make_transcripts(
    n_convs: int = 50,
    seed: int = 42,
    mega_conv: bool = True,
    mega_turns: int | None = None,
    shuffle: bool = True,
    dup_fraction: float = 0.01,
    text_pool: int | None = None,
) -> pa.Table:
    """Transcript table ``(conv_id, turn_idx, role, text, tool, ts)``.

    ``text_pool``: at bench scale, draw texts from a pool of this many
    distinct strings instead of materializing one unique string per row
    (10-50x faster generation; per-(conv, turn) choice still seeded and
    deterministic, and a pool also gives dedup something to find).
    """
    rng = np.random.default_rng(seed)
    turns_per_conv = rng.integers(8, 41, size=n_convs)
    if mega_conv and n_convs > 0:
        turns_per_conv[0] = mega_turns or int(np.median(turns_per_conv) * 10)
    n = int(turns_per_conv.sum())

    conv_ids_uniq = np.array(
        [f"conv-{i:06d}" for i in range(n_convs)], dtype=object
    )
    conv_idx = np.repeat(np.arange(n_convs), turns_per_conv)
    conv_id = conv_ids_uniq[conv_idx]
    # dense 0-based turn_idx per conversation
    offsets = np.concatenate(([0], np.cumsum(turns_per_conv)[:-1]))
    turn_idx = (np.arange(n) - offsets[conv_idx]).astype(np.int32)

    role = _ROLES[turn_idx % 3]
    if text_pool:
        pool = _random_texts(rng, text_pool)
        text = pool[rng.integers(0, text_pool, size=n)]
    else:
        text = _random_texts(rng, n)
    tool_mask = rng.random(n) < 0.2
    tool = np.where(tool_mask, _TOOLS[rng.integers(0, 4, size=n)], None)

    # timestamps: per-conv start + non-decreasing gaps; ~5% zero gaps
    # (duplicate ts), ~5% session-breaking gaps (6-12 h)
    conv_start = _BASE_TS_US + rng.integers(0, 30 * 86400, size=n_convs) * 1_000_000
    gap_kind = rng.random(n)
    gaps = rng.integers(1_000_000, 600_000_000, size=n)  # 1 s .. 10 min
    gaps[gap_kind < 0.05] = 0
    gaps[gap_kind > 0.95] = rng.integers(
        6 * 3600, 12 * 3600, size=int((gap_kind > 0.95).sum())
    ) * 1_000_000
    first_of_conv = np.zeros(n, dtype=bool)
    first_of_conv[offsets] = True
    gaps[first_of_conv] = 0
    # per-conv cumulative: global cumsum re-based at conv starts
    cg = np.cumsum(gaps)
    ts = conv_start[conv_idx] + (cg - cg[offsets[conv_idx]])

    tbl = pa.table(
        {
            "conv_id": pa.array(conv_id.astype(object), type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role.astype(object), type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts.astype(np.int64), type=pa.timestamp("us")),
        }
    )
    if dup_fraction > 0 and n > 0:
        n_dup = max(1, int(n * dup_fraction))
        dup_rows = rng.integers(0, n, size=n_dup)
        tbl = pa.concat_tables([tbl, tbl.take(dup_rows)])
    if shuffle:
        perm = rng.permutation(tbl.num_rows)
        tbl = tbl.take(perm)
    return tbl


def make_snapshots(
    n_convs: int = 50,
    seed: int = 42,
    transcripts: pa.Table | None = None,
) -> pa.Table:
    """Sparse snapshot table ``(conv_id, ts, snap_val, snap_tag)``.

    ~30% of conversations get no snapshot; every conversation with
    snapshots also gets one strictly after its last turn (leakage
    probe) and its first turn precedes its first snapshot.
    """
    rng = np.random.default_rng(seed + 1)
    conv_ids, ts_out, val_out, tag_out = [], [], [], []
    tags = np.array(["alpha", "beta", "gamma"])

    if transcripts is not None:
        import pyarrow.compute as pc

        agg = transcripts.group_by("conv_id").aggregate(
            [("ts", "min"), ("ts", "max")]
        )
        cids = agg["conv_id"].to_pylist()
        tmin = pc.cast(agg["ts_min"], pa.int64()).to_numpy()
        tmax = pc.cast(agg["ts_max"], pa.int64()).to_numpy()
    else:
        cids = [f"conv-{i:06d}" for i in range(n_convs)]
        tmin = np.full(len(cids), _BASE_TS_US, dtype=np.int64)
        tmax = tmin + 86400_000_000

    order = np.argsort(np.array(cids, dtype=object))
    if len(cids) > 5000:  # vectorized path for bench-scale corpora
        cid_arr = np.array(cids, dtype=object)[order]
        tmin_s = np.asarray(tmin)[order]
        tmax_s = np.asarray(tmax)[order]
        nc = len(cid_arr)
        has = rng.random(nc) >= 0.3
        k = rng.integers(1, 5, size=nc)
        k[~has] = 0
        rep = np.repeat(np.arange(nc), k)
        lo = tmin_s + 1_000_000
        hi = np.maximum(lo + 1, tmax_s)
        snap_ts = rng.integers(lo[rep], hi[rep])
        snap_val = np.round(rng.random(len(rep)) * 100, 6)
        snap_tag = tags[rng.integers(0, 3, size=len(rep))]
        fut = np.flatnonzero(has)
        all_conv = np.concatenate([cid_arr[rep], cid_arr[fut]])
        all_ts = np.concatenate(
            [snap_ts, tmax_s[fut] + 3_600_000_000]
        ).astype(np.int64)
        all_val = np.concatenate(
            [snap_val, np.full(len(fut), -999.0)]
        )
        all_tag = np.concatenate(
            [snap_tag.astype(object), np.full(len(fut), "future", object)]
        )
        return pa.table(
            {
                "conv_id": pa.array(all_conv, type=pa.string()),
                "ts": pa.array(all_ts, type=pa.timestamp("us")),
                "snap_val": pa.array(all_val.astype(np.float64)),
                "snap_tag": pa.array(all_tag, type=pa.string()),
            }
        )
    for j in order:
        cid = cids[j]
        if rng.random() < 0.3:
            continue  # no snapshots at all for this conversation
        k = int(rng.integers(1, 5))
        lo = int(tmin[j]) + 1_000_000  # strictly after first turn
        hi = max(lo + 1, int(tmax[j]))
        snap_ts = np.sort(rng.integers(lo, hi, size=k))
        for t in snap_ts:
            conv_ids.append(cid)
            ts_out.append(int(t))
            val_out.append(round(float(rng.random() * 100), 6))
            tag_out.append(str(tags[int(rng.integers(0, 3))]))
        # leakage probe: snapshot strictly after the last turn
        conv_ids.append(cid)
        ts_out.append(int(tmax[j]) + 3600_000_000)
        val_out.append(-999.0)
        tag_out.append("future")

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "ts": pa.array(
                np.array(ts_out, dtype=np.int64), type=pa.timestamp("us")
            ),
            "snap_val": pa.array(np.array(val_out, dtype=np.float64)),
            "snap_tag": pa.array(tag_out, type=pa.string()),
        }
    )


def write_corpus(
    out_dir: str,
    n_convs: int = 50,
    seed: int = 42,
    row_group_size: int = 4096,
    **kw,
) -> tuple[str, str]:
    """Write transcripts.parquet + snapshots.parquet; returns the paths."""
    os.makedirs(out_dir, exist_ok=True)
    t = make_transcripts(n_convs=n_convs, seed=seed, **kw)
    s = make_snapshots(n_convs=n_convs, seed=seed, transcripts=t)
    tp = os.path.join(out_dir, "transcripts.parquet")
    sp = os.path.join(out_dir, "snapshots.parquet")
    pq.write_table(t, tp, row_group_size=row_group_size)
    pq.write_table(s, sp, row_group_size=row_group_size)
    return tp, sp


_LANGS = np.array(["de", "en", "es", "fr", "zh"])


def make_documents(
    n_docs: int = 1_000_000,
    seed: int = 42,
    text_pool: int | None = None,
    words_per_doc: tuple[int, int] = (15, 40),
) -> pa.Table:
    """Documents table ``(doc_id, text, lang, source, n_chars)`` in the
    testdata schema, for doc-scale bench stages. ``text_pool`` draws
    texts from a pool of distinct strings (sampling with replacement
    plants exact duplicates for the dedup stages — pool 60% of n gives
    a ~30% dup rate, web-crawl territory)."""
    rng = np.random.default_rng(seed)
    lo, hi = words_per_doc
    pool_n = text_pool or n_docs
    # compose each pool text from ~(lo..hi)/5.5 snippets of 3-8 words:
    # O(snippets) vectorized concat rounds instead of O(words) rounds
    # over full-width U arrays (40x fewer wide np.char.add passes)
    n_snip = max(2, (lo + hi) // 11)
    snips = _random_texts(rng, max(4096, pool_n // 8)).astype("U50")
    pick = rng.integers(0, len(snips), size=(pool_n, n_snip))
    text = snips[pick[:, 0]].astype(f"U{n_snip * 50}")
    for j in range(1, n_snip):
        text = np.char.add(np.char.add(text, " "), snips[pick[:, j]])
    pool = text.astype(object)
    docs = pool if pool_n == n_docs else pool[
        rng.integers(0, pool_n, size=n_docs)
    ]
    n_chars = np.char.str_len(docs.astype(str)).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(docs, pa.string()),
            "lang": pa.array(
                _LANGS[rng.integers(0, len(_LANGS), size=n_docs)],
                pa.string(),
            ),
            "source": pa.array(
                np.char.add(
                    "src", rng.integers(0, 20, size=n_docs).astype(str)
                ).astype(object),
                pa.string(),
            ),
            "n_chars": pa.array(n_chars),
        }
    )


def write_doc_corpus(
    out_dir: str,
    n_docs: int = 1_000_000,
    seed: int = 42,
    row_group_size: int = 131_072,
    **kw,
) -> str:
    """Write documents.parquet (testdata schema); returns the path."""
    os.makedirs(out_dir, exist_ok=True)
    t = make_documents(n_docs=n_docs, seed=seed, **kw)
    p = os.path.join(out_dir, "documents.parquet")
    pq.write_table(t, p, row_group_size=row_group_size)
    return p
