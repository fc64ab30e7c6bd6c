"""Mergeable sketches: KLL-style quantile sketch and HyperLogLog.

Both follow the engine's sketch contract: one streaming pass emits
bounded per-batch partials (a sketch per block, serialized as plain
Arrow rows), the driver merges them — merge cost is bounded by
``sketch_size × n_blocks``, never by corpus rows, and the merged result
equals the sketch of the concatenated input (split-invariant by
construction where exact, deterministic everywhere).

Quantile sketch: levels of value buffers, level ``i`` carrying weight
``2**i``; a full level sorts and promotes alternate items (offset 0,
deterministic — a fixed offset trades the textbook's randomized
unbiasedness for bit-reproducibility, the right trade under this
repo's determinism-for-resume invariant). Total weight is conserved
exactly (2m items of weight w → m items of weight 2w; odd leftovers
stay put), so rank queries use the true row count. With ``capacity ≥
n`` nothing ever compacts and quantiles are EXACT — the driver-gate
query pins that regime so DuckDB's ``quantile_disc`` is a full-strength
oracle (rank = max(1, ceil(q·N)), verified against DuckDB 1.0); the
approximate regime's rank-error bound is pytest-checked.

HyperLogLog: 2**p max-rank registers from the stable 64-bit hash
(`functions/hashing.py`); partials are register vectors, merge =
elementwise max. Approximate by nature → rows-only gate query with a
tolerance test against the exact distinct count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


class QuantileSketch:
    def __init__(self, capacity: int = 8192):
        if capacity < 2:
            raise ValueError("capacity must be >= 2")
        self.capacity = capacity
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]

    def add(self, values: np.ndarray) -> "QuantileSketch":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for i, buf in enumerate(other.levels):
            while len(self.levels) <= i:
                self.levels.append(np.empty(0, np.float64))
            self.levels[i] = np.concatenate([self.levels[i], buf])
        self._compact()
        return self

    def _compact(self):
        i = 0
        while i < len(self.levels):
            buf = self.levels[i]
            if len(buf) > self.capacity:
                s = np.sort(buf, kind="stable")
                if len(s) % 2:  # odd leftover keeps its level/weight
                    keep, s = s[-1:], s[:-1]
                else:
                    keep = s[:0]
                promoted = s[0::2]  # deterministic offset
                self.levels[i] = keep
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], promoted]
                )
            i += 1

    @property
    def total_weight(self) -> int:
        return sum(len(b) << i for i, b in enumerate(self.levels))

    def quantiles(self, qs) -> np.ndarray:
        """quantile_disc semantics: smallest stored value whose
        cumulative weight ≥ max(1, ceil(q·N))."""
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(len(b), 1 << i, np.int64)
             for i, b in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, cum = vals[order], np.cumsum(wts[order])
        n = self.total_weight
        if n == 0:
            # empty sketch (0-row or all-null input): no order
            # statistics exist — NaN per quantile, not IndexError
            return np.full(len(qs), np.nan)
        out = np.empty(len(qs), np.float64)
        for j, q in enumerate(qs):
            target = max(1, int(np.ceil(q * n)))
            out[j] = vals[np.searchsorted(cum, target, side="left")]
        return out

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "level": pa.array(
                    np.concatenate(
                        [np.full(len(b), i, np.int32)
                         for i, b in enumerate(self.levels)]
                    )
                ),
                "v": pa.array(np.concatenate(self.levels)),
            }
        )

    @classmethod
    def from_table(cls, tbl: pa.Table, capacity: int) -> "QuantileSketch":
        sk = cls(capacity)
        lv = tbl.column("level").to_numpy()
        v = tbl.column("v").to_numpy()
        for i in range(int(lv.max()) + 1 if len(lv) else 1):
            while len(sk.levels) <= i:
                sk.levels.append(np.empty(0, np.float64))
            sk.levels[i] = v[lv == i].copy()
        sk._compact()
        return sk


def quantile_sketch_ds(
    ds, col: str, qs, capacity: int = 8192, combine_partitions: int = 16
) -> pa.Table:
    """Distributed quantiles of a double column: per-batch sketches →
    two-level combine → (q, value) table.

    The driver never merges one partial per block (O(n_blocks) serial
    work at corpus scale): partial rows are level-tagged, so
    concatenating any subset of partials and re-compacting IS the
    sketch merge — a ``repartition(combine_partitions)`` +
    per-partition re-sketch collapses n_blocks partials into
    ``combine_partitions`` intermediate sketches in parallel, and the
    driver merges only those."""

    def _partial(tbl: pa.Table) -> pa.Table:
        sk = QuantileSketch(capacity).add(
            tbl.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        return sk.to_table()

    def _combine(tbl: pa.Table) -> pa.Table:
        return QuantileSketch.from_table(tbl, capacity).to_table()

    combined = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .repartition(combine_partitions)
        .map_batches(_combine, batch_format="pyarrow", batch_size=None)
    )
    merged = QuantileSketch(capacity)
    for ref in combined.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            merged.merge(QuantileSketch.from_table(t, capacity))
    vals = merged.quantiles(qs)
    return pa.table(
        {
            "q": pa.array(np.asarray(qs, np.float64)),
            "value": pa.array(vals),
        }
    )


_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_alpha(m: int) -> float:
    return _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def _hll_idx_rank(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Shared HLL core: uint64 hash → (register index = top p bits,
    rank = 1 + leading zeros of the rest). The sentinel bit at
    position p-1 caps the rank at 64-p+1 naturally; one copy of this
    math keeps the grouped and ungrouped sketches merge-compatible."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    fl = 64 - np.floor(np.log2(rest.astype(np.float64)) + 1e-15).astype(
        np.int64
    )
    rank = np.minimum(fl, 64 - p + 1)
    return idx, rank


def hll_registers_partial(h: np.ndarray, p: int) -> np.ndarray:
    """Max leading-zero-rank register vector (length 2**p) from uint64
    hashes."""
    m = 1 << p
    idx, rank = _hll_idx_rank(h, p)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _hll_alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:  # small-range linear counting
        est = m * np.log(m / zeros)
    return float(est)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 (0 → 0) — integer
    shift/compare ladder, no float log2 (whose 1-ulp libm divergence
    vs other engines can flip a floor() at powers of two)."""
    bl = np.zeros(x.shape, np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        v = np.where(m, v >> np.uint64(s), v)
    return bl + (v != 0).astype(np.int64)


def hll_registers_partial_exact(h: np.ndarray, p: int) -> np.ndarray:
    """Like :func:`hll_registers_partial` but with EXACT integer ranks
    (rank = 65 − bit_length(rest), sentinel-capped) — bit-reproducible
    against any engine that can compute a bit length."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    rank = 65 - _bit_length_u64(rest)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def hll_estimate_raw_exact(regs: np.ndarray) -> float:
    """RAW HLL estimator (no small-range linear-counting branch — that
    branch needs ln(), which diverges by 1 ulp across libms and is
    never hash-compared here; it stays on the production
    :func:`hll_estimate` path) with the register sum carried as an
    EXACT integer: Σ 2^(−reg) · 2^53 is a sum of integer powers of two
    (rank ≤ 53 at p ≥ 12), so the only rounding is the single final
    IEEE divide — bit-identical to the SQL oracle's HUGEINT sum."""
    m = len(regs)
    max_rank = 64 - int(np.log2(m)) + 1
    if max_rank > 53:
        raise ValueError("hll_estimate_raw_exact: need p >= 12")
    # Python-int accumulation: the total reaches 2^65 (4096 × 2^53)
    # and would wrap an int64 np.sum; 2^p driver-side adds are free
    counts = np.bincount(regs.astype(np.int64), minlength=54)
    s_int = sum(int(c) << (53 - r) for r, c in enumerate(counts) if c)
    alpha = _hll_alpha(m)
    return alpha * m * m * 9007199254740992.0 / float(s_int)


def hll_distinct_int_exact(
    ds, col: str, p: int = 12, combine_partitions: int = 16
) -> float:
    """Approximate distinct count of one non-negative INTEGER column,
    fully oracle-reproducible: splitmix64 finalizer hash
    (= ``rehash64(ids, seed=0)``, the same chain the
    ``weighted_sample_docs`` SQL proves), exact bit-length ranks, raw
    estimator with an integer register sum. Same distributed shape as
    :func:`hll_distinct` (2^p-byte partials, two-level max-combine)."""
    from ..functions.hashing import rehash64

    m = 1 << p
    idx_arr = pa.array(np.arange(m, dtype=np.int32))

    def _partial(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(col).to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        h = rehash64(ids, 0)
        return pa.table(
            {"i": idx_arr, "r": pa.array(hll_registers_partial_exact(h, p))}
        )

    def _combine(tbl: pa.Table) -> pa.Table:
        regs = np.zeros(m, np.uint8)
        np.maximum.at(
            regs,
            tbl.column("i").to_numpy().astype(np.int64),
            tbl.column("r").to_numpy(),
        )
        return pa.table({"i": idx_arr, "r": pa.array(regs)})

    combined = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .repartition(combine_partitions)
        .map_batches(_combine, batch_format="pyarrow", batch_size=None)
    )
    regs = np.zeros(m, np.uint8)
    for ref in combined.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            np.maximum.at(
                regs,
                t.column("i").to_numpy().astype(np.int64),
                t.column("r").to_numpy(),
            )
    return hll_estimate_raw_exact(regs)


def hll_distinct(
    ds, cols: list[str], p: int = 12, combine_partitions: int = 16
) -> float:
    """Approximate distinct count of a column tuple: per-batch register
    partials (2**p bytes each, index-tagged so repartitioning may split
    them), a parallel two-level max-combine, then an elementwise-max
    driver merge of only ``combine_partitions`` vectors."""
    from ..functions.hashing import hash64_columns

    m = 1 << p
    idx_arr = pa.array(np.arange(m, dtype=np.int32))

    def _partial(tbl: pa.Table) -> pa.Table:
        h = hash64_columns(tbl.select(cols), cols)
        return pa.table(
            {"i": idx_arr, "r": pa.array(hll_registers_partial(h, p))}
        )

    def _combine(tbl: pa.Table) -> pa.Table:
        regs = np.zeros(m, np.uint8)
        np.maximum.at(
            regs,
            tbl.column("i").to_numpy().astype(np.int64),
            tbl.column("r").to_numpy(),
        )
        return pa.table({"i": idx_arr, "r": pa.array(regs)})

    combined = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .repartition(combine_partitions)
        .map_batches(_combine, batch_format="pyarrow", batch_size=None)
    )
    regs = np.zeros(m, np.uint8)
    for ref in combined.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            np.maximum.at(
                regs,
                t.column("i").to_numpy().astype(np.int64),
                t.column("r").to_numpy(),
            )
    return hll_estimate(regs)


def hll_distinct_grouped(
    ds,
    key_col: str,
    batch_to_kv,
    p: int = 12,
    num_partitions: int = 16,
    key_type: pa.DataType | None = None,
):
    """Approximate distinct count PER GROUP: HyperLogLog registers as
    mergeable grouped partials.

    ``batch_to_kv(tbl) -> (keys, hashes)``: group key values (any
    numpy-comparable dtype) and uint64 value hashes, one pair per
    observation. Per batch the sparse non-zero registers are reduced
    with one sort + ``maximum.reduceat`` (works at any group
    cardinality — no dense groups×2**p allocation); the cross-batch
    combine is ``max(r)`` per (key, register) on the exchange's C++
    group_by; the per-group estimate is the standard bias-corrected
    harmonic mean with linear counting for the small range.

    Shuffled bytes per batch are bounded by
    ``distinct (group, register) pairs ≤ groups_in_batch × 2**p``,
    independent of row count — same partial→final contract as every
    other engine aggregate. Returns a Dataset ``(key_col, est)``.

    ``key_type``: the Arrow type of the key (default: string). It
    pins the partial schema when a non-empty batch yields ZERO
    observations (e.g. every text tokenizes empty) — an untyped empty
    object array would otherwise produce a null-typed key column and
    break the exchange's schema union.
    """
    from .exchange import hash_grouped_map
    from .groupagg import hash_grouped_aggregate

    m = 1 << p
    ktype = key_type or pa.string()

    def _partial(tbl: pa.Table) -> pa.Table:
        keys, h = batch_to_kv(tbl)
        idx, rank = _hll_idx_rank(h.astype(np.uint64), p)
        codes, uniq = _factorize(keys)
        ck = codes.astype(np.int64) * m + idx
        order = np.argsort(ck, kind="stable")
        cks, rs = ck[order], rank[order]
        starts = np.flatnonzero(np.r_[True, cks[1:] != cks[:-1]]) if len(
            cks
        ) else np.array([], np.int64)
        maxr = (
            np.maximum.reduceat(rs, starts)
            if len(starts)
            else np.array([], np.int64)
        )
        return pa.table(
            {
                key_col: pa.array(uniq[cks[starts] // m], ktype),
                "i": pa.array((cks[starts] % m).astype(np.int32)),
                "r": pa.array(maxr),
            }
        )

    partials = ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None
    )
    regs = hash_grouped_aggregate(
        partials, [key_col, "i"], [("r", "max")],
        num_buckets=num_partitions,
    )

    def _estimate(g: pa.Table) -> pa.Table:
        regs = np.zeros(m, np.uint8)
        regs[g.column("i").to_numpy().astype(np.int64)] = (
            g.column("r").cast(pa.int64()).to_numpy().astype(np.uint8)
        )
        est = hll_estimate(regs)  # shared bias-corrected estimator
        return pa.table(
            {
                key_col: pa.array([g.column(key_col)[0].as_py()], ktype),
                "est": pa.array([float(est)]),
            }
        )

    return hash_grouped_map(
        regs, [key_col], _estimate, num_partitions=num_partitions
    )


def _factorize(keys):
    """np.unique-based factorize (codes, uniques) for any comparable
    dtype, including object-dtype strings."""
    uniq, codes = np.unique(keys, return_inverse=True)
    return codes, uniq


def grouped_quantile_sketch_ds(
    ds, key_col: str, val_col: str, qs, capacity: int = 8192
) -> pa.Table:
    """Per-group distributed quantiles: one sketch per (group, batch)
    partial, driver merge per group. Sized for statistic keys (few
    groups — event types, languages), where driver state is
    O(groups × capacity); entity-cardinality keys belong on the
    exchange instead."""
    import pandas as pd

    def _partial(tbl: pa.Table) -> pa.Table:
        codes, uniq = pd.factorize(
            tbl.column(key_col).to_pandas(), sort=False
        )
        v = tbl.column(val_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        keys, levels, vals = [], [], []
        for c, key in enumerate(uniq):
            t = QuantileSketch(capacity).add(v[codes == c]).to_table()
            keys.append(
                np.full(t.num_rows, key, dtype=object)
            )
            levels.append(t.column("level").to_numpy())
            vals.append(t.column("v").to_numpy())
        if not keys:
            return pa.table(
                {
                    key_col: pa.array([], pa.string()),
                    "level": pa.array([], pa.int32()),
                    "v": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                key_col: pa.array(np.concatenate(keys), pa.string()),
                "level": pa.array(np.concatenate(levels), pa.int32()),
                "v": pa.array(np.concatenate(vals)),
            }
        )

    merged: dict[str, QuantileSketch] = {}
    for ref in ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs():
        t = ray.get(ref)
        if not t.num_rows:
            continue
        import pandas as pd

        codes, uniq = pd.factorize(
            t.column(key_col).to_pandas(), sort=False
        )
        lv = t.column("level").to_numpy()
        v = t.column("v").to_numpy()
        for c, key in enumerate(uniq):
            m = codes == c
            part = QuantileSketch.from_table(
                pa.table(
                    {"level": pa.array(lv[m]), "v": pa.array(v[m])}
                ),
                capacity,
            )
            if key in merged:
                merged[key].merge(part)
            else:
                merged[key] = part
    out_k, out_q, out_v = [], [], []
    for key in sorted(merged):
        vals = merged[key].quantiles(qs)
        out_k.extend([key] * len(qs))
        out_q.extend(float(q) for q in qs)
        out_v.extend(vals)
    return pa.table(
        {
            key_col: pa.array(out_k, pa.string()),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        }
    )


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries, Agarwal et al. 2013):
# per-batch exact counts → MG-compress to `capacity` counters → token-hash
# exchange sums surviving counters exactly → per-partition compress →
# tiny driver merge + one final compress. Undercount per item is bounded
# by the compress steps: each subtracts at most (weight it processed) /
# (capacity + 1), and the three tiers each process ≤ N total, so
# true_count - estimate ≤ 3·N/(capacity+1) (per-batch tier + partition
# tier + final tier); estimates never exceed the true count. Every item
# with true count > that bound is guaranteed present.


def mg_compress(toks: np.ndarray, cnt: np.ndarray, capacity: int):
    """One Misra-Gries compress step on (item, weight) counters:
    subtract the (capacity+1)-th largest weight from all, drop ≤ 0.
    Returns (items, adjusted_weights) with ≤ capacity entries.
    Deterministic: pure arithmetic, no tie-break choices (equal
    weights at the threshold all survive or all drop together)."""
    if len(toks) <= capacity:
        return toks, cnt
    # threshold = (capacity+1)-th largest count (1-indexed)
    thr = np.partition(cnt, len(cnt) - capacity - 1)[len(cnt) - capacity - 1]
    adj = cnt - thr
    keep = adj > 0
    return toks[keep], adj[keep]


def mg_topk_tokens(
    ds,
    batch_to_tokens,
    k: int = 20,
    capacity: int = 1024,
    num_partitions: int = 8,
):
    """Approximate top-k heavy hitters over an unbounded token stream
    with bounded memory everywhere: no stage ever holds more than
    ``capacity`` counters per block (map side) / per partition (reduce
    side), and the driver sees ≤ capacity × num_partitions rows —
    independent of corpus size OR vocabulary size (contrast
    ``top_tokens``, which is exact but holds each partition's full
    vocabulary). ``batch_to_tokens(tbl) -> np.ndarray`` of strings.

    Returns an Arrow table (tok, est, err_bound): ``est ≤ true`` and
    ``true - est ≤ err_bound = 3·total/(capacity+1)`` (tiers documented
    above); any token with true count > err_bound is present in the
    merged summary. With ``capacity ≥ distinct tokens`` nothing ever
    subtracts and est == exact count — the driver-gate planted query
    pins that regime so plain SQL counts are a full-strength oracle.
    """
    from .groupagg import hash_grouped_aggregate

    def _partial(tbl: pa.Table) -> pa.Table:
        toks = batch_to_tokens(tbl)
        if len(toks) == 0:
            return pa.table(
                {"tok": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()),
                 "w": pa.array([], pa.int64())}
            )
        u, c = np.unique(toks, return_counts=True)
        u2, c2 = mg_compress(u, c.astype(np.int64), capacity)
        # `w`: the batch's TOTAL token weight rides the partials (on
        # the first surviving row only) so the driver can compute the
        # global error bound without a second pass
        if len(u2) == 0:
            # compress dropped every counter (all-equal counts just
            # over capacity) — keep the weight on a sentinel row
            return pa.table(
                {"tok": pa.array([""], pa.string()),
                 "n": pa.array([0], pa.int64()),
                 "w": pa.array([len(toks)], pa.int64())}
            )
        w = np.zeros(len(u2), np.int64)
        w[0] = len(toks)
        return pa.table(
            {"tok": pa.array(u2, pa.string()), "n": pa.array(c2),
             "w": pa.array(w)}
        )

    summed = hash_grouped_aggregate(
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["tok"],
        [("n", "sum"), ("w", "sum")],
        num_buckets=num_partitions,
    )

    def _compress_part(tbl: pa.Table) -> pa.Table:
        t = tbl.column("tok").to_numpy(zero_copy_only=False)
        c = tbl.column("n").cast(pa.int64()).to_numpy()
        wt = int(tbl.column("w").cast(pa.int64()).to_numpy().sum())
        t2, c2 = mg_compress(t, c, capacity)
        w = np.zeros(len(t2), np.int64)
        if len(w):
            w[0] = wt
        elif wt:
            # partition compressed to nothing but carries weight: keep
            # the weight on a sentinel row so the global bound is exact
            return pa.table(
                {"tok": pa.array([""], pa.string()),
                 "n": pa.array([0], pa.int64()),
                 "w": pa.array([wt], pa.int64())}
            )
        return pa.table(
            {"tok": pa.array(t2, pa.string()), "n": pa.array(c2),
             "w": pa.array(w)}
        )

    parts = [
        ray.get(r)
        for r in summed.map_batches(
            _compress_part, batch_format="pyarrow", batch_size=None
        ).to_arrow_refs()
    ]
    merged = pa.concat_tables([t for t in parts if t.num_rows])
    if merged.num_rows == 0:
        return pa.table(
            {"tok": pa.array([], pa.string()),
             "est": pa.array([], pa.int64()),
             "err_bound": pa.array([], pa.int64())}
        )
    toks = merged.column("tok").to_numpy(zero_copy_only=False)
    cnts = merged.column("n").cast(pa.int64()).to_numpy()
    total = int(merged.column("w").cast(pa.int64()).to_numpy().sum())
    live = cnts > 0  # drop weight-sentinel rows
    toks, cnts = toks[live], cnts[live]
    toks, cnts = mg_compress(toks, cnts, capacity)
    bound = 3 * total // (capacity + 1)
    order = np.lexsort((toks, -cnts))[:k]
    return pa.table(
        {
            "tok": pa.array(toks[order], pa.string()),
            "est": pa.array(cnts[order]),
            "err_bound": pa.array(
                np.full(len(order), bound, np.int64)
            ),
        }
    )


# --------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005 — public method)

CMS_DEPTH = 4


def cms_partial(
    toks: np.ndarray, cnt: np.ndarray, width: int,
    depth: int = CMS_DEPTH,
) -> np.ndarray:
    """(depth, width) int64 count matrix from (token, count) pairs —
    mergeable by elementwise ADD (the whole point of CMS: a 100-TB
    corpus reduces to depth·width integers per partial). Row d uses
    the engine's stable hash rehashed with seed d (functions/hashing),
    so sketches from any block/run/parallelism merge consistently."""
    from ..functions.hashing import hash64, rehash64

    h = hash64(toks)
    m = np.zeros((depth, width), np.int64)
    for d in range(depth):
        idx = (rehash64(h, d + 1) % np.uint64(width)).astype(np.int64)
        np.add.at(m[d], idx, cnt)
    return m


def cms_estimate(
    sketch: np.ndarray, terms: list[str]
) -> np.ndarray:
    """Point estimates for ``terms``: min over rows (always ≥ truth;
    equal when the term collides with nothing in at least one row)."""
    from ..functions.hashing import hash64, rehash64

    depth, width = sketch.shape
    h = hash64(np.array(terms, dtype=object))
    est = np.full(len(terms), np.iinfo(np.int64).max, np.int64)
    for d in range(depth):
        idx = (rehash64(h, d + 1) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, sketch[d, idx])
    return est


def cms_token_counts_ds(
    docs_ds, terms: list[str], width: int = 1 << 16,
    depth: int = CMS_DEPTH, text_col: str = "text",
):
    """Build a corpus CMS over whitespace tokens (one (depth·width)
    partial per block, merged by addition) and return the point
    estimates for ``terms`` as an Arrow table (term, est)."""
    import pyarrow as pa
    import ray

    def _partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        s = tbl.column(text_col).to_pandas().fillna("")
        ex = s.str.split().explode().dropna()
        if len(ex) == 0:
            m = np.zeros((depth, width), np.int64)
        else:
            vc = pd.Series(ex.to_numpy()).value_counts(sort=False)
            m = cms_partial(
                vc.index.to_numpy(dtype=object),
                vc.to_numpy().astype(np.int64),
                width, depth,
            )
        return pa.table({"m": pa.array([m.reshape(-1)])})

    total = np.zeros(depth * width, np.int64)
    for t in ray.get(
        docs_ds.map_batches(
            _partial, batch_format="pyarrow", batch_size=None
        ).to_arrow_refs()
    ):
        if t.num_rows == 0:
            continue
        flat = (
            t.column("m").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False)
        )
        total += flat.reshape(t.num_rows, -1).sum(axis=0).astype(np.int64)
    est = cms_estimate(total.reshape(depth, width), terms)
    return pa.table(
        {
            "term": pa.array(list(terms), pa.string()),
            "est": pa.array(est),
        }
    )
