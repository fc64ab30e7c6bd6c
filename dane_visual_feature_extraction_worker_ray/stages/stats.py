"""Distributed statistics via mergeable integer moments.

The scale shape shared by every operator here: one streaming pass emits
tiny per-batch partial tables of EXACT int64 sums (per-batch row counts
bound the int64 range); the driver combines partials with Python
arbitrary-precision ints (so the GLOBAL sums never overflow at any
corpus size) and evaluates the final closed-form statistic with a fixed
IEEE expression shape that the DuckDB oracles mirror token-for-token
(DuckDB's ``sum(BIGINT)`` is HUGEINT — also overflow-free — and
``CAST(HUGEINT AS DOUBLE)`` rounds nearest-even like Python
``float(int)``).

No shuffle anywhere: group cardinality here is small (statistic keys,
not entity keys), so partials are collected driver-side — the same
"vocabulary, not corpus, lands on the driver" rule as
``text.doc_freq_score``. Reference analogy: the reference accumulates
per-step timing scalars on the driver thread
(``/root/reference/provenance.py:19-43``); these are the same mergeable
-scalar shape generalized to grouped moments.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .groupagg import group_aggregate_table


def grouped_moment_partials(
    ds,
    key_cols: list[str],
    batch_to_xy,
    n_moments: int = 5,
):
    """Collect exact grouped bivariate moments (n, sx, sy, sxx, syy,
    sxy) as Python ints. ``batch_to_xy(tbl) -> (x_int64, y_int64)``.

    Returns dict: key_tuple -> [n, sx, sy, sxx, syy, sxy] (Python ints).
    Exact at ANY row count: when a whole-batch int64 sum could wrap
    (large values — e.g. global RANKS, whose squares grow as N², where
    cents stay bounded), the batch is split into slices sized so every
    slice sum fits 2**62, and the slices' partial tables are emitted
    separately (the driver's Python-int combine already merges
    repeated keys). Per-ELEMENT products ≥ 2**63 (|value| ≥ ~3.0e9)
    raise loudly — that regime needs a wider-type path, not a silent
    wrap.
    """

    def _one_slice(tbl: pa.Table, x, y) -> pa.Table:
        cols = {c: tbl.column(c) for c in key_cols}
        cols["n"] = pa.array(np.ones(len(x), np.int64))
        cols["sx"] = pa.array(x)
        cols["sy"] = pa.array(y)
        cols["sxx"] = pa.array(x * x)
        cols["syy"] = pa.array(y * y)
        cols["sxy"] = pa.array(x * y)
        return group_aggregate_table(
            pa.table(cols),
            key_cols,
            [(m, "sum") for m in ("n", "sx", "sy", "sxx", "syy", "sxy")],
        )

    def _partial(tbl: pa.Table) -> pa.Table:
        x, y = batch_to_xy(tbl)
        x = x.astype(np.int64)
        y = y.astype(np.int64)
        if len(x) == 0:
            return _one_slice(tbl, x, y)
        mx = int(
            max(np.abs(x).max(initial=0), np.abs(y).max(initial=0))
        )
        if mx and mx * mx >= 2**63:
            raise OverflowError(
                "moment partials: |value| >= ~3.0e9 — per-element "
                "squares overflow int64; rescale or use a wider path"
            )
        prod = max(mx * mx, 1)
        seg = max(1, 2**62 // prod)
        if len(x) <= seg:
            return _one_slice(tbl, x, y)
        parts = [
            _one_slice(tbl.slice(i, seg), x[i : i + seg], y[i : i + seg])
            for i in range(0, len(x), seg)
        ]
        return pa.concat_tables(parts)

    acc: dict[tuple, list[int]] = {}
    for ref in ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            # Ray skips the UDF on 0-row blocks and emits 0-COLUMN
            # blocks — t.column(c) would KeyError (CLAUDE.md gotcha)
            continue
        keys = list(zip(*(t.column(c).to_pylist() for c in key_cols)))
        for i, k in enumerate(keys):
            row = acc.setdefault(k, [0, 0, 0, 0, 0, 0])
            for j, m in enumerate(("n", "sx", "sy", "sxx", "syy", "sxy")):
                row[j] += t.column(m)[i].as_py()  # python int: no overflow
    return acc


def corr_ols_from_moments(moments: dict, key_cols: list[str]) -> pa.Table:
    """Pearson r + OLS slope/intercept per group from exact moments.

    IEEE shape (mirrored by the SQL oracle):
      r     = DOUBLE(n·sxy − sx·sy) / (sqrt(DOUBLE(n·sxx − sx²)) ·
                                        sqrt(DOUBLE(n·syy − sy²)))
      slope = DOUBLE(n·sxy − sx·sy) / DOUBLE(n·sxx − sx²)
      icept = (DOUBLE(sy) − slope·DOUBLE(sx)) / DOUBLE(n)
    """
    out: dict[str, list] = {c: [] for c in key_cols}
    out.update({"n": [], "r": [], "slope": [], "intercept": []})
    for k in sorted(moments):
        n, sx, sy, sxx, syy, sxy = moments[k]
        num = float(n * sxy - sx * sy)
        vx = float(n * sxx - sx * sx)
        vy = float(n * syy - sy * sy)
        r = num / (np.sqrt(vx) * np.sqrt(vy))
        slope = num / vx
        icept = (float(sy) - slope * float(sx)) / float(n)
        for c, v in zip(key_cols, k):
            out[c].append(v)
        out["n"].append(n)
        out["r"].append(r)
        out["slope"].append(slope)
        out["intercept"].append(icept)
    out["n"] = pa.array(out["n"], pa.int64())
    return pa.table(out)


def grouped_zscore(
    ds,
    key_cols: list[str],
    id_cols: list[str],
    batch_to_x,
):
    """Per-row population z-score of an integer-valued column within
    groups: pass 1 collects exact grouped (n, sx, sxx); pass 2 streams
    the corpus against the broadcast stats.

      z = (x − DOUBLE(sx)/n) / sqrt((DOUBLE(sxx) − DOUBLE(sx)·DOUBLE(sx)/n)/n)

    Group stats dict is O(groups) — broadcast via ``ray.put``, never
    re-shipped per batch.
    """

    def _xy(tbl):
        x = batch_to_x(tbl)
        return x, np.zeros(len(x), np.int64)

    moments = grouped_moment_partials(ds, key_cols, _xy)
    stats = {
        k: (m[0], float(m[1]), float(m[3])) for k, m in moments.items()
    }
    stats_ref = ray.put(stats)

    def _z(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        st = ray.get(stats_ref)
        x = batch_to_x(tbl).astype(np.float64)
        # vectorized: factorize group keys once, per-GROUP stats (not
        # per-row), broadcast through the codes
        if len(key_cols) == 1:
            codes, uniq = pd.factorize(
                tbl.column(key_cols[0]).to_pandas(), sort=False
            )
            uk = [(u,) for u in uniq]
        else:
            codes, uniq = pd.factorize(
                pd.MultiIndex.from_frame(tbl.select(key_cols).to_pandas()),
                sort=False,
            )
            uk = list(uniq)
        g_mean = np.array([st[k][1] / st[k][0] for k in uk])
        g_std = np.array(
            [
                np.sqrt((st[k][2] - st[k][1] * st[k][1] / st[k][0]) / st[k][0])
                for k in uk
            ]
        )
        mean = g_mean[codes]
        std = g_std[codes]
        cols = {c: tbl.column(c) for c in id_cols}
        for c in key_cols:
            cols[c] = tbl.column(c)
        cols["x"] = pa.array(x)
        cols["z"] = pa.array((x - mean) / std)
        return pa.table(cols)

    return ds.map_batches(_z, batch_format="pyarrow", batch_size=None)


def fixed_width_histogram(ds, batch_to_bin):
    """Global fixed-width histogram: per-batch bin counts (mergeable
    int partials) → one tiny grouped sum. ``batch_to_bin(tbl) ->
    int64 bin ids``. Returns a Dataset (bin, n)."""
    from .groupagg import hash_grouped_aggregate

    def _partial(tbl: pa.Table) -> pa.Table:
        b = batch_to_bin(tbl).astype(np.int64)
        t = pa.table(
            {
                "bin": pa.array(b),
                "n": pa.array(np.ones(len(b), np.int64)),
            }
        )
        return group_aggregate_table(t, ["bin"], [("n", "sum")])

    return hash_grouped_aggregate(
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["bin"],
        [("n", "sum")],
        num_buckets=4,
    )


def rollup_counts(
    ds,
    key_cols: list[str],
    batch_to_x,
    all_token: str = "ALL",
) -> pa.Table:
    """GROUP BY ROLLUP over additive aggregates (count + sum): the
    finest level is computed distributed (mergeable partials, driver
    combine of O(groups × blocks) rows); every coarser level is derived
    from the finest DRIVER-SIDE — additive rollup never rescans or
    reshuffles the corpus. Aggregated-out key cells carry
    ``all_token`` (both sides COALESCE the same way)."""

    def _partial(tbl: pa.Table) -> pa.Table:
        x = batch_to_x(tbl).astype(np.int64)
        cols = {c: tbl.column(c) for c in key_cols}
        cols["n"] = pa.array(np.ones(len(x), np.int64))
        cols["sx"] = pa.array(x)
        return group_aggregate_table(
            pa.table(cols), key_cols, [("n", "sum"), ("sx", "sum")]
        )

    finest_parts = [
        t
        for t in (
            ray.get(r)
            for r in ds.map_batches(
                _partial, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows  # 0-row blocks arrive 0-COLUMN (UDF skipped)
    ]
    if not finest_parts:
        raise ValueError("rollup_counts: input dataset is empty")
    finest = pa.concat_tables(finest_parts)
    finest = group_aggregate_table(
        finest, key_cols, [("n", "sum"), ("sx", "sum")]
    )
    levels = [finest]
    for depth in range(len(key_cols) - 1, -1, -1):
        kept = key_cols[:depth]
        if kept:
            lvl = group_aggregate_table(
                finest.select(kept + ["n", "sx"]),
                kept,
                [("n", "sum"), ("sx", "sum")],
            )
        else:
            lvl = pa.table(
                {
                    "n": pa.array(
                        [int(pc.sum(finest.column("n")).as_py() or 0)],
                        pa.int64(),
                    ),
                    "sx": pa.array(
                        [int(pc.sum(finest.column("sx")).as_py() or 0)],
                        pa.int64(),
                    ),
                }
            )
        for c in key_cols[depth:]:
            lvl = lvl.append_column(
                c, pa.array([all_token] * lvl.num_rows, pa.string())
            )
        levels.append(lvl.select(key_cols + ["n", "sx"]))
    return pa.concat_tables([t.select(key_cols + ["n", "sx"]) for t in levels])
