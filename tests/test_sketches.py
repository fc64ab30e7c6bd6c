"""Quantile sketch + HyperLogLog: exact regime, merge associativity,
rank-error bound in the compacting regime, HLL tolerance envelope."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.sketches import (
    QuantileSketch,
    hll_distinct,
    quantile_sketch_ds,
)

QS = [0.0, 0.25, 0.5, 0.75, 1.0]


def _disc(sorted_v: np.ndarray, q: float) -> float:
    return sorted_v[max(1, int(np.ceil(q * len(sorted_v)))) - 1]


def test_exact_regime_matches_order_statistics():
    rng = np.random.default_rng(2)
    v = rng.standard_normal(5000)
    got = QuantileSketch(1 << 13).add(v).quantiles(QS)
    s = np.sort(v)
    np.testing.assert_array_equal(got, [_disc(s, q) for q in QS])


def test_weight_conserved_under_compaction():
    rng = np.random.default_rng(3)
    sk = QuantileSketch(64)
    n = 0
    for _ in range(20):
        chunk = rng.standard_normal(137)
        sk.add(chunk)
        n += len(chunk)
    assert sk.total_weight == n


def test_merge_equals_single_sketch_rank_error():
    rng = np.random.default_rng(4)
    v = rng.standard_normal(50000)
    merged = QuantileSketch(512)
    for chunk in np.array_split(v, 83):
        merged.merge(QuantileSketch(512).add(chunk))
    s = np.sort(v)
    got = merged.quantiles(QS)
    ranks = np.searchsorted(s, got)
    targets = np.array([max(1, int(np.ceil(q * len(v)))) for q in QS])
    assert (np.abs(ranks - targets) / len(v)).max() < 0.02


def test_quantile_sketch_ds_split_invariant_when_exact():
    rng = np.random.default_rng(5)
    t = pa.table({"value": pa.array(rng.standard_normal(3000))})
    a = quantile_sketch_ds(
        rd.from_arrow(t).repartition(3), "value", QS, capacity=1 << 12
    )
    b = quantile_sketch_ds(
        rd.from_arrow(t).repartition(8), "value", QS, capacity=1 << 12
    )
    assert a.equals(b)


def test_hll_within_tolerance_and_split_invariant():
    rng = np.random.default_rng(6)
    true_n = 7321
    vals = rng.permutation(np.arange(60000) % true_n)
    t = pa.table({"x": pa.array(vals, pa.int64())})
    e3 = hll_distinct(rd.from_arrow(t).repartition(3), ["x"], p=12)
    e9 = hll_distinct(rd.from_arrow(t).repartition(9), ["x"], p=12)
    assert e3 == e9  # register-max merge is split-invariant
    assert abs(e3 - true_n) / true_n < 0.05


def test_hll_grouped_within_tolerance_of_exact(ray_session):
    """Grouped HLL vocabulary estimates vs the exact grouped distinct
    (p=12 → ~1.6% standard error; assert 5%)."""
    import duckdb

    from dane_visual_feature_extraction_worker_ray.pipelines.text_queries import (
        q_hll_tokens_per_source,
    )

    sf = "/root/testdata/sf0.001"
    est = (
        q_hll_tokens_per_source(sf)
        .to_pandas()
        .set_index("source")["est"]
    )
    con = duckdb.connect()
    exact = (
        con.execute(
            rf"""
            SELECT source, count(DISTINCT tok) AS n FROM (
              SELECT source,
                unnest(list_filter(string_split_regex(text, '\s+'),
                       x -> x <> '')) AS tok
              FROM read_parquet('{sf}/documents.parquet'))
            GROUP BY source
            """
        )
        .df()
        .set_index("source")["n"]
    )
    assert set(est.index) == set(exact.index)
    for src in exact.index:
        rel = abs(est[src] - exact[src]) / exact[src]
        assert rel < 0.05, (src, est[src], exact[src])


def test_hll_grouped_many_groups_no_dense_blowup(ray_session):
    """Sort-reduceat partial path: high-cardinality group column (one
    group per ~2 rows) must still produce sane per-group estimates."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.functions.hashing import (
        hash64_columns,
    )
    from dane_visual_feature_extraction_worker_ray.stages.sketches import (
        hll_distinct_grouped,
    )

    rng = np.random.default_rng(3)
    n = 2000
    g = rng.integers(0, 1000, n).astype(np.int64)
    v = rng.integers(0, 50, n).astype(np.int64)
    tbl = pa.table({"g": pa.array(g), "v": pa.array(v)})

    def _kv(t):
        keys = t.column("g").to_numpy()
        h = hash64_columns(t.select(["v"]), ["v"])
        return keys, h

    out = (
        hll_distinct_grouped(
            rd.from_arrow(tbl).repartition(4), "g", _kv, p=10,
            key_type=pa.int64(),
        )
        .to_pandas()
        .set_index("g")["est"]
    )
    import pandas as pd

    exact = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].nunique()
    assert set(out.index) == set(exact.index)
    # tiny groups: linear counting is near-exact up to hash
    # quantization — allow ±2 absolute or 10% relative
    err = (out.reindex(exact.index) - exact).abs()
    ok = (err <= 2) | (err / exact < 0.1)
    assert ok.all(), err[~ok]


def test_misra_gries_guarantees(ray_session):
    """Approximate regime: capacity < distinct. Estimates never exceed
    true counts, undercount within the documented 3N/(cap+1) bound,
    and every token more frequent than the bound survives the merge."""
    from dane_visual_feature_extraction_worker_ray.stages.sketches import (
        mg_topk_tokens,
    )

    rng = np.random.default_rng(7)
    # zipf-ish: few heavy tokens + a long distinct tail >> capacity
    heavy = np.repeat([f"h{i}" for i in range(20)],
                      [4000 - 150 * i for i in range(20)])
    tail = np.array([f"t{i}" for i in range(3000)])
    toks = np.r_[heavy, np.tile(tail, 3)]
    rng.shuffle(toks)
    docs = pa.table({"text": [" ".join(c) for c in
                              np.array_split(toks, 97)]})
    cap = 64

    def _toks(tbl):
        out = []
        for s in tbl.column("text").to_pylist():
            out.extend(s.split())
        return np.asarray(out, dtype=object)

    got = mg_topk_tokens(
        rd.from_arrow(docs).repartition(8), _toks,
        k=2000, capacity=cap, num_partitions=4,
    )
    est = dict(zip(got.column("tok").to_pylist(),
                   got.column("est").to_pylist()))
    true = {t: c for t, c in zip(*np.unique(toks, return_counts=True))}
    n = len(toks)
    bound = 3 * n // (cap + 1)
    assert got.column("err_bound")[0].as_py() == bound
    for t, e in est.items():
        assert e <= true[t], (t, e, true[t])
        assert true[t] - e <= bound, (t, e, true[t], bound)
    # guaranteed containment: anything above the bound must be present
    for t, c in true.items():
        if c > bound:
            assert t in est, (t, c, bound)


def test_misra_gries_exact_when_capacity_covers_vocab(ray_session):
    from dane_visual_feature_extraction_worker_ray.stages.sketches import (
        mg_topk_tokens,
    )

    toks = np.array(["a"] * 9 + ["b"] * 5 + ["c"] * 2, dtype=object)
    docs = pa.table({"text": [" ".join(toks[:8]), " ".join(toks[8:])]})

    def _toks(tbl):
        out = []
        for s in tbl.column("text").to_pylist():
            out.extend(s.split())
        return np.asarray(out, dtype=object)

    got = mg_topk_tokens(rd.from_arrow(docs), _toks, k=3, capacity=16)
    assert got.column("tok").to_pylist() == ["a", "b", "c"]
    assert got.column("est").to_pylist() == [9, 5, 2]


def test_quantile_sketch_empty_returns_nan():
    sk = QuantileSketch(16)
    got = sk.quantiles([0.0, 0.5, 1.0])
    assert np.isnan(got).all()
    sk.add(np.array([np.nan, np.nan]))  # all-null input strips to empty
    assert np.isnan(sk.quantiles([0.5])).all()


def test_cms_overestimates_never_under_and_merges(ray_session):
    """CMS point estimates are >= truth always (narrow adversarial
    width forces collisions), exact at generous width, and partial
    merge-by-add equals the single-pass sketch."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.sketches import (
        cms_estimate,
        cms_partial,
        cms_token_counts_ds,
    )

    rng = np.random.default_rng(13)
    vocab = np.array([f"tok{i}" for i in range(200)], dtype=object)
    toks = vocab[rng.integers(0, len(vocab), size=5000)]
    truth = pd.Series(toks).value_counts()
    terms = [f"tok{i}" for i in range(0, 200, 17)]

    # adversarial narrow width: estimates may inflate, never deflate
    narrow = cms_partial(truth.index.to_numpy(dtype=object),
                         truth.to_numpy().astype(np.int64), width=32)
    est = cms_estimate(narrow, terms)
    for t, e in zip(terms, est):
        assert e >= truth[t]
    assert (est > np.array([truth[t] for t in terms])).any()

    # merge-by-add == single pass
    half = 2500
    a = cms_partial(*_vc(toks[:half]), width=32)
    b = cms_partial(*_vc(toks[half:]), width=32)
    assert (a + b == narrow).all()

    # generous width over a Dataset: exact
    texts = [" ".join(toks[i::50]) for i in range(50)]
    ds = rd.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(4)
    out = cms_token_counts_ds(ds, terms, width=1 << 16).to_pandas()
    for _, r in out.iterrows():
        assert r["est"] == truth[r["term"]]


def _vc(toks):
    import pandas as pd

    vc = pd.Series(toks).value_counts(sort=False)
    return vc.index.to_numpy(dtype=object), vc.to_numpy().astype(np.int64)


def test_hll_exact_bit_length_and_raw_estimate():
    """Exact-rank HLL internals: the bit-length ladder vs Python
    int.bit_length on edge values, and the raw estimator's integer
    register sum (regression: an int64 np.sum wraps at 2^63 when all
    registers are 0 — the sum is 4096 * 2^53 = 2^65)."""
    import numpy as np

    from dane_visual_feature_extraction_worker_ray.stages.sketches import (
        _bit_length_u64,
        hll_estimate_raw_exact,
        hll_registers_partial_exact,
    )

    vals = np.array(
        [0, 1, 2, 3, 2047, 2048, 2049, 2**32 - 1, 2**32, 2**63,
         2**64 - 1],
        dtype=np.uint64,
    )
    assert _bit_length_u64(vals).tolist() == [
        int(v).bit_length() for v in vals.tolist()
    ]

    # all-zero registers: s_int = m * 2^53 exactly, est = alpha * m
    m = 4096
    est = hll_estimate_raw_exact(np.zeros(m, np.uint8))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    assert est == alpha * m * m * 9007199254740992.0 / float(m << 53)
    assert est > 0  # the int64-overflow bug made this negative

    # rank caps at 53 for p=12 (sentinel bit at position 11)
    h = np.array([0], dtype=np.uint64)  # h<<12 == 0 -> rest == 2048
    regs = hll_registers_partial_exact(h, 12)
    assert int(regs[0]) == 53
