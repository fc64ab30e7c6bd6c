"""Feature-engineering operators: leakage properties + brute-force
parity the SQL oracle doesn't state explicitly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _orders_seg() -> pd.DataFrame:
    o = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).to_pandas()
    c = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["cents"] = np.round(df["o_totalprice"].to_numpy() * 100.0).astype(
        np.int64
    )
    return df


def test_loo_encoding_excludes_own_row(ray_session):
    from dane_visual_feature_extraction_worker_ray.pipelines.feature_queries import (
        q_loo_target_encoding,
    )

    got = q_loo_target_encoding(SF).to_pandas().set_index("o_orderkey")
    df = _orders_seg()
    seg = df.groupby("c_mktsegment")["cents"].agg(["sum", "count"])
    for r in df.sample(25, random_state=7).itertuples():
        s, n = seg.loc[r.c_mktsegment]
        expect = float(s - r.cents) / float(n - 1)
        assert got.loc[r.o_orderkey, "loo_avg_cents"] == expect
    # the leakage property itself: LOO of a duplicate-free max row is
    # strictly below the plain segment mean (its own high label is out)
    top = df.loc[df.groupby("c_mktsegment")["cents"].idxmax()]
    for r in top.itertuples():
        s, n = seg.loc[r.c_mktsegment]
        assert got.loc[r.o_orderkey, "loo_avg_cents"] < s / n


def test_kfold_encoding_excludes_own_fold(ray_session):
    from dane_visual_feature_extraction_worker_ray.functions.hashing import (
        rehash64,
    )
    from dane_visual_feature_extraction_worker_ray.pipelines.feature_queries import (
        _TE_FOLDS,
        q_target_encoding_kfold,
    )

    got = (
        q_target_encoding_kfold(SF).to_pandas().set_index("o_orderkey")
    )
    df = _orders_seg()
    df["fold"] = (
        rehash64(df["o_custkey"].to_numpy().astype(np.uint64), 0)
        % np.uint64(_TE_FOLDS)
    ).astype(np.int64)
    cell = df.groupby(["c_mktsegment", "fold"])["cents"].agg(
        ["sum", "count"]
    )
    seg = df.groupby("c_mktsegment")["cents"].agg(["sum", "count"])
    for r in df.sample(25, random_state=11).itertuples():
        s_all, n_all = seg.loc[r.c_mktsegment]
        s_f, n_f = cell.loc[(r.c_mktsegment, r.fold)]
        expect = float(s_all - s_f) / float(n_all - n_f)
        assert got.loc[r.o_orderkey, "te_cents"] == expect
        assert got.loc[r.o_orderkey, "fold"] == r.fold
    # fold-consistency: every order of one customer gets one fold
    folds_per_cust = (
        got.join(df.set_index("o_orderkey")["o_custkey"])
        .groupby("o_custkey")["fold"]
        .nunique()
    )
    assert (folds_per_cust == 1).all()


def test_grouped_median_and_winsorize_brute(ray_session):
    from dane_visual_feature_extraction_worker_ray.pipelines.feature_queries import (
        q_grouped_median_price,
        q_grouped_winsorized_totals,
    )

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    ).to_pandas()
    li["cents"] = np.round(
        li["l_extendedprice"].to_numpy() * 100.0
    ).astype(np.int64)

    def qdisc(v: np.ndarray, q: float) -> int:
        v = np.sort(v)
        return int(v[int(np.ceil(q * len(v))) - 1])

    med = q_grouped_median_price(SF).to_pandas().set_index("l_returnflag")
    win = (
        q_grouped_winsorized_totals(SF)
        .to_pandas()
        .set_index("l_returnflag")
    )
    for flag, g in li.groupby("l_returnflag"):
        v = g["cents"].to_numpy()
        assert med.loc[flag, "median_cents"] == qdisc(v, 0.5)
        lo, hi = qdisc(v, 0.01), qdisc(v, 0.99)
        assert win.loc[flag, "lo_cents"] == lo
        assert win.loc[flag, "hi_cents"] == hi
        assert win.loc[flag, "winsorized_sum_cents"] == int(
            np.clip(v, lo, hi).sum()
        )


def test_oov_rate_brute(ray_session):
    from dane_visual_feature_extraction_worker_ray.pipelines.feature_queries import (
        _OOV_VOCAB_K,
        q_oov_rate,
    )

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    from collections import Counter

    cnt: Counter = Counter()
    for t in docs["text"].fillna(""):
        cnt.update(w for w in t.split(" ") if w)
    vocab = {
        w
        for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_OOV_VOCAB_K
        ]
    }
    got = q_oov_rate(SF).to_pandas().set_index("doc_id")
    n_checked = 0
    for r in docs.itertuples():
        toks = [w for w in (r.text or "").split(" ") if w]
        if not toks:
            assert r.doc_id not in got.index
            continue
        oov = sum(w not in vocab for w in toks)
        assert got.loc[r.doc_id, "n_oov"] == oov
        assert got.loc[r.doc_id, "n_tokens"] == len(toks)
        n_checked += 1
    assert n_checked > 100
