"""Property-based tests (hypothesis): segment kernels vs brute force on
randomized segment structures, timestamps with ties, and sparse
validity — the randomized complement to the fixed-seed golden tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from dane_visual_feature_extraction_worker_ray.functions import segkernels as sk


@st.composite
def segmented_series(draw):
    n_segs = draw(st.integers(1, 6))
    sizes = [draw(st.integers(1, 12)) for _ in range(n_segs)]
    seg = np.repeat(np.arange(n_segs), sizes)
    n = len(seg)
    # non-decreasing ts within segment, ties allowed
    gaps = draw(
        st.lists(st.integers(0, 50), min_size=n, max_size=n)
    )
    first = sk.segment_first_index(seg)
    g = np.array(gaps, dtype=np.int64)
    g[first] = 0
    cs = np.cumsum(g)
    base = np.repeat(
        np.array([draw(st.integers(0, 1000)) for _ in range(n_segs)]),
        sizes,
    )
    ts = base + cs - cs[first]
    return seg, np.asarray(ts, dtype=np.int64)


@settings(max_examples=40, deadline=None)
@given(segmented_series(), st.integers(1, 60))
def test_sessionize_property(data, gap):
    seg, ts = data
    sid, tis = sk.sessionize(ts, seg, gap)
    first = sk.segment_first_index(seg)
    for i in range(len(seg)):
        if first[i] == i:
            assert sid[i] == 0 and tis[i] == 0
        else:
            if ts[i] - ts[i - 1] > gap:
                assert sid[i] == sid[i - 1] + 1 and tis[i] == 0
            else:
                assert sid[i] == sid[i - 1] and tis[i] == tis[i - 1] + 1


@settings(max_examples=40, deadline=None)
@given(segmented_series(), st.integers(1, 8))
def test_row_window_property(data, w):
    seg, ts = data
    rng = np.random.default_rng(0)
    x = rng.integers(0, 5, len(seg))
    first = sk.segment_first_index(seg)
    start = sk.row_window_bounds(seg, w)
    wsum, wcnt = sk.windowed_sum_count(x, None, start)
    for i in range(len(seg)):
        s0 = max(first[i], i - w + 1)
        assert wsum[i] == x[s0 : i + 1].sum()
        assert wcnt[i] == i + 1 - s0


@settings(max_examples=40, deadline=None)
@given(segmented_series(), st.integers(1, 100))
def test_time_window_counts_property(data, tw):
    seg, ts = data
    cnt = sk.time_window_counts(ts, seg, tw)
    for i in range(len(seg)):
        expect = sum(
            1
            for j in range(len(seg))
            if seg[j] == seg[i] and ts[i] - tw <= ts[j] <= ts[i]
        )
        assert cnt[i] == expect, (i, cnt[i], expect)


@settings(max_examples=40, deadline=None)
@given(segmented_series())
def test_ffill_property(data):
    seg, ts = data
    rng = np.random.default_rng(1)
    valid = rng.random(len(seg)) < 0.4
    first = sk.segment_first_index(seg)
    idx, ok = sk.ffill_indices(valid, seg)
    for i in range(len(seg)):
        cands = [j for j in range(first[i], i + 1) if valid[j]]
        if cands:
            assert ok[i] and idx[i] == cands[-1]
        else:
            assert not ok[i]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 200)),
        min_size=0,
        max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 200)),
        min_size=0,
        max_size=25,
    ),
    st.booleans(),
)
def test_asof_property(left, right, allow_exact):
    lk = np.array([k for k, _ in sorted(left)], dtype=np.int64)
    lt = np.array([t for _, t in sorted(left)], dtype=np.int64)
    rk = np.array([k for k, _ in sorted(right)], dtype=np.int64)
    rt = np.array([t for _, t in sorted(right)], dtype=np.int64)
    idx, ok = sk.asof_indices(lk, lt, rk, rt, allow_exact=allow_exact)
    for i in range(len(lk)):
        if allow_exact:
            c = [j for j in range(len(rk)) if rk[j] == lk[i] and rt[j] <= lt[i]]
        else:
            c = [j for j in range(len(rk)) if rk[j] == lk[i] and rt[j] < lt[i]]
        if c:
            assert ok[i] and idx[i] == c[-1]
        else:
            assert not ok[i]


# ---------------------------------------------------------------------------
# salted stitching property: Ray-free drive of the phase-A summary →
# carry combine → phase-B kernels against the unsalted bucket kernel,
# over adversarial timestamp patterns (zero-gap runs spanning chunk
# boundaries, session-breaking gaps, sparse tools, snapshots)


@st.composite
def _conversation(draw):
    n = draw(st.integers(min_value=1, max_value=90))
    # gap alphabet: 0 (equal-ts runs), small, around the session gap
    gaps = draw(
        st.lists(
            st.sampled_from([0, 0, 1, 1_000_000, 5 * 3600 * 1_000_000]),
            min_size=n - 1,
            max_size=n - 1,
        )
    )
    tool = draw(
        st.lists(
            st.sampled_from([None, None, None, "search", "code"]),
            min_size=n,
            max_size=n,
        )
    )
    n_snaps = draw(st.integers(min_value=0, max_value=5))
    snap_offsets = draw(
        st.lists(
            st.integers(min_value=-10, max_value=200),
            min_size=n_snaps,
            max_size=n_snaps,
        )
    )
    return n, gaps, tool, snap_offsets


@settings(max_examples=60, deadline=None)
@given(conv=_conversation(), salt_chunk=st.sampled_from([5, 7, 13]))
def test_salted_stitching_property(conv, salt_chunk):
    import pyarrow as pa

    from dane_visual_feature_extraction_worker_ray.config import (
        FeatureConfig,
    )
    from dane_visual_feature_extraction_worker_ray.stages.salting import (
        _phase_a,
        _phase_b,
        combine_carries,
    )
    from dane_visual_feature_extraction_worker_ray.stages.transcript_features import (
        _align_snaps,
        _align_turns,
        compute_bucket_features,
    )

    n, gaps, tool, snap_offsets = conv
    cfg = FeatureConfig()
    base = 1_700_000_000_000_000
    ts = base + np.cumsum(np.r_[0, np.asarray(gaps, np.int64)])
    turns = pa.table(
        {
            "conv_id": pa.array(["c"] * n, pa.string()),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
            "role": pa.array(
                np.array(["user", "assistant"], object)[np.arange(n) % 2]
            ),
            "text": pa.array([f"t{i}" for i in range(n)], pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    snaps = pa.table(
        {
            "conv_id": pa.array(["c"] * len(snap_offsets), pa.string()),
            "ts": pa.array(
                np.array(
                    [base + o * 1_000_000 for o in snap_offsets], np.int64
                ),
                pa.timestamp("us"),
            ),
            "snap_val": pa.array(
                [float(i) for i in range(len(snap_offsets))], pa.float64()
            ),
            "snap_tag": pa.array(
                ["s"] * len(snap_offsets), pa.string()
            ),
        }
    )

    aligned = pa.concat_tables(
        [_align_turns(turns, False), _align_snaps(snaps)]
    )
    plain = (
        compute_bucket_features(aligned, cfg)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )

    # salted path, driven directly: chunk on turn_idx // salt_chunk,
    # snapshots replicated to every chunk
    tix = aligned.column("turn_idx").to_numpy(zero_copy_only=False)
    is_snap = aligned.column("is_snap").to_numpy(zero_copy_only=False)
    n_chunks = (n + salt_chunk - 1) // salt_chunk
    chunks = []
    for c in range(n_chunks):
        t_mask = (~is_snap) & (tix >= c * salt_chunk) & (
            tix < (c + 1) * salt_chunk
        )
        grp = pa.concat_tables(
            [
                aligned.filter(pa.array(t_mask)),
                aligned.filter(pa.array(is_snap)),
            ]
        ).append_column(
            "salt",
            pa.array(
                np.full(
                    int(t_mask.sum()) + int(is_snap.sum()), c, np.int64
                )
            ),
        )
        chunks.append(grp)

    summaries = pa.concat_tables(
        [_phase_a(g, cfg) for g in chunks]
    ).to_pandas()
    carries = combine_carries(summaries, cfg)
    out = pa.concat_tables([_phase_b(g, cfg, carries) for g in chunks])
    salted = (
        out.to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(salted, plain)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.one_of(st.integers(0, 8), st.none()), min_size=0, max_size=30
    ),
    st.lists(st.integers(0, 8), min_size=0, max_size=20),
    st.sampled_from(["inner", "left", "semi", "anti"]),
)
def test_hash_join_property(lkeys, rkeys, how):
    """Randomized join vs the pandas merge oracle: duplicate keys both
    sides, null left keys, every join mode, multi-partition exchange."""
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.join import (
        hash_equi_join,
    )

    ldf = pd.DataFrame(
        {"k": pd.array(lkeys, dtype="Int64"),
         "lv": np.arange(len(lkeys), dtype=np.int64)}
    )
    rdf = pd.DataFrame(
        {"rk": np.array(rkeys, dtype=np.int64),
         "rv": np.arange(len(rkeys), dtype=np.int64) * 7}
    )
    lds = rd.from_arrow(pa.Table.from_pandas(ldf, preserve_index=False))
    rds = rd.from_arrow(pa.Table.from_pandas(rdf, preserve_index=False))
    kwargs = (
        {} if how in ("semi", "anti") else {"right_columns": ["rv"]}
    )
    got = hash_equi_join(
        lds, rds, left_on="k", right_on="rk", how=how,
        num_partitions=4, **kwargs,
    ).to_pandas()

    rren = rdf.rename(columns={"rk": "k"})
    if how in ("inner", "left"):
        exp = ldf.merge(rren, on="k", how=how)[["k", "lv", "rv"]]
        cols = ["k", "lv", "rv"]
    elif how == "semi":
        exp = ldf[ldf["k"].isin(rren["k"].unique())][["k", "lv"]]
        cols = ["k", "lv"]
    else:  # anti: unmatched incl. null keys
        exp = ldf[~ldf["k"].isin(rren["k"].unique()) | ldf["k"].isna()][
            ["k", "lv"]
        ]
        cols = ["k", "lv"]
    if len(got) == 0 and len(exp) == 0:
        return  # empty Ray datasets drop schema under to_pandas
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp.sort_values(cols).reset_index(drop=True)
    # normalize nullable dtypes for comparison
    for c in cols:
        got[c] = pd.array(got[c], dtype="Float64")
        exp[c] = pd.array(exp[c], dtype="Float64")
    pd.testing.assert_frame_equal(got, exp)


@settings(max_examples=40, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 120), st.integers(1, 40)),
        min_size=0, max_size=25,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 120), st.integers(1, 40)),
        min_size=0, max_size=25,
    ),
    w=st.sampled_from([3, 17, 500]),
)
def test_interval_overlap_join_property(ray_session, left, right, w):
    """Every (left, right) pair with a non-empty intersection appears
    exactly once with exact bounds, for arbitrary intervals and any
    bucket width."""
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.interval_join import (
        interval_overlap_join,
    )

    def _ds(rows, idn):
        return rd.from_arrow(
            pa.table(
                {
                    idn: pa.array(range(len(rows)), pa.int64()),
                    "st": pa.array([s for s, _ in rows], pa.int64()),
                    "en": pa.array([s + d for s, d in rows], pa.int64()),
                }
            )
        )

    out = interval_overlap_join(
        _ds(left, "lid"), _ds(right, "rid"),
        "st", "en", "st", "en", ["lid"], ["rid"],
        bucket_width=w, num_partitions=3,
    ).to_pandas()
    # all-empty Datasets drop the schema in to_pandas (CLAUDE.md gotcha)
    got = (
        {}
        if len(out) == 0
        else {
            (l, r): (s, e)
            for l, r, s, e in zip(
                out.lid, out.rid, out.ov_start, out.ov_end
            )
        }
    )
    brute = {}
    for li, (ls, ld) in enumerate(left):
        for ri, (rs, rd_) in enumerate(right):
            s, e = max(ls, rs), min(ls + ld, rs + rd_)
            if s < e:
                brute[(li, ri)] = (s, e)
    assert got == brute


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0,
                 max_size=20),
        min_size=1, max_size=12,
    ),
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3),
)
def test_phrase_match_property(docs, phrase):
    """Anchor-intersection phrase matching == brute-force sliding
    window, on random small-alphabet corpora (overlaps, repeats,
    empty docs, single-term phrases)."""
    import pyarrow as pa

    from dane_visual_feature_extraction_worker_ray.stages.text import (
        phrase_match_table,
    )

    texts = [" ".join(d) for d in docs]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = phrase_match_table(tbl, tuple(phrase)).to_pandas()
    got = {
        int(r.doc_id): (int(r.n_matches), int(r.first_pos))
        for r in out.itertuples()
    }
    k = len(phrase)
    for did, d in enumerate(docs):
        hits = [
            i + 1
            for i in range(len(d) - k + 1)
            if d[i : i + k] == phrase
        ]
        if hits:
            assert got[did] == (len(hits), hits[0])
        else:
            assert did not in got


# --- merge_upsert / table_diff vs pandas oracles (randomized) -------------


@st.composite
def _upsert_case(draw):
    keys = draw(st.lists(st.integers(0, 12), min_size=1, max_size=10,
                         unique=True))
    base = {k: f"b{k}" for k in keys}
    # (key, seq) unique, like a real CDC log: duplicate (key, seq)
    # records with different payloads are ambiguous by contract
    pairs = draw(
        st.lists(
            st.tuples(st.integers(0, 14), st.integers(0, 5)),
            min_size=0, max_size=15, unique=True,
        )
    )
    changes = []
    for i, (k, seq) in enumerate(pairs):
        op = draw(st.sampled_from(["I", "U", "D"]))
        changes.append((k, seq, op, None if op == "D" else f"c{i}"))
    return base, changes


@settings(max_examples=10, deadline=None)
@given(_upsert_case())
def test_merge_upsert_property(case):
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.upsert import (
        merge_upsert,
    )

    base, changes = case
    base_ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(list(base), pa.int64()),
                "v": pa.array(list(base.values())),
            }
        )
    ).repartition(2)
    ch_ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([c[0] for c in changes], pa.int64()),
                "seq": pa.array([c[1] for c in changes], pa.int64()),
                "op": pa.array([c[2] for c in changes]),
                "v": pa.array([c[3] for c in changes], pa.string()),
            }
        )
    )
    got = (
        merge_upsert(base_ds, ch_ds, "k", ["v"], num_partitions=4)
        .to_pandas().set_index("k")["v"].sort_index()
    )

    # oracle: per key, winner = max seq, delete beats at equal seq
    # (op 'D' < 'I' < 'U' sorted descending -> 'D' wins), base = -1
    exp = {}
    for k in set(base) | {c[0] for c in changes}:
        rows = [(-1, "zB", base.get(k)) for _ in range(1)
                if k in base]
        for ck, seq, op, v in changes:
            if ck == k:
                rows.append((seq, op, v))
        # winner: highest seq; ties -> 'D' wins, else op-descending
        # loses to... engine sorts (seq asc, op desc) and takes LAST:
        # i.e. max by (seq, reversed-op-order) where 'D' is last
        def _rank(r):
            seq, op, _ = r
            order = {"zB": 0, "U": 1, "I": 2, "D": 3}
            return (seq, order[op])

        w = max(rows, key=_rank)
        if w[1] != "D":
            exp[k] = w[2]
    assert got.to_dict() == exp


@st.composite
def _diff_case(draw):
    ks = list(range(10))
    old = {k: draw(st.sampled_from(["a", "b", None, "c"]))
           for k in ks if draw(st.booleans())}
    new = {k: draw(st.sampled_from(["a", "b", None, "c"]))
           for k in ks if draw(st.booleans())}
    return old, new


@settings(max_examples=10, deadline=None)
@given(_diff_case())
def test_table_diff_property(case):
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.upsert import (
        table_diff,
    )

    old, new = case

    def mk(d):
        return rd.from_arrow(
            pa.table(
                {
                    "k": pa.array(list(d), pa.int64()),
                    "v": pa.array(list(d.values()), pa.string()),
                }
            )
        ).repartition(2)

    got_df = table_diff(
        mk(old), mk(new), "k", ["v"], num_partitions=4
    ).to_pandas()
    exp = {}
    for k in set(old) | set(new):
        if k not in old:
            exp[k] = "added"
        elif k not in new:
            exp[k] = "removed"
        elif old[k] != new[k]:
            exp[k] = "changed"
    if not exp:
        # all-empty Dataset.to_pandas() drops the schema (documented
        # Ray gotcha) — emptiness is the assertion
        assert len(got_df) == 0
        return
    got = got_df.set_index("k")["change_type"].sort_index().to_dict()
    assert got == exp


@st.composite
def _para_corpus(draw):
    vocab = ["a", "b", "c", "d"]
    n_docs = draw(st.integers(1, 8))
    docs = []
    for _ in range(n_docs):
        n_tok = draw(st.integers(0, 17))
        docs.append(
            " ".join(
                draw(st.sampled_from(vocab)) for _ in range(n_tok)
            )
        )
    w = draw(st.sampled_from([2, 3]))
    return docs, w


@settings(max_examples=10, deadline=None)
@given(_para_corpus())
def test_paragraph_dedup_property(case):
    """Randomized keep-first chunk dedup vs a sequential python
    oracle — tiny vocab forces heavy natural chunk collisions,
    including intra-doc and cross-doc, plus empty docs and ragged
    tails."""
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        paragraph_dedup,
    )

    docs, w = case
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs),
            }
        )
    ).repartition(2)
    out = (
        paragraph_dedup(ds, chunk_w=w, num_partitions=4)
        .to_pandas().set_index("doc_id").sort_index()
    )
    seen = set()
    for d, text in enumerate(docs):
        toks = text.split()
        cs = [
            " ".join(toks[i:i + w]) for i in range(0, len(toks), w)
        ]
        kept, nrem = [], 0
        for c in cs:
            if c in seen:
                nrem += 1
            else:
                seen.add(c)
                kept.append(c)
        assert out.loc[d, "clean_text"] == " ".join(kept), (d, docs)
        assert out.loc[d, "n_kept_chunks"] == len(cs) - nrem
        assert out.loc[d, "n_removed_chunks"] == nrem


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.sampled_from(list("ab _\t\n")), max_size=12
            ),
        ),
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_space_fields_matches_python_split_on_space(texts):
    """space_fields == fill_null("").split(" ") including empty fields
    (the quality gates' exact split semantics, VERDICT r4 item 4)."""
    import pyarrow as pa

    from dane_visual_feature_extraction_worker_ray.functions.tokenize import (
        space_fields,
        space_stopword_stats,
    )

    row_idx, flat, counts = space_fields(pa.array(texts, pa.string()))
    exp = [("" if t is None else t).split(" ") for t in texts]
    assert counts.tolist() == [len(f) for f in exp]
    assert flat.to_pylist() == [w for f in exp for w in f]
    assert row_idx.tolist() == [i for i, f in enumerate(exp) for _ in f]
    stop = pa.array(["a", "ab"], pa.string())
    n_words, n_stop = space_stopword_stats(
        pa.array(texts, pa.string()), stop
    )
    assert n_words.tolist() == [len(f) for f in exp]
    assert n_stop.tolist() == [
        sum(w in ("a", "ab") for w in f) for f in exp
    ]
