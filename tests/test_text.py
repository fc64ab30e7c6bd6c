"""Text-analysis operators: brute-force parity + determinism."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.text import (
    _STOPWORDS,
    doc_fingerprints,
    lang_id,
    text_quality,
    token_counts,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "der hund und die katze sind in dem haus mit der maus",
    "le chat et le chien sont dans la maison de la ville",
    "el perro y el gato en la casa de la ciudad con su amigo",
    "xqz zzk qqp",
    "",
]


def _tbl() -> pa.Table:
    return pa.table(
        {"doc_id": pa.array(range(len(DOCS)), pa.int64()), "text": DOCS}
    )


def test_text_quality_brute():
    got = (
        text_quality(rd.from_arrow(_tbl()))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, d in enumerate(DOCS):
        words = d.split(" ")
        assert got.loc[i, "n_chars"] == len(d)
        assert got.loc[i, "n_words"] == len(words)
        assert got.loc[i, "n_stopwords"] == sum(w in _STOPWORDS for w in words)
        assert np.isclose(
            got.loc[i, "avg_word_len"],
            len(d.replace(" ", "")) / len(words),
        )


def test_token_counts_brute():
    got = (
        token_counts(rd.from_arrow(_tbl()))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, d in enumerate(DOCS):
        assert got.loc[i, "n_ws_tokens"] == len(d.split())
        assert got.loc[i, "n_word_tokens"] == len(re.findall(r"\w+", d))


def test_lang_id():
    got = (
        lang_id(rd.from_arrow(_tbl()), concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.loc[0, "lang_pred"] == "en"
    assert got.loc[1, "lang_pred"] == "de"
    assert got.loc[2, "lang_pred"] == "fr"
    assert got.loc[3, "lang_pred"] == "es"
    assert got.loc[4, "lang_pred"] == "und"
    assert got.loc[5, "lang_pred"] == "und"
    # deterministic across runs
    again = (
        lang_id(rd.from_arrow(_tbl()), concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["lang_pred"] == again["lang_pred"]).all()


def test_doc_fingerprints_deterministic_and_containment():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "a b c d e f g h i j k l m n o p",
                "a b c d e f g h i j k l m n o p",  # identical → same fp set
                "z y x w v u t s r q p o n m l k",
            ],
        }
    )
    got = doc_fingerprints(rd.from_arrow(t)).to_pandas()
    f0 = set(got[got["doc_id"] == 0]["fingerprint"])
    f1 = set(got[got["doc_id"] == 1]["fingerprint"])
    f2 = set(got[got["doc_id"] == 2]["fingerprint"])
    assert f0 == f1 and len(f0) > 0
    assert f0 != f2


def test_winnowing_matches_naive_reference():
    """The global-sliding-window winnowing kernel must equal the
    straightforward per-doc reference implementation on random docs."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        _word_shingles,
    )

    k, window = 4, 5
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(1, 40)))
        for _ in range(150)
    ]

    def naive():
        row, sh = _word_shingles(pd.Series(texts), k)
        out = {}
        order = np.argsort(row, kind="stable")
        row, sh = row[order], sh[order]
        starts = np.flatnonzero(np.r_[True, row[1:] != row[:-1]])
        ends = np.r_[starts[1:], len(row)]
        for s0, e0 in zip(starts, ends):
            h = sh[s0:e0]
            if len(h) <= window:
                mins = {int(h.min())}
            else:
                v = np.lib.stride_tricks.sliding_window_view(h, window)
                mins = set(int(x) for x in v.min(axis=1))
            out[int(row[s0])] = mins
        return out

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got_df = doc_fingerprints(rd.from_arrow(tbl), k=k, window=window).to_pandas()
    got = {
        int(d): set(int(x) for x in g["fingerprint"])
        for d, g in got_df.groupby("doc_id")
    }
    assert got == naive()


def test_topk_per_lang_partial_bound_and_parity():
    """De-skewed top-k per lang: the per-batch partial emits <= k rows
    per language (so the lang-keyed exchange never carries a full
    stratum), and the merged result equals the brute-force rank."""
    import pandas as pd

    from dane_visual_feature_extraction_worker_ray.pipelines.text_queries import (
        _topk_per_lang_partial,
    )

    rng = np.random.default_rng(7)
    n = 2000
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array(rng.choice(["en", "de", "fr"], size=n)),
            "n_chars": pa.array(rng.integers(0, 50, size=n), pa.int64()),
        }
    )
    k = 3
    part = _topk_per_lang_partial(tbl, k)
    cnt = part.to_pandas().groupby("lang").size()
    assert (cnt <= k).all()
    # merging partials of two halves == top-k of the whole
    halves = pa.concat_tables(
        [
            _topk_per_lang_partial(tbl.slice(0, n // 2), k),
            _topk_per_lang_partial(tbl.slice(n // 2), k),
        ]
    )
    merged = _topk_per_lang_partial(halves, k).to_pandas()
    df = tbl.to_pandas()
    exp = (
        df.sort_values(["lang", "n_chars", "doc_id"],
                       ascending=[True, False, True])
        .groupby("lang").head(k)[["lang", "doc_id", "n_chars"]]
    )
    got = merged.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    exp = exp.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["lang", "doc_id", "n_chars"]], exp
    )


def test_stratified_sample_ranked_cross_bucket():
    """Two-pass global-rank stratified sample: with a tiny bucket_width
    (so every stratum spans many buckets) the every-Nth-by-global-rank
    output must equal the single-process oracle — proving the prefix
    offsets stitch ranks exactly across bucket boundaries while no
    co-located group ever holds more than bucket_width rows."""
    import pandas as pd

    from dane_visual_feature_extraction_worker_ray.pipelines.text_queries import (
        stratified_sample_ranked,
    )

    rng = np.random.default_rng(11)
    n = 1000
    # non-contiguous doc_ids so buckets have ragged occupancy
    ids = np.sort(rng.choice(np.arange(0, 10_000), size=n, replace=False))
    langs = rng.choice(["en", "de", "fr", "es"], size=n)
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "lang": pa.array(langs)}
    )
    every_n, w = 4, 8
    got = (
        stratified_sample_ranked(
            rd.from_arrow(tbl), every_n=every_n, bucket_width=w,
            num_partitions=5,
        )
        .to_pandas()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    df = tbl.to_pandas().sort_values("doc_id")
    df["rn"] = df.groupby("lang").cumcount()
    exp = (
        df[df["rn"] % every_n == 0][["lang", "doc_id"]]
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # structural bound: no (lang, bkt) group can exceed bucket_width
    per_group = df.assign(bkt=df["doc_id"] // w).groupby(["lang", "bkt"]).size()
    assert per_group.max() <= w


def test_quality_filter_metrics_and_edges():
    from dane_visual_feature_extraction_worker_ray.stages.text import (
        quality_filter,
    )

    texts = [
        "a b c d " * 10,          # 40 words, 4 distinct: dup 0.9, top 0.25
        " ".join(f"w{i}" for i in range(30)),  # all distinct
        "",                        # zero tokens -> dropped
        "   ",                     # whitespace only -> dropped
        "solo",                    # 1 word
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = (
        quality_filter(rd.from_arrow(tbl))
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert list(out.index) == [0, 1, 4]  # empty-token docs dropped
    assert out.loc[0, "n_words"] == 40
    assert out.loc[0, "n_distinct"] == 4
    assert out.loc[0, "dup_word_frac"] == 36 / 40
    assert out.loc[0, "top_word_frac"] == 10 / 40
    assert not out.loc[0, "passes"]  # dup/top too high
    assert out.loc[1, "n_words"] == 30
    assert out.loc[1, "dup_word_frac"] == 0.0
    assert bool(out.loc[1, "passes"])  # 30 >= 20, dup 0, top 1/30
    assert out.loc[4, "n_words"] == 1
    assert not out.loc[4, "passes"]  # below min_words


def test_pii_scrub_patterns():
    from dane_visual_feature_extraction_worker_ray.stages.text import (
        pii_scrub,
    )

    texts = [
        "mail me at a.b-c_d@ex-ample.co.uk today",
        "see https://x.org/a?b=1&c=2 and http://y.io/z now",
        "card 1234567 and short 123456 and id 999999999",
        "url with mail https://h.io/u@v.com trailing",
        "clean text no hits",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = (
        pii_scrub(rd.from_arrow(tbl))
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "clean_text"] == "mail me at [EMAIL] today"
    assert out.loc[0, "n_email"] == 1 and out.loc[0, "n_url"] == 0
    assert out.loc[1, "clean_text"] == "see [URL] and [URL] now"
    assert out.loc[1, "n_url"] == 2
    assert out.loc[2, "clean_text"] == "card [NUM] and short 123456 and id [NUM]"
    assert out.loc[2, "n_num"] == 2  # 6-digit run stays
    # the URL swallows the embedded address (URL replaced first); the
    # count pass sees the email-shaped substring on the raw text
    assert out.loc[3, "clean_text"] == "url with mail [URL] trailing"
    assert out.loc[3, "n_email"] == 1
    assert out.loc[4, "clean_text"] == "clean text no hits"
    assert (
        out.loc[4, ["n_url", "n_email", "n_num"]].to_numpy() == 0
    ).all()


def test_doc_freq_score_model_and_oov():
    from dane_visual_feature_extraction_worker_ray.stages.text import (
        doc_freq_score,
    )

    # vocab: a->5, b->2 (c is out-of-vocabulary)
    vocab = pa.table(
        {"tok": pa.array(["b", "a"]), "n": pa.array([2, 5], pa.int64())}
    )
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a a b", "c c", ""]),
        }
    )
    out = (
        doc_freq_score(rd.from_arrow(tbl), vocab)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert list(out.index) == [0, 1]  # empty doc dropped
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "freq_sum"] == 12  # 5 + 5 + 2
    assert out.loc[0, "freq_score"] == 12 / 3
    assert out.loc[1, "freq_sum"] == 0  # OOV tokens count 0
    assert out.loc[1, "freq_score"] == 0.0


def test_doc_repetition_degenerate_docs(ray_session, tmp_path):
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.text_queries import (
        ORACLE_SQL,
        q_doc_repetition,
    )

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "a a a a",              # all-same token
                    "x y x y x y",          # repeated bigram chain
                    "",                     # empty
                    "solo",                 # single token
                    "all distinct tokens here",
                ]
            ),
            "lang": pa.array(["en"] * 5),
            "source": pa.array(["s"] * 5),
            "n_chars": pa.array([0] * 5, pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = (
        q_doc_repetition(str(tmp_path))
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert got.loc[0, "n_tokens"] == 4 and got.loc[0, "n_distinct"] == 1
    assert got.loc[0, "max_tok_n"] == 4 and got.loc[0, "top_bigram_n"] == 3
    assert got.loc[0, "dup_tok_frac"] == 3.0 / 4.0
    assert got.loc[0, "top_bigram_frac"] == 1.0
    assert got.loc[1, "top_bigram_n"] == 3  # "x y" x3 beats "y x" x2
    assert got.loc[2, "n_tokens"] == 0
    assert pd.isna(got.loc[2, "dup_tok_frac"])
    assert got.loc[3, "n_tokens"] == 1 and pd.isna(got.loc[3, "top_bigram_frac"])
    assert got.loc[4, "dup_tok_frac"] == 0.0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = (
        con.execute(ORACLE_SQL["doc_repetition"]).df()
        .set_index("doc_id").sort_index()
    )
    for c in got.columns:
        ga, ea = got[c].astype("float64"), exp[c].astype("float64")
        assert ((ga == ea) | (ga.isna() & ea.isna())).all(), c


def test_weighted_sample_docs_matches_single_node_formula(
    ray_session, tmp_path
):
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.functions.hashing import (
        rehash64,
    )
    from dane_visual_feature_extraction_worker_ray.pipelines.text_queries import (
        WEIGHTED_SAMPLE_K,
        q_weighted_sample_docs,
    )

    rng = np.random.default_rng(29)
    n = 400
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(0, 2000, n).astype(np.int64)  # includes w == 0
    t = pa.table(
        {
            "doc_id": pa.array(ids),
            "text": pa.array(["x"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array(w),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = q_weighted_sample_docs(str(tmp_path))
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    h = rehash64(ids.astype(np.uint64), seed=0)
    u = (h.astype(np.float64) + 0.5) / 2.0**64
    pr = np.where(w > 0, np.log(u) / w.astype(np.float64), -np.inf)
    exp = ids[np.lexsort((ids, -pr))[:WEIGHTED_SAMPLE_K]]
    assert got["doc_id"].tolist() == exp.tolist()
    # zero-weight docs can never be sampled
    assert (got["n_chars"] > 0).all()
    # heavier docs dominate: sampled mean weight >> corpus mean
    assert got["n_chars"].mean() > w.mean()


def test_phrase_search_overlaps_and_positions(ray_session, tmp_path):
    """Overlapping occurrences each count; first_pos is 1-based; docs
    without the phrase are absent; brute-force oracle agrees."""
    import pyarrow.parquet as pq

    import dane_visual_feature_extraction_worker_ray.pipelines.text_queries as tq

    texts = [
        "big order scan big order scan x",      # two matches, pos 1 & 4
        "big order scan",                        # one match at pos 1
        "order scan big",                        # no match
        "big big order scan order scan",         # one match at pos 2
        "",                                      # empty
        "big order",                             # truncated phrase
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        tq.q_phrase_search(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 3]
    assert out["n_matches"].tolist() == [2, 1, 1]
    assert out["first_pos"].tolist() == [1, 1, 2]

    # brute force over every doc
    terms = tq.PHRASE_TERMS
    for did, s in enumerate(texts):
        tk = s.split()
        hits = [
            i + 1
            for i in range(len(tk) - len(terms) + 1)
            if tuple(tk[i : i + len(terms)]) == terms
        ]
        row = out[out.doc_id == did]
        if hits:
            assert row.n_matches.iloc[0] == len(hits)
            assert row.first_pos.iloc[0] == hits[0]
        else:
            assert row.empty


def test_rrf_fusion_rank_invariants(ray_session, tmp_path):
    """Both rank columns are permutations of 1..n, every doc appears
    exactly once, and the fused score equals the two-term RRF formula
    recomputed from the ranks."""
    import pyarrow.parquet as pq

    import dane_visual_feature_extraction_worker_ray.pipelines.text_queries as tq

    rng = np.random.default_rng(3)
    vocab = ["scan", "sort", "hash", "join", "batch", "query"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for _ in range(80)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(80), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = tq.q_rrf_fusion(str(tmp_path)).to_pandas()
    assert len(out) == 80
    assert sorted(out["doc_id"]) == list(range(80))
    assert sorted(out["r_lex"]) == list(range(1, 81))
    assert sorted(out["r_bm"]) == list(range(1, 81))
    expect = 1.0 / (60.0 + out["r_lex"].astype(float)) + 1.0 / (
        60.0 + out["r_bm"].astype(float)
    )
    assert (out["rrf_score"].to_numpy() == expect.to_numpy()).all()


def test_bigram_novelty_planted_noise_doc(ray_session, tmp_path):
    """A doc made of corpus-unique bigrams scores novelty 1.0; docs of
    the dominant repeated bigram score 0.0; counts are exact."""
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.text_queries import (
        q_bigram_novelty,
    )

    common = "a b " * 50            # bigrams (a,b) x50, (b,a) x49 per doc
    noise = " ".join(f"z{i}" for i in range(20))  # 19 unique bigrams
    texts = [common.strip()] * 10 + [noise]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        q_bigram_novelty(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 11
    assert (out.loc[out.doc_id < 10, "novelty"] == 0.0).all()
    noise_row = out[out.doc_id == 10].iloc[0]
    assert noise_row["n_bigrams"] == 19
    assert noise_row["n_rare"] == 19
    assert noise_row["novelty"] == 1.0


def test_compression_quality_tails(ray_session, tmp_path):
    """Repetitive text compresses far better than high-entropy text;
    ratios recompute exactly from zlib; empty docs get ratio 1."""
    import zlib

    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.curation import (
        q_compression_quality,
    )

    rng = np.random.default_rng(5)
    texts = [
        "spam ham " * 400,                               # boilerplate
        "".join(chr(rng.integers(33, 1000)) for _ in range(3000)),
        "a normal sentence about stream processing engines",
        "",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        q_compression_quality(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, s in enumerate(texts):
        b = s.encode("utf-8")
        assert out.loc[i, "n_bytes"] == len(b)
        assert out.loc[i, "n_zlib_bytes"] == len(zlib.compress(b, 6))
    assert out.loc[0, "zlib_ratio"] < 0.05   # boilerplate tail
    assert out.loc[1, "zlib_ratio"] > 0.5    # entropy tail
    assert out.loc[3, "zlib_ratio"] == 1.0   # empty


def test_feature_hashing_collision_sums(ray_session, tmp_path):
    """Each doc contributes one ±1 per categorical column; same-bucket
    contributions sum (including to 0 — the hashing trick's defining
    collision behavior); buckets stay in range."""
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.curation import (
        FH_BUCKETS,
        q_feature_hashing,
    )

    t = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(["x"] * 6, pa.string()),
            "lang": pa.array(["en", "de", "en", "fr", "de", "en"]),
            "source": pa.array(["s1", "s2", "s1", "s3", "s2", "s1"]),
            "n_chars": pa.array([1] * 6, pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_feature_hashing(str(tmp_path)).to_pandas()
    assert out["bucket"].between(0, FH_BUCKETS - 1).all()
    # identical (lang, source) rows get identical feature vectors
    g = {
        did: sorted(map(tuple, out[out.doc_id == did][["bucket", "val"]]
                        .to_numpy()))
        for did in range(6)
    }
    assert g[0] == g[2] == g[5]
    assert g[1] == g[4]
    # per-doc total |val| is 2 unless a collision cancelled (even gap)
    tot = out.groupby("doc_id")["val"].apply(lambda v: v.abs().sum())
    assert ((tot <= 2) & ((2 - tot) % 2 == 0)).all()


def test_chars_percent_rank_tie_semantics(ray_session, tmp_path):
    """SQL percent_rank tie semantics: equal values share a rank
    (1 + strictly-smaller count); single-row groups get 0."""
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.curation import (
        q_chars_percent_rank,
    )

    t = pa.table(
        {
            "doc_id": pa.array(range(7), pa.int64()),
            "text": pa.array(["x"] * 7, pa.string()),
            "lang": pa.array(["en"] * 7, pa.string()),
            "source": pa.array(
                ["a", "a", "a", "a", "a", "b", "c"], pa.string()
            ),
            # source a: values 10,10,20,20,30 -> pr 0,0,.5,.5,1
            "n_chars": pa.array([10, 10, 20, 20, 30, 5, 7], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        q_chars_percent_rank(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["pr"].tolist() == [0.0, 0.0, 0.5, 0.5, 1.0, 0.0, 0.0]


def test_bigram_lm_score_bit_exact_vs_brute(ray_session, tmp_path):
    """Distributed LM scoring equals a single-process recompute of the
    identical formula in the identical (h1, h2)-sorted order —
    bit-for-bit, not allclose (the determinism contract)."""
    import collections

    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.functions.hashing import (
        hash64,
    )
    from dane_visual_feature_extraction_worker_ray.pipelines.text_queries import (
        q_bigram_lm_score,
    )

    rng = np.random.default_rng(23)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 25)))
        for _ in range(60)
    ] + ["single", ""]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        q_bigram_lm_score(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    # brute force with identical hashing, order, and float ops
    uni = collections.Counter()
    bi = collections.Counter()
    for s in texts:
        tk = s.split()
        uni.update(tk)
        bi.update(zip(tk[:-1], tk[1:]))
    V = len(uni)
    hv = {w: int(hash64(np.array([w], dtype=object)).view(np.int64)[0])
          for w in uni}
    for did, s in enumerate(texts):
        tk = s.split()
        pairs = collections.Counter(zip(tk[:-1], tk[1:]))
        if not pairs:
            assert did not in out.index
            continue
        rows = sorted(
            ((hv[a], hv[b], c) for (a, b), c in pairs.items())
        )
        by_hash = {(hv[a], hv[b]): (a, b) for (a, b) in pairs}
        c = np.array([r[2] for r in rows], np.float64)
        cn = np.array(
            [bi[by_hash[(r[0], r[1])]] for r in rows], np.float64
        )
        cw = np.array(
            [uni[by_hash[(r[0], r[1])][0]] for r in rows], np.float64
        )
        contrib = c * np.log((cn + 1.0) / (cw + float(V)))
        expect = np.add.reduce(contrib) / c.sum()
        assert out.loc[did, "n_bigrams"] == len(tk) - 1
        assert out.loc[did, "avg_logprob"] == expect
