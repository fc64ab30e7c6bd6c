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
