"""BPE training vs a reference implementation; segmentation actors."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.bpe import (
    _EOW,
    _segment,
    bpe_doc_stats,
    learn_bpe,
)


def _ref_bpe(word_counts: dict, k: int):
    """Classic reference BPE (Sennrich et al.) in the plainest form."""
    seqs = {w: list(w) + [_EOW] for w in word_counts}
    merges = []
    for _ in range(k):
        pairs = {}
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + word_counts[w]
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, n))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r); i += 2
                else:
                    out.append(syms[i]); i += 1
            seqs[w] = out
    return merges


def _docs_ds(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_learn_bpe_matches_reference(ray_session):
    texts = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest widest",
        "low lower newest",
    ]
    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    exp = _ref_bpe(wc, 10)
    got = learn_bpe(_docs_ds(texts), num_merges=10).to_pandas()
    assert len(got) == len(exp)
    for i, (l, r, n) in enumerate(exp):
        row = got.iloc[i]
        assert (row["left"], row["right"], row["pair_count"]) == (l, r, n)
        assert row["merged"] == l + r and row["rank"] == i


def test_bpe_segment_roundtrip_and_stats(ray_session):
    texts = ["aaab aaab abab", "xyz"]
    merges = learn_bpe(_docs_ds(texts), num_merges=6)
    ranks = {
        (l, r): k
        for k, l, r in zip(
            merges.column("rank").to_pylist(),
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist(),
        )
    }
    # segmentation is lossless: pieces re-concatenate to word + EOW
    for w in ["aaab", "abab", "xyz", "unseen"]:
        segs = _segment(w, ranks)
        assert "".join(segs) == w + _EOW
    stats = (
        bpe_doc_stats(_docs_ds(texts), merges, concurrency=(1, 2))
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert stats.loc[0, "n_words"] == 3 and stats.loc[1, "n_words"] == 1
    # pieces never exceed chars+1 and at least 1 per word
    assert stats.loc[0, "n_pieces"] >= 3
    assert stats.loc[1, "n_pieces"] <= len("xyz") + 1


def test_learn_bpe_empty_and_tiebreak(ray_session):
    # empty corpus -> empty merge table
    got = learn_bpe(_docs_ds([""]), num_merges=5).to_pandas()
    assert len(got) == 0
    # four count-1 pairs tie -> lexicographic min ('a', '</w>' < 'b')
    got = learn_bpe(_docs_ds(["ab ba"]), num_merges=1).to_pandas()
    assert (got.iloc[0]["left"], got.iloc[0]["right"]) == ("a", _EOW)
