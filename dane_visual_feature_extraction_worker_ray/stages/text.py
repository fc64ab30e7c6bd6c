"""Text analysis operators over a documents table.

All stateless computations run in plain ``map_batches`` tasks with
pandas-str / numpy kernels; the language-ID stage is a callable class
(actor pool) because it builds its profile tables once per actor
(reference analog: transforms/config built once per source,
``/root/reference/data_handling.py:21-37``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64

_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that "
    "with as for on at by from not but"
).split()

# tiny per-language function-word profiles (public-knowledge lists);
# enough for a deterministic heuristic language-ID operator
_LANG_PROFILES = {
    "en": "the and of to in is that it was for on are as with his they at be this have from or one had by word".split(),
    "de": "der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an werden".split(),
    "fr": "de la le et les des en un du une que est pour qui dans a par plus pas au sur ne se ce il".split(),
    "es": "de la que el en y a los del se las por un para con no una su al lo como más pero sus le".split(),
    "zh": "的 一 是 在 不 了 有 和 人 这 中 大 为 上 个 国 我 以 要 他 时 来 用 们".split(),
}


def text_quality(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Length / word / stopword quality metrics, SQL-checkable.

    Definitions shared with the oracle: words = split on single spaces;
    avg_word_len over characters excluding spaces; ratios are one IEEE
    division of exact ints.
    """

    stop_arr = pa.array(sorted(_STOPWORDS), pa.string())

    def _quality(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.tokenize import space_stopword_stats

        s = pc.fill_null(tbl.column(text_col).combine_chunks(), "")
        n_chars = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # len(replace(" ", "")) == n_chars - n_spaces (spaces are 1 char)
        no_space = n_chars - pc.count_substring(s, " ").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_words, n_stop = space_stopword_stats(s, stop_arr)
        nw_safe = np.where(n_words == 0, 1, n_words)
        return pa.table(
            {
                id_col: tbl.column(id_col),
                "n_chars": pa.array(n_chars),
                "n_words": pa.array(n_words),
                "avg_word_len": pa.array(
                    no_space.astype(np.float64) / nw_safe.astype(np.float64)
                ),
                "n_stopwords": pa.array(n_stop),
                "stopword_ratio": pa.array(
                    n_stop.astype(np.float64) / nw_safe.astype(np.float64)
                ),
            }
        )

    return docs_ds.map_batches(_quality, batch_format="pyarrow")


def token_counts(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    r"""Token counts: whitespace tokens and regex word tokens (\w+).

    ``\w`` is RE2 semantics (ASCII word chars), matching the DuckDB
    oracle's ``regexp_extract_all`` exactly — Python ``re`` would count
    unicode word chars differently."""

    def _count(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.tokenize import ws_tokens

        s = pc.fill_null(tbl.column(text_col).combine_chunks(), "")
        row_idx, _flat = ws_tokens(s)
        ws = np.bincount(row_idx, minlength=len(s)).astype(np.int64)
        rx = (
            pc.count_substring_regex(s, r"\w+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                id_col: tbl.column(id_col),
                "n_ws_tokens": pa.array(ws),
                "n_word_tokens": pa.array(rx),
            }
        )

    return docs_ds.map_batches(_count, batch_format="pyarrow")


class LangId:
    """Heuristic language ID: stopword-profile hit rates (actor pool).

    Profile token sets are materialized once per actor in ``__init__``
    (reference analog: model load once per worker,
    ``/root/reference/worker.py:61``).
    """

    def __init__(self):
        self.langs = sorted(_LANG_PROFILES)
        # Arrow value sets: pc.is_in runs the profile lookup in C++
        self.profiles = {
            lang: pa.array(sorted(set(words)), pa.string())
            for lang, words in _LANG_PROFILES.items()
        }

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.tokenize import ws_tokens

        row, flat = ws_tokens(tbl.column("text"))
        n = tbl.num_rows
        scores = np.zeros((n, len(self.langs)), dtype=np.float64)
        for j, lang in enumerate(self.langs):
            hits = pc.is_in(
                flat, value_set=self.profiles[lang]
            ).to_numpy(zero_copy_only=False)
            scores[:, j] = np.bincount(
                row, weights=hits.astype(np.float64), minlength=n
            )
        best = np.argmax(scores, axis=1)
        none = scores.max(axis=1) == 0
        pred = np.array(self.langs, dtype=object)[best]
        pred[none] = "und"
        conf_den = scores.sum(axis=1)
        conf = scores.max(axis=1) / np.where(conf_den == 0, 1, conf_den)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "lang_pred": pa.array(pred, type=pa.string()),
                "lang_conf": pa.array(conf),
            }
        )


def lang_id(docs_ds, concurrency: int = 4):
    from ..functions.runtime import autoscale_pool

    # pre-started pool with a deadlock-safe floor (see autoscale_pool)
    return docs_ds.map_batches(
        LangId,
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=autoscale_pool(concurrency),
        num_cpus=1,
    )


def quality_filter(
    docs_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_dup_frac: float = 0.5,
    max_top_frac: float = 0.12,
):
    """Gopher/C4-style heuristic quality filter over word statistics.

    Per doc: total whitespace tokens, distinct tokens, duplicate-word
    fraction ``(n_words - n_distinct) / n_words`` and top-word fraction
    ``max_count / n_words`` (the classic repetition signals), plus a
    ``passes`` verdict under the given thresholds. Ratios are one IEEE
    division of exact ints with the same expression shape as the SQL
    oracle. Docs with zero tokens are dropped (the oracle's unnest does
    the same); fully vectorized — factorize + one np.unique over
    (row, word-code) pairs, per-row aggregates via reduceat.

    Reference analog: the reference validates inputs before the
    expensive stage (``/root/reference/worker.py:108-133``); a training
    pipeline gates documents before tokenization the same way.
    """

    def _metrics(tbl: pa.Table) -> pa.Table:
        from ..functions.tokenize import ws_tokens

        ids = tbl.column(id_col).to_numpy()
        row, flat = ws_tokens(tbl.column(text_col))
        out_schema = pa.schema(
            [
                (id_col, pa.int64()),
                ("n_words", pa.int64()),
                ("n_distinct", pa.int64()),
                ("dup_word_frac", pa.float64()),
                ("top_word_frac", pa.float64()),
                ("passes", pa.bool_()),
            ]
        )
        if len(row) == 0:
            return out_schema.empty_table()
        enc = flat.dictionary_encode()  # C++ factorize
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ncodes = len(enc.dictionary)
        # (row, word) pair counts: one sort over combined int keys
        key = row * np.int64(ncodes) + codes
        uk, counts = np.unique(key, return_counts=True)
        urow = uk // np.int64(ncodes)
        starts = np.flatnonzero(np.r_[True, urow[1:] != urow[:-1]])
        rows_present = urow[starts]
        n_words = np.bincount(row, minlength=tbl.num_rows)[rows_present]
        n_distinct = np.diff(np.r_[starts, len(urow)])
        top_cnt = np.maximum.reduceat(counts, starts)
        dup_frac = (n_words - n_distinct).astype(np.float64) / n_words
        top_frac = top_cnt.astype(np.float64) / n_words
        passes = (
            (n_words >= min_words)
            & (dup_frac <= max_dup_frac)
            & (top_frac <= max_top_frac)
        )
        return pa.table(
            {
                id_col: pa.array(ids[rows_present].astype(np.int64)),
                "n_words": pa.array(n_words.astype(np.int64)),
                "n_distinct": pa.array(n_distinct.astype(np.int64)),
                "dup_word_frac": pa.array(dup_frac),
                "top_word_frac": pa.array(top_frac),
                "passes": pa.array(passes),
            }
        )

    return docs_ds.map_batches(_metrics, batch_format="pyarrow")


def token_count_partial(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch ``(tok, n)`` whitespace-token counts — the mergeable
    partial behind the heavy-hitter and vocabulary aggregations.
    ``pc.value_counts`` runs the group-count in C++."""
    import pyarrow.compute as pc

    from ..functions.tokenize import ws_tokens

    _, flat = ws_tokens(tbl.column(text_col))
    vc = pc.value_counts(flat)
    return pa.table(
        {
            "tok": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        }
    )


def doc_freq_score(docs_ds, vocab_counts, text_col: str = "text",
                   id_col: str = "doc_id"):
    """Score each doc by the mean corpus frequency of its tokens — the
    unigram-LM shape of model-based quality scoring (two-pass: a count
    pass builds the vocabulary, then the broadcast model scores the
    streaming corpus). Integer sums + ONE final IEEE division keep it
    bit-exact against the SQL oracle (a log-prob variant would sum
    floats order-dependently and can only be rows-only checked).

    ``vocab_counts``: an Arrow table ``(tok, n)`` — typically the
    output of the global token-count aggregation. It is broadcast ONCE
    via ``ray.put`` (sorted token array + int64 counts); at 100 TB the
    vocabulary is millions of rows — megabytes, not corpus-scale.
    Tokens outside the vocabulary count 0 (scoring one corpus against
    another's model). Docs with zero tokens are dropped.

    Reference analog: broadcast-model scoring is the same shape as the
    per-worker checkpoint load + forward pass
    (``/root/reference/feature_extraction.py:17-32``) with an exact
    arithmetic model instead of a CNN."""
    import ray

    tok = vocab_counts.column("tok").to_numpy(zero_copy_only=False)
    cnt = vocab_counts.column("n").cast(pa.int64()).to_numpy()
    o = np.argsort(tok)
    model_ref = ray.put((tok[o], cnt[o]))

    def _score(tbl: pa.Table) -> pa.Table:
        from ..functions.tokenize import ws_tokens

        vtok, vcnt = ray.get(model_ref)
        ids = tbl.column(id_col).to_numpy()
        row, flat = ws_tokens(tbl.column(text_col))
        out_schema = pa.schema(
            [
                (id_col, pa.int64()),
                ("n_tokens", pa.int64()),
                ("freq_sum", pa.int64()),
                ("freq_score", pa.float64()),
            ]
        )
        if len(row) == 0:
            return out_schema.empty_table()
        words = flat.to_numpy(zero_copy_only=False)
        if len(vtok):
            pos = np.searchsorted(vtok, words).clip(0, len(vtok) - 1)
            w_cnt = np.where(vtok[pos] == words, vcnt[pos], 0)
        else:
            w_cnt = np.zeros(len(words), np.int64)
        n_tok = np.bincount(row, minlength=tbl.num_rows)
        fsum = np.zeros(tbl.num_rows, np.int64)
        np.add.at(fsum, row, w_cnt)  # exact int sums (no float weights)
        present = n_tok > 0
        n_p = n_tok[present].astype(np.int64)
        f_p = fsum[present]
        return pa.table(
            {
                id_col: pa.array(ids[present].astype(np.int64)),
                "n_tokens": pa.array(n_p),
                "freq_sum": pa.array(f_p),
                "freq_score": pa.array(
                    f_p.astype(np.float64) / n_p.astype(np.float64)
                ),
            }
        )

    return docs_ds.map_batches(_score, batch_format="pyarrow")


# PII/URL scrub patterns — RE2-compatible (no lookaround, ASCII
# classes) so the SAME strings drive Python re and the DuckDB oracle.
# Order matters: URLs first (an address inside a URL is part of the
# URL), then emails, then long digit runs.
SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^ \t\n\r]+", "[URL]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("num", r"[0-9]{7,}", "[NUM]"),
]


def pii_scrub(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Redact URLs, email addresses and long digit runs (the standard
    pre-training scrub pass). Returns ``(doc_id, clean_text, n_url,
    n_email, n_num)`` — counts measured on the INPUT text, replacements
    applied in :data:`SCRUB_PATTERNS` order. Stateless vectorized
    pandas-str kernels; patterns compiled once per task."""
    import re

    compiled = [(n, re.compile(p), r) for n, p, r in SCRUB_PATTERNS]

    def _scrub(tbl: pa.Table) -> pa.Table:
        s = tbl.column(text_col).to_pandas().fillna("")
        cols = {id_col: tbl.column(id_col)}
        clean = s
        for name, pat, repl in compiled:
            cols[f"n_{name}"] = pa.array(
                s.str.count(pat).to_numpy(dtype=np.int64)
            )
            clean = clean.str.replace(pat, repl, regex=True)
        cols["clean_text"] = pa.array(clean, pa.string())
        return pa.table(cols)

    return docs_ds.map_batches(_scrub, batch_format="pyarrow")


def doc_fingerprints(
    docs_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 5,
):
    """Winnowing fingerprint: min token-k-gram hash per sliding window,
    deduplicated — a compact rolling-hash document signature usable for
    plagiarism-style containment checks."""
    from .dedup import _word_shingles

    def _fp(tbl: pa.Table) -> pa.Table:
        s = tbl.column(text_col).to_pandas()
        ids = tbl.column(id_col).to_numpy()
        row, sh = _word_shingles(s, k)
        if len(row) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "fingerprint": pa.array([], pa.uint64()),
                }
            )
        order = np.argsort(row, kind="stable")
        row, sh = row[order], sh[order]
        starts = np.flatnonzero(np.r_[True, row[1:] != row[:-1]])
        ends = np.r_[starts[1:], len(row)]
        counts = ends - starts
        # vectorized winnowing across ALL docs at once:
        # 1) docs with <= window shingles contribute their global min
        small = counts <= window
        small_rows = row[starts[small]]
        small_fps = np.minimum.reduceat(sh, starts)[small]
        # 2) larger docs: one global sliding window over the
        #    concatenated shingle array; a window is valid iff it lies
        #    entirely inside one doc (first and last index same row)
        if len(sh) >= window:
            view = np.lib.stride_tricks.sliding_window_view(sh, window)
            wmins = view.min(axis=1)
            same_doc = row[: len(wmins)] == row[window - 1 :]
            in_large = ~small[np.searchsorted(starts, np.arange(len(wmins)), side="right") - 1]
            valid = same_doc & in_large
            w_rows = row[: len(wmins)][valid]
            w_fps = wmins[valid]
        else:
            w_rows = np.empty(0, np.int64)
            w_fps = np.empty(0, np.uint64)
        all_rows = np.concatenate([small_rows, w_rows])
        all_fps = np.concatenate([small_fps, w_fps])
        # distinct (doc, fingerprint), ordered by (doc, fingerprint)
        o = np.lexsort((all_fps, all_rows))
        all_rows, all_fps = all_rows[o], all_fps[o]
        keep = np.ones(len(all_rows), dtype=bool)
        keep[1:] = (all_rows[1:] != all_rows[:-1]) | (
            all_fps[1:] != all_fps[:-1]
        )
        return pa.table(
            {
                id_col: pa.array(ids[all_rows[keep]].astype(np.int64)),
                "fingerprint": pa.array(all_fps[keep].astype(np.uint64)),
            }
        )

    return docs_ds.map_batches(_fp, batch_format="pyarrow")


def phrase_match_table(tbl, terms) -> "pa.Table":
    """Exact phrase matching over one Arrow batch — the pure kernel
    behind ``pipelines/text_queries.q_phrase_search`` (vectorized
    anchor intersection; see that query's docstring for the scale
    argument). Returns (doc_id, n_matches, first_pos) with 1-based
    positions; overlapping occurrences each count."""
    import numpy as np
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_matches", pa.int64()),
            ("first_pos", pa.int64()),
        ]
    )
    s = tbl.column("text").to_pandas().fillna("").reset_index(drop=True)
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    ex = s.str.split().explode().dropna()
    if len(ex) == 0:
        return out_schema.empty_table()
    row = ex.index.to_numpy().astype(np.int64)
    pos = ex.groupby(level=0).cumcount().to_numpy().astype(np.int64)
    tok = ex.to_numpy()
    key = (row << np.int64(32)) | pos
    anchors = None
    for i, term in enumerate(terms):
        k_i = key[tok == term] - i
        anchors = (
            k_i if anchors is None else np.intersect1d(
                anchors, k_i, assume_unique=True
            )
        )
        if len(anchors) == 0:
            return out_schema.empty_table()
    arow = (anchors >> np.int64(32)).astype(np.int64)
    apos = (anchors & np.int64(0xFFFFFFFF)).astype(np.int64)
    order = np.lexsort((apos, arow))
    arow, apos = arow[order], apos[order]
    first = np.ones(len(arow), dtype=bool)
    first[1:] = arow[1:] != arow[:-1]
    starts = np.flatnonzero(first)
    counts = np.diff(np.r_[starts, len(arow)])
    return pa.table(
        {
            "doc_id": pa.array(ids[arow[starts]].astype(np.int64)),
            "n_matches": pa.array(counts.astype(np.int64)),
            "first_pos": pa.array(apos[starts] + 1),
        }
    )
