"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute_force``: exact cosine top-k against a broadcast query
  matrix — numpy matmul per batch, merged on the driver (k rows per
  batch per query reach the driver, never the corpus). This is the
  100 TB-safe baseline: the scan streams, only top-k partials move.
- ``near_dup_pairs_cosine``: embedding near-duplicate pairs via random
  hyperplane LSH bucketing (SimHash in embedding space) + exact cosine
  verification within buckets — the scale path that avoids the O(n²)
  cross join.

Reference analog: the repo's own vector-search demo (normalize → dot →
argsort → top-10), ``/root/reference/misc/vector_search_example/
vec_example_np.py:14-22`` — re-expressed as streaming batch kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _matrix(tbl: pa.Table, col: str) -> np.ndarray:
    arr = tbl.column(col)
    if pa.types.is_fixed_size_list(arr.type):
        flat = arr.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(tbl.num_rows, arr.type.list_size)
    return np.vstack(arr.to_numpy(zero_copy_only=False)).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_brute_force(
    emb_ds,
    query_vecs: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int | None = 4,
):
    """Exact cosine top-k per query vector. Returns a pandas DataFrame
    (query_idx, vec_id, score) with deterministic tie-break (score
    desc, vec_id asc); scores optionally rounded for cross-engine
    comparability."""
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(q)

    def _partial(tbl: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _normalize(_matrix(tbl, vec_col).astype(np.float64))
        scores = m @ qm.T  # (batch, nq)
        ids = tbl.column(id_col).to_numpy()
        nq = qm.shape[0]
        kk = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for j in range(nq):
            s = scores[:, j]
            if round_decimals is not None:
                s = np.round(s, round_decimals)
            top = np.lexsort((ids, -s))[:kk]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_id.append(ids[top])
            out_s.append(s[top])
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    partials = emb_ds.map_batches(_partial, batch_format="pyarrow")
    df = partials.to_pandas()  # ≤ k × nq × n_batches rows — small
    df = df.sort_values(
        ["query_idx", "score", id_col],
        ascending=[True, False, True],
        kind="mergesort",
    )
    return df.groupby("query_idx", sort=True).head(k).reset_index(drop=True)


def knn_ivf(
    emb_ds,
    query_vecs: np.ndarray,
    k: int = 10,
    n_lists: int = 32,
    n_probe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int | None = 4,
    kmeans_iters: int = 0,
    train_sample: int = 8192,
):
    """IVF-bucketed approximate cosine top-k — the scale path next to
    :func:`knn_brute_force`.

    Coarse quantizer: the ``n_lists`` vectors with the smallest ids
    (deterministic, no k-means dependency) act as centroids; every row
    is assigned to its nearest centroid inside the streaming scan, and
    a query scores ONLY rows whose list is among its ``n_probe``
    closest centroids (rows outside every probed list are dropped
    before the scoring matmul). ``n_probe == n_lists`` degrades to the
    exact brute force for ANY centroid set. Centroids are broadcast
    once via ``ray.put``.

    ``kmeans_iters > 0`` refines the centroids with spherical-k-means
    Lloyd steps over a deterministic hash-based sample of at most
    ``train_sample`` rows. The gather is bounded BEFORE the driver
    collect (round-3 fix): each batch keeps only its ``n_lists``
    smallest-id rows (centroid seed) plus its ``train_sample``
    smallest-HASH rows (training candidates), so the driver merge holds
    at most ``(n_lists + train_sample) x n_blocks`` rows — never a
    corpus-proportional fraction — and then truncates to the global
    ``train_sample`` smallest hashes (a deterministic uniform sample,
    since the multiplicative hash is uniform over ids).
    """
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))

    def _id_hash(ids: np.ndarray) -> np.ndarray:
        return ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    def _cand(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy()
        keep = np.zeros(len(ids), dtype=bool)
        if len(ids) > n_lists:
            keep[np.argpartition(ids, n_lists)[:n_lists]] = True
        else:
            keep[:] = True
        if kmeans_iters > 0 and len(ids) > 0:
            # per-batch cap: the train_sample smallest hash values only
            h = _id_hash(ids)
            if len(ids) > train_sample:
                keep[np.argpartition(h, train_sample)[:train_sample]] = True
            else:
                keep[:] = True
        return tbl.filter(pa.array(keep)).select([id_col, vec_col])

    cand = pa.concat_tables(
        list(
            emb_ds.map_batches(
                _cand, batch_format="pyarrow"
            ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
    )
    # coarse-quantizer gather size as a lineage counter (reported as
    # ivf_gather_rows_max; bounded by (n_lists + train_sample) x blocks)
    from ..state.counters import set_max as _cmax

    _cmax("ivf_gather_rows", cand.num_rows)
    cids = cand.column(id_col).to_numpy()
    order = np.argsort(cids)[:n_lists]
    centroids = _normalize(
        _matrix(cand.take(pa.array(order)), vec_col).astype(np.float64)
    )
    if kmeans_iters > 0 and cand.num_rows > n_lists:
        # train on the GLOBAL train_sample smallest hashes (ties broken
        # by id) — the hash-ordered sample the per-batch cap preserves:
        # a row in the global smallest-K is in its batch's smallest-K.
        h = _id_hash(cids)
        t_order = np.lexsort((cids, h))[:train_sample]
        train = _normalize(
            _matrix(cand.take(pa.array(t_order)), vec_col).astype(np.float64)
        )
        for _ in range(kmeans_iters):
            assign = np.argmax(train @ centroids.T, axis=1)
            for c in range(len(centroids)):
                members = train[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
            centroids = _normalize(centroids)
    c_ref = ray.put(centroids)
    # per-query probe sets → (n_lists, nq) membership matrix
    probe_rank = np.argsort(-(centroids @ q.T), axis=0, kind="stable")
    member = np.zeros((centroids.shape[0], q.shape[0]), dtype=bool)
    for j in range(q.shape[0]):
        member[probe_rank[: min(n_probe, len(centroids)), j], j] = True
    member_ref = ray.put(member)
    q_ref = ray.put(q)

    def _partial(tbl: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        C = ray.get(c_ref)
        L = ray.get(member_ref)
        m = _normalize(_matrix(tbl, vec_col).astype(np.float64))
        ids = tbl.column(id_col).to_numpy()
        assign = np.argmax(m @ C.T, axis=1)  # nearest list per row
        row_member = L[assign]  # (batch, nq)
        keep = row_member.any(axis=1)
        m, ids, row_member = m[keep], ids[keep], row_member[keep]
        nq = qm.shape[0]
        if len(ids) == 0:
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        scores = m @ qm.T
        out_q, out_id, out_s = [], [], []
        for j in range(nq):
            in_probe = row_member[:, j]
            s = scores[in_probe, j]
            pid = ids[in_probe]
            if len(pid) == 0:
                continue
            if round_decimals is not None:
                s = np.round(s, round_decimals)
            kk = min(k, len(pid))
            top = np.lexsort((pid, -s))[:kk]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_id.append(pid[top])
            out_s.append(s[top])
        if not out_q:
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    partials = emb_ds.map_batches(_partial, batch_format="pyarrow")
    df = partials.to_pandas()  # ≤ k × nq × n_batches rows — small
    df = df.sort_values(
        ["query_idx", "score", id_col],
        ascending=[True, False, True],
        kind="mergesort",
    )
    return df.groupby("query_idx", sort=True).head(k).reset_index(drop=True)


def near_dup_pairs_cosine(
    emb_ds,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_tables: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    max_bucket: int = 4000,
    max_pairs_per_bucket: int = 1 << 22,
    broadcast_warn_bytes: int = 1 << 30,
):
    """Pairs (a < b) with cosine >= threshold, via hyperplane LSH.

    ``n_tables`` independent sets of ``n_planes`` random hyperplanes;
    a pair collides in a table iff all sign bits agree. Recall grows
    with n_tables; guaranteed hits for very high thresholds.

    Round-3 shape (two-pass, mirrors minhash_lsh_pairs): buckets carry
    ``(table_id, bucket_key, vec_id)`` only — 20 bytes/row instead of
    the round-2 design's x``n_tables`` float32 vector replication
    (dim x 4 B extra per exploded row; 8 tables x 32-dim = ~1 KiB/vec
    -> ~160 B/vec, and the saving grows with dim). Buckets emit
    candidate id pairs; the exact cosine is verified in a second
    streaming pass against a broadcast of the candidate-endpoint
    vectors (bounded by the LSH candidate count, not the corpus).
    """
    import logging

    import ray

    from .candidates import dedupe_pairs, gather_rows_by_ids, pair_endpoint_ids
    from .exchange import hash_grouped_map

    def _buckets(tbl: pa.Table) -> pa.Table:
        m = _normalize(_matrix(tbl, vec_col).astype(np.float64))
        d = m.shape[1]
        local_rng = np.random.default_rng(seed)  # same planes every batch
        pl = local_rng.standard_normal((n_tables, n_planes, d))
        ids = tbl.column(id_col).to_numpy()
        n = len(ids)
        tb, key, oid = [], [], []
        for t in range(n_tables):
            bits = (m @ pl[t].T) > 0  # (n, n_planes)
            k = np.zeros(n, dtype=np.uint64)
            for b in range(n_planes):
                k |= bits[:, b].astype(np.uint64) << np.uint64(b)
            tb.append(np.full(n, t, dtype=np.int32))
            key.append(k)
            oid.append(ids)
        return pa.table(
            {
                "table_id": pa.array(np.concatenate(tb)),
                "bucket_key": pa.array(np.concatenate(key)),
                id_col: pa.array(np.concatenate(oid)),
            }
        )

    exploded = emb_ds.map_batches(_buckets, batch_format="pyarrow")

    cand_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])

    def _cand_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column(id_col).to_numpy())
        n = len(ids)
        if n < 2:
            return cand_schema.empty_table()
        if n > max_bucket or n * (n - 1) // 2 > max_pairs_per_bucket:
            # no silent caps: report the skipped bucket
            logging.getLogger(__name__).warning(
                "near_dup_pairs_cosine: skipping bucket of %d rows "
                "(max_bucket=%d, max_pairs=%d; ~%d candidate pairs); "
                "other tables may still surface them",
                n, max_bucket, max_pairs_per_bucket, n * (n - 1) // 2,
            )
            return cand_schema.empty_table()
        iu, ju = np.triu_indices(n, k=1)
        return pa.table(
            {
                "vec_a": pa.array(ids[iu].astype(np.int64)),
                "vec_b": pa.array(ids[ju].astype(np.int64)),
            }
        )

    cand = hash_grouped_map(
        exploded, ["table_id", "bucket_key"], _cand_pairs,
        empty_schema=cand_schema,
        min_group_size=2,
    )
    # dedupe pairs that collided in several tables
    cand = dedupe_pairs(cand, "vec_a", "vec_b")

    empty = pa.table(
        {
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )
    import ray.data as rd

    cand_ids = pair_endpoint_ids(cand, "vec_a", "vec_b")
    if len(cand_ids) == 0:
        return rd.from_arrow(empty)
    picked = gather_rows_by_ids(
        emb_ds, id_col, cand_ids, columns=[id_col, vec_col]
    )
    vid = picked.column(id_col).to_numpy()
    vmat = (
        _normalize(_matrix(picked, vec_col).astype(np.float64))
        if picked.num_rows
        else np.empty((0, 1), np.float64)
    )
    o = np.argsort(vid)
    vid, vmat = vid[o], vmat[o]
    if vmat.nbytes > broadcast_warn_bytes:
        logging.getLogger(__name__).warning(
            "near_dup_pairs_cosine: candidate-vector broadcast is "
            "%.1f GiB (%d vecs) — candidate set is not small; raise "
            "threshold or n_planes",
            vmat.nbytes / (1 << 30), len(vid),
        )
    vec_ref = ray.put((vid, vmat))

    def _verify(tbl: pa.Table) -> pa.Table:
        ids_s, mat = ray.get(vec_ref)
        a = tbl.column("vec_a").to_numpy()
        b = tbl.column("vec_b").to_numpy()
        pa_i = np.searchsorted(ids_s, a)
        pb_i = np.searchsorted(ids_s, b)
        cos = np.einsum("ij,ij->i", mat[pa_i], mat[pb_i])
        keep = cos >= threshold
        return pa.table(
            {
                "vec_a": pa.array(a[keep]),
                "vec_b": pa.array(b[keep]),
                "cosine": pa.array(cos[keep]),
            }
        )

    return cand.map_batches(
        _verify, batch_format="pyarrow", batch_size=None
    )


_HN_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("neg_id", pa.int64()),
        ("score", pa.float64()),
    ]
)


def hard_negative_mining(
    emb_ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    round_decimals: int = 4,
    broadcast_max_bytes: int = 1 << 30,
    n_lists: int = 32,
    n_probe: int | None = None,
    num_partitions: int = 32,
):
    """Contrastive hard-negative mining: for every vector, the single
    most-similar vector with a DIFFERENT label (cosine, rounded for
    cross-engine comparability; ties broken by smaller negative id).

    Size-gated two-regime shape (mirrors ``dedup._anti_drop_filter``):

    - **Broadcast regime** (corpus matrix measures ≤
      ``broadcast_max_bytes``): ids/labels/normalized matrix are
      gathered once, broadcast via ``ray.put``, and every streaming
      batch does one (B x N) matmul — nothing but the one-row-per-
      vector result moves. Exact.
    - **IVF regime** (above the gate): the driver never holds the
      corpus — only ``n_lists`` coarse centroids (seeded from the
      ``n_lists`` smallest-id vectors, same deterministic quantizer as
      :func:`knn_ivf`). Each vector ships once to its home list as a
      mining *candidate* and ``n_probe`` times as a *query* replica;
      one hash exchange on the list id co-locates them, each list
      mines locally (rounded cosine, same-label mask, smallest-id
      tie-break), and a second key exchange on ``id_col`` reduces the
      per-list winners to the global best per query. ``n_probe=None``
      probes every list — exact, A/B-tested against the broadcast
      regime; smaller ``n_probe`` trades recall for a ~``n_probe``/
      ``n_lists`` cut in exchange volume (IVF semantics: a negative
      outside every probed list is missed).

    Driver-held bytes for the chosen route are recorded in the lineage
    counters (``hardneg_driver_bytes_max``, ``hardneg_route_*``);
    ``tests/test_similarity.py`` asserts the bound on an above-gate
    corpus. Rows whose label matches every scored candidate (no valid
    negative) are dropped, like SQL's inner anti-label join.
    """
    from ..state import counters

    # measure, don't guess: corpus matrix bytes from count x dim x 8
    schema = emb_ds.schema()
    vec_type = schema.base_schema.field(vec_col).type
    if pa.types.is_fixed_size_list(vec_type):
        dim = vec_type.list_size
    else:
        first = emb_ds.take(1)
        dim = len(first[0][vec_col]) if first else 0
    n_rows = emb_ds.count()
    est_bytes = n_rows * (dim * 8 + 16)  # float64 matrix + id + label
    if est_bytes <= broadcast_max_bytes:
        counters.add("hardneg_route_broadcast", 1)
        return _hard_negatives_broadcast(
            emb_ds, vec_col, id_col, label_col, round_decimals, counters
        )
    counters.add("hardneg_route_ivf", 1)
    return _hard_negatives_ivf(
        emb_ds, vec_col, id_col, label_col, round_decimals,
        n_lists, n_probe, num_partitions, counters,
    )


def _hard_negatives_broadcast(
    emb_ds, vec_col, id_col, label_col, round_decimals, counters
):
    """Exact regime: one corpus broadcast, streaming batch matmuls."""
    mats, idl, labl = [], [], []
    for ref in emb_ds.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        mats.append(_normalize(_matrix(t, vec_col).astype(np.float64)))
        idl.append(t.column(id_col).to_numpy(zero_copy_only=False)
                   .astype(np.int64))
        labl.append(t.column(label_col).to_numpy(zero_copy_only=False)
                    .astype(np.int64))
    if not mats:
        return emb_ds.map_batches(
            lambda tbl: _HN_SCHEMA.empty_table(), batch_format="pyarrow"
        )
    mat = np.vstack(mats)
    ids = np.concatenate(idl)
    labs = np.concatenate(labl)
    o = np.argsort(ids)          # id-ascending columns: np.argmax's
    mat, ids, labs = mat[o], ids[o], labs[o]  # first-max = smallest id
    counters.set_max(
        "hardneg_driver_bytes", int(mat.nbytes + ids.nbytes + labs.nbytes)
    )
    corpus_ref = ray.put((ids, labs, mat))

    def _mine(tbl: pa.Table) -> pa.Table:
        cids, clabs, cmat = ray.get(corpus_ref)
        bmat = _normalize(_matrix(tbl, vec_col).astype(np.float64))
        bids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        blabs = tbl.column(label_col).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        scores = np.round(bmat @ cmat.T, round_decimals)
        scores[blabs[:, None] == clabs[None, :]] = -2.0
        j = np.argmax(scores, axis=1)
        best = scores[np.arange(len(bids)), j]
        keep = best > -2.0
        return pa.table(
            {
                "vec_id": pa.array(bids[keep].astype(np.int64)),
                "neg_id": pa.array(cids[j[keep]]),
                "score": pa.array(best[keep]),
            }
        )

    return emb_ds.map_batches(_mine, batch_format="pyarrow")


def _hard_negatives_ivf(
    emb_ds, vec_col, id_col, label_col, round_decimals,
    n_lists, n_probe, num_partitions, counters,
):
    """Scale regime: mine within IVF coarse lists on the hash
    exchange; the driver holds only the ``n_lists x d`` centroids."""
    from .exchange import hash_exchange, hash_grouped_map

    # deterministic coarse quantizer: the n_lists smallest-id vectors
    # (knn_ivf's seed) — per-batch partial keeps the gather bounded by
    # n_lists x blocks, never corpus-proportional
    def _seed(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy()
        if len(ids) > n_lists:
            keep = np.zeros(len(ids), dtype=bool)
            keep[np.argpartition(ids, n_lists)[:n_lists]] = True
            return tbl.filter(pa.array(keep)).select([id_col, vec_col])
        return tbl.select([id_col, vec_col])

    cand = pa.concat_tables(
        list(
            emb_ds.map_batches(
                _seed, batch_format="pyarrow"
            ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
    )
    if cand.num_rows == 0:
        return rd_from_empty(_HN_SCHEMA)
    order = np.argsort(cand.column(id_col).to_numpy())[:n_lists]
    centroids = _normalize(
        _matrix(cand.take(pa.array(order)), vec_col).astype(np.float64)
    )
    counters.set_max("hardneg_driver_bytes", int(centroids.nbytes))
    c_ref = ray.put(centroids)
    L = centroids.shape[0]
    probes = L if n_probe is None else min(n_probe, L)
    dim = centroids.shape[1]

    def _fsl(m: np.ndarray) -> pa.Array:
        return pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(m).ravel(), type=pa.float64()),
            m.shape[1],
        )

    # one pass emits BOTH sides of the list-local join: each vector
    # once to its home list (role 0, candidate) and `probes` times to
    # its probed lists (role 1, query) — home is top-1 ⊆ top-probes,
    # so every vector meets at least its own list's candidates
    def _explode(tbl: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        m = _normalize(_matrix(tbl, vec_col).astype(np.float64))
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        labs = tbl.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(ids)
        sims = m @ C.T  # (n, L)
        home = np.argmax(sims, axis=1).astype(np.int64)
        if probes >= L:
            probe = np.tile(np.arange(L, dtype=np.int64), (n, 1))
        else:
            probe = np.argpartition(-sims, probes - 1, axis=1)[:, :probes]
            probe = probe.astype(np.int64)
        lists = np.concatenate([home, probe.ravel()])
        role = np.concatenate(
            [np.zeros(n, np.int8), np.ones(n * probes, np.int8)]
        )
        rep_ids = np.concatenate([ids, np.repeat(ids, probes)])
        rep_labs = np.concatenate([labs, np.repeat(labs, probes)])
        rep_m = np.concatenate([m, np.repeat(m, probes, axis=0)])
        return pa.table(
            {
                "list": pa.array(lists),
                "role": pa.array(role),
                id_col: pa.array(rep_ids),
                label_col: pa.array(rep_labs),
                "nvec": _fsl(rep_m),
            }
        )

    exploded = emb_ds.map_batches(_explode, batch_format="pyarrow")

    def _mine_list(g: pa.Table) -> pa.Table:
        role = g.column("role").to_numpy()
        ids = g.column(id_col).to_numpy()
        labs = g.column(label_col).to_numpy()
        flat = g.column("nvec").combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        m = flat.reshape(g.num_rows, dim)
        cmask = role == 0
        qmask = ~cmask
        if not cmask.any() or not qmask.any():
            return _HN_SCHEMA.empty_table()
        cid, clab, cm = ids[cmask], labs[cmask], m[cmask]
        qid, qlab, qm = ids[qmask], labs[qmask], m[qmask]
        o = np.argsort(cid)  # id-ascending: first-max = smallest id
        cid, clab, cm = cid[o], clab[o], cm[o]
        scores = np.round(qm @ cm.T, round_decimals)
        scores[qlab[:, None] == clab[None, :]] = -2.0
        j = np.argmax(scores, axis=1)
        best = scores[np.arange(len(qid)), j]
        keep = best > -2.0
        return pa.table(
            {
                "vec_id": pa.array(qid[keep]),
                "neg_id": pa.array(cid[j[keep]]),
                "score": pa.array(best[keep]),
            }
        )

    per_list = hash_grouped_map(
        exploded, "list", _mine_list,
        num_partitions=min(num_partitions, max(1, L)),
        empty_schema=_HN_SCHEMA,
    )

    # global best per query across its probed lists: one key exchange,
    # vectorized keep-first per partition (score desc, neg_id asc)
    def _best(p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _HN_SCHEMA.empty_table()
        vid = tbl.column("vec_id").to_numpy()
        nid = tbl.column("neg_id").to_numpy()
        sc = tbl.column("score").to_numpy()
        order = np.lexsort((nid, -sc, vid))
        vs = vid[order]
        first = np.ones(len(vs), dtype=bool)
        first[1:] = vs[1:] != vs[:-1]
        return tbl.take(pa.array(order[first]))

    return hash_exchange(
        per_list, "vec_id", num_partitions, _best, empty_schema=_HN_SCHEMA
    )


def rd_from_empty(schema: pa.Schema):
    import ray.data as rd

    return rd.from_arrow(schema.empty_table())
