"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline: the query matrix is
broadcast once (ray.put), each batch does one numpy matmul against it
and emits per-batch partial top-k rows; a final small groupby reduces
partials to global top-k per query.  The IVF variant clusters vectors
into buckets (k-means on a sample, centroids broadcast) so each query
probes only its nearest buckets -- the 100TB path where a full matmul
per batch is no longer free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def as_matrix(arr, dtype=np.float64) -> np.ndarray:
    """2-D numpy view of an embedding column without the row-major
    ``to_pylist`` round trip.

    * ``fixed_size_list<float>`` -- flatten() is a zero-copy slice of
      the values buffer; one reshape (plus at most one dtype cast)
      yields the matrix.  The preferred storage type at scale.
    * ``list``/``large_list`` with uniform lengths (how parquet
      delivers fixed-dim embeddings) -- same flatten+reshape from the
      offsets, no Python objects anywhere.
    * ragged / null-bearing input -- falls back to the object path,
      which raises the same numpy error a ragged matrix always did.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if arr.null_count == 0 and pa.types.is_fixed_size_list(t):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(dtype, copy=False).reshape(
            len(arr), t.list_size
        )
    if arr.null_count == 0 and (
        pa.types.is_list(t) or pa.types.is_large_list(t)
    ):
        off = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(off)
        if len(widths) == 0:
            return np.zeros((0, 0), dtype=dtype)
        if (widths == widths[0]).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(dtype, copy=False).reshape(
                len(arr), int(widths[0])
            )
    return np.array(arr.to_pylist(), dtype=dtype)


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    return as_matrix(batch.column(col), dtype=np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """Per-batch cosine top-k partials (task-pool map_batches; the
    broadcast query matrix deserializes once per worker process via
    the module cache -- the task equivalent of actor __init__ state
    without cold actor spin-up)."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        from .dedup import _cached_get

        q_ids, q_mat = (
            _cached_get(queries_ref)
            if not isinstance(queries_ref, tuple)
            else queries_ref
        )
        self.q_ids = q_ids
        self.q = _normalize(np.asarray(q_mat, dtype=np.float32))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_batch_matrix(batch, self.vec_col))
        ids = (
            batch.column(self.id_col)
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        sims = self.q @ vecs.T  # (n_query, n_batch)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for col in part[qi]:
                out_q.append(self.q_ids[qi])
                out_v.append(int(ids[col]))
                out_s.append(float(sims[qi, col]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def _brute_topk_batch(batch, queries_ref, k, vec_col, id_col):
    return BruteForceTopK(queries_ref, k, vec_col, id_col)(batch)


def _ivf_assign_batch(batch, cent_ref, vec_col, id_col):
    return IVFAssign(cent_ref, vec_col, id_col)(batch)


def knn_bruteforce(ds, queries, k=10, vec_col="embedding", id_col="vec_id"):
    """Global top-k per query.  ``queries`` = (q_ids, q_matrix)."""
    import ray

    queries_ref = ray.put(queries)
    partials = ds.map_batches(
        _brute_topk_batch,
        fn_kwargs={"queries_ref": queries_ref, "k": k,
                   "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow",
    )

    def reduce_topk(tbl: pa.Table) -> pa.Table:
        tbl = tbl.sort_by(
            [("cosine", "descending"), ("vec_id", "ascending")]
        )
        return tbl.slice(0, k)

    return partials.groupby("query_id").map_groups(
        reduce_topk, batch_format="pyarrow"
    )


def kmeans_centroids(ds, n_clusters=16, vec_col="embedding", sample=4096, iters=10, seed=0):
    """Small k-means on a driver-side sample; returns centroid matrix."""
    rows = ds.limit(sample).select_columns([vec_col]).take_all()
    m = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float32))
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_clusters, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                cent[c] = m[mask].mean(axis=0)
        cent = _normalize(cent)
    return cent


class IVFAssign:
    """Assign each vector to its nearest centroid bucket."""

    def __init__(self, cent_ref, vec_col, id_col):
        from .dedup import _cached_get

        self.cent = (
            cent_ref
            if isinstance(cent_ref, np.ndarray)
            else _cached_get(cent_ref)
        )
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_batch_matrix(batch, self.vec_col))
        assign = np.argmax(vecs @ self.cent.T, axis=1)
        return batch.append_column(
            "ivf_bucket", pa.array(assign.astype("int32"), pa.int32())
        )


def knn_ivf(ds, queries, k=10, n_clusters=16, n_probe=4, vec_col="embedding", id_col="vec_id"):
    """IVF-bucketed ANN: probe only the n_probe nearest buckets per query.

    In-memory variant: every vector is still read and then filtered to
    the probed buckets -- compute pruning without scan pruning.  For
    the at-scale path, build a bucket-partitioned index ONCE with
    :func:`ivf_build_index` and serve queries with
    :func:`knn_ivf_indexed`, which reads only the probed partitions
    from storage.
    """
    import ray

    cent = kmeans_centroids(ds, n_clusters=n_clusters, vec_col=vec_col)
    cent_ref = ray.put(cent)
    bucketed = ds.map_batches(
        _ivf_assign_batch,
        fn_kwargs={"cent_ref": cent_ref, "vec_col": vec_col,
                   "id_col": id_col},
        batch_format="pyarrow",
    )
    q_ids, q_mat = queries
    qn = _normalize(np.asarray(q_mat, dtype=np.float32))
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    wanted = pa.array(sorted(set(int(b) for row in probe for b in row)), pa.int32())

    def keep_probed(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.is_in(b.column("ivf_bucket"), value_set=wanted))

    filtered = bucketed.map_batches(keep_probed, batch_format="pyarrow")
    return knn_bruteforce(
        filtered, queries, k=k, vec_col=vec_col, id_col=id_col
    )


def ivf_build_index(
    ds, index_path, n_clusters=16, vec_col="embedding", id_col="vec_id"
):
    """Build a bucket-partitioned IVF index on storage: k-means on a
    bounded sample, assign every vector to its nearest centroid, write
    Parquet partitioned by ``ivf_bucket`` (one directory per bucket),
    and store the centroid matrix alongside.  Queries then read ONLY
    their probed buckets' files -- scan pruning, not just compute
    pruning.  Returns the centroid matrix."""
    import os

    import pyarrow.parquet as pq
    import ray

    cent = kmeans_centroids(ds, n_clusters=n_clusters, vec_col=vec_col)
    cent_ref = ray.put(cent)
    bucketed = ds.map_batches(
        _ivf_assign_batch,
        fn_kwargs={"cent_ref": cent_ref, "vec_col": vec_col,
                   "id_col": id_col},
        batch_format="pyarrow",
    )
    bucketed.write_parquet(index_path, partition_cols=["ivf_bucket"])
    cent_tbl = pa.table(
        {
            "bucket": pa.array(range(len(cent)), pa.int32()),
            "centroid": pa.array([[float(x) for x in c] for c in cent]),
        }
    )
    pq.write_table(cent_tbl, os.path.join(index_path, "_centroids.parquet"))
    return cent


def knn_ivf_indexed(
    index_path, queries, k=10, n_probe=4, vec_col="embedding", id_col="vec_id"
):
    """ANN over a bucket-partitioned IVF index: load the centroids,
    pick each query's ``n_probe`` nearest buckets, and read ONLY those
    partitions' Parquet files before the brute-force top-k reduce.
    The unprobed buckets never leave storage."""
    import glob as _g
    import os

    import pyarrow.parquet as pq
    import ray.data

    cent_tbl = pq.read_table(os.path.join(index_path, "_centroids.parquet"))
    cent = _normalize(
        np.array(cent_tbl.column("centroid").to_pylist(), dtype=np.float32)
    )
    q_ids, q_mat = queries
    qn = _normalize(np.asarray(q_mat, dtype=np.float32))
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    wanted = sorted(set(int(b) for row in probe for b in row))
    files = [
        f
        for b in wanted
        for f in sorted(
            _g.glob(os.path.join(index_path, f"ivf_bucket={b}", "*.parquet"))
        )
    ]
    ds = ray.data.read_parquet(files, columns=[id_col, vec_col])
    return knn_bruteforce(ds, queries, k=k, vec_col=vec_col, id_col=id_col)


def kmeans_clusters(ds, k: int = 8, n_assign: int = 2, vec_col="embedding",
                    id_col="vec_id", keep_vec: bool = False):
    """Lloyd's k-means over an embedding column with DETERMINISTIC
    seeding: the initial centroids are the vectors of the ``k``
    smallest ids, and ``n_assign`` assignment rounds run with one
    centroid update between consecutive rounds (``n_assign=2`` =
    assign, update, assign).  Returns one ``(vec_id, cluster)`` row
    per vector; cluster ids are 0..k-1 in seed-id order.  Ties in the
    squared-euclidean argmin break toward the lower cluster id, and an
    emptied cluster keeps its previous centroid -- both choices are
    mirrored exactly by the SQL oracle.

    Scale shape: the corpus never shuffles.  Seeding is a per-block
    min-k partial + driver fold (k rows per block); each iteration
    broadcasts the k x dim centroid matrix (``ray.put``), every batch
    computes one matmul argmin and emits k partial-sum rows, and the
    driver folds blocks x k tiny rows into the next centroids; the
    final pass is one stateless assignment map."""
    import ray

    from .dedup import _cached_get

    def f64_matrix(b: pa.Table) -> np.ndarray:
        # float64 straight from the Arrow list column -- the float32
        # roundtrip in _batch_matrix would diverge from the oracle's
        # DOUBLE[] arithmetic; list<double> storage makes this a pure
        # flatten+reshape view (no element copy at all)
        return as_matrix(b.column(vec_col), dtype=np.float64)

    def argmin_d2(mat: np.ndarray, c: np.ndarray) -> np.ndarray:
        # direct (x-c)^2 form, matching the oracle's list_distance
        # element-wise subtraction (the |x|^2-2xc+|c|^2 expansion has
        # larger rounding error and can flip near-ties)
        d2 = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(d2, axis=1)

    def local_seed(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(b, sort_keys=[(id_col, "ascending")])
        return b.take(idx[:k]).select([id_col, vec_col])

    seed_rows = []
    for tbl in ds.map_batches(
        local_seed, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        seed_rows.extend(
            zip(tbl.column(id_col).to_pylist(), tbl.column(vec_col).to_pylist())
        )
    seed_rows.sort(key=lambda r: r[0])
    cents = np.asarray([v for _, v in seed_rows[:k]], dtype=np.float64)

    def partial_sums_fn(cent_ref):
        def partial_sums(b: pa.Table) -> pa.Table:
            c = _cached_get(cent_ref)
            mat = f64_matrix(b)
            assign = argmin_d2(mat, c)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=c.shape[0])
            return pa.table(
                {
                    "cluster": pa.array(range(c.shape[0]), pa.int64()),
                    "n": pa.array(counts, pa.int64()),
                    "vsum": pa.array([list(map(float, r)) for r in sums]),
                }
            )

        return partial_sums

    for _ in range(n_assign - 1):
        cent_ref = ray.put(cents)
        sums = np.zeros_like(cents)
        counts = np.zeros(k, dtype=np.int64)
        for tbl in ds.map_batches(
            partial_sums_fn(cent_ref), batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            # Ray may concatenate several per-block partials into one
            # batch, so cluster ids repeat -- fancy-index += would drop
            # duplicates; np.add.at accumulates them all
            cl = np.asarray(tbl.column("cluster").to_pylist())
            np.add.at(counts, cl, np.asarray(tbl.column("n").to_pylist()))
            np.add.at(sums, cl, np.asarray(tbl.column("vsum").to_pylist()))
        nonempty = counts > 0
        cents = cents.copy()
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]

    final_ref = ray.put(cents)

    def assign_batch(b: pa.Table) -> pa.Table:
        c = _cached_get(final_ref)
        mat = f64_matrix(b)
        ids = b.column(id_col).cast(pa.int64())
        cols = {
            "vec_id": ids,
            "cluster": pa.array(
                argmin_d2(mat, c).astype(np.int64), pa.int64()
            ),
        }
        if keep_vec:
            # downstream within-cluster stages (semdedup) need the
            # vector co-located with its assignment
            cols[vec_col] = b.column(vec_col)
        return pa.table(cols)

    return ds.map_batches(assign_batch, batch_format="pyarrow")


def semdedup(ds, k: int = 8, n_assign: int = 2, tau: float = 0.9,
             vec_col="embedding", id_col="vec_id"):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the embeddings with the deterministic distributed k-means
    above, then inside each cluster drop every vector that has a
    SMALLER-id neighbor at cosine similarity >= ``tau``.  Returns one
    ``(vec_id, cluster, keep)`` row per vector -- the kept set is the
    deterministic per-cluster representative frontier.

    Scale shape: clustering never shuffles the corpus (broadcast
    centroids + per-block partial sums); the single shuffle is the
    cluster groupby, whose dispatch is bounded by ``k``.  The
    within-cluster check is one normalized matmul -- O(m^2) per
    cluster of size m, which is SemDeDup's own cost model: ``k`` must
    grow with the corpus so clusters stay bounded (the paper runs 50k
    clusters); at 100 TB you would also cap/shard oversized clusters.
    Cosine runs in float64 on both sides, so with any ``tau`` sitting
    in a gap of the similarity distribution the SQL oracle
    (``list_cosine_similarity``) matches decision-for-decision.
    """

    def prune(tbl: pa.Table) -> pa.Table:
        tbl = tbl.sort_by([(id_col, "ascending")])
        ids = tbl.column(id_col)
        mat = as_matrix(tbl.column(vec_col), dtype=np.float64)
        norm = np.linalg.norm(mat, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        mn = mat / norm
        sims = mn @ mn.T
        # removed_i = exists j < i (ids ascending) with cos >= tau
        removed = np.tril(sims >= tau, -1).any(axis=1)
        return pa.table(
            {
                id_col: ids,
                "cluster": tbl.column("cluster"),
                "keep": pa.array(~removed, pa.bool_()),
            }
        )

    assigned = kmeans_clusters(
        ds, k=k, n_assign=n_assign, vec_col=vec_col, id_col=id_col,
        keep_vec=True,
    )
    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pyarrow"
    )


def knn_graph(
    ds,
    k: int = 5,
    scale: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_broadcast_rows: int = 2_000_000,
):
    """Exact k-nearest-neighbor GRAPH by quantized inner product: for
    every vector, its top-``k`` neighbors (self excluded) ranked by
    the dot product of ``floor(e * scale)`` integer embeddings, ties
    by neighbor id.  The construction step of kNN-graph clustering /
    graph-based dedup, and the corpus-vs-corpus sibling of
    ``knn_bruteforce``'s query-vs-corpus top-k.

    Quantization is the exactness trick: every pairwise product and
    64-term sum stays below 2^53, so float64 matmul is EXACT and
    order-independent -- an SQL mirror over the same quantized lists
    (``list_dot_product``) is bit-identical, with no float-summation-
    order caveat.

    Scale shape: the quantized corpus matrix is ``ray.put`` ONCE and
    each block computes its rows' scores against it vectorized --
    identical contract to ``knn_bruteforce``'s broadcast (fits-in-
    worker-memory assumption, ~2 bytes/dim/row at int16 scale); above
    that, ``knn_ivf``'s bucketed variant is the scale path and this
    operator is its exact small-corpus baseline.  The broadcast is
    GUARDED: a corpus over ``max_broadcast_rows`` raises (with the
    row count) instead of silently OOMing the driver -- switch to
    ``knn_ivf`` / ``embedding_near_dups`` above the cap, exactly the
    rank family's cardinality-cap contract.
    """
    import ray

    n_rows = ds.count()  # metadata-cheap on parquet reads
    if n_rows > max_broadcast_rows:
        raise ValueError(
            f"knn_graph: corpus has {n_rows} rows > max_broadcast_rows"
            f"={max_broadcast_rows}; the exact graph broadcasts the "
            "whole quantized corpus -- use knn_ivf for large corpora "
            "or raise the cap if workers have the memory"
        )
    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    m = np.floor(
        np.array([r[vec_col] for r in rows], dtype=np.float64) * scale
    )
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    corpus_ref = ray.put((ids, m))

    def block_topk(b: pa.Table) -> pa.Table:
        from .dedup import _cached_get

        c_ids, c_m = _cached_get(corpus_ref)
        q = np.floor(as_matrix(b.column(vec_col)) * scale)
        q_ids = b.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n, c = len(q_ids), len(c_ids)
        if n == 0 or c == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "dot": pa.array([], pa.float64()),
                }
            )
        scores = q @ c_m.T  # exact: integer-valued floats < 2^53
        # self-exclusion: corpus ids are sorted, locate each query row
        pos = np.searchsorted(c_ids, q_ids)
        has_self = (pos < c) & (c_ids[np.minimum(pos, c - 1)] == q_ids)
        scores[np.flatnonzero(has_self), pos[has_self]] = -np.inf
        # top-k by (score desc, neighbor id asc): corpus columns are
        # already id-ascending, so a STABLE argsort of -score breaks
        # ties by id -- fully vectorized, no per-row Python
        kk = min(k, c)
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
        dst = c_ids[idx]
        dot = np.take_along_axis(scores, idx, axis=1)
        keep = np.isfinite(dot).ravel()  # drop self-only padding rows
        return pa.table(
            {
                id_col: pa.array(
                    np.repeat(q_ids, kk)[keep], pa.int64()
                ),
                "neighbor_id": pa.array(dst.ravel()[keep], pa.int64()),
                "dot": pa.array(dot.ravel()[keep], pa.float64()),
            }
        )

    return ds.map_batches(block_topk, batch_format="pyarrow")


def class_centroids(
    ds,
    scale: int = 1000,
    vec_col: str = "embedding",
    label_col: str = "label",
):
    """Per-class embedding centroid from EXACT integer sums: quantize
    ``floor(e * scale)``, sum per (label, dimension) -- associative-
    exact BIGINTs -- and finish with one IEEE division per cell.  The
    distributed skeleton of a nearest-class-mean classifier / cluster
    summary, with none of the float-summation order-dependence that
    makes naive distributed mean-pooling irreproducible.

    Scale shape: one ``np.add.at`` segmented sum per block reduces to
    (labels-in-block x dims) partial rows before the single Ray
    groupby-sum; the corpus never shuffles and nothing is collected.
    Output: one row per (label, dim 1..D) with n_obs, sum_q and the
    mean -- pivot driver-side if a matrix is wanted (labels x dims is
    the operator's own output bound).
    """
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        m = np.floor(as_matrix(b.column(vec_col)) * scale)
        labels = b.column(label_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if len(labels) == 0 or m.size == 0:
            return pa.table(
                {
                    label_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "s_part": pa.array([], pa.int64()),
                    "n_part": pa.array([], pa.int64()),
                }
            )
        d = m.shape[1]
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(uniq))
        return pa.table(
            {
                label_col: pa.array(
                    np.repeat(uniq, d), pa.int64()
                ),
                "dim": pa.array(
                    np.tile(np.arange(1, d + 1, dtype=np.int64),
                            len(uniq)),
                    pa.int64(),
                ),
                "s_part": pa.array(
                    sums.ravel().astype(np.int64), pa.int64()
                ),
                "n_part": pa.array(
                    np.repeat(counts.astype(np.int64), d), pa.int64()
                ),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        s = b.column("sum(s_part)").to_numpy(zero_copy_only=False)
        n = b.column("sum(n_part)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                label_col: b.column(label_col),
                "dim": b.column("dim"),
                "n_obs": pa.array(n.astype(np.int64), pa.int64()),
                "sum_q": pa.array(s.astype(np.int64), pa.int64()),
                "mean_q": pa.array(
                    s.astype(np.float64) / n.astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby([label_col, "dim"])
        .aggregate(Sum("s_part"), Sum("n_part"))
        .map_batches(finish, batch_format="pyarrow")
    )


def mmr_select(
    ds,
    query_id: int = 0,
    k: int = 10,
    lam: float = 0.7,
    mu: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Maximal Marginal Relevance selection (Carbonell & Goldstein
    1998): greedily pick ``k`` vectors maximizing

        score(d) = lam * cos(d, q) - mu * max_{s in selected} cos(d, s)

    -- the diversity-aware retrieval cut used to de-redundify RAG
    contexts and training-data subsets (plain top-k by cos(d, q)
    returns k near-copies of the best hit; MMR penalizes each
    candidate by its similarity to what is already chosen).  The
    query is the corpus vector with id ``query_id``; ties break to
    the smaller id; the query itself is eligible (it wins step 1 with
    cos = 1, matching the SQL mirror).

    Scale shape: one tiny filtered take fetches the query vector; each
    of the k steps broadcasts the (<= k x dim) selected matrix via
    ``ray.put`` and streams ONE map_batches pass that emits a single
    per-block argmax row (cosines are one matmul per block), so the
    corpus never shuffles and never materializes -- k streaming
    passes total, the iterative-refinement contract shared with
    ``kmeans_clusters``.  Returns (rnk, vec_id) only: selection is
    integer-exact; scores stay internal so float formatting can't
    perturb the contract.
    """
    import math

    import ray

    from .dedup import _cached_get

    def pick(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_valid(b.column(id_col)),
            pc.is_valid(b.column(vec_col)),
        )
        t = b.filter(m)
        return t.filter(
            pc.equal(
                t.column(id_col).cast(pa.int64()),
                pa.scalar(int(query_id), pa.int64()),
            )
        ).select([vec_col])

    qrows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    if not qrows:
        raise ValueError(f"mmr_select: no vector with id {query_id}")
    qv = np.asarray(qrows[0][vec_col], dtype=np.float64)
    qn = math.sqrt(float(np.dot(qv, qv)))

    selected: list = []
    for _ in range(k):
        sel_ids = np.array([i for i, _ in selected], np.int64)
        sel_mat = (
            np.stack([v for _, v in selected])
            if selected
            else np.zeros((0, len(qv)), np.float64)
        )
        ref = ray.put((sel_ids, sel_mat, qv, qn))

        def best(b: pa.Table, _ref=ref) -> pa.Table:
            empty = pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "vec": pa.array(
                        [], pa.list_(pa.float64())
                    ),
                }
            )
            s_ids, s_mat, q, q_norm = _cached_get(_ref)
            t = b.filter(
                pc.and_(
                    pc.is_valid(b.column(id_col)),
                    pc.is_valid(b.column(vec_col)),
                )
            )
            if t.num_rows == 0:
                return empty
            ids = t.column(id_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            mat = as_matrix(t.column(vec_col), dtype=np.float64)
            keep = ~np.isin(ids, s_ids)
            if not keep.any():
                return empty
            ids, mat = ids[keep], mat[keep]
            norms = np.sqrt((mat * mat).sum(axis=1))
            simq = (mat @ q) / (norms * q_norm)
            if len(s_ids):
                sn = np.sqrt((s_mat * s_mat).sum(axis=1))
                sims = (mat @ s_mat.T) / (
                    norms[:, None] * sn[None, :]
                )
                pen = sims.max(axis=1)
            else:
                pen = np.zeros(len(ids), np.float64)
            score = lam * simq - mu * pen
            j = int(np.lexsort((ids, -score))[0])
            return pa.table(
                {
                    "vec_id": pa.array([ids[j]], pa.int64()),
                    "score": pa.array(
                        [float(score[j])], pa.float64()
                    ),
                    "vec": pa.array(
                        [mat[j].tolist()], pa.list_(pa.float64())
                    ),
                }
            )

        cands = ds.map_batches(best, batch_format="pyarrow").take_all()
        if not cands:
            break
        win = max(cands, key=lambda r: (r["score"], -int(r["vec_id"])))
        selected.append(
            (int(win["vec_id"]), np.asarray(win["vec"], np.float64))
        )
    return pa.table(
        {
            "rnk": pa.array(
                range(1, len(selected) + 1), pa.int64()
            ),
            "vec_id": pa.array(
                [i for i, _ in selected], pa.int64()
            ),
        }
    )


def mmr_oracle_sql(
    query_id: int = 0,
    k: int = 10,
    lam: float = 0.7,
    mu: float = 0.3,
) -> str:
    """Iteration-unrolled SQL mirror of ``mmr_select`` (the
    ``kmeans`` oracle pattern): step i's CTE re-scores every not-yet-
    selected vector against the i-1 previous picks via
    ``list_cosine_similarity`` + ``greatest`` and keeps the (score
    DESC, vec_id ASC) head.  Generated from the same parameters as
    the engine call, so the two can never drift."""
    ctes = [
        # MATERIALIZED: DuckDB would otherwise inline sq into every
        # unrolled step and re-open the parquet once per reference
        "emb AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] "
        "AS v FROM embeddings WHERE vec_id IS NOT NULL AND "
        "embedding IS NOT NULL)",
        f"q AS (SELECT v FROM emb WHERE vec_id = {int(query_id)})",
        "sq AS MATERIALIZED (SELECT e.vec_id, e.v, "
        "list_cosine_similarity(e.v, (SELECT v FROM q)) AS simq "
        "FROM emb e)",
    ]
    for i in range(1, k + 1):
        if i == 1:
            pen = "0.0"
            excl = ""
        else:
            sims = ", ".join(
                f"list_cosine_similarity(sq.v, (SELECT v FROM s{j}))"
                for j in range(1, i)
            )
            pen = f"greatest({sims})"
            ids = " UNION ALL ".join(
                f"SELECT vec_id FROM s{j}" for j in range(1, i)
            )
            excl = f"WHERE vec_id NOT IN ({ids}) "
        ctes.append(
            # each step MATERIALIZED too: later steps reference it
            # several times (greatest + NOT IN) and plain CTEs inline
            # exponentially across the unroll
            f"s{i} AS MATERIALIZED (SELECT vec_id, v, {lam} * simq "
            f"- {mu} * {pen} AS score FROM sq {excl}"
            "ORDER BY score DESC, vec_id ASC LIMIT 1)"
        )
    heads = " UNION ALL ".join(
        f"SELECT {i} AS rnk, vec_id FROM s{i}" for i in range(1, k + 1)
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT CAST(rnk AS BIGINT) AS rnk, vec_id FROM ({heads})"
    )


def dbscan_embeddings(
    ds,
    eps_cos: float = 0.9,
    min_pts: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_limit: int = 2_000_000,
):
    """Deterministic DBSCAN over the embedding corpus with a cosine
    neighborhood (sim >= ``eps_cos``): the density-clustering family
    ``kmeans_clusters`` cannot express -- clusters of arbitrary shape,
    an explicit noise class, and no k to pick.  A point is CORE when
    its neighborhood (incl. itself) holds >= ``min_pts`` points;
    clusters are the connected components of the core-core neighbor
    graph (labelled by their minimum core id); non-core points with a
    core neighbor are BORDER (attached to the smallest core
    neighbor's cluster -- the deterministic tie rule); the rest is
    NOISE.

    Scale shape: the neighbor graph comes from
    :func:`~.dedup.embedding_near_dups` (IVF multi-probe buckets,
    exact at near-dup cosine levels per its recall contract), so the
    edge list is O(neighbor pairs), minuscule next to the corpus.
    Below ``pair_limit`` edges the whole graph is folded once on the
    driver (union-by-min over cores, one pass for borders) and the
    id -> (role, cluster) map is broadcast via ``ray.put``; the
    corpus then streams through one stateless lookup ``map_batches``
    -- the ``dup_cluster_labels`` small-graph pattern.  Above the
    limit, raise: chain ``connected_components`` on the core-core
    edges instead (the distributed path), documented rather than
    silently slow.
    """
    import ray

    from .dedup import embedding_near_dups

    edges_ds = (
        embedding_near_dups(
            ds, threshold=eps_cos, vec_col=vec_col, id_col=id_col
        )
        .select_columns(["doc_a", "doc_b"])
        .materialize()
    )
    if edges_ds.count() > pair_limit:
        raise ValueError(
            "dbscan_embeddings: neighbor graph exceeds "
            f"pair_limit={pair_limit}; run connected_components on "
            "the core-core edges instead"
        )
    edges = [
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in edges_ds.take_all()
    ]
    deg: dict = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    core = {v for v, d in deg.items() if d >= min_pts - 1}

    parent: dict = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        if a in core and b in core:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    cluster = {v: find(v) for v in core}
    border: dict = {}
    for a, b in edges:
        if a in core and b not in core:
            lab = cluster[find(a)]
            if b not in border or lab < border[b]:
                border[b] = lab
        elif b in core and a not in core:
            lab = cluster[find(b)]
            if a not in border or lab < border[a]:
                border[a] = lab
    tagged = sorted(
        [(v, 0, cluster[v]) for v in core]
        + [(v, 1, lab) for v, lab in border.items()]
    )
    map_ids = np.array([t[0] for t in tagged], np.int64)
    map_role = np.array([t[1] for t in tagged], np.int8)
    map_lab = np.array([t[2] for t in tagged], np.int64)
    handle = ray.put((map_ids, map_role, map_lab))
    role_names = pa.array(["core", "border", "noise"], pa.string())

    def tag(b: pa.Table) -> pa.Table:
        mi, mr, ml = ray.get(handle)
        ids = (
            b.column(id_col)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        pos = (
            np.searchsorted(mi, ids)
            if len(mi)
            else np.zeros(len(ids), np.int64)
        )
        pos = np.clip(pos, 0, max(len(mi) - 1, 0))
        hit = (
            mi[pos] == ids
            if len(mi)
            else np.zeros(len(ids), bool)
        )
        role_idx = np.where(hit, mr[pos] if len(mi) else 0, 2)
        labels = pa.array(
            np.where(hit, ml[pos] if len(mi) else 0, 0), pa.int64()
        )
        labels = pc.if_else(
            pa.array(hit, pa.bool_()), labels, pa.scalar(None, pa.int64())
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "role": pc.take(
                    role_names,
                    pa.array(role_idx.astype(np.int64), pa.int64()),
                ),
                "cluster_id": labels,
            }
        )

    return ds.select_columns([id_col]).map_batches(
        tag, batch_format="pyarrow"
    )


def hard_negatives(
    ds,
    n_anchors: int = 5,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
):
    """Contrastive hard-negative mining: for each anchor vector (the
    ``n_anchors`` smallest ids), the ``k`` most cosine-similar
    vectors carrying a DIFFERENT label -- the "closest wrong
    answers" a contrastive training run pairs with its positives,
    which plain kNN cannot produce (it returns the same-label
    near-duplicates first).

    Same shape and float discipline as :func:`knn_bruteforce`: the
    tiny anchor (id, matrix, label) triple broadcasts once via
    ``ray.put``; each batch computes the anchor x batch cosine
    block, masks same-label columns to -inf, and emits per-anchor
    local top-k candidate partials; one small ``groupby(anchor)``
    sorts (cosine DESC, id ASC) and cuts to k.  The corpus streams;
    nothing materializes.
    """
    import ray

    def is_anchor(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.less(
                b.column(id_col).cast(pa.int64()),
                pa.scalar(n_anchors, pa.int64()),
            )
        )

    rows = sorted(
        ds.map_batches(is_anchor, batch_format="pyarrow").take_all(),
        key=lambda r: int(r[id_col]),
    )
    a_ids = np.array([int(r[id_col]) for r in rows], np.int64)
    a_mat = _normalize(
        np.array([r[vec_col] for r in rows], np.float32)
    )
    a_labels = np.array([str(r[label_col]) for r in rows], object)
    handle = ray.put((a_ids, a_mat, a_labels))

    def partial(batch: pa.Table) -> pa.Table:
        ids_a, q, labs = ray.get(handle)
        vecs = _normalize(_batch_matrix(batch, vec_col))
        ids = (
            batch.column(id_col)
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        blabs = np.array(
            [str(x) for x in batch.column(label_col).to_pylist()],
            object,
        )
        sims = q @ vecs.T
        sims[labs[:, None] == blabs[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out_a, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for col in part[qi]:
                if np.isfinite(sims[qi, col]):
                    out_a.append(int(ids_a[qi]))
                    out_v.append(int(ids[col]))
                    out_s.append(float(sims[qi, col]))
        return pa.table(
            {
                "anchor": pa.array(out_a, pa.int64()),
                "neg": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def reduce_topk(tbl: pa.Table) -> pa.Table:
        tbl = tbl.sort_by(
            [("cosine", "descending"), ("neg", "ascending")]
        )
        return tbl.slice(0, k)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("anchor")
        .map_groups(reduce_topk, batch_format="pyarrow")
    )


def kcenter_select(
    ds,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Greedy k-center coreset selection (farthest-point traversal):
    start from the smallest id, then repeatedly add the vector whose
    best cosine similarity to the already-selected set is LOWEST --
    the 2-approximation coverage subset used to pick maximally
    spread training/eval exemplars, where ``mmr_select`` trades
    coverage against a query and plain top-k collapses to one dense
    region.

    Ties break to the smaller id; selection is integer-exact
    (scores stay internal, the ``mmr_select`` contract).  Scale
    shape: identical to MMR -- each of the k steps broadcasts the
    (<= k x dim) selected matrix and streams one per-block argmin
    pass; the corpus never shuffles, k streaming passes total.
    """
    import ray

    from .dedup import _cached_get

    selected: list = []
    for step in range(k):
        sel_ids = np.array([i for i, _ in selected], np.int64)
        sel_mat = (
            np.stack([v for _, v in selected])
            if selected
            else None
        )
        ref = ray.put((sel_ids, sel_mat))

        def best(b: pa.Table, _ref=ref) -> pa.Table:
            empty = pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cover": pa.array([], pa.float64()),
                    "vec": pa.array([], pa.list_(pa.float64())),
                }
            )
            s_ids, s_mat, = _cached_get(_ref)
            t = b.filter(
                pc.and_(
                    pc.is_valid(b.column(id_col)),
                    pc.is_valid(b.column(vec_col)),
                )
            )
            if t.num_rows == 0:
                return empty
            ids = t.column(id_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            mat = as_matrix(t.column(vec_col), dtype=np.float64)
            keep = ~np.isin(ids, s_ids)
            if not keep.any():
                return empty
            ids, mat = ids[keep], mat[keep]
            if s_mat is None:
                # anchor step: smallest id, cover = -inf sentinel
                j = int(np.argmin(ids))
                cover = np.float64(-np.inf)
            else:
                norms = np.sqrt((mat * mat).sum(axis=1))
                sn = np.sqrt((s_mat * s_mat).sum(axis=1))
                sims = (mat @ s_mat.T) / (
                    norms[:, None] * sn[None, :]
                )
                cov = sims.max(axis=1)
                j = int(np.lexsort((ids, cov))[0])
                cover = cov[j]
            return pa.table(
                {
                    "vec_id": pa.array([ids[j]], pa.int64()),
                    "cover": pa.array(
                        [float(cover)], pa.float64()
                    ),
                    "vec": pa.array(
                        [mat[j].tolist()], pa.list_(pa.float64())
                    ),
                }
            )

        cands = ds.map_batches(best, batch_format="pyarrow").take_all()
        if not cands:
            break
        win = min(
            cands, key=lambda r: (r["cover"], int(r["vec_id"]))
        )
        selected.append(
            (int(win["vec_id"]), np.asarray(win["vec"], np.float64))
        )
    return pa.table(
        {
            "rnk": pa.array(range(1, len(selected) + 1), pa.int64()),
            "vec_id": pa.array(
                [i for i, _ in selected], pa.int64()
            ),
        }
    )


def kcenter_oracle_sql(k: int = 8) -> str:
    """Iteration-unrolled SQL mirror of ``kcenter_select`` (the
    ``mmr_oracle_sql`` pattern), generated from the same k so engine
    and oracle can never drift."""
    ctes = [
        "emb AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] "
        "AS v FROM embeddings WHERE vec_id IS NOT NULL AND "
        "embedding IS NOT NULL)",
        "s1 AS MATERIALIZED (SELECT vec_id, v FROM emb "
        "ORDER BY vec_id ASC LIMIT 1)",
    ]
    for i in range(2, k + 1):
        sims = ", ".join(
            f"list_cosine_similarity(e.v, (SELECT v FROM s{j}))"
            for j in range(1, i)
        )
        cover = f"greatest({sims})" if i > 2 else sims
        ids = " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(1, i)
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT vec_id, v FROM "
            f"(SELECT e.vec_id, e.v, {cover} AS cover FROM emb e "
            f"WHERE vec_id NOT IN ({ids})) "
            "ORDER BY cover ASC, vec_id ASC LIMIT 1)"
        )
    heads = " UNION ALL ".join(
        f"SELECT {i} AS rnk, vec_id FROM s{i}" for i in range(1, k + 1)
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT CAST(rnk AS BIGINT) AS rnk, vec_id FROM ({heads})"
    )
