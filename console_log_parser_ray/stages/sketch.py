"""Sketch-based operators: bounded-memory heavy hitters and
count-min point-frequency estimates.

``heavy_hitters`` finds every value of a column whose frequency
exceeds ``N / k`` EXACTLY, without ever shuffling the full
value-frequency table:

1. **Sketch pass** -- each block reduces to a Misra-Gries summary of
   at most ``2k`` (value, weight) counters.  An MG summary of
   capacity ``c`` underestimates any value's true in-block count by
   at most ``block_n / (c + 1)``, and the underestimates are additive
   across blocks: summing the per-block summaries gives merged
   weights ``w`` with ``true - N/(2k+1) <= w <= true``.
2. **Candidate selection** -- no further lossy reduction: a value is
   a candidate iff its summed weight could still clear the
   threshold, ``w > N/k - N/(2k+1)`` (equivalently the integer test
   ``w * k * (2k+1) > N * (k + 1)``).  Every true heavy hitter
   satisfies it, and since the kept weights each exceed ~``N/2k``
   while summing to at most ``N``, the candidate set stays O(k)
   regardless of skew.
3. **Verify pass** -- the candidate values are broadcast; one
   stateless ``map_batches`` emits exact per-block counts for
   candidates only, a driver fold sums them (N itself comes from
   ``ds.count()`` -- metadata-cheap on parquet reads), and the exact
   integer comparison ``n * k > N`` keeps the true heavy hitters.

Shuffle volume: zero.  Driver state: O(2k x blocks) summary rows,
then O(k) candidates.  Compare ``groupby(col).count()``: an
all-to-all shuffle of every distinct value -- at 10^9 users that is
the whole key space; here it is ``2k`` rows per block regardless of
skew.  (Misra & Gries 1982; merge bound per Agarwal et al.,
"Mergeable Summaries", PODS 2012.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mg_reduce(values: np.ndarray, weights: np.ndarray, cap: int):
    """Keep at most ``cap`` counters: subtract the (cap+1)-th largest
    weight from all, drop non-positives (the Misra-Gries decrement
    step, batched)."""
    if len(values) <= cap:
        return values, weights
    cut = np.partition(weights, len(weights) - (cap + 1))[
        len(weights) - (cap + 1)
    ]
    w = weights - cut
    keep = w > 0
    return values[keep], w[keep]


def heavy_hitters(ds, col: str, k: int = 100):
    """All values of ``ds[col]`` with exact frequency ``n`` such that
    ``n * k > N`` (N = total rows), as ``(col, n)`` rows with exact
    counts -- two streaming passes, no shuffle (module docstring has
    the guarantee argument)."""
    import ray
    import ray.data

    from .dedup import _cached_get

    cap = 2 * k  # sketch capacity: error N/(2k+1) < threshold N/k

    def sketch_block(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch.column(col).to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        vals, w = _mg_reduce(vals, counts.astype(np.int64), cap)
        return pa.table(
            {
                "value": pa.array(vals, pa.int64()),
                "w": pa.array(w, pa.int64()),
            }
        )

    # fold the tiny per-block summaries (vectorized); no further lossy
    # reduction -- candidate selection below uses the error bound
    part_v, part_w = [], []
    for tbl in ds.map_batches(
        sketch_block, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        part_v.append(tbl.column("value").to_numpy(zero_copy_only=False))
        part_w.append(tbl.column("w").to_numpy(zero_copy_only=False))
    n_total = ds.count()
    empty = pa.table(
        {col: pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )
    if not part_v or n_total == 0:
        return ray.data.from_arrow(empty)
    allv = np.concatenate(part_v)
    allw = np.concatenate(part_w)
    uniq, inv = np.unique(allv, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, allw)
    # keep iff w > N/k - N/(cap+1): integer form w*k*(cap+1) > N*(k+1)
    # (cap = 2k); object ints avoid any overflow at extreme N
    lhs = sums.astype(object) * (k * (cap + 1))
    cand_sorted = np.sort(uniq[lhs > n_total * (cap + 1 - k)])
    if len(cand_sorted) == 0:
        return ray.data.from_arrow(empty)
    cand_ref = ray.put(cand_sorted)

    def exact_counts(batch: pa.Table) -> pa.Table:
        cand = _cached_get(cand_ref)
        arr = batch.column(col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(cand, arr)
        idx_c = np.clip(idx, 0, len(cand) - 1)
        hit = cand[idx_c] == arr
        counts = np.bincount(idx_c[hit], minlength=len(cand))
        return pa.table(
            {
                "value": pa.array(cand, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    n_exact = np.zeros(len(cand_sorted), dtype=np.int64)
    for tbl in ds.map_batches(
        exact_counts, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        nn = tbl.column("n").to_numpy(zero_copy_only=False)
        # delivered batches may split or concatenate per-block
        # partials arbitrarily; accumulating by value position is
        # invariant to any re-batching
        pos = np.searchsorted(cand_sorted, v)
        np.add.at(n_exact, pos, nn)

    keep = n_exact * k > n_total
    out_v, out_n = cand_sorted[keep], n_exact[keep]
    return ray.data.from_arrow(
        pa.table(
            {
                col: pa.array(out_v.astype(np.int64), pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )
    )


def count_min_counts(
    ds,
    col: str,
    probes,
    d: int = 4,
    w: int = 1024,
):
    """Count-min sketch: upper-bound frequency estimates for the
    ``probes`` keys of ``ds[col]`` from ``d x w`` integer counters --
    the point-frequency sibling of :func:`heavy_hitters` (top-k) and
    ``events.approx_distinct_per_group`` (distinct count).

    Guarantee: ``true <= est <= true + eps*N`` with probability
    ``1 - (1/2)^d`` where ``eps ~ e/w`` (Cormode & Muthukrishnan
    2005); estimates never undercount.  Each block reduces to at most
    ``d*w`` nonzero (slot, count) partials (one vectorized bincount),
    the driver fold holds exactly ``d*w`` int64 counters regardless of
    row count or key cardinality, and nothing shuffles.

    Row hashes are ``fmix32(key ^ (i * 0x5BD1E995))`` -- the same
    DuckDB-expressible chain as the HLL sketch, so the whole estimate
    is bit-reproducible against a SQL mirror.
    """
    from .events import _fmix32

    probes = np.asarray(probes, dtype=np.int64)
    mask31 = 0x7FFFFFFF

    def positions(keys: np.ndarray) -> np.ndarray:
        """(n, d) counter positions; row i uses an xor-salted fmix."""
        out = np.empty((len(keys), d), dtype=np.int64)
        base = keys & mask31
        for i in range(d):
            out[:, i] = _fmix32(base ^ (i * 0x5BD1E995)) % w + i * w
        return out

    def sketch_block(batch: pa.Table) -> pa.Table:
        keys = (
            batch.column(col)
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        cnt = np.bincount(positions(keys).ravel(), minlength=d * w)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "slot": pa.array(nz.astype(np.int64), pa.int64()),
                "cnt": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    counters = np.zeros(d * w, dtype=np.int64)
    for tbl in ds.map_batches(
        sketch_block, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        s = tbl.column("slot").to_numpy(zero_copy_only=False)
        c = tbl.column("cnt").to_numpy(zero_copy_only=False)
        np.add.at(counters, s, c)

    est = counters[positions(probes)].min(axis=1)
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                col: pa.array(probes, pa.int64()),
                "est": pa.array(est, pa.int64()),
            }
        )
    )


def kmv_distinct(ds, col: str, k: int = 256, hex_digits: int = 15):
    """K-minimum-values (KMV / bottom-k) distinct-count sketch over a
    column: keep the ``k`` smallest distinct hash values; the running
    estimate at prefix size ``j`` is ``(j - 1) / U_j`` with ``U_j``
    the ``j``-th smallest hash normalized to [0, 1) (Bar-Yossef et
    al. 2002; Beyer et al., SIGMOD 2007).  The classic bounded-state
    answer to COUNT(DISTINCT) at 100 TB: an exact distinct count is
    an all-to-all shuffle of the whole key space, this is O(k) rows
    per block and an O(blocks x k) driver fold, no shuffle at all.

    Exactness contract (vs the SQL mirror, not vs the true count --
    the sketch is approximate BY DESIGN but bit-reproducible): the
    hash is the first ``hex_digits`` hex chars of md5 of the value's
    decimal string (DuckDB: ``('0x' || substr(md5(CAST(col AS
    VARCHAR)), 1, 15))::BIGINT``, 60 bits), hashed once per DISTINCT
    value per block via dictionary encode; the estimate divisor is
    the exact integer floor ``((j - 1) << 60) // h_j`` on both sides,
    so every output cell is bit-identical.  Nulls are dropped (the
    SQL ``WHERE col IS NOT NULL`` shape).

    Returns ``(rank, h, est)`` -- the sketch itself plus the running
    estimate curve; ``est`` at ``rank = k`` is the point estimate,
    with relative error ~ 1/sqrt(k - 2).
    """
    import hashlib

    import pyarrow.compute as pc
    import ray.data

    full = 1 << (4 * hex_digits)

    def minhash_part(batch: pa.Table) -> pa.Table:
        arr = batch.column(col).combine_chunks()
        arr = arr.drop_null().cast(pa.string())
        vals = pc.unique(arr)
        hs = np.unique(
            np.fromiter(
                (
                    int(
                        hashlib.md5(v.encode()).hexdigest()[:hex_digits],
                        16,
                    )
                    for v in vals.to_pylist()
                ),
                np.int64,
                count=len(vals),
            )
        )[:k]
        return pa.table({"h": pa.array(hs, pa.int64())})

    parts = []
    for tbl in ds.map_batches(
        minhash_part, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        parts.append(tbl.column("h").to_numpy(zero_copy_only=False))
    hs = (
        np.unique(np.concatenate(parts))[:k]
        if parts
        else np.empty(0, np.int64)
    )
    ranks = np.arange(1, len(hs) + 1, dtype=np.int64)
    # Python ints: (j-1) << 60 exceeds int64; both sides floor-divide
    est = np.fromiter(
        (((int(j) - 1) * full) // int(h) for j, h in zip(ranks, hs)),
        np.int64,
        count=len(hs),
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "rank": pa.array(ranks, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "est": pa.array(est, pa.int64()),
            }
        )
    )
