"""Deduplication operators over document tables.

Large-scale training-data pipeline staples, each expressed Ray-Data-
first:

* exact dedup      -- hash per batch, hash-partitioned groupby, keep
                      the minimum id per identical text
* MinHash + LSH    -- shingle -> 128 minhashes -> banded bucket keys ->
                      bucket groupby -> candidate pairs -> exact-Jaccard
                      verification (pair-wise, no all-pairs blowup)
* SimHash          -- 64-bit weighted fingerprint; near-dup candidates
                      via 16-bit chunk pigeonhole buckets
* n-gram Jaccard   -- the exact verifier, reusable standalone

Shuffle discipline: every wide step keys on a *small* derived column
(64-bit hash, band bucket, chunk key), never on the document text
itself; texts travel only into the final pair verification, fetched
per-candidate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1
_N_PERM = 128
_N_BANDS = 32  # x 4 rows per band


def _text_hash_batch(batch: pa.Table, text_col: str) -> pa.Table:
    hashes = [
        int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        for t in batch.column(text_col).to_pylist()
    ]
    return batch.append_column("text_hash", pa.array(hashes, pa.uint64()))


def exact_dedup(ds, text_col="text", id_col="doc_id"):
    """Keep one row (minimum id) per identical text."""
    hashed = ds.map_batches(
        lambda b: _text_hash_batch(b, text_col), batch_format="pyarrow"
    )

    def keep_first(tbl: pa.Table) -> pa.Table:
        i = pc.index(tbl.column(id_col), pc.min(tbl.column(id_col))).as_py()
        return tbl.slice(i, 1)

    return (
        hashed.groupby("text_hash")
        .map_groups(keep_first, batch_format="pyarrow")
        .drop_columns(["text_hash"])
    )


def _shingles(text: str, k: int = 3):
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = _shingles(a, k), _shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


class _MinHasher:
    """Stateful per-actor minhash machinery (perm tables built once)."""

    def __init__(self, k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        # odd multipliers for multiplicative hashing mod 2^64 (uint64
        # wraparound is the modulus; fully vectorized)
        self.a = (rng.integers(1, 1 << 62, _N_PERM, dtype=np.uint64) << 1) | 1
        self.b = rng.integers(0, 1 << 63, _N_PERM, dtype=np.uint64)
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.zeros(_N_PERM, dtype=np.uint64)
        base = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
                )
                for s in sh
            ],
            dtype=np.uint64,
        )
        # (n_shingles, n_perm) multiplicative hashing, min over shingles
        vals = base[:, None] * self.a[None, :] + self.b[None, :]
        return np.min(vals, axis=0)


class MinHashStage:
    """map_batches actor: text -> banded LSH bucket keys (flat output).

    Emits one row per (doc, band): (band, bucket, doc_id).
    """

    def __init__(self, text_col="text", id_col="doc_id", k=3):
        self.h = _MinHasher(k=k)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        rows_band, rows_bucket, rows_id = [], [], []
        rpb = _N_PERM // _N_BANDS
        for did, text in zip(ids, texts):
            sig = self.h.signature(text)
            for band in range(_N_BANDS):
                chunk = sig[band * rpb : (band + 1) * rpb]
                # process-independent hash: builtin hash() is salted per
                # interpreter, so identical bands hashed by different
                # actors would land in different buckets
                bucket = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(),
                    "big",
                ) >> 1
                rows_band.append(band)
                rows_bucket.append(bucket)
                rows_id.append(did)
        return pa.table(
            {
                "band": pa.array(rows_band, pa.int32()),
                "bucket": pa.array(rows_bucket, pa.int64()),
                "doc_id": pa.array(rows_id, pa.int64()),
            }
        )


def minhash_candidate_pairs(ds, text_col="text", id_col="doc_id", k=3):
    """LSH candidate pairs (doc_a < doc_b), deduplicated."""
    bands = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col, "k": k},
        batch_format="pyarrow",
        concurrency=(2, 8),
    )

    def pairs(tbl: pa.Table) -> pa.Table:
        ids = sorted(set(tbl.column("doc_id").to_pylist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    cand = bands.groupby(["band", "bucket"]).map_groups(
        pairs, batch_format="pyarrow"
    )

    def first_pair(tbl: pa.Table) -> pa.Table:
        return tbl.slice(0, 1)

    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        first_pair, batch_format="pyarrow"
    )


def minhash_near_dups(ds, threshold=0.5, text_col="text", id_col="doc_id", k=3):
    """Near-duplicate pairs: LSH candidates verified by exact Jaccard.

    The text lookup for verification broadcasts the (id -> text) map via
    the object store; at larger scale this becomes a hash-join of the
    candidate pairs against the documents on doc_id instead.
    """
    import ray

    texts_ref = ray.put(
        {
            r[id_col]: r[text_col]
            for r in ds.select_columns([id_col, text_col]).take_all()
        }
    )
    cand = minhash_candidate_pairs(ds, text_col=text_col, id_col=id_col, k=k)

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch.column("doc_a").to_pylist()
            b = batch.column("doc_b").to_pylist()
            j = [
                ngram_jaccard(self.texts[x], self.texts[y], k) for x, y in zip(a, b)
            ]
            out = batch.append_column("jaccard", pa.array(j, pa.float64()))
            return out.filter(
                pc.greater_equal(out.column("jaccard"), pa.scalar(threshold))
            )

    return cand.map_batches(
        Verify, batch_format="pyarrow", concurrency=(1, 4)
    )


def _simhash64(text: str) -> int:
    v = np.zeros(64, dtype=np.int64)
    for tok in set(text.split()):
        h = int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
        )
        for bit in range(64):
            v[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if v[bit] > 0:
            out |= 1 << bit
    return out


def simhash(ds, text_col="text", id_col="doc_id"):
    """Adds a 64-bit simhash fingerprint column."""

    def fn(batch: pa.Table) -> pa.Table:
        hs = [_simhash64(t) for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "simhash": pa.array(hs, pa.uint64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def token_jaccard_adjacent(ds, id_col="doc_id", text_col="text"):
    """Token-set Jaccard between each document and its id+1 neighbor.

    The small side (id -> token set) is broadcast once; each batch
    computes its rows' similarities locally -- the same broadcast-
    lookup shape the near-dup verifier uses, here in a directly
    SQL-checkable form (integer-free ratios are exact: both sides
    compute |A intersect B| / |A union B| over identical integer sets).
    """
    import ray

    rows = ds.select_columns([id_col, text_col]).take_all()
    token_sets = {r[id_col]: frozenset(r[text_col].split()) for r in rows}
    max_id = max(token_sets) if token_sets else -1
    ref = ray.put((token_sets, max_id))

    class Jac:
        def __init__(self):
            self.sets, self.max_id = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            out_a, out_j = [], []
            for i in ids:
                if i >= self.max_id:
                    continue
                a, b = self.sets[i], self.sets[i + 1]
                inter = len(a & b)
                union = len(a) + len(b) - inter
                out_a.append(i)
                out_j.append(inter / union if union else 1.0)
            return pa.table(
                {
                    "doc_a": pa.array(out_a, pa.int64()),
                    "jaccard": pa.array(out_j, pa.float64()),
                }
            )

    return ds.map_batches(Jac, batch_format="pyarrow", concurrency=(1, 4))


def embedding_near_dups(ds, threshold=0.9, vec_col="embedding", id_col="vec_id"):
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    The normalized matrix is broadcast once; each batch computes its
    block of the similarity matrix against it -- brute force as the
    exact baseline; the IVF path (similarity.knn_ivf) is the scale
    variant for corpora where a full broadcast no longer fits.
    """
    import ray

    from .similarity import _batch_matrix, _normalize

    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows])
    mat = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float64))
    ref = ray.put((ids, mat))

    class Near:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            b_ids = np.asarray(batch.column(id_col).to_pylist())
            b_mat = _normalize(
                np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
            )
            sims = b_mat @ self.mat.T
            out_a, out_b, out_c = [], [], []
            for r in range(sims.shape[0]):
                hits = np.where(sims[r] >= threshold)[0]
                for c in hits:
                    if b_ids[r] < self.ids[c]:
                        out_a.append(int(b_ids[r]))
                        out_b.append(int(self.ids[c]))
                        out_c.append(float(sims[r, c]))
            return pa.table(
                {
                    "doc_a": pa.array(out_a, pa.int64()),
                    "doc_b": pa.array(out_b, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    return ds.map_batches(Near, batch_format="pyarrow", concurrency=(1, 4))
