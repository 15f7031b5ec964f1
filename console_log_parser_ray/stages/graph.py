"""Graph operators over edge tables.

The reference engine has no graph operators; this module adds the one
a training-data pipeline most often needs beyond connected components
(which live in ``stages/dedup.py`` as duplicate-graph clustering):
link-analysis centrality (PageRank) over a large edge table -- the
standard importance prior for crawl frontiers and document-graph
weighting.

Exactness contract: ranks are INTEGER-QUANTIZED (micro-units of a
fixed ``quantum`` of total rank mass) and the damping factor is a
rational ``damp_num/damp_den``, so every iteration is pure int64
arithmetic -- sums are order-free, the result is bit-identical on any
partitioning, and the DuckDB oracle spells the same floor-division
expressions in unrolled CTEs.  No float ever enters the fixpoint.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum


def pagerank(
    edges,
    iterations: int = 3,
    n_buckets: int = 64,
    quantum: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
):
    """Integer-quantized PageRank over a directed edge table
    ``(src, dst)`` (int64 node ids, rows need not be distinct --
    parallel edges count twice, matching the SQL mirror).

    Per iteration: ``r'(v) = base + (damp_num * S_v) // damp_den``
    with ``S_v = sum over in-edges (u, v) of r(u) // outdeg(u)`` and
    ``base = ((damp_den - damp_num) * quantum) // (damp_den * n)`` --
    the classic ``(1-d)/n + d * sum`` update with every division a
    floor over non-negative int64.

    CONTRACT: every node must appear as both a source and a
    destination (outdeg >= 1 and indeg >= 1) -- symmetrized
    (undirected) graphs satisfy this by construction; for general
    digraphs, pre-drop or self-loop dangling nodes.  A node with no
    in-edges would silently leave the rank vector after the first
    groupby.

    Scale shape: outdegrees come from per-block partial counts + one
    tiny ``groupby(src)``; the degree column is attached to the edge
    table through ONE co-partitioned ``hash_join`` and the result is
    materialized once (the standard PageRank trade -- at cluster
    scale you would write it hash-partitioned and keep the rank
    vector co-partitioned on the same key).  Each iteration is one
    co-partitioned join of the tiny ``(node, r)`` vector against the
    edges plus one ``groupby(dst)`` sum; the rank vector (bounded by
    node count, never edge count) is materialized per iteration to
    keep plans shallow.  Nothing ever collects to the driver but the
    node count.
    """
    from console_log_parser_ray.stages.relational import hash_join

    def deg_partial(b: pa.Table) -> pa.Table:
        agg = (
            pa.table({"src": b.column("src").cast(pa.int64())})
            .append_column("one", pa.array(np.ones(len(b), np.int64)))
            .group_by("src")
            .aggregate([("one", "sum")])
        )
        return pa.table(
            {
                "node": agg.column("src"),
                "n_part": agg.column("one_sum").cast(pa.int64()),
            }
        )

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("n_part"))
        .rename_columns({"sum(n_part)": "deg"})
        .materialize()
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge table")
    r0 = quantum // n_nodes
    base = ((damp_den - damp_num) * quantum) // (damp_den * n_nodes)

    edge_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64())]
    )
    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])
    rank_schema = pa.schema([("node", pa.int64()), ("r", pa.int64())])

    def cast_edges(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": b.column("src").cast(pa.int64()),
                "dst": b.column("dst").cast(pa.int64()),
            }
        )

    edges_deg = (
        hash_join(
            edges.map_batches(cast_edges, batch_format="pyarrow"),
            deg,
            on="src",
            right_on="node",
            n_buckets=n_buckets,
            left_schema=edge_schema,
            right_schema=deg_schema,
        )
        # drop the joined key copy: the per-iteration join brings its
        # own "node" column and names must not collide
        .map_batches(
            lambda b: b.select(["src", "dst", "deg"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    ed_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("deg", pa.int64())]
    )

    def seed(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": b.column("node"),
                "r": pa.array(
                    np.full(len(b), r0, np.int64), pa.int64()
                ),
            }
        )

    rank = deg.map_batches(seed, batch_format="pyarrow")

    def contrib(b: pa.Table) -> pa.Table:
        r = b.column("r").to_numpy(zero_copy_only=False)
        d = b.column("deg").to_numpy(zero_copy_only=False)
        return pa.table(
            {"dst": b.column("dst"), "c": pa.array(r // d, pa.int64())}
        )

    def damp(b: pa.Table) -> pa.Table:
        s = b.column("sum(c)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": b.column("dst"),
                "r": pa.array(
                    base + (damp_num * s) // damp_den, pa.int64()
                ),
            }
        )

    for _ in range(iterations):
        joined = hash_join(
            edges_deg,
            rank,
            on="src",
            right_on="node",
            n_buckets=n_buckets,
            left_schema=ed_schema,
            right_schema=rank_schema,
        )
        rank = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c"))
            .map_batches(damp, batch_format="pyarrow")
            .materialize()
        )

    return rank.rename_columns({"r": "rank_q"})


def symmetric_edges(ds, a_col: str, b_col: str, b_offset: int = 0):
    """Distinct undirected edges from a two-column relation, emitted
    in both directions (the symmetrization that gives ``pagerank`` its
    outdeg/indeg >= 1 contract).  ``b_offset`` shifts the second
    column's id space so two key domains (e.g. suppliers and parts)
    cannot collide as node ids.

    In-batch dedup first, then the bounded hash-bucket distinct of
    ``distinct_rows`` -- the shuffle carries one row per distinct pair
    per block; the 2x direction expansion happens after dedup,
    block-locally.
    """
    from console_log_parser_ray.stages.dedup import distinct_rows

    def project(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "a": b.column(a_col).cast(pa.int64()),
                "b": b.column(b_col).cast(pa.int64()),
            }
        )
        return t.group_by(["a", "b"]).aggregate([])

    def both_ways(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy(zero_copy_only=False)
        bb = b.column("b").to_numpy(zero_copy_only=False) + b_offset
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, bb]), pa.int64()),
                "dst": pa.array(np.concatenate([bb, a]), pa.int64()),
            }
        )

    pairs = distinct_rows(
        ds.map_batches(project, batch_format="pyarrow"), ["a", "b"]
    )
    return pairs.map_batches(both_ways, batch_format="pyarrow")
