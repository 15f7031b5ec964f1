"""Checkpoint-resumable flagship run: parse -> enrich -> route -> aggregate.

Two physical plans share one logical pipeline:

* **Sharded** (input partitioned by conversation at ingest, marked with
  ``_CONV_PARTITIONED``): the input shard is the unit of work AND the
  unit of recovery.  One Ray task per shard fuses read -> session scan
  -> enrich -> multi-sink Parquet fan-out (parsed / by_role / by_tool /
  vim_sessions, one directory per shard) and returns only metrics and
  aggregate partials; the driver combines the tiny partials and commits
  one lineage manifest per shard.  No shuffle, no re-read, and raw text
  never crosses the object store.

* **Bucketed** (arbitrary input): one hash shuffle on conv_id buckets
  co-locates conversations; buckets are processed in waves, each wave
  one streaming execution writing bucket-partitioned sinks, with a
  manifest per bucket.

Either way, a restarted run skips committed partitions, wipes
uncommitted partial output first, and re-runs only the remainder --
sinks are exactly-once at partition granularity.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.enrich import EnrichConfig, EnrichTurns
from ..state import manifests as M


def run_flagship(
    input_path: str,
    out_dir: str,
    n_buckets: int = 32,
    wave_buckets: int = 16,
    cfg: EnrichConfig | None = None,
    resume: bool = True,
    skew_threshold: int | None = None,
):
    """Run the full pipeline; returns summary metrics dict."""
    conv_partitioned = os.path.exists(
        os.path.join(input_path, "_CONV_PARTITIONED")
    )
    if conv_partitioned:
        return _run_sharded(input_path, out_dir, cfg=cfg, resume=resume)
    return _run_bucketed(
        input_path,
        out_dir,
        n_buckets=n_buckets,
        wave_buckets=wave_buckets,
        cfg=cfg,
        resume=resume,
        skew_threshold=skew_threshold,
    )


# ---------------------------------------------------------------------------
# sharded plan
# ---------------------------------------------------------------------------


def _shard_task(out_dir: str, cfg_ref):
    """Fused per-shard worker: read, scan, enrich, write all sinks,
    emit metrics + aggregate partials as the (tiny) output table."""
    import pyarrow.parquet as pq

    from ..stages.scan import scan_bucket_table

    enricher = [None]

    def fn(batch: pa.Table) -> pa.Table:
        if enricher[0] is None:
            enricher[0] = EnrichTurns(cfg_ref)
        out_rows = {
            "shard": [],
            "kind": [],
            "k1": [],
            "k2": [],
            "n1": [],
            "n2": [],
            "n3": [],
        }

        def emit(shard, kind, k1, k2="", n1=0, n2=0, n3=0):
            out_rows["shard"].append(shard)
            out_rows["kind"].append(kind)
            out_rows["k1"].append(k1)
            out_rows["k2"].append(k2)
            out_rows["n1"].append(n1)
            out_rows["n2"].append(n2)
            out_rows["n3"].append(n3)

        for item in batch.column("path").to_pylist():
            path = item["path"] if isinstance(item, dict) else item
            shard = item["shard"] if isinstance(item, dict) else 0
            tbl = pq.read_table(
                path, columns=["conv_id", "turn_idx", "text", "ts"]
            )
            parsed = enricher[0](scan_bucket_table(tbl))
            tag = uuid.uuid4().hex[:8]

            def write(sub, sink, part_value=None):
                if sub.num_rows == 0:
                    return
                d = os.path.join(out_dir, "sinks", sink)
                if part_value is not None:
                    d = os.path.join(d, part_value)
                d = os.path.join(d, f"shard={shard}")
                os.makedirs(d, exist_ok=True)
                pq.write_table(
                    sub, os.path.join(d, f"part-{tag}.parquet"),
                    compression="zstd",
                )
                emit(shard, "sink_rows",
                     sink + ("/" + part_value if part_value else ""),
                     "", sub.num_rows)

            # primary structured sink
            write(parsed, "parsed")
            # routed fan-out
            for role in pc.unique(parsed.column("role")).to_pylist():
                sub = parsed.filter(pc.equal(parsed.column("role"), role))
                write(sub, "by_role", f"role={role}")
            for sink in pc.unique(parsed.column("sink")).to_pylist():
                sub = parsed.filter(pc.equal(parsed.column("sink"), sink))
                write(sub, "by_tool", f"sink={sink}")
            vim = parsed.filter(pc.is_valid(parsed.column("vim_text")))
            write(
                vim.select(
                    ["conv_id", "turn_idx", "ts", "vim_session_id", "vim_text"]
                ),
                "vim_sessions",
            )

            # aggregate partials
            for role, n in zip(
                *_value_counts(parsed.column("role"))
            ):
                emit(shard, "role_count", role, "", n)
            for sink, n in zip(*_value_counts(parsed.column("sink"))):
                emit(shard, "sink_count", sink, "", n)
            df = parsed.select(
                ["conv_id", "cmd_count", "vim_session_id"]
            ).to_pandas()
            g = df.groupby("conv_id", sort=False)
            roll = g.agg(
                n_turns=("cmd_count", "size"), n_cmds=("cmd_count", "max")
            )
            vimn = (
                df[df["vim_session_id"] >= 0]
                .groupby("conv_id", sort=False)["vim_session_id"]
                .nunique()
            )
            roll["n_vim"] = vimn.reindex(roll.index).fillna(0).astype("int64")
            # rollups are per-conversation (unbounded at scale): they go
            # to a shard-partitioned sink like every other output, so
            # resume cleanup and manifests cover them too
            roll = roll.reset_index()
            roll_tbl = pa.table(
                {
                    "conv_id": pa.array(roll["conv_id"], pa.string()),
                    "n_turns": pa.array(roll["n_turns"], pa.int64()),
                    "n_cmds": pa.array(
                        roll["n_cmds"].astype("int64"), pa.int64()
                    ),
                    "n_vim_sessions": pa.array(roll["n_vim"], pa.int64()),
                }
            )
            write(roll_tbl, "conv_rollup")

        return pa.table(
            {
                "shard": pa.array(out_rows["shard"], pa.int32()),
                "kind": pa.array(out_rows["kind"], pa.string()),
                "k1": pa.array(out_rows["k1"], pa.string()),
                "k2": pa.array(out_rows["k2"], pa.string()),
                "n1": pa.array(out_rows["n1"], pa.int64()),
                "n2": pa.array(out_rows["n2"], pa.int64()),
                "n3": pa.array(out_rows["n3"], pa.int64()),
            }
        )

    return fn


def _value_counts(col):
    vc = col.combine_chunks().value_counts() if isinstance(
        col, pa.ChunkedArray
    ) else col.value_counts()
    return (
        vc.field("values").to_pylist(),
        vc.field("counts").to_pylist(),
    )


def _run_sharded(input_path, out_dir, cfg=None, resume=True):
    import glob as _g

    import ray
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    in_files = sorted(_g.glob(os.path.join(input_path, "*.parquet")))
    shards = {i: p for i, p in enumerate(in_files)}
    done = M.completed_partitions(out_dir, "shard") if resume else set()
    todo = [s for s in shards if s not in done]
    for s in todo:
        M.clean_partition_outputs(out_dir, "shard", s)
    if not todo:
        return {"partitions": len(shards), "skipped": len(done)}

    cfg_ref = ray.put(cfg or EnrichConfig())
    items = [{"path": {"path": shards[s], "shard": s}} for s in todo]
    metrics_ds = ray.data.from_items(
        items, override_num_blocks=len(items)
    ).map_batches(
        _shard_task(out_dir, cfg_ref), batch_format="pyarrow", batch_size=None
    )
    metrics = metrics_ds.take_all()

    # combine partials (counts only; rollups were written in-task)
    by_shard_sinks = {}
    role_counts, sink_counts = {}, {}
    for r in metrics:
        if r["kind"] == "sink_rows":
            by_shard_sinks.setdefault(r["shard"], {})[r["k1"]] = {
                "rows": r["n1"]
            }
        elif r["kind"] == "role_count":
            role_counts[r["k1"]] = role_counts.get(r["k1"], 0) + r["n1"]
        elif r["kind"] == "sink_count":
            sink_counts[r["k1"]] = sink_counts.get(r["k1"], 0) + r["n1"]

    import pyarrow.parquet as pq

    agg_dir = os.path.join(out_dir, "aggregates")
    os.makedirs(agg_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "role": pa.array(list(role_counts), pa.string()),
                "n": pa.array(list(role_counts.values()), pa.int64()),
            }
        ),
        os.path.join(agg_dir, "counts_by_role.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "sink": pa.array(list(sink_counts), pa.string()),
                "n": pa.array(list(sink_counts.values()), pa.int64()),
            }
        ),
        os.path.join(agg_dir, "counts_by_sink.parquet"),
    )

    # commit manifests (metrics came from the tasks; no directory walk)
    for s in todo:
        M.write_partition_manifest(
            out_dir,
            "shard",
            s,
            {
                "shard": s,
                "input": shards[s],
                "sinks": by_shard_sinks.get(s, {}),
            },
        )
    # total from ALL committed manifests, so a resumed run reports the
    # cumulative routed rows, not just the shards it re-ran
    routed = 0
    for s in M.completed_partitions(out_dir, "shard"):
        with open(M.partition_manifest_path(out_dir, "shard", s)) as fh:
            sinks = json.load(fh).get("sinks", {})
        routed += sum(
            v["rows"] for k, v in sinks.items() if k.startswith("by_role/")
        )
    return {
        "partitions": len(shards),
        "ran": len(todo),
        "skipped": len(done),
        "routed_rows": routed,
    }


# ---------------------------------------------------------------------------
# bucketed plan (generic inputs)
# ---------------------------------------------------------------------------


def _add_bucket_and_filter(n_buckets: int, wanted: frozenset, heavy_ids=None):
    import zlib

    heavy_ids = heavy_ids or {}

    def fn(batch: pa.Table) -> pa.Table:
        convs = batch.column("conv_id").to_pylist()
        buckets = [
            heavy_ids.get(c, zlib.crc32(c.encode()) % n_buckets)
            for c in convs
        ]
        mask = pa.array([b in wanted for b in buckets], pa.bool_())
        batch = batch.append_column("bucket", pa.array(buckets, pa.int32()))
        return batch.filter(mask)

    return fn


def _bucket_scan_keep_bucket():
    from ..stages.scan import scan_bucket_table

    def fn(tbl: pa.Table) -> pa.Table:
        b = tbl.column("bucket")[0].as_py() if tbl.num_rows else -1
        out = scan_bucket_table(tbl)
        return out.append_column(
            "bucket", pa.array([b] * out.num_rows, pa.int32())
        )

    return fn


def _keep_vim_rows(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.is_valid(batch.column("vim_text")))


def _reattach_bucket(n_buckets: int):
    """Hive partition columns are not materialized when reading explicit
    file lists; recompute the bucket from each batch's conv_id."""
    import zlib

    def fn(batch: pa.Table) -> pa.Table:
        if "bucket" in batch.schema.names:
            return batch
        convs = batch.column("conv_id").to_pylist()
        buckets = [zlib.crc32(c.encode()) % n_buckets for c in convs]
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))

    return fn


def _run_concurrently(fns):
    import threading

    errors = []

    def wrap(f):
        try:
            f()
        except BaseException as e:  # propagate to caller
            errors.append(e)

    threads = [threading.Thread(target=wrap, args=(f,)) for f in fns]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]


def _parse_giant_conversation(
    input_path, conv_id, bucket_id, parsed_root, cfg_ref, chunk_size=None
):
    """Parse one oversized conversation with the chunk-parallel scan
    and write its dedicated parsed partition.

    The conversation's rows are collected to the driver here (fine up
    to tens of millions of turns); past that, the speculative phase
    would read chunk ranges directly from storage instead.
    """
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from ..stages.scan import records_to_table
    from ..vt.chunked import ray_chunked_scan

    ds = ray.data.read_parquet(
        input_path, columns=["conv_id", "turn_idx", "text", "ts"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("conv_id"), conv_id))

    tbl = pa.Table.from_pylist(
        ds.map_batches(keep, batch_format="pyarrow").take_all()
    ).sort_by("turn_idx")
    texts = tbl.column("text").to_pylist()
    if chunk_size is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        chunk_size = max(500, len(texts) // max(2 * n_cpus, 4))
    recs = ray_chunked_scan(texts, chunk_size)
    out = records_to_table(
        conv_id, recs, ts_vals=tbl.column("ts"), texts=texts
    )
    out = EnrichTurns(cfg_ref)(out)
    d = os.path.join(parsed_root, f"bucket={bucket_id}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        out, os.path.join(d, "part-giant.parquet"), compression="zstd"
    )


def find_heavy_conversations(input_path, threshold: int) -> dict:
    """Pre-pass: per-conversation turn counts (narrow read of conv_id
    only, per-batch partial counts, tiny driver combine); returns the
    conversations above ``threshold``."""
    import collections

    import ray.data

    ds = ray.data.read_parquet(input_path, columns=["conv_id"])

    def partial(batch: pa.Table) -> pa.Table:
        vals, counts = _value_counts(batch.column("conv_id"))
        return pa.table(
            {
                "conv_id": pa.array(vals, pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    total = collections.Counter()
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        total[row["conv_id"]] += row["n"]
    return {c: n for c, n in total.items() if n > threshold}


def _run_bucketed(
    input_path,
    out_dir,
    n_buckets=32,
    wave_buckets=16,
    cfg=None,
    resume=True,
    skew_threshold=None,
):
    """Generic-input plan.  ``skew_threshold``: conversations with more
    turns than this get a dedicated partition each (conv_id-salting's
    safe sibling: a giant conversation can dominate a hash bucket, so
    it is isolated instead of sharing one; splitting a conversation
    *across* partitions would require FSM chunk-stitching, SURVEY
    section 4.2)."""
    import glob as _glob

    import ray
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    heavy = (
        find_heavy_conversations(input_path, skew_threshold)
        if skew_threshold
        else {}
    )
    heavy_ids = {c: n_buckets + i for i, c in enumerate(sorted(heavy))}
    total_buckets = n_buckets + len(heavy_ids)

    done = M.completed_buckets(out_dir) if resume else set()
    todo = [b for b in range(total_buckets) if b not in done]
    for b in todo:
        M.clean_bucket_outputs(out_dir, b)

    cfg_ref = ray.put(cfg or EnrichConfig())
    parsed_root = os.path.join(out_dir, "parsed")
    sinks_root = os.path.join(out_dir, "sinks")

    # Giant conversations are parsed first, chunk-parallel: speculative
    # chunk scans fan out as Ray tasks and a state-convergence stitch
    # pass adopts their results (vt/chunked.py) -- one conversation no
    # longer bounds wall time by a single worker's sequential scan.
    heavy_bucket_ids = frozenset(heavy_ids.values())
    for conv, bucket_id in heavy_ids.items():
        if bucket_id not in todo:
            continue
        _parse_giant_conversation(
            input_path, conv, bucket_id, parsed_root, cfg_ref
        )

    waves = [
        todo[i : i + wave_buckets] for i in range(0, len(todo), wave_buckets)
    ]
    for wave in waves:
        wanted = frozenset(wave) - heavy_bucket_ids
        if not wanted:
            wanted = frozenset()
        ds = ray.data.read_parquet(
            input_path, columns=["conv_id", "turn_idx", "text", "ts"]
        )
        ds = ds.map_batches(
            _add_bucket_and_filter(n_buckets, wanted, heavy_ids),
            batch_format="pyarrow",
        )
        parsed = ds.groupby("bucket").map_groups(
            _bucket_scan_keep_bucket(), batch_format="pyarrow"
        )
        if wanted:
            n_cpus = int(ray.cluster_resources().get("CPU", 8))
            enriched = parsed.map_batches(
                EnrichTurns,
                fn_constructor_args=(cfg_ref,),
                batch_format="pyarrow",
                concurrency=(2, max(8, n_cpus)),
                batch_size=4096,
            )
            enriched.write_parquet(parsed_root, partition_cols=["bucket"])

        wave_files = [
            f
            for b in wave
            for f in sorted(
                _glob.glob(os.path.join(parsed_root, f"bucket={b}", "*.parquet"))
            )
        ]
        if wave_files:
            # the three routed sinks are independent re-reads of the
            # parsed files; run them concurrently so fixed costs overlap
            def _write_by_role():
                ray.data.read_parquet(wave_files).map_batches(
                    _reattach_bucket(n_buckets), batch_format="pyarrow"
                ).write_parquet(
                    os.path.join(sinks_root, "by_role"),
                    partition_cols=["role", "bucket"],
                )

            def _write_by_tool():
                ray.data.read_parquet(wave_files).map_batches(
                    _reattach_bucket(n_buckets), batch_format="pyarrow"
                ).write_parquet(
                    os.path.join(sinks_root, "by_tool"),
                    partition_cols=["sink", "bucket"],
                )

            def _write_vim():
                (
                    ray.data.read_parquet(
                        wave_files,
                        columns=[
                            "conv_id",
                            "turn_idx",
                            "ts",
                            "vim_session_id",
                            "vim_text",
                        ],
                    )
                    .map_batches(
                        _reattach_bucket(n_buckets), batch_format="pyarrow"
                    )
                    .map_batches(_keep_vim_rows, batch_format="pyarrow")
                    .write_parquet(
                        os.path.join(sinks_root, "vim_sessions"),
                        partition_cols=["bucket"],
                    )
                )

            _run_concurrently([_write_by_role, _write_by_tool, _write_vim])

        for b in wave:
            payload = {
                "bucket": b,
                "input": input_path,
                "n_buckets": n_buckets,
                "sinks": M.collect_bucket_metrics(out_dir, b),
            }
            M.write_manifest(out_dir, b, payload)

    agg_dir = os.path.join(out_dir, "aggregates")
    _bucket_aggregates(parsed_root, n_buckets, agg_dir)

    total = sum(
        s.get("rows", 0)
        for b in M.completed_buckets(out_dir)
        for k, s in _load_manifest_sinks(out_dir, b).items()
        if k.startswith("by_role")
    )
    return {"buckets": n_buckets, "waves": len(waves), "routed_rows": total}


def _bucket_aggregates(parsed_root: str, n_buckets: int, agg_dir: str):
    """Per-bucket aggregates without a shuffle: the parsed sink is
    already partitioned by bucket, so one Ray task per bucket computes
    its partials and a tiny driver-side combine writes the results."""
    import collections
    import glob as _g

    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    @ray.remote(num_cpus=1)
    def per_bucket(files):
        sink_counts = collections.Counter()
        role_counts = collections.Counter()
        rollups = []
        for f in files:
            t = pq.read_table(
                f,
                columns=[
                    "conv_id",
                    "cmd_count",
                    "vim_session_id",
                    "role",
                    "sink",
                ],
            )
            sink_counts.update(t.column("sink").to_pylist())
            role_counts.update(t.column("role").to_pylist())
            df = t.select(["conv_id", "cmd_count", "vim_session_id"]).to_pandas()
            g = df.groupby("conv_id", sort=False)
            out = g.agg(
                n_turns=("cmd_count", "size"), n_cmds=("cmd_count", "max")
            )
            vim = (
                df[df["vim_session_id"] >= 0]
                .groupby("conv_id", sort=False)["vim_session_id"]
                .nunique()
            )
            out["n_vim_sessions"] = (
                vim.reindex(out.index).fillna(0).astype("int64")
            )
            rollups.append(out.reset_index())
        return dict(sink_counts), dict(role_counts), rollups

    refs = []
    for bdir in sorted(_g.glob(os.path.join(parsed_root, "bucket=*"))):
        files = sorted(_g.glob(os.path.join(bdir, "*.parquet")))
        if files:
            refs.append(per_bucket.remote(files))

    sink_total = collections.Counter()
    role_total = collections.Counter()
    rollup_parts = []
    for s, r, rolls in ray.get(refs):
        sink_total.update(s)
        role_total.update(r)
        rollup_parts.extend(rolls)

    os.makedirs(agg_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "sink": pa.array(list(sink_total), pa.string()),
                "n": pa.array(list(sink_total.values()), pa.int64()),
            }
        ),
        os.path.join(agg_dir, "counts_by_sink.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "role": pa.array(list(role_total), pa.string()),
                "n": pa.array(list(role_total.values()), pa.int64()),
            }
        ),
        os.path.join(agg_dir, "counts_by_role.parquet"),
    )
    if rollup_parts:
        roll = pd.concat(rollup_parts, ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(roll, preserve_index=False),
            os.path.join(agg_dir, "conv_rollup.parquet"),
        )


def _load_manifest_sinks(out_dir: str, bucket: int) -> dict:
    with open(M.manifest_path(out_dir, bucket)) as fh:
        return json.load(fh).get("sinks", {})
