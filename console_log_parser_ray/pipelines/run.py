"""Checkpoint-resumable flagship run: parse -> enrich -> route -> aggregate.

Conversations hash into ``n_buckets`` partitions; buckets are processed
in waves, each wave one streaming Ray Data execution.  After a wave's
sinks land, one lineage manifest per bucket is committed (atomic
rename); a restarted run skips committed buckets at the read and wipes
any uncommitted partial output first, so sinks are exactly-once at
bucket granularity.

Sinks:
  parsed/        structured turns, partitioned by bucket (primary sink)
  sinks/by_role/ role-routed turns   (hive: role=<r>/bucket=<b>)
  sinks/by_tool/ tool-sink routed    (hive: sink=<s>/bucket=<b>)
  sinks/vim_sessions/ raw vim frames (hive: bucket=<b>)
  aggregates/    per-sink counts, per-conversation rollups
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.enrich import EnrichConfig, EnrichTurns
from ..stages.scan import make_scan_fn
from ..state import manifests as M


def _add_bucket_and_filter(n_buckets: int, wanted: frozenset):
    import zlib

    def fn(batch: pa.Table) -> pa.Table:
        convs = batch.column("conv_id").to_pylist()
        buckets = [zlib.crc32(c.encode()) % n_buckets for c in convs]
        mask = pa.array([b in wanted for b in buckets], pa.bool_())
        batch = batch.append_column("bucket", pa.array(buckets, pa.int32()))
        return batch.filter(mask)

    return fn


def run_flagship(
    input_path: str,
    out_dir: str,
    n_buckets: int = 32,
    wave_buckets: int = 16,
    cfg: EnrichConfig | None = None,
    resume: bool = True,
):
    """Run the full pipeline; returns summary metrics dict."""
    import ray
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    done = M.completed_buckets(out_dir) if resume else set()
    todo = [b for b in range(n_buckets) if b not in done]
    for b in todo:
        M.clean_bucket_outputs(out_dir, b)

    cfg_ref = ray.put(cfg or EnrichConfig())
    parsed_root = os.path.join(out_dir, "parsed")
    sinks_root = os.path.join(out_dir, "sinks")

    waves = [
        todo[i : i + wave_buckets] for i in range(0, len(todo), wave_buckets)
    ]
    for wave in waves:
        wanted = frozenset(wave)
        ds = ray.data.read_parquet(
            input_path, columns=["conv_id", "turn_idx", "text", "ts"]
        )
        ds = ds.map_batches(
            _add_bucket_and_filter(n_buckets, wanted), batch_format="pyarrow"
        )
        parsed = ds.groupby("conv_id").map_groups(
            _scan_with_bucket(n_buckets), batch_format="pyarrow"
        )
        enriched = parsed.map_batches(
            EnrichTurns,
            fn_constructor_args=(cfg_ref,),
            batch_format="pyarrow",
            concurrency=(2, 8),
            batch_size=4096,
        )
        enriched.write_parquet(parsed_root, partition_cols=["bucket"])

        # route from the parsed sink (columnar re-read, no re-parse);
        # read_parquet expands a single directory but not a list of
        # them, so enumerate the wave's files explicitly
        import glob as _glob

        wave_files = [
            f
            for b in wave
            for f in sorted(
                _glob.glob(os.path.join(parsed_root, f"bucket={b}", "*.parquet"))
            )
        ]
        if wave_files:
            routed = ray.data.read_parquet(wave_files).map_batches(
                _reattach_bucket(n_buckets), batch_format="pyarrow"
            )
            routed.write_parquet(
                os.path.join(sinks_root, "by_role"),
                partition_cols=["role", "bucket"],
            )
            routed.write_parquet(
                os.path.join(sinks_root, "by_tool"),
                partition_cols=["sink", "bucket"],
            )
            vim = (
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
                .map_batches(_reattach_bucket(n_buckets), batch_format="pyarrow")
                .map_batches(_keep_vim_rows, batch_format="pyarrow")
            )
            vim.write_parquet(
                os.path.join(sinks_root, "vim_sessions"),
                partition_cols=["bucket"],
            )

        for b in wave:
            payload = {
                "bucket": b,
                "input": input_path,
                "n_buckets": n_buckets,
                "sinks": M.collect_bucket_metrics(out_dir, b),
            }
            M.write_manifest(out_dir, b, payload)

    # global aggregates from the parsed sink
    agg_dir = os.path.join(out_dir, "aggregates")
    parsed_all = ray.data.read_parquet(parsed_root)
    counts = parsed_all.groupby("sink").count()
    counts.write_parquet(os.path.join(agg_dir, "counts_by_sink"))
    role_counts = parsed_all.groupby("role").count()
    role_counts.write_parquet(os.path.join(agg_dir, "counts_by_role"))

    def _rollup(tbl: pa.Table) -> pa.Table:
        conv_id = tbl.column("conv_id")[0].as_py()
        n_cmds = pc.max(tbl.column("cmd_count")).as_py() or 0
        vim_ids = set(
            v for v in tbl.column("vim_session_id").to_pylist() if v >= 0
        )
        return pa.table(
            {
                "conv_id": pa.array([conv_id]),
                "n_turns": pa.array([tbl.num_rows], pa.int64()),
                "n_cmds": pa.array([n_cmds], pa.int64()),
                "n_vim_sessions": pa.array([len(vim_ids)], pa.int64()),
            }
        )

    rollup = parsed_all.groupby("conv_id").map_groups(
        _rollup, batch_format="pyarrow"
    )
    rollup.write_parquet(os.path.join(agg_dir, "conv_rollup"))

    total = sum(
        s.get("rows", 0)
        for b in M.completed_buckets(out_dir)
        for k, s in _load_manifest_sinks(out_dir, b).items()
        if k.startswith("by_role")
    )
    return {"buckets": n_buckets, "waves": len(waves), "routed_rows": total}


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


def _load_manifest_sinks(out_dir: str, bucket: int) -> dict:
    import json

    with open(M.manifest_path(out_dir, bucket)) as fh:
        return json.load(fh).get("sinks", {})


def _scan_with_bucket(n_buckets: int):
    base = make_scan_fn()
    import zlib

    def fn(tbl: pa.Table) -> pa.Table:
        out = base(tbl)
        if out.num_rows == 0:
            return out.append_column(
                "bucket", pa.array([], pa.int32())
            )
        b = zlib.crc32(out.column("conv_id")[0].as_py().encode()) % n_buckets
        return out.append_column(
            "bucket", pa.array([b] * out.num_rows, pa.int32())
        )

    return fn
