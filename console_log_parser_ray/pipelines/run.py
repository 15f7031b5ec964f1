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
from ..stages.scan import make_scan_fn  # noqa: F401  (conformance path)
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
        parsed = ds.groupby("bucket").map_groups(
            _bucket_scan_keep_bucket(), batch_format="pyarrow"
        )
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        enriched = parsed.map_batches(
            EnrichTurns,
            fn_constructor_args=(cfg_ref,),
            batch_format="pyarrow",
            concurrency=(2, max(8, n_cpus // 2)),
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
            # the three routed sinks are independent re-reads of the
            # parsed files; run them concurrently (Ray Data supports
            # concurrent executions) so their fixed costs overlap
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

    # global aggregates from the parsed sink (independent; concurrent)
    agg_dir = os.path.join(out_dir, "aggregates")
    from .flagship import conv_rollup

    def _agg_sink():
        ray.data.read_parquet(parsed_root).groupby("sink").count().write_parquet(
            os.path.join(agg_dir, "counts_by_sink")
        )

    def _agg_role():
        ray.data.read_parquet(parsed_root).groupby("role").count().write_parquet(
            os.path.join(agg_dir, "counts_by_role")
        )

    def _agg_rollup():
        conv_rollup(
            ray.data.read_parquet(parsed_root), n_buckets=n_buckets
        ).write_parquet(os.path.join(agg_dir, "conv_rollup"))

    _run_concurrently([_agg_sink, _agg_role, _agg_rollup])

    total = sum(
        s.get("rows", 0)
        for b in M.completed_buckets(out_dir)
        for k, s in _load_manifest_sinks(out_dir, b).items()
        if k.startswith("by_role")
    )
    return {"buckets": n_buckets, "waves": len(waves), "routed_rows": total}


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


def _bucket_scan_keep_bucket():
    from ..stages.scan import scan_bucket_table

    def fn(tbl: pa.Table) -> pa.Table:
        b = tbl.column("bucket")[0].as_py() if tbl.num_rows else -1
        out = scan_bucket_table(tbl)
        return out.append_column(
            "bucket", pa.array([b] * out.num_rows, pa.int32())
        )

    return fn
