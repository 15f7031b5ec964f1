"""Flagship pipeline: parse -> enrich -> route -> aggregate.

Ray-Data-native composition over the transcripts table
(conv_id, turn_idx, role, text, tool, ts):

    read_parquet(columns pruned)
      -> groupby(conv_id).map_groups(session scan)   # the one shuffle
      -> map_batches(Enrich actor pool)              # broadcast lookups
      -> routed parquet sinks (by role / by tool / vim sessions)
      -> groupby aggregates (per-sink counts, rollups, histograms)

The session scan is the only stage that needs co-located, ordered
conversations; every downstream stage is stateless over its output and
keyed aggregations shuffle only small columns.
"""

from __future__ import annotations

import ray.data

from ..stages.scan import make_scan_fn, make_stats_fn


def read_transcripts(sf_dir: str, path: str | None = None) -> "ray.data.Dataset":
    """Read the transcripts parquet with column pruning."""
    p = path or f"{sf_dir}/transcripts.parquet"
    return ray.data.read_parquet(p, columns=["conv_id", "turn_idx", "text", "ts"])


def parse_sessions(
    ds: "ray.data.Dataset",
    suppress_map=None,
    use_fast_paths: bool = True,
    num_cpus: float = 1.0,
) -> "ray.data.Dataset":
    """The session-scan stage: one group per conversation."""
    fn = make_scan_fn(suppress_map=suppress_map, use_fast_paths=use_fast_paths)
    return ds.groupby("conv_id").map_groups(
        fn, batch_format="pyarrow", num_cpus=num_cpus
    )


def sequence_histogram(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Global (kind, seq) histogram, mirroring the reference's
    log_statistics (reference vtparser.py:751-787): per-conversation
    partials then a narrow groupby-sum shuffle."""
    partials = ds.groupby("conv_id").map_groups(
        make_stats_fn(), batch_format="pyarrow"
    )
    return (
        partials.groupby(["kind", "seq"])
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )


def sink_counts(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-sink routed-row counts (role sinks)."""
    return parsed.groupby("role").count().rename_columns({"count()": "n"})


def conv_rollup(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-conversation rollup: turns, command rows, vim sessions."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def rollup(tbl: pa.Table) -> pa.Table:
        conv_id = tbl.column("conv_id")[0].as_py()
        n_turns = tbl.num_rows
        n_cmds = pc.max(tbl.column("cmd_count")).as_py() or 0
        vim_ids = tbl.column("vim_session_id")
        n_vim = len(
            set(v for v in vim_ids.to_pylist() if v is not None and v >= 0)
        )
        return pa.table(
            {
                "conv_id": pa.array([conv_id], pa.string()),
                "n_turns": pa.array([n_turns], pa.int64()),
                "n_cmds": pa.array([n_cmds], pa.int64()),
                "n_vim_sessions": pa.array([n_vim], pa.int64()),
            }
        )

    return parsed.groupby("conv_id").map_groups(rollup, batch_format="pyarrow")
