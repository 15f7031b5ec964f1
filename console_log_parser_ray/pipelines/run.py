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

* **Bucketed** (arbitrary input): a storage scatter-gather shuffle.
  Phase 1 reads each input file once and scatters its rows into
  per-conversation-bucket staged parquet (deterministic names, atomic
  writes -- retries are idempotent); phase 2 runs one independent task
  per bucket fusing scan -> enrich -> all sink writes, committing its
  own lineage manifest in-task, so every bucket is an independent
  checkpoint.  The staged files ARE the shuffle's spill -- the same
  externalized exchange a multi-node run would use, without the
  sample-sort barrier of an in-memory groupby.  Conversations above
  ``skew_threshold`` turns get dedicated heavy partitions parsed
  chunk-parallel, streaming chunk ranges from storage.

Either way, a restarted run skips committed partitions, wipes
uncommitted partial output first, and re-runs only the remainder --
sinks are exactly-once at partition granularity.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.enrich import EnrichConfig, EnrichTurns
from ..state import manifests as M


def run_flagship(
    input_path: str,
    out_dir: str,
    n_buckets: int | None = None,
    wave_buckets: int = 16,
    cfg: EnrichConfig | None = None,
    resume: bool = True,
    skew_threshold: int | None = None,
    plan: str | None = None,
):
    """Run the full pipeline; returns summary metrics dict.

    ``plan``: force "sharded" or "bucketed" (default: sharded when the
    input carries the ``_CONV_PARTITIONED`` marker, else bucketed).
    """
    conv_partitioned = (
        os.path.exists(os.path.join(input_path, "_CONV_PARTITIONED"))
        if plan is None
        else plan == "sharded"
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

            def write(sub, sink, part_value=None):
                if sub.num_rows == 0:
                    return
                d = os.path.join(out_dir, "sinks", sink)
                if part_value is not None:
                    d = os.path.join(d, part_value)
                d = os.path.join(d, f"shard={shard}")
                os.makedirs(d, exist_ok=True)
                # deterministic name: each (sink, shard) dir is written
                # by exactly one task, so a retried task overwrites its
                # own partial file instead of duplicating rows; tmp +
                # rename so a mid-write death never leaves a truncated
                # file behind a committed manifest
                _atomic_write_table(
                    sub, os.path.join(d, "part-00000.parquet")
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


def _atomic_write_table(tbl: pa.Table, path: str):
    """zstd parquet write via tmp + rename: readers (and resume) never
    observe a truncated file, even if the writer dies mid-write."""
    import pyarrow.parquet as pq

    # dot-prefixed tmp name: pyarrow/Ray dataset discovery ignores
    # hidden files, so a crash-orphaned tmp can never pollute a read
    d, base = os.path.split(path)
    tmp = os.path.join(d, "." + base + ".tmp")
    pq.write_table(tbl, tmp, compression="zstd")
    os.replace(tmp, path)


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

    agg_dir = os.path.join(out_dir, "aggregates")
    os.makedirs(agg_dir, exist_ok=True)
    _atomic_write_table(
        pa.table(
            {
                "role": pa.array(list(role_counts), pa.string()),
                "n": pa.array(list(role_counts.values()), pa.int64()),
            }
        ),
        os.path.join(agg_dir, "counts_by_role.parquet"),
    )
    _atomic_write_table(
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
    all_wanted = len(wanted) >= n_buckets and frozenset(
        range(n_buckets)
    ) <= wanted and not heavy_ids

    def fn(batch: pa.Table) -> pa.Table:
        # hash only the distinct conv_ids in the batch (a batch holds
        # whole or few conversations, so distinct << rows), then fan the
        # bucket ids back out through the dictionary indices -- no
        # per-row Python work
        dic = pc.dictionary_encode(batch.column("conv_id").combine_chunks())
        uniq = dic.dictionary.to_pylist()
        bucket_u = pa.array(
            [
                heavy_ids.get(c, zlib.crc32(c.encode()) % n_buckets)
                for c in uniq
            ],
            pa.int32(),
        )
        bucket_arr = bucket_u.take(dic.indices)
        batch = batch.append_column("bucket", bucket_arr)
        if all_wanted:
            return batch
        mask = pc.is_in(
            bucket_arr, value_set=pa.array(sorted(wanted), pa.int32())
        )
        return batch.filter(mask)

    return fn


def _counts(col) -> dict:
    vals, ns = _value_counts(col)
    return dict(zip(vals, ns))


def _rollup_table(parsed: pa.Table) -> pa.Table:
    """Per-conversation rollup rows for one bucket's parsed table."""
    df = parsed.select(["conv_id", "cmd_count", "vim_session_id"]).to_pandas()
    g = df.groupby("conv_id", sort=False)
    roll = g.agg(n_turns=("cmd_count", "size"), n_cmds=("cmd_count", "max"))
    vimn = (
        df[df["vim_session_id"] >= 0]
        .groupby("conv_id", sort=False)["vim_session_id"]
        .nunique()
    )
    roll["n_vim"] = vimn.reindex(roll.index).fillna(0).astype("int64")
    roll = roll.reset_index()
    return pa.table(
        {
            "conv_id": pa.array(roll["conv_id"], pa.string()),
            "n_turns": pa.array(roll["n_turns"], pa.int64()),
            "n_cmds": pa.array(roll["n_cmds"].astype("int64"), pa.int64()),
            "n_vim_sessions": pa.array(roll["n_vim"], pa.int64()),
        }
    )


def _write_bucket_outputs(
    enriched: pa.Table, bucket: int, out_dir: str, part: str = "part-00000"
) -> dict:
    """Write one bucket's parsed + routed sinks; returns {sink: rows}.

    File names are deterministic per (bucket, part), so a retried task
    overwrites its own partial output instead of duplicating rows.
    """
    import pyarrow.parquet as pq

    sinks = {}

    def write(sub: pa.Table, rel: str):
        if sub.num_rows == 0:
            return
        d = os.path.join(out_dir, rel, f"bucket={bucket}")
        os.makedirs(d, exist_ok=True)
        # tmp + rename: a task re-executed after its manifest committed
        # (lineage reconstruction) that dies mid-write must never leave
        # a truncated file behind a committed manifest
        _atomic_write_table(sub, os.path.join(d, part + ".parquet"))
        key = rel[len("sinks/"):] if rel.startswith("sinks/") else rel
        cur = sinks.setdefault(key, {"rows": 0, "files": []})
        cur["rows"] += sub.num_rows
        cur["files"].append(part + ".parquet")

    write(enriched, "parsed")
    for role in pc.unique(enriched.column("role")).to_pylist():
        write(
            enriched.filter(pc.equal(enriched.column("role"), role)),
            f"sinks/by_role/role={role}",
        )
    for sink in pc.unique(enriched.column("sink")).to_pylist():
        write(
            enriched.filter(pc.equal(enriched.column("sink"), sink)),
            f"sinks/by_tool/sink={sink}",
        )
    vim = enriched.filter(pc.is_valid(enriched.column("vim_text")))
    write(
        vim.select(["conv_id", "turn_idx", "ts", "vim_session_id", "vim_text"]),
        "sinks/vim_sessions",
    )
    write(_rollup_table(enriched), "sinks/conv_rollup")
    return sinks


def _commit_bucket(out_dir, bucket, input_path, n_buckets, sinks, parsed):
    """Write the bucket's lineage manifest (counts + written files)."""
    M.write_manifest(
        out_dir,
        bucket,
        {
            "bucket": bucket,
            "input": input_path,
            "n_buckets": n_buckets,
            "sinks": sinks,
            "role_counts": _counts(parsed.column("role")) if parsed.num_rows else {},
            "sink_counts": _counts(parsed.column("sink")) if parsed.num_rows else {},
        },
    )


def _scatter_task(
    staging: str, n_buckets: int, wanted: frozenset, heavy_ids=None
):
    """Per-input-file scatter worker (phase 1 of the storage shuffle):
    read the file, assign conversation buckets, split, and write one
    staged parquet per touched bucket.

    File names are deterministic per (bucket, source file index) and
    writes are atomic, so a retried scatter task overwrites its own
    staged output byte-identically instead of duplicating rows.  An
    input block holds whole (or few) conversations, so each scatter
    task touches only a handful of buckets -- the staged file count is
    ~#input-files x #convs-per-file, not #input-files x #buckets.
    """
    import pyarrow.parquet as pq

    bucketer = _add_bucket_and_filter(n_buckets, wanted, heavy_ids)

    def fn(batch: pa.Table) -> pa.Table:
        touched = []
        for item in batch.column("item").to_pylist():
            # each task covers a CHUNK of input files: one staged file
            # per (bucket, chunk) instead of per (bucket, file) keeps
            # the staged-file count (and its open/footer overhead on
            # the gather side) an order of magnitude down
            paths, idx = item["paths"], item["idx"]
            tbl = pa.concat_tables(
                [
                    pq.read_table(
                        p, columns=["conv_id", "turn_idx", "text", "ts"]
                    )
                    for p in paths
                ]
            )
            tbl = bucketer(tbl)
            if not tbl.num_rows:
                continue
            buckets = tbl.column("bucket")
            for b in pc.unique(buckets).to_pylist():
                sub = tbl.filter(pc.equal(buckets, b)).drop_columns(
                    ["bucket"]
                )
                d = os.path.join(staging, f"bucket={b}")
                os.makedirs(d, exist_ok=True)
                _atomic_write_table(
                    sub, os.path.join(d, f"src-{idx:06d}.parquet")
                )
                touched.append(b)
        return pa.table({"bucket": pa.array(touched, pa.int32())})

    return fn


def _gather_task(
    staging: str, out_dir: str, cfg_ref, input_path: str, n_buckets: int
):
    """Per-bucket gather worker (phase 2): read the bucket's staged
    files, scan -> enrich -> fused multi-sink write -> in-task manifest
    commit.  Committing in-task makes each bucket an independent
    checkpoint: a run killed mid-execution resumes by skipping every
    bucket whose manifest exists (deterministic sink file names make
    task retries idempotent).  A bucket with no staged data commits an
    empty manifest so resume bookkeeping stays complete."""
    import pyarrow.parquet as pq

    from ..stages.scan import scan_bucket_table

    def fn(batch: pa.Table) -> pa.Table:
        buckets, rows = [], []
        for b in batch.column("item").to_pylist():
            d = os.path.join(staging, f"bucket={b}")
            if not os.path.isdir(d):
                _commit_bucket(
                    out_dir, b, input_path, n_buckets, {}, pa.table({})
                )
                buckets.append(b)
                rows.append(0)
                continue
            tbl = pa.concat_tables(
                [
                    pq.read_table(os.path.join(d, f))
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                ]
            )
            parsed = scan_bucket_table(tbl)
            enriched = EnrichTurns(cfg_ref)(parsed)
            sinks = _write_bucket_outputs(enriched, b, out_dir)
            _commit_bucket(
                out_dir, b, input_path, n_buckets, sinks, enriched
            )
            buckets.append(b)
            rows.append(enriched.num_rows)
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.int32()),
                "rows": pa.array(rows, pa.int64()),
            }
        )

    return fn


# ---------------------------------------------------------------------------
# giant-conversation path (skew isolation + chunk-parallel scan)
# ---------------------------------------------------------------------------


def _conv_dataset_filter(conv_id: str, lo=None, hi=None):
    import pyarrow.dataset as pds

    f = pds.field("conv_id") == conv_id
    if lo is not None:
        f = f & (pds.field("turn_idx") >= lo)
    if hi is not None:
        f = f & (pds.field("turn_idx") <= hi)
    return f


def _read_conv_range(input_path, conv_id, columns, lo=None, hi=None):
    import pyarrow.dataset as pds

    dset = pds.dataset(input_path)
    tbl = dset.to_table(
        columns=columns, filter=_conv_dataset_filter(conv_id, lo, hi)
    )
    return tbl.sort_by("turn_idx")


def _parse_giant_conversation(
    input_path,
    conv_id,
    bucket_id,
    out_dir,
    cfg_ref,
    n_buckets,
    chunk_size=None,
    head=256,
):
    """Parse one oversized conversation chunk-parallel, streaming chunk
    ranges from storage, and write its full sink set under its
    dedicated heavy bucket.

    Three phases, none of which materializes the conversation anywhere:

    1. **Speculative scans** run as Ray tasks that READ THEIR OWN
       turn-range from storage (parquet predicate pushdown on
       conv_id + turn_idx).  Each returns small stitch metadata (the
       first ``head`` state signatures / texts, the end scanner, the
       positions of its command discoveries) plus an object-store
       payload of its records that the driver never fetches.
    2. **Stitch walk** (driver, sequential but tiny): the true state
       crosses each boundary by re-scanning at most ``head`` lines
       (terminal sessions re-synchronize at prompts; a chunk that
       fails to converge is re-read and re-scanned -- the sequential
       worst case, never an error).  The walk yields each chunk's
       counter deltas and accumulates the conversation-wide
       command-backfill map from the discovery positions.
    3. **Finalize tasks** (parallel): each chunk's records are shifted,
       assembled against the complete backfill map, enriched, and
       written as that chunk's part file in every sink -- the driver
       only combines the returned counter partials into the manifest.

    Routed sink rows land under ``bucket=<heavy id>`` so the heavy
    bucket's manifest owns them and resume stays exactly-once (a hash
    bucket's cleanup can never delete them).
    """
    import ray

    from ..vt.chunked import (
        _shift_record,
        _shift_scanner,
        speculative_scan,
        state_sig,
    )
    from ..vt.session import SessionScanner

    meta = _read_conv_range(input_path, conv_id, ["turn_idx", "ts"])
    idxs = meta.column("turn_idx").to_pylist()
    n = len(idxs)
    if n == 0:
        _commit_bucket(
            out_dir, bucket_id, input_path, n_buckets,
            {}, pa.table({"role": pa.array([], pa.string()),
                          "sink": pa.array([], pa.string())}),
        )
        return
    if chunk_size is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        chunk_size = max(500, n // max(2 * n_cpus, 4))

    bounds = list(range(0, n, chunk_size))

    @ray.remote(num_cpus=1, num_returns=2)
    def _spec(lo_idx, hi_idx, start_pos):
        tbl = _read_conv_range(
            input_path, conv_id, ["turn_idx", "text"], lo_idx, hi_idx
        )
        texts = tbl.column("text").to_pylist()
        recs, sigs, counters, sc = speculative_scan(texts, start_pos)
        vim_texts = {
            start_pos + i: texts[i] for i, r in enumerate(recs) if r.in_vim
        }
        # command/cwd discovery positions (speculative numbering; the
        # driver shifts and filters them after convergence)
        disc = [
            (start_pos + i, r.cmd_count, r.command, r.cwd)
            for i, r in enumerate(recs)
            if r.command is not None or r.cwd
        ]
        stitch_meta = (sigs[:head], counters[:head], sc, texts[:head], disc)
        payload = (recs, vim_texts)
        return stitch_meta, payload

    meta_refs, payload_refs = [], []
    for b in bounds[1:]:
        e = min(b + chunk_size, n) - 1
        m_ref, p_ref = _spec.remote(idxs[b], idxs[e], b)
        meta_refs.append(m_ref)
        payload_refs.append(p_ref)

    @ray.remote(num_cpus=1)
    def _finalize(
        head_recs, head_vim, payload_ref, converged, deltas,
        cmd_map, cwd_map, base, lo_idx, hi_idx, part_idx,
    ):
        from ..stages.scan import records_to_table

        recs = list(head_recs)
        vim_texts = dict(head_vim)
        if payload_ref is not None:
            s_recs, s_vim = payload_ref
            d_cmd, d_num, d_vim = deltas
            for rec in s_recs[converged + 1 :]:
                recs.append(_shift_record(rec, d_cmd, d_num, d_vim))
            for pos, t in s_vim.items():
                if pos > base + converged:
                    vim_texts[pos] = t
        ts_tbl = _read_conv_range(
            input_path, conv_id, ["turn_idx", "ts"], lo_idx, hi_idx
        )
        out = records_to_table(
            conv_id, recs, ts_vals=ts_tbl.column("ts"), texts=None,
            carry=(dict(cmd_map), dict(cwd_map)),
        )
        out = out.set_column(
            out.schema.get_field_index("vim_text"),
            "vim_text",
            pa.array(
                [
                    vim_texts.get(base + i) if recs[i].in_vim else None
                    for i in range(len(recs))
                ],
                pa.string(),
            ),
        )
        enriched = EnrichTurns(cfg_ref)(out)
        sinks = _write_bucket_outputs(
            enriched, bucket_id, out_dir, part=f"part-{part_idx:05d}"
        )
        roll = {
            "n_turns": len(recs),
            "n_cmds": max((r.cmd_count for r in recs), default=0),
            "vim_ids": {
                r.vim_session_id for r in recs if r.vim_session_id >= 0
            },
            "role_counts": _counts(enriched.column("role")),
            "sink_counts": _counts(enriched.column("sink")),
        }
        return sinks, roll

    # ---- phase 2: stitch walk (sequential, bounded per boundary) ----
    cmd_map, cwd_map = {}, {}

    def discover(rec):
        if rec.command is not None:
            cmd_map.setdefault(rec.cmd_count, rec.command)
        if rec.cwd:
            cwd_map.setdefault(rec.cmd_count, rec.cwd)

    finalize_args = []  # per chunk: (head_recs, head_vim, use_payload,
    #                     converged, deltas, base, lo, hi)

    # chunk 0: true scan (bounded read)
    e0 = min(chunk_size, n) - 1
    texts0 = _read_conv_range(
        input_path, conv_id, ["turn_idx", "text"], idxs[0], idxs[e0]
    ).column("text").to_pylist()
    sc = SessionScanner()
    recs0 = [sc.scan_turn(i, t) for i, t in enumerate(texts0)]
    for r in recs0:
        discover(r)
    vim0 = {i: texts0[i] for i, r in enumerate(recs0) if r.in_vim}
    finalize_args.append((recs0, vim0, False, -1, None, 0, idxs[0], idxs[e0]))

    for k, b in enumerate(bounds[1:], start=1):
        s_sigs, s_counters, s_end, head_texts, s_disc = ray.get(meta_refs[k - 1])
        e = min(b + chunk_size, n) - 1
        head_recs = []
        head_vim = {}
        converged = None
        for j, text in enumerate(head_texts):
            rec = sc.scan_turn(b + j, text)
            head_recs.append(rec)
            discover(rec)
            if rec.in_vim:
                head_vim[b + j] = text
            if state_sig(sc) == s_sigs[j]:
                converged = j
                break
        if converged is not None:
            d_cmd = sc.cmd_count - s_counters[converged][0]
            d_num = sc.cmd_number - s_counters[converged][1]
            d_vim = sc.vim_session_seq - s_counters[converged][2]
            for pos, cc, cmd, cwd in s_disc:
                if pos <= b + converged:
                    continue  # pre-convergence speculation: head owns it
                if cmd is not None:
                    cmd_map.setdefault(cc + d_cmd, cmd)
                if cwd:
                    cwd_map.setdefault(cc + d_cmd, cwd)
            sc = _shift_scanner(s_end, d_cmd, d_num, d_vim)
            finalize_args.append(
                (head_recs, head_vim, True, converged,
                 (d_cmd, d_num, d_vim), b, idxs[b], idxs[e])
            )
        else:
            # no convergence within the head: fetch the full chunk and
            # finish sequentially (worst case, still correct)
            full = _read_conv_range(
                input_path, conv_id, ["turn_idx", "text"], idxs[b], idxs[e]
            ).column("text").to_pylist()
            for j in range(len(head_texts), len(full)):
                rec = sc.scan_turn(b + j, full[j])
                head_recs.append(rec)
                discover(rec)
                if rec.in_vim:
                    head_vim[b + j] = full[j]
            finalize_args.append(
                (head_recs, head_vim, False, -1, None, b, idxs[b], idxs[e])
            )

    # ---- phase 3: parallel finalize (complete backfill map known) ----
    refs = []
    for part_idx, (h_recs, h_vim, use_payload, conv_j, deltas, base, lo, hi) in enumerate(
        finalize_args
    ):
        refs.append(
            _finalize.remote(
                h_recs,
                h_vim,
                payload_refs[part_idx - 1] if use_payload else None,
                conv_j,
                deltas,
                cmd_map,
                cwd_map,
                base,
                lo,
                hi,
                part_idx,
            )
        )

    sinks_total = {}
    agg_role, agg_sink = {}, {}
    roll_state = {"n_turns": 0, "n_cmds": 0, "vim_ids": set()}
    for sinks, roll in ray.get(refs):
        for k2, v in sinks.items():
            cur = sinks_total.setdefault(k2, {"rows": 0, "files": []})
            cur["rows"] += v["rows"]
            cur["files"].extend(v["files"])
        roll_state["n_turns"] += roll["n_turns"]
        roll_state["n_cmds"] = max(roll_state["n_cmds"], roll["n_cmds"])
        roll_state["vim_ids"] |= roll["vim_ids"]
        for r, c in roll["role_counts"].items():
            agg_role[r] = agg_role.get(r, 0) + c
        for s, c in roll["sink_counts"].items():
            agg_sink[s] = agg_sink.get(s, 0) + c

    # conv-level rollup correction: per-chunk rollup rows were written
    # incrementally; replace them with the single correct row
    import pyarrow.parquet as pq

    roll_dir = os.path.join(out_dir, "sinks", "conv_rollup", f"bucket={bucket_id}")
    if os.path.isdir(roll_dir):
        import shutil

        shutil.rmtree(roll_dir)
    roll_tbl = pa.table(
        {
            "conv_id": pa.array([conv_id], pa.string()),
            "n_turns": pa.array([roll_state["n_turns"]], pa.int64()),
            "n_cmds": pa.array([roll_state["n_cmds"]], pa.int64()),
            "n_vim_sessions": pa.array(
                [len(roll_state["vim_ids"])], pa.int64()
            ),
        }
    )
    os.makedirs(roll_dir, exist_ok=True)
    _atomic_write_table(
        roll_tbl, os.path.join(roll_dir, "part-00000.parquet")
    )
    sinks_total["conv_rollup"] = {
        "rows": 1, "files": ["part-00000.parquet"]
    }

    M.write_manifest(
        out_dir,
        bucket_id,
        {
            "bucket": bucket_id,
            "input": input_path,
            "n_buckets": n_buckets,
            "sinks": sinks_total,
            "role_counts": agg_role,
            "sink_counts": agg_sink,
        },
    )


def find_heavy_conversations(input_path, threshold: int) -> dict:
    """Pre-pass: per-conversation turn counts, entirely in the data
    plane (narrow read of conv_id only, per-batch partial counts, small
    conv_id groupby, threshold filter BEFORE collection) -- the driver
    only ever holds the few heavy conversations, never the full
    conv -> count map."""
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

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("conv_id")
        .sum("n")
    )

    def heavy_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("sum(n)"), threshold))

    rows = totals.map_batches(heavy_only, batch_format="pyarrow").take_all()
    return {r["conv_id"]: r["sum(n)"] for r in rows}


def _run_bucketed(
    input_path,
    out_dir,
    n_buckets=None,
    wave_buckets=None,
    cfg=None,
    resume=True,
    skew_threshold=None,
):
    """Generic-input plan: storage scatter-gather.

    scatter (read each input file once -> split by conv bucket ->
    staged parquet) -> gather (one task per bucket fusing scan +
    enrich + all sink writes + manifest commit).  No stage re-reads
    the input or the parsed output; aggregates combine the tiny
    per-bucket counts recorded in the manifests.

    ``skew_threshold``: conversations with more turns than this get a
    dedicated partition each, parsed chunk-parallel (conv_id-salting's
    safe sibling: a giant conversation can dominate a hash bucket, so
    it is isolated; splitting one *across* partitions uses the
    speculative FSM stitch in vt/chunked.py).

    ``wave_buckets`` is accepted for API compatibility and ignored:
    per-bucket in-task manifest commits give finer-grained resume than
    waves did, without waves' repeated input scans.
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    # Pick the bucket count for parallelism, then PIN it in the run
    # manifest: bucket assignment is hash(conv_id) % n_buckets, so every
    # resumed attempt must reuse the first attempt's count or completed
    # buckets would cover a different conversation set.  The default
    # targets ~4 gather tasks per CPU: enough buckets that the slowest
    # bucket can't dominate the tail, few enough that per-bucket
    # overhead (staged-file opens, sink files, manifests) stays small.
    prior = M.read_run_manifest(out_dir) if resume else None
    if prior and prior.get("n_buckets"):
        n_buckets = prior["n_buckets"]
    elif n_buckets is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        n_buckets = max(128, 4 * n_cpus)
    M.write_run_manifest(
        out_dir, {"plan": "bucketed", "n_buckets": n_buckets}
    )
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

    heavy_bucket_ids = frozenset(heavy_ids.values())
    heavy_todo = [
        (conv, bucket_id)
        for conv, bucket_id in heavy_ids.items()
        if bucket_id in todo
    ]
    if heavy_todo:
        # overlap the giants: each _parse_giant_conversation alternates
        # parallel Ray phases with a sequential driver-side stitch walk,
        # so running several giants from driver threads lets one giant's
        # stitch overlap another's scan/finalize tasks
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(heavy_todo))) as ex:
            futs = [
                ex.submit(
                    _parse_giant_conversation,
                    input_path, conv, bucket_id, out_dir, cfg_ref, n_buckets,
                )
                for conv, bucket_id in heavy_todo
            ]
            for f in futs:
                f.result()

    wanted = frozenset(todo) - heavy_bucket_ids
    if wanted:
        # Storage scatter-gather shuffle.  Ray's sort-based groupby
        # measured ~16s of wall per 10M-row exchange here (the sample
        # sort + merge dominate); scattering through storage instead
        # streams phase 1 fully and gives phase 2 one independent task
        # per bucket -- and staged files double as the shuffle's spill,
        # exactly how a 256-node run would externalize this exchange.
        import glob as _g
        import shutil as _sh

        staging = os.path.join(out_dir, "_staging")
        in_files = sorted(_g.glob(os.path.join(input_path, "*.parquet")))
        if not in_files and os.path.isfile(input_path):
            in_files = [input_path]
        # ~2 scatter tasks per CPU: enough for balance, few enough that
        # the staged-file count stays ~n_tasks x n_buckets, not
        # n_files x n_buckets
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        n_chunks = min(len(in_files), max(1, 2 * n_cpus))
        chunks = [
            in_files[i::n_chunks] for i in range(n_chunks)
        ]
        items = [
            {"item": {"paths": ps, "idx": i}}
            for i, ps in enumerate(chunks)
            if ps
        ]
        ray.data.from_items(
            items, override_num_blocks=max(1, len(items))
        ).map_batches(
            _scatter_task(staging, n_buckets, wanted, heavy_ids),
            batch_format="pyarrow",
            batch_size=None,
        ).count()
        buckets = sorted(wanted)
        ray.data.from_items(
            buckets, override_num_blocks=len(buckets)
        ).map_batches(
            _gather_task(staging, out_dir, cfg_ref, input_path, n_buckets),
            batch_format="pyarrow",
            batch_size=None,
        ).count()
        # every wanted bucket committed (empty ones inside the gather);
        # the staged shuffle files are no longer needed
        _sh.rmtree(staging, ignore_errors=True)

    _write_aggregates_from_manifests(out_dir)

    routed = 0
    for b in M.completed_buckets(out_dir):
        for k, s in _load_manifest_sinks(out_dir, b).items():
            if k.startswith("by_role"):
                routed += s.get("rows", 0)
    return {
        "buckets": n_buckets,
        "ran": len(todo),
        "skipped": len(done),
        "routed_rows": routed,
    }


def _write_aggregates_from_manifests(out_dir: str):
    """Cumulative per-sink counts from ALL committed manifests (tiny):
    a resumed run's aggregates cover skipped buckets too."""
    import collections

    role_total = collections.Counter()
    sink_total = collections.Counter()
    for b in M.completed_buckets(out_dir):
        with open(M.manifest_path(out_dir, b)) as fh:
            payload = json.load(fh)
        role_total.update(payload.get("role_counts", {}))
        sink_total.update(payload.get("sink_counts", {}))

    agg_dir = os.path.join(out_dir, "aggregates")
    os.makedirs(agg_dir, exist_ok=True)
    _atomic_write_table(
        pa.table(
            {
                "role": pa.array(list(role_total), pa.string()),
                "n": pa.array(list(role_total.values()), pa.int64()),
            }
        ),
        os.path.join(agg_dir, "counts_by_role.parquet"),
    )
    _atomic_write_table(
        pa.table(
            {
                "sink": pa.array(list(sink_total), pa.string()),
                "n": pa.array(list(sink_total.values()), pa.int64()),
            }
        ),
        os.path.join(agg_dir, "counts_by_sink.parquet"),
    )


def _load_manifest_sinks(out_dir: str, bucket: int) -> dict:
    with open(M.manifest_path(out_dir, bucket)) as fh:
        return json.load(fh).get("sinks", {})
