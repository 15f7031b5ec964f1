"""Resumable routed sinks: bucketed Parquet with lineage manifests.

Output layout (north rule: "per-partition lineage manifests + metrics"):

    <out_dir>/
      sinks/
        by_role/ role=<r>/ bucket=<b>/ *.parquet
        by_tool/ sink=<s>/ bucket=<b>/ *.parquet
        vim_sessions/ bucket=<b>/ *.parquet
      _manifest/
        bucket-<b>.json     # rows per sink, written files, input lineage

Conversations are assigned to ``n_buckets`` partitions by a stable hash
of ``conv_id``.  A bucket's manifest is written only after every sink
finished writing that bucket, so a killed run leaves at most one
unfinished bucket per sink; on restart completed buckets are skipped
(their conversations are filtered out at the read) and the remaining
buckets re-run idempotently (their partition directories are replaced).
"""

from __future__ import annotations

import json
import os
import shutil
import zlib


def conv_bucket(conv_id: str, n_buckets: int) -> int:
    return zlib.crc32(conv_id.encode()) % n_buckets


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"bucket-{bucket:05d}.json")


def completed_buckets(out_dir: str) -> set:
    md = manifest_dir(out_dir)
    if not os.path.isdir(md):
        return set()
    out = set()
    for name in os.listdir(md):
        if name.startswith("bucket-") and name.endswith(".json"):
            out.add(int(name[len("bucket-"):-len(".json")]))
    return out


def clean_bucket_outputs(out_dir: str, bucket: int):
    """Remove partial output of an uncommitted bucket from every sink
    (including the primary parsed/ sink -- writers append into existing
    partition directories, so stale files would duplicate rows)."""
    needle = f"bucket={bucket}"
    for sub in ("sinks", "parsed"):
        root_dir = os.path.join(out_dir, sub)
        if not os.path.isdir(root_dir):
            continue
        for root, dirs, _files in os.walk(root_dir):
            for d in list(dirs):
                if d == needle:
                    shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                    dirs.remove(d)


def write_manifest(out_dir: str, bucket: int, payload: dict):
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    tmp = manifest_path(out_dir, bucket) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, sort_keys=True)
    os.replace(tmp, manifest_path(out_dir, bucket))


def run_manifest_path(out_dir: str) -> str:
    return os.path.join(manifest_dir(out_dir), "run.json")


def read_run_manifest(out_dir: str) -> dict | None:
    path = run_manifest_path(out_dir)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def write_run_manifest(out_dir: str, payload: dict):
    """Run-level parameters (e.g. the bucket count) that every resumed
    attempt must reuse for partition assignment to stay stable."""
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    tmp = run_manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, sort_keys=True)
    os.replace(tmp, run_manifest_path(out_dir))


def partition_manifest_path(out_dir: str, kind: str, pid: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"{kind}-{pid:05d}.json")


def completed_partitions(out_dir: str, kind: str) -> set:
    md = manifest_dir(out_dir)
    if not os.path.isdir(md):
        return set()
    pref = kind + "-"
    out = set()
    for name in os.listdir(md):
        if name.startswith(pref) and name.endswith(".json"):
            out.add(int(name[len(pref):-len(".json")]))
    return out


def clean_partition_outputs(out_dir: str, kind: str, pid: int):
    """Remove uncommitted partition output under every sink directory."""
    sinks_root = os.path.join(out_dir, "sinks")
    if not os.path.isdir(sinks_root):
        return
    needle = f"{kind}={pid}"
    for root, dirs, _files in os.walk(sinks_root):
        for d in list(dirs):
            if d == needle:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                dirs.remove(d)


def write_partition_manifest(out_dir: str, kind: str, pid: int, payload: dict):
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    tmp = partition_manifest_path(out_dir, kind, pid) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, sort_keys=True)
    os.replace(tmp, partition_manifest_path(out_dir, kind, pid))


def collect_bucket_metrics(out_dir: str, bucket: int) -> dict:
    """Row counts + file lists per sink for one bucket (for lineage)."""
    import pyarrow.parquet as pq

    sinks_root = os.path.join(out_dir, "sinks")
    needle = f"bucket={bucket}"
    metrics = {}
    for root, dirs, files in os.walk(sinks_root):
        if os.path.basename(root) == needle:
            rel = os.path.relpath(root, sinks_root)
            rows = 0
            flist = []
            for f in files:
                if f.endswith(".parquet"):
                    rows += pq.read_metadata(os.path.join(root, f)).num_rows
                    flist.append(f)
            metrics[rel] = {"rows": rows, "files": sorted(flist)}
    return metrics
