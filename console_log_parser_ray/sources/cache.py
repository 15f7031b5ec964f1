"""Deterministic transcript datasets cached under /tmp.

The driver's testdata (``/root/testdata/sf*``) has no transcripts
table, so the engine synthesises one per scale factor -- deterministic
(seed 42), generated once, cached as partitioned Parquet.  DuckDB
oracle SQL reads the same files via ``read_parquet``, so the driver's
side-by-side comparison sees one consistent dataset.

Generation is sharded across Ray tasks (one task per conversation
range) when a Ray session is available, falling back to inline
generation for tests.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .synth import gen_table

CACHE_ROOT = "/tmp/clpr_transcripts"

# scale-factor name -> (n_convs, mean_turns)
SIZES = {
    "sf0.001": (60, 40),
    "sf0.01": (500, 50),
    "sf0.1": (50000, 200),
}
_DEFAULT = (60, 40)
SEED = 42
_SHARD_CONVS = 200  # conversations per generation shard / output file


def sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def transcripts_dir(sf_dir: str) -> str:
    return os.path.join(CACHE_ROOT, sf_name(sf_dir))


def transcripts_glob(sf_dir: str) -> str:
    return os.path.join(transcripts_dir(sf_dir), "*.parquet")


ENRICHED_ROOT = "/tmp/clpr_enriched"


def enriched_dir(sf_dir: str) -> str:
    return os.path.join(ENRICHED_ROOT, sf_name(sf_dir))


def ensure_enriched(sf_dir: str) -> str:
    """Parse + enrich the transcripts ONCE per scale factor, cached as
    partitioned parquet under /tmp/clpr_enriched/<sf>/.

    The transcript-ANALYTICS query family (tool_rules, tool_transitions,
    tools_per_conv, role_runs, top_commands, vim_share, turnlen_by_role)
    treats the enriched parse output as its INPUT table; before this
    cache each of them re-ran the full session scan (the most expensive
    stage in the repo) per query.  This is the materialized-view step a
    100 TB deployment would run anyway -- pay the parse once, write
    columnar output, and let every downstream query read a
    column-pruned parquet instead of re-parsing the corpus.

    Build is streaming (read -> session scan -> enrich actor pool ->
    write_parquet); nothing materializes on the driver.  Same
    _SUCCESS-marker + rename protocol as ``ensure_transcripts`` so
    concurrent builders race safely and crashed partial builds are
    discarded.
    """
    src = ensure_transcripts(sf_dir)
    out = enriched_dir(sf_dir)
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    if os.path.exists(out):  # stale partial build from a crashed run
        import shutil

        shutil.rmtree(out, ignore_errors=True)
    tmp = out + ".building.{}".format(os.getpid())

    import ray.data

    from ..pipelines.flagship import parse_sessions
    from ..stages.enrich import enrich

    ds = ray.data.read_parquet(
        src, columns=["conv_id", "turn_idx", "text", "ts"]
    )
    enrich(parse_sessions(ds)).write_parquet(tmp)
    if _files_conv_complete(tmp):
        # the session scan emits one block per conv-hash bucket and
        # write_parquet writes one file per block, so conversations
        # normally never span files; VERIFY rather than assume (a
        # giant bucket can split at the output-block size) and record
        # the property so per-conv consumers can skip their shuffle
        with open(os.path.join(tmp, "_CONV_PARTITIONED"), "w") as fh:
            fh.write("conv_id\n")
    with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
        fh.write("ok\n")
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        if os.path.exists(done):  # lost the race
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return out


def _files_conv_complete(path: str) -> bool:
    """True when no conv_id appears in more than one parquet file.

    Per-file distinct conv sets are collected in parallel Ray tasks
    (one tiny dictionary-encoded column per file) and checked disjoint
    on the driver; driver memory is bounded by the total conversation
    count, which is ~5 orders below row count for this workload.
    """
    import glob

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if len(files) <= 1:
        return True

    def distinct_convs(f):
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq

        t = _pq.read_table(f, columns=["conv_id"])
        return set(pc.unique(t.column("conv_id").combine_chunks()).to_pylist())

    try:
        import ray

        if ray.is_initialized():
            fn = ray.remote(num_cpus=1)(distinct_convs)
            sets = ray.get([fn.remote(f) for f in files])
        else:
            sets = [distinct_convs(f) for f in files]
    except Exception:
        sets = [distinct_convs(f) for f in files]
    seen: set = set()
    for s in sets:
        if seen & s:
            return False
        seen |= s
    return True


def ensure_transcripts(sf_dir: str) -> str:
    """Generate (once) and return the transcripts directory for sf_dir."""
    name = sf_name(sf_dir)
    n_convs, mean_turns = SIZES.get(name, _DEFAULT)
    out = transcripts_dir(sf_dir)
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    if os.path.exists(out):  # stale partial build from a crashed run
        import shutil

        shutil.rmtree(out, ignore_errors=True)
    tmp = out + ".building.{}".format(os.getpid())
    os.makedirs(tmp, exist_ok=True)

    shards = [
        (start, min(_SHARD_CONVS, n_convs - start))
        for start in range(0, n_convs, _SHARD_CONVS)
    ]

    try:
        import ray

        use_ray = ray.is_initialized() and len(shards) > 1
    except Exception:
        use_ray = False

    if use_ray:
        import ray

        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )

        @ray.remote(num_cpus=1)
        def _gen(start, count, path):
            import sys

            if repo_root not in sys.path:
                sys.path.insert(0, repo_root)
            from console_log_parser_ray.sources.synth import gen_table as _gt

            tbl = _gt(count, seed=SEED, mean_turns=mean_turns, start=start)
            pq.write_table(tbl, path, compression="zstd")
            return tbl.num_rows

        refs = [
            _gen.remote(s, c, os.path.join(tmp, f"part-{s:07d}.parquet"))
            for s, c in shards
        ]
        ray.get(refs)
    else:
        for s, c in shards:
            tbl = gen_table(c, seed=SEED, mean_turns=mean_turns, start=s)
            pq.write_table(
                tbl, os.path.join(tmp, f"part-{s:07d}.parquet"), compression="zstd"
            )

    # conversations never span files (each shard covers a conv range),
    # so scans can run file-parallel without a conv_id shuffle
    with open(os.path.join(tmp, "_CONV_PARTITIONED"), "w") as fh:
        fh.write("conv_id\n")
    with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
        fh.write("ok\n")
    try:
        os.rename(tmp, out)
    except OSError:
        # lost the race: another process finished first
        import shutil

        if os.path.exists(done):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return out
