"""Replay sink (SURVEY S8) and typing simulator (M10) conformance.

The engine's ReplayScanner is differential-pinned against the reference
replay path (terminalreplay.VT2Output driven in-process with sleeps
captured; the reference's vim_start arity crash patched identically on
both sides — see functions/replay.py module docstring) on the full
reference corpus in all four mode combinations, comparing both the
emitted text AND the simulated typing schedule chunk-for-chunk.
"""

import glob
import io
import os
import sys

import pyarrow as pa
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from refbridge import read_log_lines, run_reference_replay  # noqa: E402

from console_log_parser_ray.functions.replay import (  # noqa: E402
    normalize_schedule,
    play,
    replay_schedule,
    replay_table,
)

CORPUS = sorted(glob.glob("/root/reference/test/resources/*.log"))
MODES = [
    (True, False),
    (True, True),
    (False, False),
    (False, True),
]


def _round(sched):
    # float delays accumulate identically on both sides (same literal
    # arithmetic), but round defensively for comparison stability
    return [(round(d, 9), t) for d, t in sched]


@pytest.mark.parametrize("path", CORPUS, ids=[os.path.basename(p) for p in CORPUS])
@pytest.mark.parametrize(
    "cleanup,print_vim", MODES, ids=["clean", "clean+vim", "raw", "raw+vim"]
)
def test_replay_matches_reference(path, cleanup, print_vim):
    lines = read_log_lines(path)
    expect = _round(
        run_reference_replay(lines, cleanup_cmdline=cleanup, print_vim=print_vim)
    )
    got = _round(
        replay_schedule(lines, cleanup_cmdline=cleanup, print_vim=print_vim)
    )
    assert got == expect


@pytest.mark.parametrize("speed", [1.0, 7.5])
def test_replay_speed_scales_delays(speed):
    lines = read_log_lines(CORPUS[2])  # testtermlog_1: prompts, no vim
    expect = _round(run_reference_replay(lines, speed=speed))
    got = _round(replay_schedule(lines, speed=speed))
    assert got == expect
    assert sum(d for d, _ in got) > 0


def test_replay_table_per_turn_attribution():
    # per-turn replay text concatenates back to the conversation stream,
    # and multiple conversations in one table stay independent
    paths = [CORPUS[0], CORPUS[4]]  # session_linux_1 (vim), testtermlog_0
    cols = {"conv_id": [], "turn_idx": [], "text": [], "has_eol": []}
    whole = {}
    for p in paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        lines = read_log_lines(p)
        whole[stem] = "".join(
            t for _, t in run_reference_replay(lines)
        )
        for i, raw in enumerate(lines):
            eol = raw.endswith(b"\n")
            cols["conv_id"].append(stem)
            cols["turn_idx"].append(i)
            cols["text"].append((raw[:-1] if eol else raw).decode("utf-8"))
            cols["has_eol"].append(eol)
    tbl = pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "text": pa.array(cols["text"], pa.string()),
            "has_eol": pa.array(cols["has_eol"], pa.bool_()),
        }
    )
    out = replay_table(tbl)
    assert out.num_rows == tbl.num_rows
    df = out.to_pandas()
    for stem, group in df.groupby("conv_id"):
        group = group.sort_values("turn_idx")
        assert "".join(group["replay_text"]) == whole[stem]
        assert (group["replay_delay"] >= 0).all()
        assert group["replay_delay"].sum() > 0 or stem.startswith("testtermlog_0")


def test_play_writes_schedule_in_order():
    sched = normalize_schedule(
        [(0, 0.0, "a"), (0, 0.5, "b"), (1, 0.0, "c"), (1, 0.25, "d")]
    )
    assert sched == [(0.0, "a"), (0.5, "b"), (0.25, "d")] or sched == [
        (0.0, "a"),
        (0.5, "bc"),
        (0.25, "d"),
    ]
    buf = io.StringIO()
    slept = []
    play(sched, buf, sleep_fn=slept.append)
    assert buf.getvalue() == "".join(t for _, t in sched)
    assert slept == [d for d, _ in sched if d > 0]
    buf2 = io.StringIO()
    play(sched, buf2, sleep_fn=None)  # --instant
    assert buf2.getvalue() == buf.getvalue()


def test_stream_replay_dataset(ray_session):
    import ray

    rows = []
    for p in CORPUS[:3]:
        stem = os.path.splitext(os.path.basename(p))[0]
        for i, raw in enumerate(read_log_lines(p)):
            eol = raw.endswith(b"\n")
            rows.append(
                {
                    "conv_id": stem,
                    "turn_idx": i,
                    "text": (raw[:-1] if eol else raw).decode("utf-8"),
                    "has_eol": eol,
                }
            )
    from console_log_parser_ray.functions.replay import stream_replay

    ds = ray.data.from_items(rows)
    got = stream_replay(ds, n_buckets=4).to_pandas()
    assert len(got) == len(rows)
    # matches the table-level operator exactly
    tbl = pa.Table.from_pylist(rows)
    want = replay_table(tbl).to_pandas()
    key = ["conv_id", "turn_idx"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want)
