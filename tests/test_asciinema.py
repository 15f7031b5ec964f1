"""Asciinema source: frame->line assembly, header validation, vim
recording extraction with quantized timestamps."""

import json

import numpy as np
import pyarrow as pa
import pytest

from console_log_parser_ray.sources.asciinema import (
    FRAME_SCHEMA,
    frames_to_turns,
    parse_header,
    quantize_gap,
    quantize_gaps,
)


def test_parse_header():
    info = parse_header(json.dumps({"version": 2, "width": 80, "height": 24}))
    assert info["width"] == 80
    with pytest.raises(ValueError):
        parse_header(json.dumps({"version": 1}))


def test_quantize_matches_reference_steps():
    # reference asciinema2html.py:226-230
    cases = {5.0: 4.0, 4.0: 4.0, 3.0: 2.0, 0.9: 0.5, 0.2: 0.18, 0.05: 0.03,
             0.01: 0.01}
    for gap, want in cases.items():
        assert quantize_gap(gap) == want
    gaps = np.array(list(cases))
    assert list(quantize_gaps(gaps)) == [cases[g] for g in cases]


def _frames_table():
    # two conversations; lines split across frames
    rows = {
        "conv_id": [], "frame_idx": [], "ts": [], "data": [],
    }

    def add(conv, idx, ts, data):
        rows["conv_id"].append(conv)
        rows["frame_idx"].append(idx)
        rows["ts"].append(ts)
        rows["data"].append(data)

    add("a", 0, 0.1, "hel")
    add("a", 1, 0.2, "lo\nwor")
    add("a", 2, 0.5, "ld\n")
    add("a", 3, 0.9, "tail")  # unterminated final line
    add("b", 0, 0.3, "x\ny\n")
    return pa.Table.from_arrays(
        [pa.array(rows[f.name], f.type) for f in FRAME_SCHEMA],
        schema=FRAME_SCHEMA,
    )


def test_frames_to_turns(ray_session):
    ray = ray_session
    out = frames_to_turns(ray.data.from_arrow(_frames_table())).take_all()
    by_conv = {}
    for r in sorted(out, key=lambda r: (r["conv_id"], r["turn_idx"])):
        by_conv.setdefault(r["conv_id"], []).append(r)
    a = by_conv["a"]
    assert [r["text"] for r in a] == ["hello", "world", "tail"]
    assert a[0]["has_eol"] and a[1]["has_eol"] and not a[2]["has_eol"]
    # line ts = timestamp of the frame completing the line
    assert a[0]["ts"].timestamp() == pytest.approx(0.2)
    assert a[1]["ts"].timestamp() == pytest.approx(0.5)
    assert [r["text"] for r in by_conv["b"]] == ["x", "y"]


def test_extract_vim_recordings(ray_session):
    ray = ray_session
    from console_log_parser_ray.sources.asciinema import extract_vim_recordings

    # synthetic parsed spans: conv a, session 1 covers ts 10..12 (us 1e7..1.2e7)
    parsed = pa.table(
        {
            "conv_id": pa.array(["a", "a", "a", "a"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
            "ts": pa.array(
                [9_000_000, 10_000_000, 12_000_000, 13_000_000],
                pa.timestamp("us"),
            ),
            "vim_session_id": pa.array([-1, 1, 1, -1], pa.int32()),
        }
    )
    frames = pa.table(
        {
            "conv_id": pa.array(["a"] * 5, pa.string()),
            "frame_idx": pa.array(range(5), pa.int32()),
            "ts": pa.array([9.0, 10.0, 10.05, 11.0, 13.0], pa.float64()),
            "data": pa.array(["pre", "v1", "v2", "v3", "post"], pa.string()),
        }
    )
    recs = extract_vim_recordings(
        ray.data.from_arrow(frames), ray.data.from_arrow(parsed)
    ).take_all()
    datas = [r["data"] for r in sorted(recs, key=lambda r: r["rec_idx"])]
    assert datas == ["v1", "v2", "v3"]
    rel = [r["rel_ts"] for r in sorted(recs, key=lambda r: r["rec_idx"])]
    # gaps: 0 (start), 0.05 -> 0.03 quantized, 0.95 -> 0.5 quantized
    assert rel == [0.0, 0.03, 0.53]
