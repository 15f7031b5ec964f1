"""Per-turn conformance of the session scanner vs the reference oracle.

The acceptance rule: per-turn clean-text equality under stable
(conv_id, turn_idx) ordering, identical prompt/vim event placement, and
identical command-row numbering -- for every file in the reference's
own corpus, with and without the vectorized fast paths.
"""

from collections import Counter

import pytest

from console_log_parser_ray.stages.scan import _fast_hints, scan_conversation
from console_log_parser_ray.vt.session import SessionScanner
from tests.conftest import CORPUS


def _decode(lines):
    out = []
    for raw in lines:
        has_eol = raw.endswith(b"\n")
        out.append((raw[:-1].decode() if has_eol else raw.decode(), has_eol))
    return out


def _scan(lines, fast=False):
    decoded = _decode(lines)
    texts = [t for t, _ in decoded]
    if fast:
        import pyarrow as pa

        hints = _fast_hints(pa.chunked_array([pa.array(texts)]))
        cols, sc = scan_conversation(
            "c",
            texts,
            list(range(len(texts))),
            [0] * len(texts),
            hints=hints,
            has_eols=[e for _, e in decoded],
        )
        return cols
    sc = SessionScanner()
    recs = [
        sc.scan_turn(i, t, eol) for i, (t, eol) in enumerate(_decode(lines))
    ]
    return {
        "clean_text": [r.clean_text for r in recs],
        "_recs": recs,
    }


@pytest.mark.parametrize("stem", CORPUS)
def test_clean_text_matches_oracle(stem, corpus_lines, oracle_results):
    lines = corpus_lines[stem]
    oracle = oracle_results[stem]
    got = _scan(lines)["clean_text"]
    for i, (mine, ref) in enumerate(zip(got, oracle.per_line)):
        assert mine == ref, f"{stem} line {i}: {mine!r} != {ref!r}"


@pytest.mark.parametrize("stem", CORPUS)
def test_fast_paths_are_exact(stem, corpus_lines):
    lines = corpus_lines[stem]
    slow = _scan(lines)["clean_text"]
    fast = _scan(lines, fast=True)["clean_text"]
    for i, (a, b) in enumerate(zip(slow, fast)):
        assert a == b, f"{stem} line {i}: fast {b!r} != slow {a!r}"


@pytest.mark.parametrize("stem", CORPUS)
def test_events_match_oracle(stem, corpus_lines, oracle_results):
    lines = corpus_lines[stem]
    recs = _scan(lines)["_recs"]
    mine = Counter()
    for r in recs:
        if r.is_prompt:
            mine[(r.turn_idx, "prompt_start")] += 1
        if r.prompt_active:
            mine[(r.turn_idx, "prompt_active")] += 1
        if r.command is not None:
            mine[(r.turn_idx, "prompt_end")] += 1
        if r.vim_started:
            mine[(r.turn_idx, "vim_start")] += 1
        if r.vim_ended:
            mine[(r.turn_idx, "vim_end")] += 1
    ref = Counter((l, e) for (l, e, _p) in oracle_results[stem].events)
    assert mine == ref


@pytest.mark.parametrize("stem", CORPUS)
def test_cmd_rows_match_oracle(stem, corpus_lines, oracle_results):
    recs = _scan(corpus_lines[stem])["_recs"]
    mine = [
        (r.turn_idx, r.cmd_count) for r in recs if r.is_prompt
    ]
    assert mine == oracle_results[stem].cmd_rows


def test_suppression_matches_oracle(corpus_lines):
    from refbridge import run_reference

    lines = corpus_lines["session_win_1"]
    oracle = run_reference(lines, cmd_filter=[2, 5])
    sc = SessionScanner(suppress=[2, 5])
    recs = [
        sc.scan_turn(i, t, eol) for i, (t, eol) in enumerate(_decode(lines))
    ]
    for i, (r, ref) in enumerate(zip(recs, oracle.per_line)):
        assert r.clean_text == ref, f"line {i}"


def test_stats_match_oracle(corpus_lines, oracle_results):
    for stem in ("testtermlog_3", "testtermlog_4", "session_linux_1"):
        oracle = oracle_results[stem]
        sc = SessionScanner(collect_stats=True)
        for i, (t, eol) in enumerate(_decode(corpus_lines[stem])):
            sc.scan_turn(i, t, eol)
        assert sc.stats["control_function"] == oracle.control_functions
        assert sc.stats["escape"] == {
            k: v for k, v in oracle.escape_sequences.items()
        }
        assert sc.stats["csi"] == oracle.control_sequences
        assert sc.stats["dcs_function"] == oracle.dcs_functions
        assert sc.osc_seen == oracle.os_commands
        assert sc.dcs_seen == oracle.dcs_strings


def test_fast_paths_are_exact_on_synth_all_columns():
    """Fast/slow parity across EVERY output column on synthetic
    conversations (covers the prompt-flush fast path, vim interiors,
    noise lines, SGR lines)."""
    from console_log_parser_ray.sources.synth import gen_table
    from console_log_parser_ray.stages.scan import scan_bucket_table

    tbl = gen_table(30, seed=99, mean_turns=60).select(
        ["conv_id", "turn_idx", "text"]
    )
    fast = scan_bucket_table(tbl, use_fast_paths=True)
    slow = scan_bucket_table(tbl, use_fast_paths=False)
    assert fast.equals(slow)
