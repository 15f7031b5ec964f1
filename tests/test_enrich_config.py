"""Todo-list config loading and broadcast enrichment lookups."""

import json

import pyarrow as pa

from console_log_parser_ray.stages.enrich import EnrichConfig, EnrichTurns
from console_log_parser_ray.state.config import load_todo_config, parse_todo_json


def test_parse_todo_json_strips_comments():
    text = '{ /* a comment\n spanning lines */ "a": 1, "b": [2] /*x*/ }'
    assert parse_todo_json(text) == {"a": 1, "b": [2]}


def test_reference_sample_config_loads(tmp_path):
    # the reference's own sample breaks json.load (test_list.json:2);
    # our loader parses it
    src = open("/root/reference/test/resources/test_list.json").read()
    p = tmp_path / "list.json"
    p.write_text(src)
    cfg, suppress_map, files = load_todo_config(str(p))
    assert isinstance(cfg, EnrichConfig)
    assert files


def test_todo_config_side_tables(tmp_path):
    data = {
        "files": [
            {"id": "s1", "in": "s1.log", "title": "Session 1"},
            {"id": "s2", "in": "s2.log"},
        ],
        "s1-chapters": {"2": "Getting started"},
        "s1-suppress": [3, 5],
        "s1-hopto": {"id": "s2", "hops": [4, 7]},
    }
    p = tmp_path / "todo.json"
    p.write_text(json.dumps(data))
    cfg, suppress_map, files = load_todo_config(str(p))
    assert cfg.chapters[("s1", 2)] == "Getting started"
    assert ("s1", 3) in cfg.suppress and ("s1", 5) in cfg.suppress
    assert suppress_map["s1"] == [3, 5]
    assert cfg.hopto[("s1", 4)] == "s2#c7"


def test_hopto_renumbers_through_target_suppress(tmp_path):
    """Reference HopTarget.get_target_cmd: a hop into a file whose
    earlier commands are suppressed anchors to the raw cmd_count but
    DISPLAYS the renumbered command (terminal2html.py:16-38)."""
    data = {
        "files": [
            {"id": "s1", "in": "s1.log"},
            {"id": "s2", "in": "s2.log"},
        ],
        # target file s2 suppresses commands 2, 3 and 9: a hop to raw
        # command 7 displays as 7 - |{2,3}| = 5 (9 > 7 doesn't count)
        "s2-suppress": [2, 3, 9],
        "s1-hopto": {
            "id": "s2",
            "pre": "see",
            "to": "session two",
            "post": "for details",
            "hops": [4, 7, 6, 1],
        },
    }
    p = tmp_path / "todo.json"
    p.write_text(json.dumps(data))
    cfg, _suppress, _files = load_todo_config(str(p))
    # anchors keep the raw command number
    assert cfg.hopto[("s1", 4)] == "s2#c7"
    assert cfg.hopto[("s1", 6)] == "s2#c1"
    # display labels renumber through the target's suppress list
    assert cfg.hop_labels[("s1", 4)] == "see jump to session two command 5 for details"
    assert cfg.hop_labels[("s1", 6)] == "see jump to session two command 1 for details"


def test_hop_target_cmd_matches_reference():
    """Pin the renumbering against the reference implementation."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from terminal2html import HopTarget
    finally:
        sys.path.remove("/root/reference")
    from console_log_parser_ray.state.config import hop_target_cmd

    for filt in ([], [1], [2, 3, 9], [5, 6, 7], [1, 2, 3, 4]):
        ref = HopTarget("x", "x.html", filt)
        for hop in range(1, 12):
            assert hop_target_cmd(hop, filt) == int(
                ref.get_target_cmd(hop)
            ), (filt, hop)


def test_enrich_lookups():
    cfg = EnrichConfig(
        chapters={("c1", 2): "Intro"},
        suppress={("c1", 3)},
        hopto={("c1", 2): "c2#c5"},
    )
    batch = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
            "cmd_count": pa.array([2, 3, 2], pa.int32()),
            "command": pa.array(["git status", "ls -la", ""], pa.string()),
        }
    )
    out = EnrichTurns(cfg)(batch)
    assert out.column("tool").to_pylist() == ["git", "ls", ""]
    assert out.column("tool_family").to_pylist() == ["vcs", "shell", ""]
    assert out.column("sink").to_pylist() == ["vcs", "shell", "none"]
    assert out.column("chapter_title").to_pylist() == ["Intro", "", ""]
    assert out.column("suppressed").to_pylist() == [False, True, False]
    assert out.column("hop_to").to_pylist() == ["c2#c5", "", ""]
