"""CLI parity: single-file text output equals the reference oracle;
batch mode produces per-file outputs and an index."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, cwd=REPO):
    return subprocess.run(
        [sys.executable, "-m", "console_log_parser_ray", *args],
        capture_output=True,
        text=True,
        cwd=cwd,
        timeout=120,
    )


def test_cli_text_output_matches_oracle(oracle_results):
    out = _run_cli(["/root/reference/test/resources/session_win_1.log"])
    assert out.returncode == 0, out.stderr
    assert out.stdout == oracle_results["session_win_1"].text


def test_cli_html_output(tmp_path):
    out = _run_cli(
        ["/root/reference/test/resources/testtermlog_3.log", "-o", str(tmp_path)]
    )
    assert out.returncode == 0, out.stderr
    assert (tmp_path / "testtermlog_3.parquet").exists()
    html = (tmp_path / "testtermlog_3.html").read_text()
    assert "<pre" in html and "testtermlog_3" in html


def test_cli_batch_mode(tmp_path):
    todo = {
        "title": "Demo",
        "files": [
            {"id": "w1", "in": "session_win_1.log", "title": "Win 1"},
            {"id": "l2", "in": "session_linux_2.log"},
        ],
        "w1-suppress": [2],
    }
    # inputs resolved relative to the todo file
    todo_path = tmp_path / "todo.json"
    for name in ("session_win_1.log", "session_linux_2.log"):
        data = open(f"/root/reference/test/resources/{name}", "rb").read()
        (tmp_path / name).write_bytes(data)
    todo_path.write_text(json.dumps(todo))
    out_dir = tmp_path / "out"
    out = _run_cli(["--todo", str(todo_path), "-o", str(out_dir)])
    assert out.returncode == 0, out.stderr
    assert (out_dir / "session_win_1.parquet").exists()
    assert (out_dir / "session_linux_2.html").exists()
    idx = (out_dir / "index.html").read_text()
    assert "session_win_1.html" in idx and "session_linux_2.html" in idx


def test_cli_suppression(tmp_path, oracle_results):
    """Suppression from the todo list drops the suppressed command's
    text, matching the reference's cmd_filter behavior."""
    import pyarrow.parquet as pq

    todo = {
        "files": [{"id": "session_win_1", "in": "session_win_1.log"}],
        "session_win_1-suppress": [2],
    }
    data = open("/root/reference/test/resources/session_win_1.log", "rb").read()
    (tmp_path / "session_win_1.log").write_bytes(data)
    (tmp_path / "todo.json").write_text(json.dumps(todo))
    out_dir = tmp_path / "out"
    out = _run_cli(["--todo", str(tmp_path / "todo.json"), "-o", str(out_dir)])
    assert out.returncode == 0, out.stderr
    t = pq.read_table(out_dir / "session_win_1.parquet")
    from refbridge import run_reference, read_log_lines

    oracle = run_reference(
        read_log_lines("/root/reference/test/resources/session_win_1.log"),
        cmd_filter=[2],
    )
    assert "".join(t.sort_by("turn_idx").column("clean_text").to_pylist()) == oracle.text


def test_cli_batch_base_dirs(tmp_path):
    """base_dir_in/base_dir_out resolve like the reference: absolute
    wins, relative joins the todo file's directory (main.py:177-191);
    a file entry without 'in' is a clean exit-2 error, not a
    traceback."""
    todo = {
        "base_dir_in": "/root/reference/test/resources",
        "base_dir_out": "rendered",
        "files": [{"id": "t3", "in": "testtermlog_3.log"}],
    }
    todo_path = tmp_path / "todo.json"
    todo_path.write_text("/* comment */\n" + json.dumps(todo))
    out = _run_cli(["--todo", str(todo_path)])
    assert out.returncode == 0, out.stderr
    assert (tmp_path / "rendered" / "testtermlog_3.html").exists()
    assert (tmp_path / "rendered" / "index.html").exists()

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"files": [{"id": "x", "file": "y.log"}]}))
    out = _run_cli(["--todo", str(bad)])
    assert out.returncode == 2
    assert "without 'in'" in out.stderr
    assert "Traceback" not in out.stderr


def test_cli_replay_matches_oracle():
    """--replay --instant writes the reference replay stream (the
    typing schedule's text, pacing skipped) to stdout."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from refbridge import read_log_lines, run_reference_replay

    path = "/root/reference/test/resources/testtermlog_1.log"
    expect = "".join(t for _, t in run_reference_replay(read_log_lines(path)))
    # bytes-mode subprocess: text=True would translate the stream's \r
    out = subprocess.run(
        [sys.executable, "-m", "console_log_parser_ray", "--replay",
         "--instant", path],
        capture_output=True,
        cwd=REPO,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.decode("utf-8") == expect

    out = _run_cli(["--replay", "--instant", "--format", "asciinema", path])
    assert out.returncode == 2
    assert "terminal logs only" in out.stderr
