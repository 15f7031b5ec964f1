"""Command-line entry point, mirroring the reference driver's surface
(reference main.py:289-314): single-file and batch (todo-list) modes,
terminal and asciinema input formats, plain-text and HTML outputs.

    python -m console_log_parser_ray session.log                # text to stdout
    python -m console_log_parser_ray session.log -o out/        # parquet + html
    python -m console_log_parser_ray --format asciinema rec.cast -o out/
    python -m console_log_parser_ray --todo list.json -o out/   # batch + index

Single files run inline (no Ray session needed); batch mode uses Ray
Data when a session is available and falls back to inline otherwise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def _parse_terminal_file(path: str, suppress=()):
    from .sources.convert import log_lines_to_rows
    from .stages.scan import scan_bucket_table

    stem = os.path.splitext(os.path.basename(path))[0]
    with open(path, "rb") as fh:
        rows = log_lines_to_rows(stem, fh.readlines())
    tbl = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "text": pa.array(rows["text"], pa.string()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "has_eol": pa.array(rows["has_eol"], pa.bool_()),
        }
    )
    return scan_bucket_table(tbl, suppress_map={stem: suppress})


def _parse_asciinema_file(path: str, suppress=()):
    from .sources.asciinema import parse_header
    from .stages.scan import scan_bucket_table

    stem = os.path.splitext(os.path.basename(path))[0]
    texts, tss, eols = [], [], []
    buf = []
    last_ts = 0.0
    with open(path, encoding="utf-8") as fh:
        parse_header(fh.readline())
        for line in fh:
            if not line.strip():
                continue
            frame = json.loads(line)
            ts, data = float(frame[0]), frame[2]
            last_ts = ts
            start = 0
            while True:
                nl = data.find("\n", start)
                if nl < 0:
                    if start < len(data):
                        buf.append(data[start:])
                    break
                buf.append(data[start:nl])
                texts.append("".join(buf))
                tss.append(ts)
                eols.append(True)
                buf = []
                start = nl + 1
    if buf:
        texts.append("".join(buf))
        tss.append(last_ts)
        eols.append(False)
    tbl = pa.table(
        {
            "conv_id": pa.array([stem] * len(texts), pa.string()),
            "turn_idx": pa.array(range(len(texts)), pa.int32()),
            "text": pa.array(texts, pa.string()),
            "ts": pa.array(
                [int(t * 1_000_000) for t in tss], pa.timestamp("us")
            ),
            "has_eol": pa.array(eols, pa.bool_()),
        }
    )
    return scan_bucket_table(tbl, suppress_map={stem: suppress})


def _emit(
    parsed: pa.Table,
    out_dir,
    palette,
    title=None,
    as_html=True,
    review=False,
    chapters=(),
    out_name=None,
    assets_rel=None,
):
    conv_id = parsed.column("conv_id")[0].as_py() if parsed.num_rows else "session"
    if out_dir is None:
        sys.stdout.write(
            "".join(parsed.column("clean_text").to_pylist())
        )
        return None
    os.makedirs(out_dir, exist_ok=True)
    # an explicit per-entry "out" filename wins (reference main.py:205-210);
    # the index then links that name instead of <conv_id>.html
    stem = os.path.splitext(out_name)[0] if out_name else conv_id
    pq.write_table(
        parsed, os.path.join(out_dir, stem + ".parquet"), compression="zstd"
    )
    if as_html:
        from .functions.html import render_conversation

        rows = parsed.sort_by("turn_idx").to_pylist()
        html = render_conversation(
            rows,
            palette=palette,
            title=title or conv_id,
            review=review,
            assets_rel=assets_rel,
        )
        with open(
            os.path.join(out_dir, stem + ".html"), "w", encoding="utf-8"
        ) as fh:
            fh.write(html)
    import pyarrow.compute as pc

    n_cmds = pc.max(parsed.column("cmd_count")).as_py() or 0
    return (stem, title or conv_id, n_cmds, list(chapters))


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="console_log_parser_ray",
        description="Parse terminal session recordings into structured "
        "turns (parquet) and HTML pages.",
    )
    ap.add_argument("infile", nargs="?", help="log file to parse")
    ap.add_argument("-o", "--out", help="output directory (default: text to stdout)")
    ap.add_argument(
        "--format",
        choices=["terminal", "asciinema"],
        default="terminal",
        help="input format (reference main.py:132-139)",
    )
    ap.add_argument("--palette", default="MyDracula")
    ap.add_argument("--title")
    ap.add_argument(
        "--todo", help="batch todo-list JSON (reference main.py:173-264)"
    )
    ap.add_argument(
        "--replay",
        action="store_true",
        help="replay the session to stdout with simulated typing "
        "(reference terminalreplay.py)",
    )
    ap.add_argument(
        "--speed",
        type=float,
        default=3.0,
        help="typing speed for --replay (reference default 3)",
    )
    ap.add_argument(
        "--raw-cmdline",
        action="store_true",
        help="--replay: echo prompt keystrokes as typed instead of the "
        "cleaned-up command line",
    )
    ap.add_argument(
        "--print-vim",
        action="store_true",
        help="--replay: also play vim-session content",
    )
    ap.add_argument(
        "--instant",
        action="store_true",
        help="--replay: skip the typing delays",
    )
    args = ap.parse_args(argv)

    if args.replay:
        if not args.infile:
            ap.error("--replay requires an input file")
        if args.format != "terminal":
            ap.error("--replay supports terminal logs only")
        if not os.path.exists(args.infile):
            print(
                f"console_log_parser_ray: error: no such file: {args.infile}",
                file=sys.stderr,
            )
            return 2
        import time

        from .functions.replay import play, replay_schedule

        with open(args.infile, "rb") as fh:
            sched = replay_schedule(
                fh.readlines(),
                speed=args.speed,
                cleanup_cmdline=not args.raw_cmdline,
                print_vim=args.print_vim,
            )
        play(sched, sys.stdout, sleep_fn=None if args.instant else time.sleep)
        return 0

    if args.todo:
        from .stages.enrich import EnrichTurns
        from .state.config import load_todo_config

        from .state.config import parse_todo_json

        cfg, suppress_map, files = load_todo_config(args.todo)
        enricher = EnrichTurns(cfg)
        todo_dir = os.path.dirname(os.path.abspath(args.todo))
        with open(args.todo, encoding="utf-8") as fh:
            data = parse_todo_json(fh.read())

        def _resolve(key):
            # absolute dirs win; relative join the todo file's dir
            # (reference main.py:177-191)
            d = data.get(key)
            if not d:
                return todo_dir
            return d if os.path.isabs(d) else os.path.join(todo_dir, d)

        base = _resolve("base_dir_in")
        todo_out = _resolve("base_dir_out")
        # shared player assets once per output tree (reference
        # copy_asciinema_files, asciinema2html.py:383-397)
        from .functions.assets import assets_rel_dir, write_player_assets

        write_player_assets(args.out or todo_out)
        entries = []
        for f in files:
            if "in" not in f:
                print(
                    "console_log_parser_ray: error: todo file entry "
                    "without 'in': {!r}".format(f),
                    file=sys.stderr,
                )
                return 2
            in_path = os.path.join(base, f["in"])
            fid = f.get("id") or os.path.splitext(f["in"])[0]
            fmt = f.get("format", "terminal")
            sup = suppress_map.get(fid, ())
            parsed = (
                _parse_asciinema_file(in_path, sup)
                if fmt == "asciinema"
                else _parse_terminal_file(in_path, sup)
            )
            # chapters / hop links / suppression flags ride in as
            # columns (reference main.py:237-264 TodoArgs plumbing)
            parsed = enricher(parsed)
            entry = _emit(
                parsed,
                args.out or todo_out,
                f.get("palette", args.palette),
                f.get("title"),
                review=bool(f.get("review")),
                chapters=sorted(
                    (cmd, t)
                    for (cid, cmd), t in cfg.chapters.items()
                    if cid == fid
                ),
                out_name=f.get("out"),
                assets_rel=assets_rel_dir(),
            )
            if entry:
                entries.append(entry)
        from .functions.html import render_index

        out_dir = args.out or todo_out
        os.makedirs(out_dir, exist_ok=True)
        with open(
            os.path.join(out_dir, "index.html"), "w", encoding="utf-8"
        ) as fh:
            fh.write(render_index(sorted(entries)))
        return 0

    if not args.infile:
        ap.error("an input file or --todo list is required")
    if not os.path.exists(args.infile):
        print(
            f"console_log_parser_ray: error: no such file: {args.infile}",
            file=sys.stderr,
        )
        return 2
    try:
        parsed = (
            _parse_asciinema_file(args.infile)
            if args.format == "asciinema"
            else _parse_terminal_file(args.infile)
        )
    except (ValueError, json.JSONDecodeError) as e:
        print(
            "console_log_parser_ray: error: {} does not parse as {} "
            "input: {}".format(args.infile, args.format, e),
            file=sys.stderr,
        )
        return 2
    assets_rel = None
    if args.out:
        from .functions.assets import assets_rel_dir, write_player_assets

        write_player_assets(args.out)
        assets_rel = assets_rel_dir()
    _emit(parsed, args.out, args.palette, args.title, assets_rel=assets_rel)
    return 0


if __name__ == "__main__":
    sys.exit(main())
