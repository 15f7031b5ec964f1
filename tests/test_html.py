"""HTML presentation stage: SGR span conversion, escaping, documents."""

from console_log_parser_ray.functions.html import (
    SgrSpans,
    escape_html,
    render_conversation,
    render_index,
    render_styled_line,
)


def test_escape_html():
    assert escape_html('a<b>&"c"') == "a&lt;b&gt;&amp;&quot;c&quot;"


def test_sgr_basic_colors():
    out = render_styled_line("\x1b[31mred\x1b[0m plain")
    assert 'style="color:#ff5555"' in out
    assert "</span> plain" in out


def test_sgr_bright_and_bold():
    out = render_styled_line("\x1b[1;92mok\x1b[0m")
    assert "font-weight:bold" in out and "color:#69ff94" in out
    assert out.count("</span>") == 2


def test_sgr_selective_close_stack_surgery():
    # open fg, open bold, close fg (39): bold must be re-opened
    # (bold_as_bright off isolates the stack mechanics)
    s = SgrSpans(bold_as_bright=False)
    html = s.convert("31") + "a" + s.convert("1") + "b" + s.convert("39") + "c"
    # after 39: two closes, bold reopened
    assert html.count("</span>") == 2
    assert html.count("font-weight:bold") == 2  # original + reopen
    assert len(s.stack) == 1 and s.stack[0][0] == "bold"


def test_bold_as_bright_policy():
    """Reference terminal2html.py:90-94,112-143: bold combined with a
    base color renders the BRIGHT palette variant with the policy's
    font weight; bold alone uses the DarkBg policy's bF9 color."""
    # .f1 > .bold: base red (31) then bold -> bright red, weight normal
    s = SgrSpans("MyDracula")
    html = s.convert("31") + s.convert("1")
    assert "color:#ff5555" in html            # base red open
    assert "color:#ff6e6e;font-weight:normal" in html  # bright on bold
    # .bold > .f2: bold then base green -> bright green on the fg span
    s = SgrSpans("MyDracula")
    html = s.convert("1") + s.convert("32")
    assert "color:#69ff94;font-weight:normal" in html
    # bold with default fg: bF9 (PC15 on dark bg), weight stays bold
    s = SgrSpans("MyDracula")
    html = s.convert("1")
    assert html == '<span style="color:#ffffff;font-weight:bold">'
    # light background flips the bold-default color to PC08
    s = SgrSpans("MyDracula", dark_bg=False)
    assert "color:#6272a4" in s.convert("1")
    # policy off: the reference CSS still applies the bright variant
    # when bold combines with a base color (.fN > .bold always maps to
    # PC(N+8)); the policy only flips the font weight to bold
    s = SgrSpans("MyDracula", bold_as_bright=False)
    html = s.convert("31") + s.convert("1")
    assert "color:#ff6e6e;font-weight:bold" in html
    # policy off + default fg: color is the plain F9 default-fg slot
    # (no visible color change), weight bold
    s = SgrSpans("MyDracula", bold_as_bright=False)
    assert s.convert("1") == '<span style="color:#f8f8f2;font-weight:bold">'


def test_sgr_256_and_rgb():
    out = render_styled_line("\x1b[38;5;196mX\x1b[48;2;1;2;3mY")
    assert "color:#ff0000" in out
    assert "background-color:rgb(1,2,3)" in out


def test_render_conversation_and_index():
    rows = [
        {"turn_idx": 0, "clean_text": "hello <world>\n", "cmd_count": 1,
         "is_prompt": True, "in_vim": False, "chapter_title": "Ch1",
         "hop_to": "", "suppressed": False},
        {"turn_idx": 1, "clean_text": "", "cmd_count": 1, "is_prompt": False,
         "in_vim": True, "chapter_title": "", "hop_to": "",
         "suppressed": False},
    ]
    doc = render_conversation(rows, title="t")
    assert "hello &lt;world&gt;" in doc
    assert "Vim editor session" in doc
    assert "<h3>Ch1</h3>" in doc
    idx = render_index([("conv1", "First", 5, [(2, "Setup")])])
    assert 'href="conv1.html"' in idx and 'href="conv1.html#c2"' in idx


def test_review_mode_vim_player_and_hop_link():
    """Reference asciinema2html.py:94-189: a vim session embeds a
    base64 asciinema recording in a dropdown player, hop links render
    the renumbered label, and review mode adds frame timestamps, the
    session dump, and passed review-hop markers."""
    import base64
    import json
    import re

    rows = [
        {"turn_idx": 0, "clean_text": "$ vim f\n", "cmd_count": 1,
         "is_prompt": True, "in_vim": False, "chapter_title": "",
         "hop_to": "s2#c7", "hop_label": "jump to s2 command 5",
         "suppressed": False, "ts": 100.0},
        {"turn_idx": 1, "clean_text": "", "cmd_count": 1,
         "is_prompt": False, "in_vim": True, "vim_session_id": 1,
         "vim_text": "\x1b[2J\x1b[Hvim frame one", "suppressed": False,
         "ts": 101.0},
        {"turn_idx": 2, "clean_text": "", "cmd_count": 1,
         "is_prompt": False, "in_vim": True, "vim_session_id": 1,
         "vim_text": "\x1b[5;1Hframe two", "suppressed": False,
         "ts": 102.5},
        {"turn_idx": 3, "clean_text": "\n", "cmd_count": 1,
         "is_prompt": False, "in_vim": False, "suppressed": False,
         "ts": 103.0},
    ]
    doc = render_conversation(
        rows, title="t", review=True, review_hops=[(101.5, 42.25)]
    )
    # hop link: raw anchor + renumbered display label
    assert '<a href="s2#c7">jump to s2 command 5</a>' in doc
    # embedded player with a decodable asciinema v2 recording
    m = re.search(r'src="data:application/json;base64,([^"]+)"', doc)
    assert m
    rec = base64.b64decode(m.group(1)).decode("utf-8").splitlines()
    header = json.loads(rec[0])
    assert header["version"] == 2
    ev1 = json.loads(rec[1])
    ev2 = json.loads(rec[2])
    assert ev1 == [0.0, "o", "\x1b[2J\x1b[Hvim frame one\r\n"]
    assert ev2[0] == 1.5 and ev2[2].endswith("frame two\r\n")
    # review extras: frame ts, session dump, passed hop marker
    assert '<div class="review-frame-ts">100.000000</div>' in doc
    assert 'class="vimsession-dump"' in doc
    assert "detected jump to 42.25" in doc


def test_non_review_render_has_no_dump():
    rows = [
        {"turn_idx": 0, "clean_text": "", "cmd_count": 1,
         "is_prompt": False, "in_vim": True, "vim_session_id": 3,
         "vim_text": "x", "suppressed": False, "ts": 1.0},
    ]
    doc = render_conversation(rows)
    assert "asciinema-player" in doc
    assert "vimsession-dump" not in doc


def test_escape_html_array_matches_scalar():
    import pyarrow as pa

    from console_log_parser_ray.functions.html import escape_html_array

    texts = [
        'a<b>&"c"',
        "plain",
        "",
        "&amp; already & <<>>",
        'mix "quotes" & <tags> everywhere',
    ]
    got = escape_html_array(pa.array(texts, pa.string())).to_pylist()
    assert got == [escape_html(t) for t in texts]


def test_index_entries_first_wins(ray_session):
    import pyarrow as pa

    import ray.data

    from console_log_parser_ray.functions.html import index_entries

    # three convs, two sharing the title "git status": conv a wins
    rows = []
    for conv, title, ncmds in [
        ("convb", "git status", 3),
        ("conva", "git status", 2),
        ("convc", "ls -la", 1),
    ]:
        for cmd in range(1, ncmds + 1):
            rows.append(
                {
                    "conv_id": conv,
                    "cmd_count": cmd,
                    "command": title if cmd == 1 else "other",
                }
            )
    ds = ray.data.from_arrow(
        pa.Table.from_pylist(rows)
    ).repartition(3)
    out = sorted(
        index_entries(ds).take_all(), key=lambda r: r["title"]
    )
    assert out == [
        {"title": "git status", "conv_id": "conva", "n_cmds": 2},
        {"title": "ls -la", "conv_id": "convc", "n_cmds": 1},
    ]


def test_html_sink_writes_in_task(ray_session, tmp_path):
    import os

    import pyarrow as pa

    import ray.data

    from console_log_parser_ray.functions.html import html_sink

    rows = []
    for conv in ("s1", "s2"):
        rows += [
            {"conv_id": conv, "turn_idx": 0, "clean_text": "hello\n",
             "cmd_count": 1, "is_prompt": True, "in_vim": False,
             "suppressed": False},
            {"conv_id": conv, "turn_idx": 1, "clean_text": "out <&>\n",
             "cmd_count": 1, "is_prompt": False, "in_vim": False,
             "suppressed": False},
        ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = str(tmp_path / "html")
    n = html_sink(ds, out)
    assert n == 2
    files = sorted(os.listdir(out))
    assert files == ["acp", "index.html", "s1.html", "s2.html"]
    doc = open(os.path.join(out, "s1.html")).read()
    assert "out &lt;&amp;&gt;" in doc
    idx = open(os.path.join(out, "index.html")).read()
    assert 's1.html' in idx and "(1 commands)" in idx
    assert not [f for f in files if ".tmp." in f]


def test_player_assets_written_and_linked(tmp_path):
    """S7: the shared player assets land under acp/v2 AND acp/v3
    exactly once (reference copy_asciinema_files,
    asciinema2html.py:383-397 -- the source tree ships both version
    builds, v3's min.js normalized to asciinema-player.js) and pages
    link the active version relatively."""
    import os

    from console_log_parser_ray.functions.assets import (
        assets_rel_dir,
        write_player_assets,
    )
    from console_log_parser_ray.functions.html import render_conversation

    out = str(tmp_path / "out")
    rels = write_player_assets(out)
    assert rels == [
        "acp/v2/asciinema-player.css",
        "acp/v2/asciinema-player.js",
        "acp/v3/asciinema-player.css",
        "acp/v3/asciinema-player.js",
    ]
    for rel in rels:
        p = os.path.join(out, rel)
        assert os.path.exists(p) and os.path.getsize(p) > 0
    before = {rel: os.stat(os.path.join(out, rel)).st_mtime_ns for rel in rels}
    # idempotent: a second call (concurrent batch entry / resume) does
    # not rewrite committed files
    write_player_assets(out)
    after = {rel: os.stat(os.path.join(out, rel)).st_mtime_ns for rel in rels}
    assert before == after
    for ver in ("v2", "v3"):
        assert not [
            f
            for f in os.listdir(os.path.join(out, "acp", ver))
            if ".tmp." in f
        ]

    rows = [
        {"conv_id": "c", "turn_idx": 0, "clean_text": "hi\n",
         "cmd_count": 1, "is_prompt": True, "in_vim": False,
         "suppressed": False},
    ]
    doc = render_conversation(rows, assets_rel=assets_rel_dir())
    assert 'href="acp/v2/asciinema-player.css"' in doc
    assert 'src="acp/v2/asciinema-player.js"' in doc
    bare = render_conversation(rows)
    assert "asciinema-player.js" not in bare
