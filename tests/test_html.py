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
    s = SgrSpans()
    html = s.convert("31") + "a" + s.convert("1") + "b" + s.convert("39") + "c"
    # after 39: two closes, bold reopened
    assert html.count("</span>") == 2
    assert html.count("font-weight:bold") == 2  # original + reopen
    assert len(s.stack) == 1 and s.stack[0][0] == "bold"


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
