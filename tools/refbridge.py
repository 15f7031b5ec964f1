"""In-process bridge to the reference implementation at /root/reference.

Used ONLY as a conformance oracle by the test suite and fixture
generation.  The library under ``console_log_parser_ray/`` must never
import this module: the engine is a from-scratch Ray-Data-native build
and only its *behavior* is checked against the reference.

The reference's flagship path (``terminal2html.parse``) crashes at the
first prompt because ``HtmlDocumentCreator.new_cmd_row`` calls a
nonexistent ``add_hop_to_link`` (reference terminal2html.py:414).  The
working path drives ``TermLogParser`` + ``VT2Html`` with a document that
overrides ``new_cmd_row`` -- which is what this bridge does, with a
plain-text document.  This reproduces the golden ``result_*.txt`` files
(see SURVEY.md section 5.3 for the documented divergences).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

REFERENCE_PATH = "/root/reference"

if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

from terminalparser import TermLogParser  # noqa: E402
from terminal2html import VT2Html  # noqa: E402


class TextDocument:
    """Plain-text document sink for VT2Html.

    Implements the duck-typed document interface consumed by the
    reference's VT2Html (reference terminal2html.py:574-682), recording
    every written character together with the 0-based input line index
    that produced it.  Supports suppression (cmd_filter) like the HTML
    document (reference terminal2html.py:391-397).
    """

    def __init__(self, cmd_filter=(), chapters=None):
        self.parts = []  # list of (line_idx, text)
        self.current_line = 0
        self.cmd_count = 0
        self.cmd_number = 0
        self.filter = list(cmd_filter)
        self.chapters = chapters or {}
        self.output_suppressed = False
        self.frame_ts = 0.0
        # (line_idx, cmd_count) for every new_cmd_row call
        self.cmd_rows = []
        # (line_idx,) for every vim_session marker call
        self.vim_markers = []

    def write(self, char):
        if self.output_suppressed:
            return
        self.parts.append((self.current_line, char))

    def convert_csi(self, _private, _param, _intermediate, _final):
        # Plain text: drop all SGR / formatting sequences.
        pass

    def close_all_spans(self):
        pass

    def new_cmd_row(self, _count):
        self.cmd_count += 1
        if self.cmd_count in self.filter:
            self.output_suppressed = True
            self.cmd_rows.append((self.current_line, self.cmd_count))
            return
        self.output_suppressed = False
        self.cmd_number += 1
        self.cmd_rows.append((self.current_line, self.cmd_count))

    def vim_session(self):
        self.vim_markers.append(self.current_line)
        if self.output_suppressed:
            return
        # The HTML document writes a vim marker line; for the plain-text
        # conformance target (golden result files) vim bodies are elided
        # entirely, so the text document writes nothing.

    def finish(self):
        pass

    def text(self) -> str:
        return "".join(t for _, t in self.parts)

    def per_line_text(self, n_lines: int) -> list[str]:
        out = [[] for _ in range(n_lines)]
        for idx, t in self.parts:
            out[min(idx, n_lines - 1)].append(t)
        return ["".join(p) for p in out]


class RecordingVT2Html(VT2Html):
    """VT2Html subclass that records TLP events with line attribution."""

    def __init__(self, document):
        super().__init__(document)
        self.events = []  # (line_idx, event, props)

    def _line(self):
        return self.document.current_line

    def prompt_start(self):
        self.events.append((self._line(), "prompt_start", None))
        super().prompt_start()

    def prompt_active(self):
        self.events.append((self._line(), "prompt_active", None))
        super().prompt_active()

    def prompt_end(self):
        self.events.append((self._line(), "prompt_end", None))
        super().prompt_end()

    def vim_start(self, ev_props):
        self.events.append((self._line(), "vim_start", ev_props))
        super().vim_start(ev_props)

    def vim_end(self):
        self.events.append((self._line(), "vim_end", None))
        super().vim_end()


@dataclass
class OracleResult:
    """Reference output for one conversation."""

    text: str
    per_line: list[str]
    events: list[tuple]  # (line_idx, event, props)
    cmd_rows: list[tuple]  # (line_idx, cmd_count)
    # sequence statistics dicts keyed like vtparser.log_statistics
    control_functions: dict = field(default_factory=dict)
    escape_sequences: dict = field(default_factory=dict)
    control_sequences: dict = field(default_factory=dict)
    dcs_functions: dict = field(default_factory=dict)
    dcs_strings: set = field(default_factory=set)
    os_commands: set = field(default_factory=set)


def run_reference(lines: list[bytes], cmd_filter=()) -> OracleResult:
    """Drive the reference parser over one conversation's raw lines.

    ``lines`` are newline-terminated byte strings exactly as
    ``readline()`` would produce them from the original log file.
    """
    doc = TextDocument(cmd_filter=cmd_filter)
    parser = TermLogParser()
    out = RecordingVT2Html(doc)
    parser.terminal_output_handler = out
    parser.control_sequence_handler = out
    parser.tlp_event_listener = out

    for i, line in enumerate(lines):
        doc.current_line = i
        parser.parse(line)
    doc.current_line = max(len(lines) - 1, 0)
    doc.finish()

    return OracleResult(
        text=doc.text(),
        per_line=doc.per_line_text(max(len(lines), 1)),
        events=out.events,
        cmd_rows=doc.cmd_rows,
        control_functions=dict(parser.control_functions_seen),
        escape_sequences=dict(parser.escape_sequences_seen),
        control_sequences=dict(parser.control_sequences_seen),
        dcs_functions=dict(parser.device_control_functions_seen),
        dcs_strings=set(parser.device_control_strings),
        os_commands=set(parser.os_commands),
    )


def run_reference_replay(
    lines: list[bytes],
    speed: float = 3.0,
    cleanup_cmdline: bool = True,
    print_vim: bool = False,
) -> list[tuple[float, str]]:
    """Drive the reference replay sink (terminalreplay.VT2Output) over
    one conversation and capture its stdout stream as a normalized
    typing schedule [(delay_before_s, text), ...].

    ``time.sleep`` is stubbed to accumulate delays instead of sleeping.
    The reference's ``vim_start`` arity bug (terminalreplay.py:178 —
    crashes on any vim-containing recording) is patched here the way
    the engine fixes it, so vim logs are usable as oracle input.
    """
    import io

    import terminalreplay
    from terminalreplay import VT2Output

    class FixedVT2Output(VT2Output):
        def vim_start(self, ev_props=None):
            self.in_vim = True

    sched: list[tuple[float, str]] = []
    pend = [0.0]

    def fake_sleep(d):
        pend[0] += d

    class Capture(io.StringIO):
        def write(self, s):
            if s:
                if sched and pend[0] == 0.0:
                    sched[-1] = (sched[-1][0], sched[-1][1] + s)
                else:
                    sched.append((pend[0], s))
                    pend[0] = 0.0
            return len(s)

    old_sleep = terminalreplay.sleep
    terminalreplay.sleep = fake_sleep
    parser = TermLogParser()
    out = FixedVT2Output()
    out.speed = speed
    out.cleanup_cmdline = cleanup_cmdline
    out.print_vim = print_vim
    parser.terminal_output_handler = out
    parser.control_sequence_handler = out
    parser.tlp_event_listener = out
    old_stdout = sys.stdout
    sys.stdout = Capture()
    try:
        for line in lines:
            parser.parse(line)
    finally:
        sys.stdout = old_stdout
        terminalreplay.sleep = old_sleep
    return sched


def read_log_lines(path: str) -> list[bytes]:
    with open(path, "rb") as fh:
        return fh.readlines()


def run_reference_file(path: str, cmd_filter=()) -> OracleResult:
    return run_reference(read_log_lines(path), cmd_filter=cmd_filter)
