"""Deterministic synthetic transcript generator with ground truth.

Produces the transcripts table from BASELINE.json's ``input_hint``
(conv_id, turn_idx, role, text, tool, ts) plus per-turn ground-truth
columns (``expected_clean_text``, ``expected_cmd_count``,
``expected_role``, ``expected_tool``, ``expected_in_vim``,
``expected_command``) computed *by construction* from the turn
templates -- independently of the engine.  Tests assert three-way
agreement: generator expectation == reference oracle == this engine.

All randomness derives from ``numpy.random.default_rng`` seeded per
conversation with ``seed ^ conv_index``, so any conversation can be
regenerated in isolation (shardable across Ray tasks).

Feature coverage mirrors the reference corpus (FIXTURES.md section 3):
Linux one-line prompts with OSC titles, MINGW three-line prompt
protocol, command-line editing (BS runs, CSI K/D/C/@/P, CR rewrite),
SGR-colored output, vim sessions via the xterm title-stack markers,
application-mode spans, and invisible terminal-noise sequences.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("expected_clean_text", pa.string()),
        ("expected_cmd_count", pa.int32()),
        ("expected_role", pa.string()),
        ("expected_tool", pa.string()),
        ("expected_in_vim", pa.bool_()),
        ("expected_command", pa.string()),
    ]
)

_USERS = ["alice", "bob.d", "carol", "dev", "ops.bot"]
_HOSTS = ["devbox", "build-7", "Hobbes", "ci-runner", "edge-2"]
_DIRS = [
    "~/work/data",
    "~/src/engine",
    "~/logs",
    "~",
    "~/notes/daily",
    "~/proj/alpha-1",
]
_CMDS = [
    ("ls -la", "ls"),
    ("git status", "git"),
    ("git add -A", "git"),
    ("cat results.txt", "cat"),
    ("grep -r pattern .", "grep"),
    ("make build", "make"),
    ("python run.py --fast", "python"),
    ("du -sh .", "du"),
    ("tail -n 20 app.log", "tail"),
    ("echo done", "echo"),
]
_WORDS = (
    "total usage lines found match build ok warning error file dir "
    "writing reading done elapsed rows bytes chunk part merge scan"
).split()

_SGR_OPEN = ["\x1b[01;32m", "\x1b[33m", "\x1b[1;31m", "\x1b[38;5;196m", "\x1b[04m"]
_NOISE = ["\x1b[?25l", "\x1b[?25h", "\x1b]10;?\x07", "\x1b]11;?\x07", "\x1bP1$r0m\x1b\\"]


class _Turn:
    __slots__ = ("text", "clean", "cmd", "role", "tool", "in_vim", "command")

    def __init__(self, text, clean, cmd, role, tool, in_vim=False, command=""):
        self.text = text
        self.clean = clean
        self.cmd = cmd
        self.role = role
        self.tool = tool
        self.in_vim = in_vim
        self.command = command


def _output_line(rng) -> tuple:
    """A command-output line; returns (text, visible)."""
    k = rng.integers(2, 9)
    words = " ".join(str(_WORDS[i]) for i in rng.integers(0, len(_WORDS), k))
    style = rng.integers(0, 5)
    if style == 0:  # SGR-colored
        op = _SGR_OPEN[rng.integers(0, len(_SGR_OPEN))]
        text = f"{op}{words}\x1b[0m"
        return text, words
    if style == 1:  # noise-decorated (invisible sequences)
        nz = _NOISE[rng.integers(0, len(_NOISE))]
        return f"{nz}{words}", words
    if style == 2:  # tab + unicode + html-escapables
        extra = "α→β <&\"> 	end" if rng.random() < 0.5 else "plain	col"
        return f"{words} {extra}", f"{words} {extra}"
    if style == 3:  # trailing CR (winpty-ish)
        return f"{words}\r", words
    return words, words


def _edited_command(rng, base_cmd: str) -> tuple:
    """Render a typed command with edit sequences; returns
    (typed_bytes_str, final_visible)."""
    # NOTE: cursor-backward (CSI D) must never arrive while the cursor
    # sits one past the last cell: the reference indexes the cell under
    # the cursor and would crash (reference terminal2html.py:492).  Real
    # logs always move off the end with BS first; these templates do the
    # same.
    kind = rng.integers(0, 4)
    if kind == 0:  # plain typing
        return base_cmd, base_cmd
    if kind == 1:  # typo + BS run + erase-to-eol
        junk = "qq"
        return base_cmd + junk + "\x08" * len(junk) + "\x1b[K", base_cmd
    if kind == 2:  # BS, cursor back, overwrite one char, forward
        if len(base_cmd) < 4:
            return base_cmd, base_cmd
        ch = base_cmd[-3]
        typed = (
            base_cmd[:-3]
            + "#"
            + base_cmd[-2:]
            + "\x08\x1b[2D"
            + ch
            + "\x1b[2C"
        )
        return typed, base_cmd
    # kind == 3: insert junk mid-word, jump back, delete it with CSI P
    junk = "zz"
    n_back = len(base_cmd) - 2 + len(junk) - 1
    typed = (
        base_cmd[:2]
        + junk
        + base_cmd[2:]
        + "\x08"
        + ("\x1b[{}D".format(n_back) if n_back > 0 else "")
        + "\x1b[{}P".format(len(junk))
        + "\x1b[{}C".format(len(base_cmd) - 2)
    )
    return typed, base_cmd


def _vim_block(rng, cmd_count):
    """A vim session: start marker line, noise lines, end marker line."""
    height = int(rng.integers(20, 60))
    start = (
        "\x1b[?1049h\x1b[22;0;0t\x1b[1;{h}r\x1b[?12h\x1b[?12l"
        "\x1b[27m\x1b[23m\x1b[29m\x1b[m\x1b[H\x1b[2J\x1b[22;2t\x1b[22;1t"
    ).format(h=height)
    turns = [_Turn(start, "", cmd_count, "assistant", "vim", True)]
    for _ in range(int(rng.integers(1, 6))):
        k = rng.integers(2, 8)
        noise = "".join(
            "\x1b[{};{}H\x1b[K{}".format(
                int(rng.integers(1, height)),
                int(rng.integers(1, 80)),
                _WORDS[int(rng.integers(0, len(_WORDS)))],
            )
            for _ in range(k)
        )
        turns.append(_Turn(noise, "", cmd_count, "assistant", "vim", True))
    end = "\x1b[{h};1H\x1b[?1049l\x1b[23;0;0t".format(h=height)
    # after 23;0;0t the vim session has ended mid-line, so this turn is
    # not in-vim at its close; the trailing LF flushes "\n"
    turns.append(_Turn(end, "\n", cmd_count, "assistant", "vim", False))
    return turns


def gen_conversation(conv_index: int, seed: int, mean_turns: int = 60):
    """Generate one conversation; returns list of _Turn."""
    rng = np.random.default_rng((seed << 20) ^ conv_index)
    user = _USERS[conv_index % len(_USERS)]
    host = _HOSTS[(conv_index // len(_USERS)) % len(_HOSTS)]
    mingw = rng.random() < 0.35

    turns: list[_Turn] = []
    turns.append(
        _Turn(
            "Script started on 2026-08-17 10:00:00+00:00",
            "Script started on 2026-08-17 10:00:00+00:00\n",
            0,
            "system",
            "",
        )
    )

    cmd_count = 0
    target = max(8, int(rng.normal(mean_turns, mean_turns / 4)))
    while len(turns) < target:
        cmd_count += 1
        cmd_start = len(turns)
        cwd = _DIRS[int(rng.integers(0, len(_DIRS)))]
        want_vim = rng.random() < 0.12
        base_cmd, tool = (
            ("vim notes.txt", "vim")
            if want_vim
            else _CMDS[int(rng.integers(0, len(_CMDS)))]
        )
        typed, final_cmd = (
            (base_cmd, base_cmd) if want_vim else _edited_command(rng, base_cmd)
        )

        if mingw:
            # prompt-header validation requires the OSC title to end
            # with cwd[1:] (reference terminalparser.py:112-118)
            osc = "\x1b]0;{}@{}: {}\x07".format(user, host, cwd)
            turns.append(_Turn(osc, "\n", cmd_count, "user", tool))
            header = "\x1b[32m{}@{} \x1b[35mMINGW64 \x1b[33m{}\x1b[0m".format(
                user, host, cwd
            )
            header_vis = "{}@{} MINGW64 {}".format(user, host, cwd)
            turns.append(_Turn(header, header_vis + "\n", cmd_count, "user", tool))
            turns.append(_Turn("$ " + typed, "", cmd_count, "user", tool))
            cmd_clean_prefix = "$ " + final_cmd + "\n"
        else:
            osc = "\x1b]0;{}@{}: {}\x07".format(user, host, cwd)
            header = "{}\x1b[01;32m{}@{}\x1b[00m:\x1b[01;34m{}\x1b[00m$ ".format(
                osc, user, host, cwd
            )
            header_vis = "{}@{}:{}".format(user, host, cwd)
            turns.append(
                _Turn(header + typed, header_vis, cmd_count, "user", tool)
            )
            cmd_clean_prefix = "$ " + final_cmd + "\n"

        # the command text flushes at the start of the NEXT line's parse
        if want_vim:
            block = _vim_block(rng, cmd_count)
        else:
            n_out = int(rng.integers(0, 6))
            block = []
            for _ in range(n_out):
                text, vis = _output_line(rng)
                block.append(_Turn(text, vis + "\n", cmd_count, "assistant", tool))
            if not block:
                block.append(_Turn("", "\n", cmd_count, "assistant", tool))
        block[0].clean = cmd_clean_prefix + block[0].clean
        block[0].role = "user"  # the command flush lands on this turn
        turns.extend(block)
        # every turn of this command row carries the command (backfill
        # semantics of the engine's per-row metadata); only this
        # command's turns can match, so start at its first turn --
        # scanning the whole list made giant-conversation generation
        # quadratic
        for t in turns[cmd_start:]:
            if t.cmd == cmd_count:
                t.command = final_cmd

    return turns


def conversation_columns(conv_id: str, conv_index: int, seed: int, mean_turns: int):
    turns = gen_conversation(conv_index, seed, mean_turns)
    n = len(turns)
    base_ts = 1_700_000_000_000_000 + conv_index * 86_400_000_000
    return {
        "conv_id": [conv_id] * n,
        "turn_idx": list(range(n)),
        "role": [t.role for t in turns],
        "text": [t.text for t in turns],
        "tool": [t.tool if t.cmd > 0 else "" for t in turns],
        "ts": [base_ts + i * 1_000_000 for i in range(n)],
        "expected_clean_text": [t.clean for t in turns],
        "expected_cmd_count": [t.cmd for t in turns],
        "expected_role": [t.role for t in turns],
        "expected_tool": [t.tool if t.cmd > 0 else "" for t in turns],
        "expected_in_vim": [t.in_vim for t in turns],
        "expected_command": [t.command for t in turns],
    }


def gen_table(n_convs: int, seed: int = 42, mean_turns: int = 60, start: int = 0):
    cols = {name: [] for name in SCHEMA.names}
    for ci in range(start, start + n_convs):
        conv_id = "conv{:06d}".format(ci)
        c = conversation_columns(conv_id, ci, seed, mean_turns)
        for k, v in c.items():
            cols[k].extend(v)
    arrays = []
    for field in SCHEMA:
        arrays.append(pa.array(cols[field.name], field.type))
    return pa.Table.from_arrays(arrays, schema=SCHEMA)
