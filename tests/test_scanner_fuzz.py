"""Scanner-level adversarial fuzz: hostile combinations of prompt /
vim / edit / noise fragments, per-turn clean-text equality vs the
in-process reference oracle.  Conversations where the reference itself
crashes (its documented LineBuilder quirks, CONFORMANCE.md D2-D5) are
skipped -- there is no reference output to match."""

import logging
import random

import pyarrow as pa

from console_log_parser_ray.stages.scan import _fast_hints, scan_conversation

logging.getLogger("vtparser").disabled = True

_ATOMS = [
    "\x1b]0;alice@host: ~/dir\x07",
    "\x1b]0;other title\x07",
    "\x1b[32malice@host \x1b[35mMINGW64 \x1b[33m~/dir\x1b[0m",
    "alice@host:~/dir$ ls -la",
    "$ git status",
    "$ ",
    "plain output text",
    "words \x1b[31mcolored\x1b[0m end",
    "\x1b[?1049h\x1b[22;0;0t\x1b[1;40r\x1b[22;2t\x1b[22;1t",
    "\x1b[5;1H\x1b[Knoise",
    "\x1b[40;1H\x1b[?1049l\x1b[23;0;0t",
    "\x1b[23;0;0t",
    "\x1b[?1l\x1b>",
    "\x1b[?1h\x1b=",
    "hint: Waiting for your editor to close the file... ",
    "abc\x08\x08\x1b[K",
    "xy\x08\x1b[1P",
    "\x1b[2@in",
    "text\r",
    "\rredraw\x1b[K",
    "\x1b[6n\x1b[0c",
    "\x1bP1$r0m\x1b\\",
    "tab\there",
    "日本語テキスト",
    "\x1b[1;5H\x1b[2Jmore",
    "a$b",
    "user@host:~$ echo hi",
    # raw C1 introducers (UTF-8-encoded U+0080-U+009F): the tokenizer
    # treats \x9b as CSI, \x9d as OSC, \x90 as DCS, \x9c as ST -- a line
    # containing one must never take a fast path (ADVICE r1)
    "\x9b32mcolored-c1\x9b0m",
    "\x9d0;c1 title\x07after",
    "pre\x90" + "1$r0m\x9c" + "post",
    "text\x85mid",
    "stray\x9cst",
]


def test_scanner_adversarial_vs_oracle():
    from refbridge import run_reference

    rng = random.Random(20260818)
    checked = 0
    for _trial in range(400):
        texts = [
            "".join(
                _ATOMS[rng.randrange(len(_ATOMS))]
                for _ in range(rng.randint(1, 4))
            )
            for _ in range(rng.randint(1, 12))
        ]
        lines = [(t + "\n").encode() for t in texts]
        try:
            oracle = run_reference(lines)
        except Exception:
            continue  # reference crash quirk; no output to match
        hints = _fast_hints(pa.chunked_array([pa.array(texts)]))
        cols, _ = scan_conversation(
            "c", texts, list(range(len(texts))), [0] * len(texts), hints=hints
        )
        for i in range(len(texts)):
            assert cols["clean_text"][i] == oracle.per_line[i], (
                f"trial {_trial} line {i}: {texts[i]!r}"
            )
        checked += 1
    assert checked > 300  # crash-skips must stay a small minority
