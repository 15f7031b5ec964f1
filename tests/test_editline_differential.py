"""Property test: EditLine vs the reference LineBuilder on random edit
sequences (prints, C0 controls, editing CSI), avoiding only the inputs
where the reference crashes (documented in CONFORMANCE.md D2-D5)."""

import random

import pytest

from console_log_parser_ray.vt.editline import EditLine


def _ref_linebuilder():
    from terminal2html import LineBuilder

    return LineBuilder()


def _ref_render(lb):
    return "".join(
        chr(c) for c in lb.line if not isinstance(c, tuple)
    )


_OPS = [
    ("text", "hello"),
    ("text", "wo"),
    ("text", "x"),
    ("ctrl", 0x08),
    ("ctrl", 0x09),
    ("ctrl", 0x0D),
    ("csi", "", "", "", "K"),
    ("csi", "", "2", "", "C"),
    ("csi", "", "1", "", "C"),
    ("csi", "", "2", "", "D"),
    ("csi", "", "1", "", "D"),
    ("csi", "", "2", "", "@"),
    ("csi", "", "1", "", "P"),
    ("csi", "", "2", "", "X"),
    ("csi", "", "31", "", "m"),
    ("csi", "", "0", "", "m"),
]


def _would_crash_reference(lb, op):
    """Predict the reference's crash conditions so the fuzz explores
    everything else (reference terminal2html.py:461,477,492,502)."""
    kind = op[0]
    if kind == "ctrl" and op[1] == 0x0A and lb.prefix_start < lb.pos < 0:
        return True
    if kind == "csi":
        final = op[4]
        if final == "@" and lb.pos < 0:
            return True
        if final == "D" and lb.pos >= len(lb.line):
            return True
        if final == "K" and op[2] not in ("", "0"):
            return True
    return False


@pytest.mark.parametrize("seed", range(12))
def test_editline_matches_reference_linebuilder(seed):
    rng = random.Random(seed)
    ref = _ref_linebuilder()
    mine = EditLine()
    if seed % 3 == 0:
        ref.set_prefix_len(4)
        mine.set_prefix_len(4)
    keep_sgr = seed % 2 == 0
    for _ in range(300):
        op = _OPS[rng.randrange(len(_OPS))]
        if _would_crash_reference(ref, op):
            continue
        if op[0] == "text":
            for ch in op[1]:
                ref.print(ord(ch))
            mine.put_text(op[1])
        elif op[0] == "ctrl":
            ref.ctrl(op[1])
            mine.ctrl(op[1])
        else:
            _, p, par, i, f = op
            ref.csi(p, par, i, f, ignore_SGR=not keep_sgr)
            mine.csi(p, par, i, f, keep_sgr=keep_sgr)
        assert mine.cur == ref.pos
        assert mine.render() == _ref_render(ref)
        assert mine.printable_size() == ref.printable_size()


def test_entry_smoke(ray_session):
    """Driver contract: entry() runs under an existing Ray session and
    yields rows with a stable schema."""
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__ray_entry__")
    ds = entry_mod.entry()
    rows = ds.take(5)
    assert len(rows) >= 1
    assert {"conv_id", "turn_idx", "clean_text", "role", "sink"} <= set(
        rows[0].keys()
    )
