"""Ray Data stage: per-conversation session scan (map_groups UDF).

Builds the callable passed to ``ds.groupby("conv_id").map_groups``.
Each group is one conversation's turns as a zero-copy Arrow table; the
UDF sorts by ``turn_idx``, walks the SessionScanner over the lines, and
returns one structured row per turn.

Vectorized pre-classification: before the Python walk, three Arrow
compute passes classify every line of the group so that the scanner can
skip tokenization entirely for the two dominant line shapes --

* *plain* lines (no escapes / C0 edits / '$' / vim hint): the visible
  text is the line itself,
* *SGR-only* lines (escapes are exclusively ``CSI ... m`` color runs):
  the visible text is the line with the color runs deleted --

while prompt lines, vim boundaries and anything carrying parser state
take the exact slow path.  The fast paths are only *hints*; the scanner
re-checks its own state (FSM state, tokenizer carry, pending vim
re-entry, suppression) before trusting them, so output is bit-identical
to the full walk (asserted by tests against the reference oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..vt import session as S
from ..vt.session import SessionScanner
from ..vt.tokenizer import GROUND

# "Plain" lines: no C0 except TAB (LF cannot occur inside a turn's
# text) and a trailing CR run (winpty endings), no '$' (prompt
# detection), no vim hint literal, no ESC.  C1 code points
# U+0080-U+009F are excluded everywhere: the tokenizer feeds decoded
# code points to the event map, where 0x9B/0x9D/0x90/... introduce
# CSI/OSC/DCS exactly like their ESC forms (tokenizer._c1), so a line
# carrying one is never fast-path safe.
_PLAIN = "^[^\\x00-\\x08\\x0a-\\x1f$\\x80-\\x9f]*\\r*$"
_HINT_LIT = "hint: Waiting"
# Lines whose only escape use is SGR coloring
_SGR_ONLY = (
    "^(?:[^\\x1b\\x00-\\x08\\x0b-\\x1f$\\x80-\\x9f]|\\x1b\\[[0-9;]*m)*\\r*$"
)
_SGR_RUN = "\\x1b\\[[0-9;]*m"
# "Noise-safe" lines: visible text interleaved ONLY with sequences that
# produce no output and no feature-FSM transitions in NORMAL state --
# SGR runs, private-mode toggles (DECCKM ?1h/?1l included: their
# positions are reconstructed analytically), BEL-terminated OSC strings
# that do NOT start "0;" (only title-setting OSCs drive the prompt
# protocol, reference terminalparser.py:381), and ST-terminated DCS.
_NOISE_ONLY = (
    "^(?:[^\\x1b\\x00-\\x06\\x08\\x0b-\\x1f$\\x80-\\x9f]"
    "|\\x1b\\[[0-9;]*m"
    "|\\x1b\\[\\?[0-9;]*[hl]"
    "|\\x1b\\][1-9][0-9]*;[^\\x07\\x1b\\x80-\\x9f]*\\x07"
    "|\\x1bP[0-9;]*[\\x20-\\x2f]*[a-zA-Z][^\\x1b\\x80-\\x9f]*\\x1b\\\\"
    ")*\\r*$"
)
# visible remainder of a noise-safe line (applied per noise row)
_NOISE_STRIP = (
    "\\x1b\\[[0-9;]*m|\\x1b\\[\\?[0-9;]*[hl]"
    "|\\x1b\\][1-9][0-9]*;[^\\x07\\x1b]*\\x07"
    "|\\x1bP[0-9;]*[\\x20-\\x2f]*[a-zA-Z][^\\x1b]*\\x1b\\\\"
    "|[\\x07]"
)
# Inside a vim session every print/exec/CSI is dropped; a line can be
# skipped wholesale unless it could (a) end or re-detect the session
# (23;0;0t / vim-end-2 pieces / hint literal), (b) start an OSC/DCS/
# SOS string or toggle app-mode state, or (c) leave the tokenizer in a
# non-GROUND state at end of line (truncated ESC/CSI tail; the tail
# class conservatively includes embedded C0s).
_VIM_RISKY = (
    "\\x1b(\\]|P|X|\\^|_|=|>)|23;0;0t|\\x1b\\[\\?1[hl]"
    "|\\x1b(\\[[\\x00-\\x3f\\x7f]*)?$|hint: Waiting|[\\x80-\\x9f]"
)


_NOISE_STRIP_RE = __import__("re").compile(_NOISE_STRIP)

# Output schema of the session scan
SCAN_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("ts", pa.timestamp("us")),
        ("role", pa.string()),
        ("clean_text", pa.string()),
        ("cmd_count", pa.int32()),
        ("cmd_number", pa.int32()),
        ("is_prompt", pa.bool_()),
        ("command", pa.string()),
        ("cwd", pa.string()),
        ("in_vim", pa.bool_()),
        ("vim_session_id", pa.int32()),
        ("osc_title", pa.string()),
        ("warnings", pa.int32()),
        # raw frame data for vim-session turns (null elsewhere); feeds
        # the vim_sessions sink (reference asciinema2html.py:192-197)
        ("vim_text", pa.string()),
    ]
)


def _fast_hints(texts: pa.ChunkedArray):
    """Vectorized line classification for the scanner fast paths."""
    no_hint = pc.invert(pc.match_substring(texts, _HINT_LIT))
    plain = pc.and_(pc.match_substring_regex(texts, _PLAIN), no_hint)
    vim_safe = pc.invert(pc.match_substring_regex(texts, _VIM_RISKY))
    has_esc = pc.match_substring(texts, "\x1b")
    sgr_only = pc.and_(
        has_esc, pc.and_(pc.match_substring_regex(texts, _SGR_ONLY), no_hint)
    )
    stripped = pc.replace_substring_regex(texts, _SGR_RUN, "")
    # the noise-only class is tested lazily per row (Python regex) only
    # for rows that would otherwise take the full scan: a column-wide
    # RE2 pass with that alternation costs more than it saves
    return (
        plain.to_numpy(zero_copy_only=False),
        vim_safe.to_numpy(zero_copy_only=False),
        sgr_only.to_numpy(zero_copy_only=False),
        stripped,
        None,
    )


def scan_conversation(
    conv_id: str,
    texts: list,
    turn_idxs,
    ts_vals,
    suppress=(),
    collect_stats: bool = False,
    hints=None,
    has_eols=None,
):
    """Scan one conversation; returns dict of output columns."""
    n = len(texts)
    sc = SessionScanner(suppress=suppress, collect_stats=collect_stats)
    recs = []
    if hints is not None:
        plain, vim_safe, sgr_only, stripped, _noise = hints
    for i in range(n):
        text = texts[i]
        eol = True if has_eols is None else bool(has_eols[i])
        rec = None
        if hints is not None and not collect_stats and eol:
            rec = _try_fast(
                sc,
                int(turn_idxs[i]),
                text,
                bool(plain[i]),
                bool(vim_safe[i]),
                bool(sgr_only[i]),
                stripped[i],
            )
        if rec is None:
            rec = sc.scan_turn(int(turn_idxs[i]), text, eol)
        recs.append(rec)

    # backfill per-command metadata over the whole conversation
    cmd_text = {}
    cmd_cwd = {}
    for r in recs:
        if r.command is not None:
            cmd_text.setdefault(r.cmd_count, r.command)
        if r.cwd:
            cmd_cwd.setdefault(r.cmd_count, r.cwd)

    roles, commands, cwds = [], [], []
    for r in recs:
        if r.cmd_count == 0:
            roles.append("system")
        elif r.is_prompt or r.prompt_active or r.command is not None or r.cwd:
            roles.append("user")
        else:
            roles.append("assistant")
        commands.append(cmd_text.get(r.cmd_count, ""))
        cwds.append(cmd_cwd.get(r.cmd_count, ""))

    return {
        "conv_id": [conv_id] * n,
        "turn_idx": [r.turn_idx for r in recs],
        "ts": ts_vals,
        "role": roles,
        "clean_text": [r.clean_text for r in recs],
        "cmd_count": [r.cmd_count for r in recs],
        "cmd_number": [r.cmd_number for r in recs],
        "is_prompt": [r.is_prompt for r in recs],
        "command": commands,
        "cwd": cwds,
        "in_vim": [r.in_vim for r in recs],
        "vim_session_id": [r.vim_session_id for r in recs],
        "osc_title": [r.osc_title for r in recs],
        "warnings": [r.warnings for r in recs],
    }, sc


_NOISE_ONLY_RE = __import__("re").compile(_NOISE_ONLY)


def _try_fast(sc: SessionScanner, idx, text, plain, vim_safe, sgr_only, stripped, noise=None):
    """State-checked fast paths; None means take the exact slow path."""
    if sc.tok.state != GROUND or sc.tok.utf8_need or sc.next_vim > 0:
        return None
    tlp = sc.tlp

    # vim interior: everything is dropped; only session-control escapes
    # or a dirty tokenizer tail force the exact path
    if tlp in (S.VIM_START, S.VIM_ONELINE):
        if not vim_safe or sc.in_prompt:
            return None
        rec = S.TurnRecord(idx)
        rec.cmd_count = sc.cmd_count
        rec.cmd_number = sc.cmd_number
        rec.in_vim = True
        rec.vim_session_id = sc.vim_session_seq
        sc._last_rec = rec
        return rec

    # in_prompt at line start means the command line is pending flush,
    # which happens exactly when tlp == PROMPT: the PROMPT branch below
    # runs _emit_normal (prompt_end -> command write, in_prompt
    # cleared) before touching the body, so those lines stay eligible.
    if (sc.in_prompt and tlp != S.PROMPT) or sc.in_vim:
        return None
    if not (plain or sgr_only):
        # lazy noise-only check: visible text + output-free sequences
        if noise is False or _HINT_LIT in text or not _NOISE_ONLY_RE.match(text):
            return None
        noise = True
    else:
        noise = False
    if sc.term_line.size() > 0:
        return None

    prefix = ""
    rec = S.TurnRecord(idx)
    sc._rec = rec
    if tlp == S.PROMPT:
        sc._emit_normal()  # fires prompt_end -> writes the command line
        sc.tlp = S.NORMAL
        prefix = rec.clean_text
    elif tlp == S.VIM_ENDING:
        sc._emit_normal()  # fires vim_end
        sc.tlp = S.NORMAL
    elif tlp != S.NORMAL:
        sc._rec = None
        return None

    # the vim-start detection block ran and found nothing
    sc.vim_2200_seen = False

    if noise:
        # DECCKM toggles on this line update app-mode pairing positions
        # (the reference records the position of the final byte,
        # terminalparser.py:358-361); nothing else survives skipping.
        raw = text.encode("utf-8", "surrogatepass")
        p = raw.rfind(b"\x1b[?1h")
        if p >= 0:
            sc.ckm_set_pos = p + 4
        p = raw.rfind(b"\x1b[?1l")
        if p >= 0:
            sc.ckm_reset_pos = p + 4
        body = _NOISE_STRIP_RE.sub("", text).rstrip("\r")
    elif sgr_only and not plain:
        body = stripped.as_py().rstrip("\r")
    else:
        body = text.rstrip("\r")
    if not sc.suppressed:
        rec.clean_text = prefix + body + "\n"
    else:
        rec.clean_text = prefix
    rec.cmd_count = sc.cmd_count
    rec.cmd_number = sc.cmd_number
    sc._rec = None
    sc._last_rec = rec
    return rec


def make_scan_fn(
    suppress_map=None,
    collect_stats: bool = False,
    use_fast_paths: bool = True,
):
    """Create the map_groups UDF (pyarrow batch format)."""
    suppress_map = suppress_map or {}

    def scan_group(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return SCAN_SCHEMA.empty_table()
        tbl = tbl.sort_by("turn_idx")
        conv_id = tbl.column("conv_id")[0].as_py()
        texts = tbl.column("text").to_pylist()
        turn_idxs = tbl.column("turn_idx").to_numpy(zero_copy_only=False)
        ts_vals = (
            tbl.column("ts")
            if "ts" in tbl.schema.names
            else pa.nulls(tbl.num_rows, pa.timestamp("us"))
        )
        hints = _fast_hints(tbl.column("text")) if use_fast_paths else None
        has_eols = (
            tbl.column("has_eol").to_pylist()
            if "has_eol" in tbl.schema.names
            else None
        )
        cols, _sc = scan_conversation(
            conv_id,
            texts,
            turn_idxs,
            ts_vals,
            suppress=suppress_map.get(conv_id, ()),
            collect_stats=collect_stats,
            hints=hints,
            has_eols=has_eols,
        )
        arrays = [
            pa.array(cols["conv_id"], pa.string()),
            pa.array(cols["turn_idx"], pa.int32()),
            cols["ts"] if isinstance(cols["ts"], (pa.Array, pa.ChunkedArray)) else pa.array(cols["ts"], pa.timestamp("us")),
            pa.array(cols["role"], pa.string()),
            pa.array(cols["clean_text"], pa.string()),
            pa.array(cols["cmd_count"], pa.int32()),
            pa.array(cols["cmd_number"], pa.int32()),
            pa.array(cols["is_prompt"], pa.bool_()),
            pa.array(cols["command"], pa.string()),
            pa.array(cols["cwd"], pa.string()),
            pa.array(cols["in_vim"], pa.bool_()),
            pa.array(cols["vim_session_id"], pa.int32()),
            pa.array(cols["osc_title"], pa.string()),
            pa.array(cols["warnings"], pa.int32()),
            pa.array(
                [
                    t if v else None
                    for t, v in zip(texts, cols["in_vim"])
                ],
                pa.string(),
            ),
        ]
        return pa.Table.from_arrays(arrays, schema=SCAN_SCHEMA)

    return scan_group


def make_stats_fn():
    """map_groups UDF emitting (conv_id, kind, seq, n) histogram partials.

    Mirrors the reference's sequence statistics
    (reference vtparser.py:552-559,744-787): control functions, escape
    sequences, CSI sequences, DCS functions, plus distinct OSC/DCS
    strings.  Set-valued kinds (osc_string / dcs_string) emit n = 1 per
    conversation containing the string, so the global sum counts
    conversations -- a partitioning-independent statistic.
    """

    def stats_group(tbl: pa.Table) -> pa.Table:
        tbl = tbl.sort_by("turn_idx")
        conv_id = tbl.column("conv_id")[0].as_py()
        sc = SessionScanner(collect_stats=True)
        for i, text in enumerate(tbl.column("text").to_pylist()):
            sc.scan_turn(i, text)
        kinds, seqs, ns = [], [], []
        for kind, d in sc.stats.items():
            for k, v in d.items():
                kinds.append(kind)
                seqs.append(k if isinstance(k, str) else "0x{:02x}".format(k))
                ns.append(v)
        for s in sc.osc_seen:
            kinds.append("osc_string")
            seqs.append(s)
            ns.append(1)
        for s in sc.dcs_seen:
            kinds.append("dcs_string")
            seqs.append(s)
            ns.append(1)
        return pa.table(
            {
                "conv_id": pa.array([conv_id] * len(kinds), pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "seq": pa.array(seqs, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    return stats_group


def scan_bucket_table(
    tbl: pa.Table,
    suppress_map=None,
    collect_stats: bool = False,
    use_fast_paths: bool = True,
) -> pa.Table:
    """Scan a whole bucket of conversations in one call.

    The 100TB-shaped variant of the session scan: instead of one
    map_groups invocation per conversation (whose fixed costs dominate
    at ~200-turn conversations), conversations are hash-bucketed and a
    single invocation scans every conversation in the bucket -- one
    sort, one set of vectorized hint masks, one output table.
    """
    if tbl.num_rows == 0:
        return SCAN_SCHEMA.empty_table()
    suppress_map = suppress_map or {}
    tbl = tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv_col = tbl.column("conv_id")
    texts = conv_texts = tbl.column("text").to_pylist()
    turn_idxs = tbl.column("turn_idx").to_numpy(zero_copy_only=False)
    has_eols = (
        tbl.column("has_eol").to_pylist()
        if "has_eol" in tbl.schema.names
        else None
    )
    hints = _fast_hints(tbl.column("text")) if use_fast_paths else None
    if hints is not None:
        plain, vim_safe, sgr_only, stripped, _noise = hints
    conv_ids = conv_col.to_pylist()

    n = len(conv_ids)
    out = {
        "conv_id": conv_ids,
        "turn_idx": [0] * n,
        "role": [""] * n,
        "clean_text": [""] * n,
        "cmd_count": [0] * n,
        "cmd_number": [0] * n,
        "is_prompt": [False] * n,
        "command": [""] * n,
        "cwd": [""] * n,
        "in_vim": [False] * n,
        "vim_session_id": [-1] * n,
        "osc_title": [""] * n,
        "warnings": [0] * n,
        "vim_text": [None] * n,
    }

    i = 0
    while i < n:
        j = i
        cid = conv_ids[i]
        while j < n and conv_ids[j] == cid:
            j += 1
        sc = SessionScanner(
            suppress=suppress_map.get(cid, ()), collect_stats=collect_stats
        )
        recs = []
        for r in range(i, j):
            text = texts[r]
            eol = True if has_eols is None else bool(has_eols[r])
            rec = None
            if hints is not None and not collect_stats and eol:
                rec = _try_fast(
                    sc,
                    int(turn_idxs[r]),
                    text,
                    bool(plain[r]),
                    bool(vim_safe[r]),
                    bool(sgr_only[r]),
                    stripped[r],
                )
            if rec is None:
                rec = sc.scan_turn(int(turn_idxs[r]), text, eol)
            recs.append(rec)

        cmd_text, cmd_cwd = {}, {}
        for rec in recs:
            if rec.command is not None:
                cmd_text.setdefault(rec.cmd_count, rec.command)
            if rec.cwd:
                cmd_cwd.setdefault(rec.cmd_count, rec.cwd)
        for r, rec in zip(range(i, j), recs):
            out["turn_idx"][r] = rec.turn_idx
            out["clean_text"][r] = rec.clean_text
            out["cmd_count"][r] = rec.cmd_count
            out["cmd_number"][r] = rec.cmd_number
            out["is_prompt"][r] = rec.is_prompt
            out["command"][r] = cmd_text.get(rec.cmd_count, "")
            out["cwd"][r] = cmd_cwd.get(rec.cmd_count, "")
            out["in_vim"][r] = rec.in_vim
            out["vim_session_id"][r] = rec.vim_session_id
            out["osc_title"][r] = rec.osc_title
            out["warnings"][r] = rec.warnings
            if rec.cmd_count == 0:
                role = "system"
            elif (
                rec.is_prompt
                or rec.prompt_active
                or rec.command is not None
                or rec.cwd
            ):
                role = "user"
            else:
                role = "assistant"
            out["role"][r] = role
            if rec.in_vim:
                out["vim_text"][r] = conv_texts[r]
        i = j

    ts_vals = (
        tbl.column("ts")
        if "ts" in tbl.schema.names
        else pa.nulls(n, pa.timestamp("us"))
    )
    if isinstance(ts_vals, pa.ChunkedArray):
        ts_vals = ts_vals.combine_chunks()
    arrays = [
        pa.array(out["conv_id"], pa.string()),
        pa.array(out["turn_idx"], pa.int32()),
        ts_vals,
        pa.array(out["role"], pa.string()),
        pa.array(out["clean_text"], pa.string()),
        pa.array(out["cmd_count"], pa.int32()),
        pa.array(out["cmd_number"], pa.int32()),
        pa.array(out["is_prompt"], pa.bool_()),
        pa.array(out["command"], pa.string()),
        pa.array(out["cwd"], pa.string()),
        pa.array(out["in_vim"], pa.bool_()),
        pa.array(out["vim_session_id"], pa.int32()),
        pa.array(out["osc_title"], pa.string()),
        pa.array(out["warnings"], pa.int32()),
        pa.array(out["vim_text"], pa.string()),
    ]
    return pa.Table.from_arrays(arrays, schema=SCAN_SCHEMA)


def make_bucket_scan_fn(
    suppress_map=None, collect_stats: bool = False, use_fast_paths: bool = True
):
    def fn(tbl: pa.Table) -> pa.Table:
        return scan_bucket_table(
            tbl,
            suppress_map=suppress_map,
            collect_stats=collect_stats,
            use_fast_paths=use_fast_paths,
        )

    return fn


def make_bucket_stats_fn(use_fast_paths: bool = True):
    """Per-bucket sequence-statistics partials: one (kind, seq, n)
    partial table per bucket.

    Delegates to the tokenizer-level stats engine (stages/stats.py),
    which skips the session FSM entirely -- the histogram depends only
    on tokenizer events -- and handles plain lines analytically.
    ``use_fast_paths=False`` keeps the legacy SessionScanner-based
    counting for differential tests.
    """
    if use_fast_paths:
        from .stats import stats_table

        return stats_table
    return _legacy_bucket_stats_fn(use_fast_paths=False)


def _legacy_bucket_stats_fn(use_fast_paths: bool = True):
    """SessionScanner-based stats counting (differential-test oracle
    for stages/stats.py)."""

    def fn(tbl: pa.Table) -> pa.Table:
        tbl = tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv_ids = tbl.column("conv_id").to_pylist()
        texts = tbl.column("text").to_pylist()
        has_eols = (
            tbl.column("has_eol").to_pylist()
            if "has_eol" in tbl.schema.names
            else None
        )
        if use_fast_paths:
            plain, _vim_safe, sgr_only, stripped, _noise = _fast_hints(
                tbl.column("text")
            )
        merged = {}
        i, n = 0, len(conv_ids)
        while i < n:
            j = i
            cid = conv_ids[i]
            while j < n and conv_ids[j] == cid:
                j += 1
            sc = SessionScanner(collect_stats=True)
            for r in range(i, j):
                eol = True if has_eols is None else bool(has_eols[r])
                rec = None
                if use_fast_paths and eol:
                    rec = _try_fast_stats(
                        sc,
                        r - i,
                        texts[r],
                        bool(plain[r]),
                        bool(sgr_only[r]),
                        stripped[r],
                    )
                if rec is None:
                    sc.scan_turn(r - i, texts[r], eol)
            for kind, d in sc.stats.items():
                for k, v in d.items():
                    key = (kind, k if isinstance(k, str) else "0x{:02x}".format(k))
                    merged[key] = merged.get(key, 0) + v
            # set-valued kinds: one count per conversation containing
            # the string (partitioning-independent; sums to the number
            # of conversations globally)
            for s in sc.osc_seen:
                key = ("osc_string", s)
                merged[key] = merged.get(key, 0) + 1
            for s in sc.dcs_seen:
                key = ("dcs_string", s)
                merged[key] = merged.get(key, 0) + 1
            i = j
        kinds = [k for k, _ in merged]
        seqs = [s for _, s in merged]
        ns = list(merged.values())
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "seq": pa.array(seqs, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    return fn


# Analytic stats contributions for fast-path lines ------------------------

_SGR_FINDALL = __import__("re").compile("\x1b\\[([0-9;]*)m")


def _try_fast_stats(sc, idx, text, plain, sgr_only, stripped):
    """Stats-mode fast path for plain / SGR-only lines.

    Reuses the state-checked fast transitions of :func:`_try_fast` (vim
    interiors excluded -- their sequences must be counted exactly) and
    adds the line's statistics contributions analytically: a plain or
    SGR-only line executes exactly one LF, one CR per trailing carriage
    return, one TAB per tab glyph, and dispatches exactly its SGR
    sequences (reference vtparser.py:632,675).
    """
    tlp = sc.tlp
    if tlp in (S.VIM_START, S.VIM_ONELINE):
        return None
    # noise lines are excluded in stats mode (their sequences count):
    # noise=False disables the lazy check
    rec = _try_fast(sc, idx, text, plain, False, sgr_only, stripped, noise=False)
    if rec is None:
        return None
    cf = sc.stats["control_function"]
    cf[0x0A] = cf.get(0x0A, 0) + 1
    n_cr = len(text) - len(text.rstrip("\r"))
    if n_cr:
        cf[0x0D] = cf.get(0x0D, 0) + n_cr
    n_tab = text.count("\t")
    if n_tab:
        cf[0x09] = cf.get(0x09, 0) + n_tab
    if sgr_only and not plain:
        csi = sc.stats["csi"]
        for params in _SGR_FINDALL.findall(text):
            k = "Esc[" + params + "m"
            csi[k] = csi.get(k, 0) + 1
    return rec


def records_to_table(
    conv_id: str, recs, ts_vals=None, texts=None, carry=None
) -> pa.Table:
    """Assemble TurnRecords (e.g. from the chunk-parallel scan) into the
    standard SCAN_SCHEMA table, applying the same per-command backfill
    and role derivation as the grouped scans.

    ``carry``: optional (cmd_text, cmd_cwd) dict pair for incremental
    assembly of one conversation across successive calls (the giant-
    conversation path emits one output file per chunk): a command row
    whose turns span a chunk boundary backfills from the carried maps,
    which this call updates in place.
    """
    n = len(recs)
    cmd_text, cmd_cwd = carry if carry is not None else ({}, {})
    for r in recs:
        if r.command is not None:
            cmd_text.setdefault(r.cmd_count, r.command)
        if r.cwd:
            cmd_cwd.setdefault(r.cmd_count, r.cwd)
    roles = []
    for r in recs:
        if r.cmd_count == 0:
            roles.append("system")
        elif r.is_prompt or r.prompt_active or r.command is not None or r.cwd:
            roles.append("user")
        else:
            roles.append("assistant")
    if ts_vals is None:
        ts_arr = pa.nulls(n, pa.timestamp("us"))
    elif isinstance(ts_vals, (pa.Array, pa.ChunkedArray)):
        ts_arr = (
            ts_vals.combine_chunks()
            if isinstance(ts_vals, pa.ChunkedArray)
            else ts_vals
        )
    else:
        ts_arr = pa.array(ts_vals, pa.timestamp("us"))
    arrays = [
        pa.array([conv_id] * n, pa.string()),
        pa.array([r.turn_idx for r in recs], pa.int32()),
        ts_arr,
        pa.array(roles, pa.string()),
        pa.array([r.clean_text for r in recs], pa.string()),
        pa.array([r.cmd_count for r in recs], pa.int32()),
        pa.array([r.cmd_number for r in recs], pa.int32()),
        pa.array([r.is_prompt for r in recs], pa.bool_()),
        pa.array([cmd_text.get(r.cmd_count, "") for r in recs], pa.string()),
        pa.array([cmd_cwd.get(r.cmd_count, "") for r in recs], pa.string()),
        pa.array([r.in_vim for r in recs], pa.bool_()),
        pa.array([r.vim_session_id for r in recs], pa.int32()),
        pa.array([r.osc_title for r in recs], pa.string()),
        pa.array([r.warnings for r in recs], pa.int32()),
        pa.array(
            [
                (texts[i] if texts is not None and recs[i].in_vim else None)
                for i in range(n)
            ],
            pa.string(),
        ),
    ]
    return pa.Table.from_arrays(arrays, schema=SCAN_SCHEMA)
