"""Convert raw terminal session logs into the transcripts table.

One conversation per log file: ``conv_id`` = file stem, one row per
newline-terminated line, ``turn_idx`` = 0-based line number, ``ts`` =
epoch + line_no seconds (script(1) logs carry no timestamps).  The raw
bytes of each line (without the trailing newline) become the ``text``
column; all reference corpus files are valid UTF-8 so the conversion is
lossless (FIXTURES.md section 2).
"""

from __future__ import annotations

import os

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        # True unless the source line was unterminated (EOF without
        # newline); extra column beyond the required six.
        ("has_eol", pa.bool_()),
    ]
)

_EPOCH_US = 1_500_000_000 * 1_000_000


def log_lines_to_rows(conv_id: str, lines: list) -> dict:
    texts = []
    eols = []
    for raw in lines:
        eol = raw.endswith(b"\n")
        if eol:
            raw = raw[:-1]
        texts.append(raw.decode("utf-8"))
        eols.append(eol)
    n = len(texts)
    return {
        "conv_id": [conv_id] * n,
        "turn_idx": list(range(n)),
        "role": [""] * n,
        "text": texts,
        "tool": [""] * n,
        "ts": [_EPOCH_US + i * 1_000_000 for i in range(n)],
        "has_eol": eols,
    }


def logs_to_table(paths: list) -> pa.Table:
    cols = {name: [] for name in TRANSCRIPT_SCHEMA.names}
    for path in paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        with open(path, "rb") as fh:
            rows = log_lines_to_rows(stem, fh.readlines())
        for k, v in rows.items():
            cols[k].extend(v)
    arrays = [
        pa.array(cols["conv_id"], pa.string()),
        pa.array(cols["turn_idx"], pa.int32()),
        pa.array(cols["role"], pa.string()),
        pa.array(cols["text"], pa.string()),
        pa.array(cols["tool"], pa.string()),
        pa.array(cols["ts"], pa.timestamp("us")),
        pa.array(cols["has_eol"], pa.bool_()),
    ]
    return pa.Table.from_arrays(arrays, schema=TRANSCRIPT_SCHEMA)
