"""Batch "todo list" configuration loader.

The reference's batch driver consumes a JSON file describing inputs,
outputs and per-file side tables: ``<id>-chapters`` (cmd_count ->
title), ``<id>-suppress`` (cmd_counts to drop), ``<id>-hopto``
(cross-file links) (reference main.py:173-264).  Its bundled sample
contains ``/* */`` comments that break ``json.load`` (reference
test/resources/test_list.json:2); this loader strips them, which is a
deliberate deviation documented in CONFORMANCE.md.

The loaded config becomes an EnrichConfig broadcast to the enrichment
actor pool plus a suppress map for the session scan -- the engine's
equivalent of the reference's per-file TodoArgs plumbing.
"""

from __future__ import annotations

import json
import re

from ..stages.enrich import EnrichConfig

_COMMENT = re.compile(r"/\*.*?\*/", re.S)


def parse_todo_json(text: str) -> dict:
    return json.loads(_COMMENT.sub("", text))


def load_todo_config(path: str):
    """Returns (EnrichConfig, suppress_map, files) from a todo list.

    ``suppress_map`` maps conv_id (file id) -> list of suppressed
    cmd_counts, consumed by the session scan; chapters and hop links
    feed the enrichment stage keyed on (conv_id, cmd_count).
    """
    with open(path, encoding="utf-8") as fh:
        data = parse_todo_json(fh.read())

    files = data.get("files", [])
    chapters = {}
    suppress_map = {}
    suppress_keys = set()
    hopto = {}
    for f in files:
        fid = f.get("id")
        if not fid:
            continue
        ch = data.get(fid + "-chapters")
        if ch:
            for cmd, title in ch.items():
                chapters[(fid, int(cmd))] = title
        sup = data.get(fid + "-suppress")
        if sup:
            suppress_map[fid] = list(sup)
            for c in sup:
                suppress_keys.add((fid, int(c)))
        hop = data.get(fid + "-hopto")
        if hop and "hops" in hop:
            hops = hop["hops"]
            target = hop.get("id", "")
            for i in range(0, len(hops) - 1, 2):
                hopto[(fid, int(hops[i]))] = "{}#c{}".format(
                    target, hops[i + 1]
                )

    cfg = EnrichConfig(
        chapters=chapters, suppress=suppress_keys, hopto=hopto
    )
    return cfg, suppress_map, files
