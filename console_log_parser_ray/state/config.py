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


def hop_target_cmd(hop: int, target_filter) -> int:
    """Translated command number to DISPLAY for a hop into a file with
    suppressed commands: suppression renumbers the visible commands, so
    the shown number walks the target's suppress list (reference
    terminal2html.py:32-38, HopTarget.get_target_cmd).  The anchor id
    keeps the raw cmd_count (reference terminal2html.py:28-30)."""
    cmdnum = hop
    for cmd in sorted(target_filter):
        if hop < cmd:
            break
        cmdnum -= 1
    return cmdnum


def load_todo_config(path: str):
    """Returns (EnrichConfig, suppress_map, files) from a todo list.

    ``suppress_map`` maps conv_id (file id) -> list of suppressed
    cmd_counts, consumed by the session scan; chapters and hop links
    feed the enrichment stage keyed on (conv_id, cmd_count).  Hop links
    carry both the raw anchor and a display label whose command number
    is renumbered through the TARGET file's suppress list (reference
    main.py:247-258 wiring HopTarget with the target's filter).
    """
    with open(path, encoding="utf-8") as fh:
        data = parse_todo_json(fh.read())

    files = data.get("files", [])
    chapters = {}
    suppress_map = {}
    suppress_keys = set()
    hopto = {}
    hop_labels = {}
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
            tfilter = data.get(target + "-suppress") or ()
            pre = hop.get("pre", "")
            to = hop.get("to", target)
            post = hop.get("post", "")
            for i in range(0, len(hops) - 1, 2):
                raw = int(hops[i + 1])
                key = (fid, int(hops[i]))
                hopto[key] = "{}#c{}".format(target, raw)
                hop_labels[key] = "{} jump to {} command {} {}".format(
                    pre, to, hop_target_cmd(raw, tfilter), post
                )

    cfg = EnrichConfig(
        chapters=chapters,
        suppress=suppress_keys,
        hopto=hopto,
        hop_labels=hop_labels,
    )
    return cfg, suppress_map, files
