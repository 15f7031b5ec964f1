"""Shared player asset writer (reference asciinema2html.py:383-397,
``copy_asciinema_files``): batch HTML output ships the asciinema
player support files once per output tree, under ``acp/v<VER>/``, and
pages reference them relatively instead of carrying a copy each.

The reference copies its vendored third-party player build; this repo
does not vendor that build, so the assets written here are an ORIGINAL
minimal player shim (a custom element that base64-decodes the v2
recording from the ``src`` data URI and replays the output events as
text, honoring ``speed`` and ``idle-time-limit``).  The on-disk layout
and relative link contract match the reference exactly, so a user
diffing output trees sees the same ``acp/v2/asciinema-player.{css,js}``
files in the same place.
"""

from __future__ import annotations

import os

ACP_DIR = "acp"
ACP_VER = 2  # the version pages link against
# every version dir the reference tree ships (asciinema2html.py keeps
# acp/v2 AND acp/v3 builds side by side; copy_asciinema_files places
# the active one, normalizing v3's min.js to asciinema-player.js --
# we write both dirs so a tree diff sees the same shape)
ACP_VERSIONS = (2, 3)

PLAYER_CSS = """\
asciinema-player { display: block; }
asciinema-player pre.acp-screen {
  background: #000; color: #ddd; padding: 8px; margin: 4px 0;
  max-height: 24em; overflow-y: auto; font-family: monospace;
  white-space: pre-wrap; word-break: break-all;
}
asciinema-player .acp-bar { font-family: monospace; font-size: 90%; }
asciinema-player button { margin-right: 6px; }
"""

PLAYER_JS = """\
/* Minimal asciinema v2 replay shim: decodes the base64 NDJSON payload
 * in the src data URI and streams "o" events into a <pre>, paced by
 * the recorded timestamps / speed with idle gaps clamped to
 * idle-time-limit.  Control sequences are stripped, not emulated. */
(function () {
  "use strict";
  var STRIP = /\\x1b(?:\\[[0-9;?]*[ -\\/]*[@-~]|\\][^\\x07\\x1b]*(?:\\x07|\\x1b\\\\)|[@-Z\\\\-_])|[\\x00-\\x08\\x0b-\\x1f]/g;
  function parseCast(b64) {
    var lines = atob(b64).split("\\n"), evs = [];
    for (var i = 1; i < lines.length; i++) {
      if (!lines[i]) continue;
      var ev = JSON.parse(lines[i]);
      if (ev[1] === "o") evs.push([ev[0], ev[2]]);
    }
    return evs;
  }
  var P = Object.create(HTMLElement.prototype);
  P.attachedOnce = false;
  function setup(el) {
    if (el.attachedOnce) return;
    el.attachedOnce = true;
    var src = el.getAttribute("src") || "";
    var m = /^data:application\\/json;base64,(.*)$/.exec(src);
    if (!m) return;
    var evs = parseCast(m[1]);
    var speed = parseFloat(el.getAttribute("speed") || "1") || 1;
    var idle = parseFloat(el.getAttribute("idle-time-limit") || "0");
    var screen = document.createElement("pre");
    screen.className = "acp-screen";
    var bar = document.createElement("div");
    bar.className = "acp-bar";
    var btn = document.createElement("button");
    btn.textContent = "\\u25b6 play";
    bar.appendChild(btn);
    el.appendChild(bar);
    el.appendChild(screen);
    var timer = null, idx = 0, last = 0;
    function stop() {
      if (timer) clearTimeout(timer);
      timer = null;
      btn.textContent = "\\u25b6 play";
    }
    function step() {
      if (idx >= evs.length) { stop(); return; }
      var ev = evs[idx++];
      screen.textContent += ev[1].replace(STRIP, "");
      screen.scrollTop = screen.scrollHeight;
      if (idx < evs.length) {
        var gap = (evs[idx][0] - ev[0]) / speed;
        if (idle > 0 && gap > idle) gap = idle;
        timer = setTimeout(step, Math.max(0, gap * 1000));
      } else stop();
    }
    btn.onclick = function () {
      if (timer) { stop(); return; }
      if (idx >= evs.length) { idx = 0; screen.textContent = ""; }
      btn.textContent = "\\u275a\\u275a pause";
      step();
    };
    last = last;
  }
  function init() {
    var els = document.getElementsByTagName("asciinema-player");
    for (var i = 0; i < els.length; i++) setup(els[i]);
  }
  if (document.readyState === "loading")
    document.addEventListener("DOMContentLoaded", init);
  else init();
})();
"""


def assets_rel_dir() -> str:
    """Relative directory pages link against, e.g. ``acp/v2``."""
    return "{}/v{}".format(ACP_DIR, ACP_VER)


def write_player_assets(destdir: str) -> list:
    """Write the shared player CSS/JS under ``destdir/acp/v<VER>/``
    for every version in ``ACP_VERSIONS`` (reference
    ``copy_asciinema_files``, which normalizes the v3 build's min.js
    to ``asciinema-player.js`` in the output tree -- both version
    dirs end up with the same two file names).  Idempotent and atomic
    (tmp+rename, matching the repo's sink convention) so concurrent
    batch entries and re-runs converge on identical files.  Returns
    the relative paths written; pages link against ``ACP_VER`` only.
    """
    out = []
    for ver in ACP_VERSIONS:
        rel = "{}/v{}".format(ACP_DIR, ver)
        acp_dst = os.path.join(destdir, rel)
        os.makedirs(acp_dst, exist_ok=True)
        header = "/* player build slot v{} */\n".format(ver)
        for name, body in (
            ("asciinema-player.css", PLAYER_CSS),
            ("asciinema-player.js", header + PLAYER_JS),
        ):
            final = os.path.join(acp_dst, name)
            relpath = "{}/{}".format(rel, name)
            out.append(relpath)
            if os.path.exists(final):
                continue
            tmp = final + ".tmp.{}".format(os.getpid())
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(body)
            os.replace(tmp, final)
    return out


def head_links(assets_rel: str) -> str:
    """The <head> fragment loading the shared player assets."""
    return (
        '<link rel="stylesheet" href="{0}/asciinema-player.css"/>'
        '<script src="{0}/asciinema-player.js" defer></script>'.format(
            assets_rel
        )
    )
