"""Prompt / vim / app-mode byte patterns.

These regexes define the *log feature language* the engine recognises;
they are taken verbatim from the reference so that detection behavior
matches exactly (reference terminalparser.py:27-37).  They operate on
raw line bytes (escape sequences included).
"""

import re

# MINGW-style two-line prompt header: user@host MINGW64 <cwd>
# (reference terminalparser.py:27)
PROMPT_HEADER = re.compile(
    b"(?:\x1b\\[[0-9;]+m)?[a-z.]+@[-a-zA-Z0-9]+ (?:\x1b\\[[0-9;]+m)?MINGW64"
    b"(?:\x1b\\[[0-9;]+m)? (?:\x1b\\[[0-9;]+m)?(?P<cwd>(~?[-.\\w/ ]+|~))"
)

# Generic prompt: user[@host][:] <cwd> [ (branch) ] $
# (reference terminalparser.py:28)
_PROMPT_SRC = (
    b"(?:\x1b\\[[0-9;]+m)?[a-z.]+(?:(?:\x1b\\[[0-9;]+m)?@(?:\x1b\\[[0-9;]+m)?"
    b"[-a-zA-Z0-9]+)?(?:\x1b\\[[0-9;]+m)?(?::| )(?:\x1b\\[[0-9;]+m)?"
    b"(?P<cwd>(~?[-.\\w/ ]+|~))(?:\x1b\\[[0-9;]+m)?"
    b"(?:(?:\x1b\\[[0-9;]+m) \\({1,2}[-.\\w/|! ]+\\){1,2} (?:\x1b\\[[0-9;]+m))?"
    b"(?:\x1b\\[[0-9;]+m)?\\$(?:\x1b\\[00m)? "
)
PROMPT = re.compile(_PROMPT_SRC)
PROMPT_LINESTART = re.compile(b"^" + _PROMPT_SRC)
# Prompt immediately after an application-mode (e.g. man page) exit
# (reference terminalparser.py:30)
PROMPT_INLINE = re.compile(b"(?:\x1b\\[\\?1049l\x1b\\[23;0;0t)?" + _PROMPT_SRC)
# Prompt immediately after a vim session, possibly after a clear-line
# (reference terminalparser.py:31)
PROMPT_POSTVIM = re.compile(b"(?:\r\x1b\\[K)?" + _PROMPT_SRC)

# Vim session start markers (reference terminalparser.py:32-35)
VIM_START_LIT = b"hint: Waiting for your editor to close the file... "
VIM_START_0 = re.compile(b"(?:\x1b\\[\\?2004l\r)?" + VIM_START_LIT)
VIM_START_1 = re.compile(
    b".*(?P<t2200>\x1b\\[22;0;0t)(?:.*\x1b\\[[0-9];(?P<height>[0-9]+)r)?"
    b".*(?:\x1b\\[22;2t\x1b\\[22;1t)"
)
VIM_START_2 = re.compile(
    b".*\x1b\\[[0-9];(?P<height>[0-9]+)r(?:.*\x1b\\[[0-9]+;[0-9]+H\""
    b"(?P<file>[^\"]+)\")?.*\x1b\\[2;1H\xe2\x96\xbd\x1b\\[6n\x1b\\[2;1H  "
)

# Vim session end markers (reference terminalparser.py:36-37)
VIM_END_1 = re.compile(b".*\x1b\\[23;0;0t")
VIM_END_2 = re.compile(b".*\x1b\\[\\?1l\x1b>")
