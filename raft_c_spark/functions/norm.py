"""Shared text normalization for the Arrow kernels.

The SQL-side normalization everywhere in this repo is
``lower(trim(regexp_replace(text, '\\s+', ' ')))`` — Java regex on
the Spark side, RE2 in the DuckDB oracles, and BOTH define ``\\s`` as
the ASCII whitespace class. Python's ``str.split()`` collapses
UNICODE whitespace (U+00A0, U+3000, ...) — reviewer r8: the kernels
that normalized with ``str.split()`` therefore diverged from their
own SQL plans and oracles on any document containing non-ASCII
whitespace (plausible in CJK text). Every kernel must normalize with
THIS function so all three surfaces agree.
"""

from __future__ import annotations

import re

#: Java \s == RE2 \s+\v == this class — ASCII whitespace only
_ASCII_WS = re.compile(r"[ \t\n\r\f\x0b]+")


def norm_ascii_ws(text: str | None) -> str:
    """lower + collapse ASCII-whitespace runs to single spaces + trim
    — the exact Python replay of ``lower(trim(regexp_replace(text,
    '\\s+', ' ')))``. Non-ASCII whitespace is DATA here, as it is to
    Java/RE2 ``\\s``."""
    return _ASCII_WS.sub(" ", (text or "").lower()).strip(" ")
