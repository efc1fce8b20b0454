"""Shared whitespace-tokenization contract (Spark-free).

ONE definition of "whitespace" used by every engine pair so oracles stay
value-identical (CLAUDE.md driver contract):

- Java/Spark ``\\s``  = ``[ \\t\\n\\x0b\\f\\r]`` — the canonical class;
- DuckDB RE2 ``\\s``  = ``[ \\t\\n\\f\\r]`` (NO vertical tab!), so SQL
  twins must spell the class out — use :data:`SQL_WS` in oracle strings;
- Python ``str.split()`` splits on UNICODE whitespace (NBSP, \\x85, …),
  so Python-side tokenizers here use :func:`ascii_words` instead.

A document containing ``\\x0b`` or U+00A0 diverges across all three
defaults — reviewer-found, latent on the ASCII fixture corpus.
"""

from __future__ import annotations

import re

# the Java \s class, shared verbatim by all three engines
WS_CHARS = " \t\n\x0b\f\r"

# embed in DuckDB regexes: f"regexp_split_to_array(text, '{SQL_WS}+')"
SQL_WS = "[" + WS_CHARS + "]"

_WS_RUN = re.compile("[" + re.escape(WS_CHARS) + "]+")


def ascii_words(text: str | None) -> list[str]:
    """Split on runs of the shared class, dropping empty tokens — the
    cross-engine-stable analogue of ``str.split()``."""
    return [w for w in _WS_RUN.split(text or "") if w]
