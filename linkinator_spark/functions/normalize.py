"""Unicode text normalization — the cleanup pass every corpus pipeline
runs before tokenization/dedup (C4 strips control characters and
collapses whitespace; CCNet/Gopher normalize punctuation before
hashing so near-dup keys don't fracture on typography).

Normalizations (each a single regexp step, applied in a fixed order so
the composition is deterministic):

1. C0/C1 control characters (except ``\\n`` and ``\\t``) removed.
2. Unicode space separators (NBSP, en/em/thin spaces, zero-width
   space, BOM) → ASCII space.
3. Typographic quotes → straight quotes; en/em/horizontal-bar dashes
   → ``-``; the ellipsis character → ``...``.
4. Tabs and runs of spaces collapse to one space; spaces around
   newlines trimmed; 3+ consecutive newlines collapse to 2 (the
   paragraph break survives).
5. Leading/trailing whitespace trimmed.

Scale shape: a zero-shuffle codegen projection (the regexp_replace
chain fuses into the scan). The DuckDB twin shares the pattern
constants verbatim; all classes use ``\\x{...}`` escapes, which the
Java regex dialect and RE2 both accept, so one constant serves both
engines (the graphgen/cdx single-definition-point pattern).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# C0 (minus \t \n) + DEL + C1
CONTROL_RE = (r"[\x{0000}-\x{0008}\x{000b}\x{000c}\x{000e}-\x{001f}"
              r"\x{007f}\x{0080}-\x{009f}]")
# unicode space separators + zero-width space + BOM + line/para seps
SPACE_RE = (r"[\x{00a0}\x{1680}\x{2000}-\x{200b}\x{2028}\x{2029}"
            r"\x{202f}\x{205f}\x{3000}\x{feff}]")
SINGLE_Q_RE = r"[\x{2018}\x{2019}\x{201a}\x{201b}\x{2039}\x{203a}]"
DOUBLE_Q_RE = r"[\x{201c}\x{201d}\x{201e}\x{201f}\x{00ab}\x{00bb}]"
DASH_RE = r"[\x{2010}-\x{2015}\x{2212}]"
ELLIPSIS_RE = r"\x{2026}"

def clean_text(col: Column) -> Column:
    """The normalization chain as one codegen expression."""
    out = F.regexp_replace(col, CONTROL_RE, "")
    out = F.regexp_replace(out, SPACE_RE, " ")
    out = F.regexp_replace(out, SINGLE_Q_RE, "'")
    out = F.regexp_replace(out, DOUBLE_Q_RE, '"')
    out = F.regexp_replace(out, DASH_RE, "-")
    out = F.regexp_replace(out, ELLIPSIS_RE, "...")
    out = F.regexp_replace(out, "[ \\t]+", " ")
    out = F.regexp_replace(out, " ?\\n ?", "\n")
    out = F.regexp_replace(out, "\\n{3,}", "\n\n")
    # regex trim: unlike trim(), strips newlines at the ends too
    return F.regexp_replace(out, "^\\s+|\\s+$", "")


def clean_text_sql(expr: str) -> str:
    """DuckDB twin — same constants, same order."""
    steps = [
        (CONTROL_RE, "''"),
        (SPACE_RE, "' '"),
        (SINGLE_Q_RE, "''''"),   # SQL-escaped single quote
        (DOUBLE_Q_RE, "'\"'"),
        (DASH_RE, "'-'"),
        (ELLIPSIS_RE, "'...'"),
        (r"[ \t]+", "' '"),
        # newline replacements ride as chr(10) expressions: RE2 expands
        # \n in PATTERNS but replacement strings are literal text
        (r" ?\n ?", "chr(10)"),
        (r"\n{3,}", "chr(10) || chr(10)"),
    ]
    steps.append((r"^\s+|\s+$", "''"))  # regex trim incl. newlines
    out = expr
    for pat, repl in steps:
        out = f"regexp_replace({out}, '{pat}', {repl}, 'g')"
    return out
