"""Surface-form name normalization as pure Catalyst column expressions.

Semantics match the reference's NormalizedNameCandidateSearcher.normalizeName
(/root/reference/dice/src/main/kotlin/com/embabel/dice/common/resolver/searcher/
NormalizedNameCandidateSearcher.kt:107-139): "Last, First" reversal FIRST, then
title strip (Mr/Mrs/Ms/Dr/Prof), suffix strip (Jr/Sr/II/III/IV), middle-initial
strip (single capital, optional dot, flanked by tokens of length >= 2), then
whitespace collapse. The normalized lower-case key is the candidate-blocking
join key (the salted hash-join key at scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_COMMA_REVERSAL = (r"^([^,]+),\s*(.+)$", "$2 $1")
_TITLES = (r"(?i)^(Mr\.?|Mrs\.?|Ms\.?|Dr\.?|Prof\.?)\s+", "")
_SUFFIXES = (r"(?i)\s+(Jr\.?|Sr\.?|II|III|IV)$", "")
# Capture-group form of the reference's lookaround rule — equivalent for a
# single middle initial, and portable to regex engines without lookbehind.
_MIDDLE_INITIAL = (r"(\w{2,})\s+[A-Z]\.?\s+(\w{2,})", "$1 $2")
_WS = (r"\s+", " ")


def normalize_name(col: Column | str) -> Column:
    """Case-preserving normalized display form of a personal name."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    c = F.trim(F.regexp_replace(c, *_COMMA_REVERSAL))
    c = F.regexp_replace(c, *_TITLES)
    c = F.regexp_replace(c, *_SUFFIXES)
    c = F.regexp_replace(c, *_MIDDLE_INITIAL)
    c = F.trim(F.regexp_replace(c, *_WS))
    return c


def norm_key(col: Column | str) -> Column:
    """Lower-cased normalized name — the equality/blocking key.

    The reference searcher compares normalized names case-insensitively
    (NormalizedNameCandidateSearcher.kt:60-75).
    """
    return F.lower(normalize_name(col))


# DuckDB rendering of the same chain, used to build oracle SQL. Kept adjacent
# so a parity test can assert both produce identical keys on the fixture table.
def duckdb_norm_key_sql(expr: str) -> str:
    s = f"trim({expr})"
    s = f"trim(regexp_replace({s}, '^([^,]+),\\s*(.+)$', '\\2 \\1'))"
    s = f"regexp_replace({s}, '(?i)^(Mr\\.?|Mrs\\.?|Ms\\.?|Dr\\.?|Prof\\.?)\\s+', '')"
    s = f"regexp_replace({s}, '(?i)\\s+(Jr\\.?|Sr\\.?|II|III|IV)$', '')"
    s = f"regexp_replace({s}, '(\\w{{2,}})\\s+[A-Z]\\.?\\s+(\\w{{2,}})', '\\1 \\2', 'g')"
    s = f"lower(trim(regexp_replace({s}, '\\s+', ' ', 'g')))"
    return s
