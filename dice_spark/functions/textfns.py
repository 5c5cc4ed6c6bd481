"""Text/string helpers: canonical text, hashing, id minting, name scoring.

All pure column expressions (JVM-side, whole-stage-codegen friendly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonicalize_text(col: Column | str) -> Column:
    """Lower, strip non-alnum, collapse whitespace.

    Matches LlmPropositionReviser.canonicalize
    (/root/reference/dice/.../revision/LlmPropositionReviser.kt:123-127) —
    the exact-text revision fast path and in-batch dedup key.
    """
    c = F.lower(_c(col))
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def content_hash(col: Column | str) -> Column:
    """SHA-256 hex content hash (reference Sha256ContentHasher)."""
    return F.sha2(_c(col), 256)


def upper_snake(col: Column | str) -> Column:
    """Predicate -> graph relationship type: "works with" -> "WORKS_WITH".

    Matches RelationBasedGraphProjector.toRelationshipType
    (projection/graph/RelationBasedGraphProjector.kt:134-139).
    """
    return F.regexp_replace(F.upper(F.trim(_c(col))), r"\s+", "_")


def mint_entity_id(context_id: Column | str, entity_type: Column | str, key: Column | str) -> Column:
    """Deterministic content-derived entity id.

    The reference mints random UUIDs (SuggestedEntities.kt:46-52); we derive
    ids from content so reruns and both parallelism levels mint identical ids
    (a deliberate improvement for reproducibility — SURVEY.md §2.5).
    """
    return F.md5(F.concat_ws("|", _c(context_id), F.lower(_c(entity_type)), _c(key)))


def canonical_name_score(col: Column | str) -> Column:
    """Display-name quality score for canonical-name selection.

    Weights match DefaultCanonicalNameSelector.score
    (common/support/DefaultCanonicalNameSelector.kt:48-67):
    +1000 multi-word, +500 mixed-case (any uppercase), +100 title-cased,
    -200 ALL-CAPS (with letters), -2000 contains '@', -50 has digit,
    + length as tiebreak.
    """
    c = _c(col)
    has_letter = c.rlike("[A-Za-z]")
    return (
        F.when(c.contains(" "), F.lit(1000)).otherwise(0)
        + F.when(c != F.lower(c), F.lit(500)).otherwise(0)
        + F.when(c.rlike("^[A-Z]"), F.lit(100)).otherwise(0)
        - F.when((c == F.upper(c)) & has_letter, F.lit(200)).otherwise(0)
        - F.when(c.contains("@"), F.lit(2000)).otherwise(0)
        - F.when(c.rlike("[0-9]"), F.lit(50)).otherwise(0)
        + F.length(c)
    )


def duckdb_canonical_name_score_sql(expr: str) -> str:
    """DuckDB rendering of canonical_name_score for oracle SQL."""
    return (
        f"(case when contains({expr}, ' ') then 1000 else 0 end"
        f" + case when {expr} <> lower({expr}) then 500 else 0 end"
        f" + case when regexp_matches({expr}, '^[A-Z]') then 100 else 0 end"
        f" - case when {expr} = upper({expr}) and regexp_matches({expr}, '[A-Za-z]') then 200 else 0 end"
        f" - case when contains({expr}, '@') then 2000 else 0 end"
        f" - case when regexp_matches({expr}, '[0-9]') then 50 else 0 end"
        f" + length({expr}))"
    )


def duckdb_canonicalize_text_sql(expr: str) -> str:
    return (
        "trim(regexp_replace(regexp_replace(lower(" + expr + "), "
        "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
    )
