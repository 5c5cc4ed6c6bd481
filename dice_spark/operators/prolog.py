"""Prolog fact-base emission: classified edges -> ground Prolog program rows.

Semantics match DefaultPrologProjector + PrologTypes (/root/reference/dice/src/
main/kotlin/com/embabel/dice/projection/prolog/PrologProjector.kt:96-230,
PrologTypes.kt:100-360):

* projectRelationship (PrologProjector.kt:180-195): predicate =
  PrologSchema.getPredicate(relationship.type) — explicit mapping first
  (DEFAULT_MAPPINGS, PrologTypes.kt:337-350), else camelCase -> snake_case
  (which for our UPPER_SNAKE edge types is a plain lowercase); args =
  [sourceId, targetId].
* PrologFact.toProlog (PrologTypes.kt:113-117): ``predicate('a', 'b').`` with
  quoteAtom lowercasing and replacing every non-[a-z0-9_] char with ``_``
  (PrologTypes.kt:133-136).
* ConfidenceFact (PrologTypes.kt:147-153): ``confidence(term, C).`` so rules
  can filter by threshold. Deviation: the reference interpolates Kotlin's
  Double.toString; we emit a fixed ``%.6f`` (printf on both engines) because
  JVM float repr is not reproducible in DuckDB — same information, stable
  across engines.
* GroundingFact (PrologTypes.kt:160-166): ``grounded_by(term, 'propId').``,
  one per source proposition id — the proposition id is quoted verbatim (NOT
  atom-normalized), exactly as the reference string-interpolates it.
* PrologProjectionResult.toTheory (PrologTypes.kt:330-350) concatenates
  rules + facts + confidence + grounding; ``write_theory`` streams the same
  sections to text files instead of building one driver-side string.

Scale: everything is a column expression over the already-merged edges table
(one narrow projection + one explode for grounding) — no shuffle beyond what
project_edges already did, no UDF, no driver-side loop. Grounding rows are
bounded per edge by projection.MAX_EDGE_SOURCE_IDS (the capped
source_prop_ids array), so a Zipf-head edge cannot fan out unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# PrologSchema.DEFAULT_MAPPINGS (PrologTypes.kt:337-350)
DEFAULT_MAPPINGS = {
    "EXPERT_IN": "expert_in",
    "KNOWS": "knows",
    "WORKS_AT": "works_at",
    "LIVES_IN": "lives_in",
    "OWNS": "owns",
    "FRIEND_OF": "friend_of",
    "COLLEAGUE_OF": "colleague_of",
    "REPORTS_TO": "reports_to",
    "MANAGES": "manages",
    "MEMBER_OF": "member_of",
    "CREATED": "created",
    "USES": "uses",
}


def quote_atom(col) -> F.Column:
    """quoteAtom (PrologTypes.kt:133-136): lowercase, non-[a-z0-9_] -> '_',
    single-quoted."""
    return F.concat(
        F.lit("'"), F.regexp_replace(F.lower(col), "[^a-z0-9_]", "_"), F.lit("'")
    )


def predicate_for(edge_type_col, mappings: dict[str, str] | None = None) -> F.Column:
    """PrologSchema.getPredicate (PrologTypes.kt:260-265): mapping lookup by
    uppercased type, else camelToSnakeCase (insert _ at lower->UPPER
    boundaries, then lowercase — a no-op beyond lowercasing for our
    UPPER_SNAKE edge types)."""
    m = mappings if mappings is not None else DEFAULT_MAPPINGS
    fallback = F.lower(
        F.regexp_replace(edge_type_col, r"([a-z])([A-Z])", r"$1_$2")
    )
    if not m:
        return fallback
    pairs = []
    for k, v in m.items():
        pairs.extend([F.lit(k.upper()), F.lit(v)])
    return F.coalesce(
        F.element_at(F.create_map(*pairs), F.upper(edge_type_col)), fallback
    )


def project_prolog(
    edges: DataFrame,
    include_confidence: bool = True,
    include_grounding: bool = True,
    mappings: dict[str, str] | None = None,
) -> DataFrame:
    """Edges (project_edges output: source_id, target_id, edge_type,
    confidence, source_prop_ids) -> one row per emitted Prolog line.

    Output: (kind, predicate, line) where kind in
    fact | confidence | grounded_by — the three sections of
    PrologProjectionResult (PrologTypes.kt:318-327).
    """
    base = edges.select(
        predicate_for(F.col("edge_type"), mappings).alias("predicate"),
        F.concat(
            predicate_for(F.col("edge_type"), mappings),
            F.lit("("),
            quote_atom(F.col("source_id")),
            F.lit(", "),
            quote_atom(F.col("target_id")),
            F.lit(")"),
        ).alias("term"),
        "confidence",
        "source_prop_ids",
    )
    facts = base.select(
        F.lit("fact").alias("kind"),
        "predicate",
        F.concat(F.col("term"), F.lit(".")).alias("line"),
    )
    out = facts
    if include_confidence:
        conf = base.select(
            F.lit("confidence").alias("kind"),
            "predicate",
            F.concat(
                F.lit("confidence("),
                F.col("term"),
                F.lit(", "),
                F.format_string("%.6f", F.col("confidence")),
                F.lit(")."),
            ).alias("line"),
        )
        out = out.unionByName(conf)
    if include_grounding:
        ground = base.select(
            "predicate", "term", F.explode("source_prop_ids").alias("prop_id")
        ).select(
            F.lit("grounded_by").alias("kind"),
            "predicate",
            F.concat(
                F.lit("grounded_by("),
                F.col("term"),
                F.lit(", '"),
                F.col("prop_id"),
                F.lit("')."),
            ).alias("line"),
        )
        out = out.unionByName(ground)
    return out


def write_theory(prolog_rows: DataFrame, path: str, base_rules: str = "") -> None:
    """toTheory at scale (PrologTypes.kt:330-350): sections as partitioned
    text files instead of one driver-side string. Rules (a small static
    string) go in a header file; fact/confidence/grounding rows stream out
    partitioned by kind."""
    # .text() accepts exactly one string column, so write per-kind:
    for kind in ("fact", "confidence", "grounded_by"):
        (
            prolog_rows.filter(F.col("kind") == kind)
            .select("line")
            .write.mode("overwrite")
            .text(f"{path}/{kind}")
        )
    if base_rules:
        import os

        os.makedirs(path, exist_ok=True)
        with open(f"{path}/rules.pl", "w") as fh:
            fh.write("% Base inference rules\n" + base_rules + "\n")


def theory_string(prolog_rows: DataFrame, base_rules: str = "") -> str:
    """Small-input toTheory parity (PrologTypes.kt:330-350) — test/driver use
    only; collects, so callers must pass bounded input."""
    rows = prolog_rows.select("kind", "line").collect()
    sections = {
        "fact": "% Projected facts",
        "confidence": "% Confidence metadata",
        "grounded_by": "% Grounding/provenance",
    }
    parts = ["% Base inference rules", base_rules, ""]
    for kind, header in sections.items():
        parts.append(header)
        parts.extend(sorted(r["line"] for r in rows if r["kind"] == kind))
        parts.append("")
    return "\n".join(parts)
