"""Provenance stamping, authority tiers, and authority-weighted trust.

Ports three SPI pieces of the reference:

* stampProvenance (pipeline/PropositionPipeline.kt:306-319): each proposition
  carries provenance entries linking it to the chunks it came from. The
  locator is the caller's source locator when known, else a content-addressed
  locator over the chunk text — always available, grounds the fact in the
  exact content it was read from (provenance/SourceLocator.kt:42-150).
  Locator keys are kind-prefixed strings ("uri:...", "file:...",
  "content:...", "connector:...") exactly as SourceLocator.key() renders them.
* StructuralAuthorityResolver (spi/Authority.kt:35-131): a proposition's
  authority is the STRONGEST (lowest-ordinal) tier across its grounding
  locators; no grounding fails safe to UNKNOWN. Tier mapping: connector ->
  PRIMARY, uri/file -> SECONDARY, content -> DERIVED.
* AuthorityWeightedTrustScorer (spi/AuthorityWeightedTrustScorer.kt):
  trust = weight[tier], default PRIMARY 0.9 / SECONDARY 0.75 / DERIVED 0.6 /
  UNKNOWN 0.5 — the cached trust score the TrustGate and
  PropositionQuery.min_trust_score read (fail-open on absence).

Everything is a column expression over a ``provenance`` array<string> column —
no UDFs, no shuffles beyond the one grounding join in stamp_provenance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AUTHORITY_TIERS = ["PRIMARY", "SECONDARY", "DERIVED", "UNKNOWN"]  # ordinal = index
TRUST_WEIGHTS = [0.9, 0.75, 0.6, 0.5]  # AuthorityWeightedTrustScorer.DEFAULT_WEIGHTS
UNKNOWN_ORDINAL = 3


def stamp_provenance(
    props: DataFrame,
    chunks: DataFrame,
    chunk_id_col: str = "chunk_id",
    text_col: str = "text",
    hash_col: str | None = None,
    locator_col: str | None = None,
) -> DataFrame:
    """Attach a ``provenance`` array of locator keys to each proposition.

    props must carry ``grounding`` (array of chunk ids). Each grounding chunk
    contributes one entry: the chunk's explicit source locator when
    ``locator_col`` names one, else the content-addressed fallback
    ``content:<sha256(chunk text)>`` (``hash_col`` reuses a precomputed
    content hash, e.g. assembly's). Sorted distinct — deterministic across
    reruns and parallelism.
    """
    content = (
        F.col(hash_col) if hash_col else F.sha2(F.col(text_col), 256)
    )
    key = F.concat(F.lit("content:"), content)
    if locator_col:
        key = F.coalesce(F.col(locator_col), key)
    entries = chunks.select(F.col(chunk_id_col).alias("_chunk"), key.alias("_key"))
    stamped = (
        props.select("prop_id", F.explode("grounding").alias("_chunk"))
        .join(entries, "_chunk")
        .groupBy("prop_id")
        .agg(F.array_sort(F.collect_set("_key")).alias("provenance"))
    )
    return props.join(stamped, "prop_id", "left").withColumn(
        "provenance", F.coalesce("provenance", F.array().cast("array<string>"))
    )


def locator_ordinal(key: Column) -> Column:
    """SourceLocator kind -> AuthorityTier ordinal (StructuralAuthorityResolver.DEFAULT_MAP)."""
    return (
        F.when(key.startswith("connector:"), 0)
        .when(key.startswith("uri:"), 1)
        .when(key.startswith("file:"), 1)
        .when(key.startswith("content:"), 2)
        .otherwise(UNKNOWN_ORDINAL)
    )


def authority_ordinal(provenance: Column | str = "provenance") -> Column:
    """Strongest (min) tier ordinal across grounding locators; UNKNOWN when empty."""
    p = F.col(provenance) if isinstance(provenance, str) else provenance
    return F.coalesce(
        F.array_min(F.transform(p, lambda k: locator_ordinal(k))),
        F.lit(UNKNOWN_ORDINAL),
    )


def authority_tier(provenance: Column | str = "provenance") -> Column:
    """Tier name (PRIMARY|SECONDARY|DERIVED|UNKNOWN) from the provenance array."""
    return F.element_at(
        F.array(*[F.lit(t) for t in AUTHORITY_TIERS]), authority_ordinal(provenance) + 1
    )


def trust_score(provenance: Column | str = "provenance") -> Column:
    """Authority-weighted trust (AuthorityWeightedTrustScorer.DEFAULT_WEIGHTS)."""
    return F.element_at(
        F.array(*[F.lit(w) for w in TRUST_WEIGHTS]), authority_ordinal(provenance) + 1
    )


def with_provenance_metadata(props: DataFrame, chunks: DataFrame, **kwargs) -> DataFrame:
    """stamp_provenance + authority_tier + trust_score in one pass."""
    out = stamp_provenance(props, chunks, **kwargs)
    return out.withColumn("authority_tier", authority_tier()).withColumn(
        "trust_score", trust_score()
    )


def with_additional_grounding(props: DataFrame, extra: list[str] | None) -> DataFrame:
    """RevisionResult.withAdditionalGrounding (proposition/revision/
    RevisionResult.kt, AdditionalGroundingTest.kt): merge extra source-record
    ids into each proposition's ``grounding``, de-duplicated, original ids
    first; empty/None is a no-op. Callers apply this to the INCOMING side
    only, so New/Merged/Reinforced outputs and a Contradicted pair's new
    proposition carry the ids while pre-existing originals keep their own
    provenance."""
    if not extra:
        return props
    extra_arr = F.array(*[F.lit(x) for x in extra])
    if "grounding" not in props.columns:
        return props.withColumn("grounding", F.array_distinct(extra_arr))
    return props.withColumn(
        "grounding",
        F.array_distinct(
            F.concat(
                F.coalesce(F.col("grounding"), F.array().cast("array<string>")),
                extra_arr,
            )
        ),
    )


def resolve_sources(
    props: DataFrame,
    prop_ids: DataFrame | list[str],
    max_sources: int = 100,
) -> DataFrame:
    """Batch provenance lookup for a result set (agent/ProvenanceResolver.kt:
    30-46): one call per result set, never per proposition. Input ids may be
    a literal list or a 1-column (prop_id) relation; output is one row per
    requested proposition that HAS recorded sources — absent ids are simply
    absent, matching the contract ("propositions with no recorded source may
    be absent from the map").

    Returns (prop_id, sources) with ``sources`` the proposition's provenance
    locator keys most-authoritative first (connector < uri/file < content —
    locator_ordinal order, then key), capped at ``max_sources`` ("Memory caps
    and truncates for display").

    Scale shape: a broadcast semi-join on prop_id against the provenance
    relation — the request side is a result set (tens of rows), so the probe
    never scans more than the pushed-down id filter.
    """
    if isinstance(prop_ids, DataFrame):
        wanted = prop_ids.select("prop_id")
        scoped = props.join(F.broadcast(wanted), "prop_id", "left_semi")
    else:
        scoped = props.filter(F.col("prop_id").isin(list(prop_ids)))
    key = F.explode("provenance")
    return (
        scoped.select("prop_id", key.alias("_key"))
        .select(
            "prop_id",
            F.struct(locator_ordinal(F.col("_key")).alias("o"), F.col("_key").alias("k")).alias("_sk"),
        )
        .groupBy("prop_id")
        .agg(
            F.slice(F.array_sort(F.collect_set("_sk")), 1, max_sources).alias("_sks")
        )
        .select(
            "prop_id",
            F.transform("_sks", lambda s: s["k"]).alias("sources"),
        )
    )
