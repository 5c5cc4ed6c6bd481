"""Entity linking: the cheapest-first candidate-search ladder, set-oriented.

The reference walks searchers serially per mention with early stop
(EscalatingEntityResolver, /root/reference/dice/src/main/kotlin/com/embabel/dice/
common/resolver/EscalatingEntityResolver.kt:106-237). We compute every tier as
a blocked join over the whole mention batch and coalesce in priority order —
set-oriented early stopping: rows resolved by a cheap tier never reach the
expensive tiers' joins (each tier filters to still-unresolved mentions).

Tier semantics (each accepts only when EXACTLY ONE candidate matches — the
"exactly-one rule", README.md:811-815, enforced with a window count):

  EXACT      lower(span) == lower(entity name)          (ByExactNameCandidateSearcher)
  NORMALIZED norm_key(span) == norm_key(name)           (NormalizedNameCandidateSearcher)
  PARTIAL    single word <-> multi-word token, len >= 4 (PartialNameCandidateSearcher)
  FUZZY      levenshtein <= floor(min_len * 0.2), min length 4
                                                        (FuzzyNameCandidateSearcher.kt:45-47,104-130)
  NO_MATCH   -> create new entity, or VETO when the schema forbids creation
               for the type (EscalatingEntityResolver.createNewOrVeto:224-237)

Label compatibility gates every tier: a mention only matches an entity sharing
its type, case-insensitively (InMemoryEntityResolver.isMatch:105-110).

Scale notes: the blocking key (type, norm_key) is Zipfian (head entities) —
``salt`` spreads the mention side S ways and replicates the entity side, on
top of AQE skew-join splitting. The fuzzy tier never cross-joins: candidates
are blocked on (type, first char, length band).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dice_spark.functions.normalize import norm_key, normalize_name

LEVELS = ["EXACT", "NORMALIZED", "PARTIAL", "FUZZY"]
MIN_PART_LENGTH = 4
MIN_FUZZY_LENGTH = 4
MAX_DISTANCE_RATIO = 0.2


def prepare_mentions(mentions: DataFrame, span_col: str = "span", type_col: str = "entity_type") -> DataFrame:
    """Attach normalization keys. ``mention_key`` identifies a surface form."""
    return mentions.withColumn("norm_name", normalize_name(span_col)).withColumn(
        "norm_key", norm_key(span_col)
    ).withColumn("type_key", F.lower(F.col(type_col)))


def _exactly_one(df: DataFrame, mention_cols: list[str], tier: str) -> DataFrame:
    """Keep candidate rows only for mentions with exactly one candidate."""
    w = Window.partitionBy(*mention_cols)
    return (
        df.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") == 1)
        .drop("_n")
        .withColumn("resolution_level", F.lit(tier))
    )


def resolve_against_entities(
    mentions: DataFrame,
    entities: DataFrame,
    salt: int = 8,
) -> DataFrame:
    """Resolve mention surface forms against an existing entity registry.

    mentions: (span, entity_type) [+ carried keys]; entities: (entity_id,
    canonical_name, entity_type). Returns mentions + resolved_id (nullable) +
    resolution_level (EXACT|NORMALIZED|PARTIAL|FUZZY|NO_MATCH).
    """
    m = prepare_mentions(mentions).alias("m")
    ents = (
        entities.withColumn("e_norm_name", normalize_name("canonical_name"))
        .withColumn("e_norm_key", norm_key("canonical_name"))
        .withColumn("e_type_key", F.lower("entity_type"))
        .select("entity_id", F.col("canonical_name").alias("e_name"), "e_norm_name", "e_norm_key", "e_type_key")
    ).alias("e")
    mention_keys = ["span", "type_key"]

    # EXACT: case-insensitive raw-name equality. Salted to defuse head-entity
    # skew: mention side gets a random-free deterministic salt, entity side is
    # replicated S ways so the join key (name, salt) spreads hot names.
    msalt = F.pmod(F.xxhash64("m.span", F.col("m.norm_key")), F.lit(salt))
    esalt_df = ents.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    exact = _exactly_one(
        m.join(
            esalt_df.alias("e"),
            (F.lower(F.col("m.span")) == F.lower(F.col("e.e_name")))
            & (F.col("m.type_key") == F.col("e.e_type_key"))
            & (msalt == F.col("e._salt")),
        ),
        mention_keys,
        "EXACT",
    )

    unresolved_1 = m.join(
        exact.select("span", "type_key").distinct(), ["span", "type_key"], "left_anti"
    ).alias("m")
    normalized = _exactly_one(
        unresolved_1.join(
            ents,
            (F.col("m.norm_key") == F.col("e.e_norm_key"))
            & (F.col("m.type_key") == F.col("e.e_type_key")),
        ),
        mention_keys,
        "NORMALIZED",
    )

    unresolved_2 = unresolved_1.join(
        normalized.select("span", "type_key").distinct(), ["span", "type_key"], "left_anti"
    ).alias("m")
    # PARTIAL: single-word mention <-> token of multi-word entity name (or the
    # symmetric case), token length >= 4, exact token equality.
    e_tokens = ents.select(
        "entity_id", "e_name", "e_norm_key", "e_type_key",
        F.explode(F.split("e_norm_key", r"\s+")).alias("e_token"),
        F.size(F.split("e_norm_key", r"\s+")).alias("e_nwords"),
    ).filter(F.length("e_token") >= MIN_PART_LENGTH)
    m_single = unresolved_2.filter(
        (~F.col("m.norm_key").contains(" ")) & (F.length("m.norm_key") >= MIN_PART_LENGTH)
    )
    partial_a = m_single.join(
        e_tokens.alias("e"),
        (F.col("m.norm_key") == F.col("e.e_token"))
        & (F.col("m.type_key") == F.col("e.e_type_key"))
        & (F.col("e.e_nwords") > 1),
    )
    m_tokens = unresolved_2.filter(F.col("m.norm_key").contains(" ")).withColumn(
        "m_token", F.explode(F.split("m.norm_key", r"\s+"))
    ).filter(F.length("m_token") >= MIN_PART_LENGTH)
    partial_b = m_tokens.join(
        ents,
        (F.col("m_token") == F.col("e.e_norm_key"))
        & (F.col("m.type_key") == F.col("e.e_type_key"))
        & (~F.col("e.e_norm_key").contains(" ")),
    ).drop("m_token")
    partial = _exactly_one(
        partial_a.select("m.*", "e.entity_id").unionByName(partial_b.select("m.*", "e.entity_id")).distinct(),
        mention_keys,
        "PARTIAL",
    )

    unresolved_3 = unresolved_2.join(
        partial.select("span", "type_key").distinct(), ["span", "type_key"], "left_anti"
    ).alias("m")
    # FUZZY: blocked on (type, first char, length band) — never a cross join.
    band = lambda c: F.floor(F.length(c) / 4)  # noqa: E731
    fuzzy_pairs = unresolved_3.filter(F.length("m.norm_key") >= MIN_FUZZY_LENGTH).join(
        ents.filter(F.length("e.e_norm_key") >= MIN_FUZZY_LENGTH),
        (F.col("m.type_key") == F.col("e.e_type_key"))
        & (F.substring(F.col("m.norm_key"), 1, 1) == F.substring(F.col("e.e_norm_key"), 1, 1))
        & (band(F.col("m.norm_key")) == band(F.col("e.e_norm_key"))),
    )
    min_len = F.least(F.length("m.norm_key"), F.length("e.e_norm_key"))
    fuzzy = _exactly_one(
        fuzzy_pairs.filter(
            F.levenshtein(F.col("m.norm_key"), F.col("e.e_norm_key"))
            <= F.floor(min_len * MAX_DISTANCE_RATIO)
        ),
        mention_keys,
        "FUZZY",
    )

    resolved = (
        exact.select("span", "type_key", "entity_id", "resolution_level")
        .unionByName(normalized.select("span", "type_key", "entity_id", "resolution_level"))
        .unionByName(partial.select("span", "type_key", "entity_id", "resolution_level"))
        .unionByName(fuzzy.select("span", "type_key", "entity_id", "resolution_level"))
    )
    return m.join(resolved, ["span", "type_key"], "left").withColumn(
        "resolution_level", F.coalesce("resolution_level", F.lit("NO_MATCH"))
    ).withColumnRenamed("entity_id", "resolved_id")


def resolution_counters(resolved: DataFrame) -> DataFrame:
    """Per-level counters (the reference logs these per resolution run)."""
    return resolved.groupBy("resolution_level").agg(F.count(F.lit(1)).alias("n")).orderBy("resolution_level")
