"""Session -> long-term memory consolidation (MemoryConsolidator).

Ports DefaultMemoryConsolidator (/root/reference/dice/src/main/kotlin/com/
embabel/dice/projection/memory/MemoryConsolidator.kt:75-210), the delegate
behind SessionConsolidationPass (operations/consolidation/
SessionConsolidationPass.kt:37). Per session proposition:

* similarity vs every long-term proposition =
  0.7 * word-Jaccard(text) + 0.3 * entity-Jaccard(resolved ids), with the
  reference's empty-set conventions (both entity sets empty -> 0.5, one
  empty -> 0.0; both word sets empty -> 1.0);
* best match with sim >= similarity_threshold (0.7):
  sim > 0.9  -> REINFORCED: the existing prop, confidence + 0.1 capped at
                1.0, grounding union-distinct;
  else       -> MERGED: the higher-confidence text of the pair survives,
                grounding union-distinct;
* no match: confidence >= promotion_threshold (0.6) -> PROMOTED (ACTIVE),
  else DISCARDED.

Spark shape: the pair space is blocked by a shared-word inverted index —
SOUND here, not approximate: entity similarity contributes at most 0.3, so
sim >= 0.7 forces word-Jaccard >= 0.57 > 0, i.e. every qualifying pair
shares at least one word. Stop-word-frequency blowup is capped with
``max_token_df`` (a token in more than that fraction of long-term props is
skipped for blocking — with Jaccard >= 0.57, pairs share several words, so
dropping the most common blocking token is safe in practice and the cap is
documented in SCALE.md). Best-match selection is one window
(sim desc, existing_id asc — the reference's maxByOrNull is iteration-order
dependent; the id tie-break makes it deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PROMOTION_THRESHOLD = 0.6
SIMILARITY_THRESHOLD = 0.7
REINFORCEMENT_BOOST = 0.1
SIM_REINFORCE_ABOVE = 0.9


def _word_set(text: Column) -> Column:
    """lowercase \\s+ split as a distinct sorted array (Kotlin toSet())."""
    return F.array_sort(
        F.array_distinct(
            F.filter(F.split(F.lower(text), r"\s+"), lambda w: F.length(w) > 0)
        )
    )


def _jaccard(a: Column, b: Column, both_empty: float, one_empty: float | None = None) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    base = F.when(union == 0, F.lit(both_empty)).otherwise(inter / union)
    if one_empty is not None:
        base = F.when(
            ((F.size(a) == 0) | (F.size(b) == 0)) & (F.size(a) + F.size(b) > 0),
            F.lit(one_empty),
        ).otherwise(base)
    return base


def consolidate_session(
    session: DataFrame,
    longterm: DataFrame,
    session_entities: DataFrame | None = None,
    longterm_entities: DataFrame | None = None,
    promotion_threshold: float = PROMOTION_THRESHOLD,
    similarity_threshold: float = SIMILARITY_THRESHOLD,
    boost: float = REINFORCEMENT_BOOST,
    max_token_df: float | None = None,
    use_lsh: bool = False,
    # (15, 5) = 5 bands x 3 rows: measured sweet spot of the S-curve for the
    # threshold-implied word-Jaccard floor ~0.79 (sim 0.7 with empty entity
    # sets): recall 0.96 at the floor vs 2.5x fewer junk candidates than
    # 8x2 (which is ~0.9995 recall but collides ~28% of ALL pairs at J~0.2).
    n_hashes: int = 15,
    bands: int = 5,
) -> dict[str, DataFrame]:
    """Consolidate a session batch into long-term memory.

    session / longterm: proposition tables (prop_id, text, confidence,
    grounding array<string>, ...). *_entities: optional (prop_id,
    resolved_id) mention relations; omitted -> entity sets are empty on that
    side (the reference's 0.5 / 0.0 conventions apply).

    Returns {"outcomes": one row per session prop (prop_id, outcome,
    matched_id, similarity), "promoted", "reinforced", "merged",
    "discarded"} — reinforced/merged rows carry the updated confidence and
    union-distinct grounding the reference writes back.
    """

    def ent_sets(props: DataFrame, rel: DataFrame | None) -> DataFrame:
        if rel is None:
            return props.select(
                "prop_id", F.array().cast("array<string>").alias("ents")
            )
        agg = rel.groupBy("prop_id").agg(
            F.array_sort(F.collect_set("resolved_id")).alias("ents")
        )
        return (
            props.select("prop_id")
            .join(agg, "prop_id", "left")
            .select(
                "prop_id",
                F.coalesce("ents", F.array().cast("array<string>")).alias("ents"),
            )
        )

    s = (
        session.select(
            F.col("prop_id").alias("s_id"),
            F.col("text").alias("s_text"),
            F.col("confidence").alias("s_conf"),
            F.col("grounding").alias("s_grounding")
            if "grounding" in session.columns
            else F.array().cast("array<string>").alias("s_grounding"),
        )
        .withColumn("s_words", _word_set(F.col("s_text")))
        .join(
            ent_sets(session, session_entities).select(
                F.col("prop_id").alias("s_id"), F.col("ents").alias("s_ents")
            ),
            "s_id",
        )
    )
    lt = (
        longterm.select(
            F.col("prop_id").alias("e_id"),
            F.col("text").alias("e_text"),
            F.col("confidence").alias("e_conf"),
            F.col("grounding").alias("e_grounding")
            if "grounding" in longterm.columns
            else F.array().cast("array<string>").alias("e_grounding"),
        )
        .withColumn("e_words", _word_set(F.col("e_text")))
        .join(
            ent_sets(longterm, longterm_entities).select(
                F.col("prop_id").alias("e_id"), F.col("ents").alias("e_ents")
            ),
            "e_id",
        )
    )

    # Shared-word inverted index: candidate pairs share >= 1 token (sound for
    # similarity_threshold >= 0.3 + epsilon, see module docstring). The size
    # band is IMPLIED by the threshold, not an approximation: the entity term
    # caps at 0.3, so word-Jaccard >= f = (thr - 0.3)/0.7, and
    # j = k/(n+m-k) >= f with k <= min(n,m) forces max(n,m) <= min(n,m)/f —
    # pairs outside the band cannot qualify, so pruning them in the token
    # join (before any Jaccard arithmetic) changes nothing.
    f_floor = max(0.0, (similarity_threshold - 0.3) / 0.7)
    if use_lsh:
        # 100 TB path: banded MinHash over the WORD sets — the similarity's
        # word-Jaccard term is exactly what MinHash estimates, so the
        # (bands, rows) S-curve collides qualifying pairs (J >= f_floor)
        # with high probability even when no token is selective (uniform
        # document frequency, where the inverted index degenerates to ~|S|x|E|).
        # Candidates are approximate (recall < 1 near the floor); the
        # driver oracle mirrors the same candidate rule. Cost is linear in
        # tokens + bucket-bounded in pairs.
        rows = n_hashes // bands

        def band_keys(side: DataFrame, id_c: str, n_c: str, words_c: str) -> DataFrame:
            tok = side.select(
                F.col(id_c), F.size(words_c).alias(n_c), F.explode(words_c).alias("tok")
            )
            hashed = tok.select(
                id_c,
                n_c,
                *[
                    F.md5(F.concat(F.lit(f"{i}|"), F.col("tok"))).alias(f"mh{i}")
                    for i in range(n_hashes)
                ],
            )
            sig = hashed.groupBy(id_c, n_c).agg(
                *[F.min(f"mh{i}").alias(f"h{i}") for i in range(n_hashes)]
            )
            return sig.select(
                id_c,
                n_c,
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(bi).alias("band"),
                                F.md5(
                                    F.concat_ws(
                                        "|",
                                        *[F.col(f"h{bi * rows + r}") for r in range(rows)],
                                    )
                                ).alias("key"),
                            )
                            for bi in range(bands)
                        ]
                    )
                ).alias("bk"),
            ).select(id_c, n_c, F.col("bk.band"), F.col("bk.key"))

        cand = band_keys(s, "s_id", "s_n", "s_words").join(
            band_keys(lt, "e_id", "e_n", "e_words"), ["band", "key"]
        )
    else:
        s_tok = s.select(
            "s_id", F.size("s_words").alias("s_n"), F.explode("s_words").alias("tok")
        )
        e_tok = lt.select(
            "e_id", F.size("e_words").alias("e_n"), F.explode("e_words").alias("tok")
        )
    if not use_lsh and max_token_df is not None:
        # Scale knob: a boilerplate token present in >max_token_df of the
        # long-term store joins ~|S|x|E| rows on its own. Dropping it from
        # BLOCKING (similarity still counts it) misses only pairs whose
        # every shared token is that common — with word-Jaccard forced
        # >= (thr-0.3)/0.7 such pairs share several tokens, so in practice
        # a rarer shared token still blocks them. Approximation documented
        # in SCALE.md; leave None for the exact (oracle-checked) path.
        n_lt = lt.count()
        common = (
            e_tok.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_token_df * n_lt)
            .select("tok")
        )
        s_tok = s_tok.join(F.broadcast(common), "tok", "left_anti")
        e_tok = e_tok.join(F.broadcast(common), "tok", "left_anti")
    if not use_lsh:
        cand = s_tok.join(e_tok, "tok")
    if f_floor > 0:
        band = (
            F.greatest("s_n", "e_n")
            <= F.least("s_n", "e_n") / F.lit(f_floor)
        )
        cand = cand.filter(band)
    cand = cand.select("s_id", "e_id").distinct()

    text_sim = _jaccard(F.col("s_words"), F.col("e_words"), both_empty=1.0)
    ent_sim = _jaccard(F.col("s_ents"), F.col("e_ents"), both_empty=0.5, one_empty=0.0)
    scored = (
        cand.join(s, "s_id")
        .join(lt, "e_id")
        .withColumn("sim", text_sim * 0.7 + ent_sim * 0.3)
        .filter(F.col("sim") >= similarity_threshold)
    )
    w = Window.partitionBy("s_id").orderBy(F.desc("sim"), F.asc("e_id"))
    # best is read by matched, the unmatched anti-join, AND every outcome
    # branch — without materialization the whole candidate/pair scan (the
    # expensive part) recomputes once per consumer. It is at most one row
    # per session proposition, so the checkpoint is tiny.
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .localCheckpoint(eager=False)
    )

    matched = best.select(
        "s_id", "e_id", F.round("sim", 6).alias("similarity"),
        "s_text", "s_conf", "s_grounding", "e_text", "e_conf", "e_grounding",
    )
    reinforced = matched.filter(F.col("similarity") > SIM_REINFORCE_ABOVE)
    merged = matched.filter(F.col("similarity") <= SIM_REINFORCE_ABOVE)

    reinforced_out = reinforced.select(
        F.col("e_id").alias("prop_id"),
        F.col("e_text").alias("text"),
        F.round(F.least(F.col("e_conf") + F.lit(boost), F.lit(1.0)), 6).alias("confidence"),
        F.array_sort(F.array_union("e_grounding", "s_grounding")).alias("grounding"),
        F.col("s_id").alias("source_session_id"),
    )
    # Merge survivor: the higher-confidence text (ties -> existing wins, the
    # reference's maxByOrNull keeps the first of equal maxima: listOf(best,
    # session) iterates existing first).
    merged_out = merged.select(
        F.col("e_id").alias("prop_id"),
        F.when(F.col("s_conf") > F.col("e_conf"), F.col("s_text"))
        .otherwise(F.col("e_text"))
        .alias("text"),
        F.round(F.greatest("s_conf", "e_conf"), 6).alias("confidence"),
        F.array_sort(F.array_union("e_grounding", "s_grounding")).alias("grounding"),
        F.col("s_id").alias("source_session_id"),
    )
    unmatched = s.join(best.select("s_id"), "s_id", "left_anti")
    promoted = unmatched.filter(F.col("s_conf") >= promotion_threshold).select(
        F.col("s_id").alias("prop_id"),
        F.col("s_text").alias("text"),
        F.round("s_conf", 6).alias("confidence"),
        F.col("s_grounding").alias("grounding"),
        F.lit("ACTIVE").alias("status"),
    )
    discarded = unmatched.filter(F.col("s_conf") < promotion_threshold).select(
        F.col("s_id").alias("prop_id"), F.col("s_text").alias("text")
    )

    outcomes = (
        matched.select(
            F.col("s_id").alias("prop_id"),
            F.when(F.col("similarity") > SIM_REINFORCE_ABOVE, "REINFORCED")
            .otherwise("MERGED")
            .alias("outcome"),
            F.col("e_id").alias("matched_id"),
            "similarity",
        )
        .unionByName(
            promoted.select(
                "prop_id",
                F.lit("PROMOTED").alias("outcome"),
                F.lit(None).cast("string").alias("matched_id"),
                F.lit(None).cast("double").alias("similarity"),
            )
        )
        .unionByName(
            discarded.select(
                "prop_id",
                F.lit("DISCARDED").alias("outcome"),
                F.lit(None).cast("string").alias("matched_id"),
                F.lit(None).cast("double").alias("similarity"),
            )
        )
    )
    return {
        "outcomes": outcomes,
        "promoted": promoted,
        "reinforced": reinforced_out,
        "merged": merged_out,
        "discarded": discarded,
    }
