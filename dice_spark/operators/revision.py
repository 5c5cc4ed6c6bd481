"""Revision: merge / reinforce / contradict — the evidence-accumulation stage.

Ports the deterministic parts of LlmPropositionReviser (/root/reference/dice/
src/main/kotlin/com/embabel/dice/proposition/revision/LlmPropositionReviser.kt):

* canonical-text fast path (:284-304): exact canonicalize(text) match vs
  ACTIVE propositions in the same context -> Merged, no classifier call;
* merge arithmetic (:666-684): conf' = min(c_old + 0.3*c_new, 0.99),
  decay' = 0.7*d_old, grounding/provenance unioned distinct, reinforce+1;
* reinforce arithmetic (:690-708): conf' = min(c_old + 0.1*c_new, 0.95),
  decay' = 0.85*d_old;
* contradiction (:513-550): unpinned original -> conf' = max(0.3*c, 0.05),
  decay' = min(d + 0.15, 1.0), status=CONTRADICTED; PINNED originals are kept
  intact and routed to review;
* entity-overlap pre-filter (:344-363): candidates sharing no entity are
  dropped before any expensive classification (a semi-join);
* SIMILAR acceptance floor: classifier similarity < 0.7 -> UNRELATED (:85,487-501).

The LLM classifier seam is ``classify_pairs_udf`` — a grouped vectorized
stand-in with a deterministic rule (token-Jaccard), the shape a real model
plugs into.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dice_spark.functions.textfns import canonicalize_text

MIN_SIMILARITY_FOR_REINFORCE = 0.7


def merge_arithmetic(c_old, c_new, d_old):
    conf = F.least(c_old + F.lit(0.3) * c_new, F.lit(0.99))
    dec = F.greatest(d_old * F.lit(0.7), F.lit(0.0))
    return conf, dec


def reinforce_arithmetic(c_old, c_new, d_old):
    conf = F.least(c_old + F.lit(0.1) * c_new, F.lit(0.95))
    dec = F.greatest(d_old * F.lit(0.85), F.lit(0.0))
    return conf, dec


def contradict_arithmetic(c_old, d_old):
    conf = F.greatest(c_old * F.lit(0.3), F.lit(0.05))
    dec = F.least(d_old + F.lit(0.15), F.lit(1.0))
    return conf, dec


def revise(existing: DataFrame, incoming: DataFrame, classified_pairs: DataFrame | None = None) -> DataFrame:
    """Apply revision to the ``existing`` store given an ``incoming`` batch.

    existing/incoming: proposition rows (prop_id, context_id, text, confidence,
    decay, pinned, status, reinforce_count, grounding).

    classified_pairs: optional (existing_id, new_id, relation, similarity)
    from the classifier seam, relation in
    IDENTICAL|SIMILAR|CONTRADICTORY|GENERALIZES|UNRELATED
    (revision/PropositionReviser.kt:27-42). When None only the canonical-text
    fast path applies.

    Returns the revised store: updated existing rows + genuinely-new incoming
    rows, plus a ``revision_outcome`` column
    (MERGED|REINFORCED|CONTRADICTED|NEW|UNCHANGED|REVIEW).
    """
    ex = existing.withColumn("canon", canonicalize_text("text")).alias("ex")
    # In-batch canonical dedup first (reviseAll step 1, :240-250).
    inc = (
        incoming.withColumn("canon", canonicalize_text("text"))
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("context_id", "canon").orderBy("prop_id")),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .alias("inc")
    )

    # Fast path: exact canonical-text match vs ACTIVE existing -> Merged.
    merged = (
        ex.filter(F.col("ex.status") == "ACTIVE")
        .join(inc, (F.col("ex.context_id") == F.col("inc.context_id")) & (F.col("ex.canon") == F.col("inc.canon")))
    )
    m_conf, m_dec = merge_arithmetic(F.col("ex.confidence"), F.col("inc.confidence"), F.col("ex.decay"))
    merged_rows = merged.select(
        F.col("ex.prop_id").alias("prop_id"),
        F.col("ex.context_id").alias("context_id"),
        F.col("ex.text").alias("text"),
        F.round(m_conf, 6).alias("confidence"),
        F.round(m_dec, 6).alias("decay"),
        F.col("ex.pinned").alias("pinned"),
        F.col("ex.status").alias("status"),
        (F.col("ex.reinforce_count") + 1).alias("reinforce_count"),
        F.array_sort(F.array_distinct(F.array_union(F.col("ex.grounding"), F.col("inc.grounding")))).alias("grounding"),
        F.lit("MERGED").alias("revision_outcome"),
    )
    merged_ex_ids = merged.select(F.col("ex.prop_id").alias("prop_id"))
    merged_inc_ids = merged.select(F.col("inc.prop_id").alias("prop_id"))

    rest_inc = inc.join(merged_inc_ids, "prop_id", "left_anti").alias("inc")
    rest_ex = ex.join(merged_ex_ids, "prop_id", "left_anti").alias("ex")

    if classified_pairs is not None:
        cls = classified_pairs.alias("cls")
        # IDENTICAL classifications merge, and per new proposition identical
        # outranks contradictory outranks similar (classifiedToResult,
        # LlmPropositionReviser.kt:478-509: `find` identical first). One merge
        # per new prop — the reference's first-found candidate made
        # deterministic as min existing_id.
        ident_one = (
            cls.filter(F.col("relation") == "IDENTICAL")
            .withColumn(
                "_rn",
                F.row_number().over(Window.partitionBy("new_id").orderBy("existing_id")),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .alias("cls")
        )
        ident_new_ids = ident_one.select(F.col("new_id"))
        im = rest_ex.join(ident_one, F.col("ex.prop_id") == F.col("cls.existing_id")).join(
            rest_inc, F.col("inc.prop_id") == F.col("cls.new_id")
        )
        i_conf, i_dec = merge_arithmetic(
            F.col("ex.confidence"), F.col("inc.confidence"), F.col("ex.decay")
        )
        ident_rows = im.select(
            F.col("ex.prop_id").alias("prop_id"),
            F.col("ex.context_id").alias("context_id"),
            F.col("ex.text").alias("text"),
            F.round(i_conf, 6).alias("confidence"),
            F.round(i_dec, 6).alias("decay"),
            F.col("ex.pinned").alias("pinned"),
            F.col("ex.status").alias("status"),
            (F.col("ex.reinforce_count") + 1).alias("reinforce_count"),
            F.array_sort(
                F.array_distinct(F.array_union(F.col("ex.grounding"), F.col("inc.grounding")))
            ).alias("grounding"),
            F.lit("MERGED").alias("revision_outcome"),
        )
        # SIMILAR below the floor is treated UNRELATED (:85,487-501).
        reinforce = cls.filter(
            (F.col("relation") == "SIMILAR") & (F.col("similarity") >= MIN_SIMILARITY_FOR_REINFORCE)
        ).join(ident_new_ids, "new_id", "left_anti")
        contradict = cls.filter(F.col("relation") == "CONTRADICTORY").join(
            ident_new_ids, "new_id", "left_anti"
        )

        r = rest_ex.join(reinforce, F.col("ex.prop_id") == F.col("cls.existing_id")).join(
            rest_inc, F.col("inc.prop_id") == F.col("cls.new_id")
        )
        r_conf, r_dec = reinforce_arithmetic(F.col("ex.confidence"), F.col("inc.confidence"), F.col("ex.decay"))
        reinforced_rows = r.select(
            F.col("ex.prop_id").alias("prop_id"),
            F.col("ex.context_id").alias("context_id"),
            F.col("ex.text").alias("text"),
            F.round(r_conf, 6).alias("confidence"),
            F.round(r_dec, 6).alias("decay"),
            F.col("ex.pinned").alias("pinned"),
            F.col("ex.status").alias("status"),
            (F.col("ex.reinforce_count") + 1).alias("reinforce_count"),
            F.array_sort(F.array_distinct(F.array_union(F.col("ex.grounding"), F.col("inc.grounding")))).alias("grounding"),
            F.lit("REINFORCED").alias("revision_outcome"),
        )

        c = rest_ex.join(contradict, F.col("ex.prop_id") == F.col("cls.existing_id"))
        c_conf, c_dec = contradict_arithmetic(F.col("ex.confidence"), F.col("ex.decay"))
        contradicted_rows = c.filter(~F.col("ex.pinned")).select(
            F.col("ex.prop_id").alias("prop_id"),
            F.col("ex.context_id").alias("context_id"),
            F.col("ex.text").alias("text"),
            F.round(c_conf, 6).alias("confidence"),
            F.round(c_dec, 6).alias("decay"),
            F.col("ex.pinned").alias("pinned"),
            F.lit("CONTRADICTED").alias("status"),
            F.col("ex.reinforce_count").alias("reinforce_count"),
            F.col("ex.grounding").alias("grounding"),
            F.lit("CONTRADICTED").alias("revision_outcome"),
        )
        # Pinned originals stay intact, flagged for review (:536-550).
        review_rows = c.filter(F.col("ex.pinned")).select(
            F.col("ex.prop_id").alias("prop_id"),
            F.col("ex.context_id").alias("context_id"),
            F.col("ex.text").alias("text"),
            F.col("ex.confidence").alias("confidence"),
            F.col("ex.decay").alias("decay"),
            F.col("ex.pinned").alias("pinned"),
            F.col("ex.status").alias("status"),
            F.col("ex.reinforce_count").alias("reinforce_count"),
            F.col("ex.grounding").alias("grounding"),
            F.lit("REVIEW").alias("revision_outcome"),
        )
        touched = (
            reinforced_rows.select("prop_id")
            .unionByName(contradicted_rows.select("prop_id"))
            .unionByName(review_rows.select("prop_id"))
            .unionByName(ident_rows.select("prop_id"))
        )
        consumed_inc = r.select(F.col("inc.prop_id").alias("prop_id")).unionByName(
            im.select(F.col("inc.prop_id").alias("prop_id"))
        )
        extra = [ident_rows, reinforced_rows, contradicted_rows, review_rows]
    else:
        touched = merged_ex_ids.limit(0)
        consumed_inc = merged_inc_ids.limit(0)
        extra = []

    untouched_ex = rest_ex.join(touched, "prop_id", "left_anti").select(
        "prop_id", "context_id", "text", "confidence", "decay", "pinned", "status",
        "reinforce_count", "grounding", F.lit("UNCHANGED").alias("revision_outcome"),
    )
    new_rows = rest_inc.join(consumed_inc, "prop_id", "left_anti").select(
        "prop_id", "context_id", "text", "confidence", "decay", "pinned", "status",
        "reinforce_count", "grounding", F.lit("NEW").alias("revision_outcome"),
    )
    out = merged_rows
    for df in extra:
        out = out.unionByName(df)
    return out.unionByName(untouched_ex).unionByName(new_rows)


def candidate_pairs_by_overlap(mentions_a: DataFrame, mentions_b: DataFrame) -> DataFrame:
    """Generate candidate (existing_id, new_id) pairs sharing >= 1 entity.

    The candidate-generation twin of entity_overlap_prefilter: resolved-id
    equality when both sides resolved, case-insensitive span equality as the
    fallback (LlmPropositionReviser.kt:344-363). Two equi-joins unioned —
    hash-partitionable, no OR condition.
    """
    a = mentions_a.select(
        F.col("prop_id").alias("existing_id"), F.lower("span").alias("ka"),
        F.col("resolved_id").alias("rida"),
    )
    b = mentions_b.select(
        F.col("prop_id").alias("new_id"), F.lower("span").alias("kb"),
        F.col("resolved_id").alias("ridb"),
    )
    by_entity = (
        a.filter(F.col("rida").isNotNull())
        .join(b.filter(F.col("ridb").isNotNull()), F.col("rida") == F.col("ridb"))
        .select("existing_id", "new_id")
    )
    by_span = a.join(b, F.col("ka") == F.col("kb")).select("existing_id", "new_id")
    return by_entity.unionByName(by_span).distinct()


def prop_mentions(props: DataFrame) -> DataFrame:
    """(prop_id, span, resolved_id) mention rows from a proposition table.

    Uses resolved subj_id/obj_id columns when present, else null (the span
    fallback carries the prefilter).
    """
    sid = F.col("subj_id") if "subj_id" in props.columns else F.lit(None).cast("string")
    oid = F.col("obj_id") if "obj_id" in props.columns else F.lit(None).cast("string")
    return props.select(
        "prop_id", F.col("subj_span").alias("span"), sid.alias("resolved_id")
    ).unionByName(
        props.select("prop_id", F.col("obj_span").alias("span"), oid.alias("resolved_id"))
    )


VECTOR_AUTO_MERGE = 0.95   # LlmPropositionReviser.kt:306-319
VECTOR_CANDIDATE_FLOOR = 0.5  # :320-339 (LSH topK candidates >= 0.5 go to the LLM)
VECTOR_TOP_K = 5


def vector_fast_path(pairs_with_text: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Embedding fast path over candidate pairs
    (LlmPropositionReviser.kt:306-339): cosine >= VECTOR_AUTO_MERGE
    auto-classifies as IDENTICAL (merged without a classifier call); pairs in
    [VECTOR_CANDIDATE_FLOOR, auto) are kept — at most VECTOR_TOP_K per
    incoming proposition, best-first — for the classifier; everything below
    the floor is dropped before any expensive classification.

    The embedding is the deterministic letter-count stand-in
    (linking.char_embedding over canonicalized text); a real embedding column
    swaps in without changing the dataflow. Returns (auto_identical,
    to_classify) — both subsets of the input pairs.
    """
    from pyspark.sql.window import Window

    from dice_spark.operators.dedup import cosine_expr
    from dice_spark.operators.linking import char_embedding

    cos = F.round(
        cosine_expr(
            char_embedding(canonicalize_text("existing_text")),
            char_embedding(canonicalize_text("new_text")),
        ),
        6,
    )
    scored = pairs_with_text.withColumn("_cos", cos).localCheckpoint(eager=True)
    auto = (
        scored.filter(F.col("_cos") >= VECTOR_AUTO_MERGE)
        .withColumn("relation", F.lit("IDENTICAL"))
        .withColumnRenamed("_cos", "similarity")
    )
    w = Window.partitionBy("new_id").orderBy(F.desc("_cos"), F.asc("existing_id"))
    to_classify = (
        scored.filter((F.col("_cos") >= VECTOR_CANDIDATE_FLOOR) & (F.col("_cos") < VECTOR_AUTO_MERGE))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= VECTOR_TOP_K)
        .drop("_rn", "_cos")
    )
    return auto, to_classify


def revise_batch(
    existing: DataFrame,
    incoming: DataFrame,
    mentions_existing: DataFrame | None = None,
    mentions_incoming: DataFrame | None = None,
    classifier=None,
    use_vector_fast_path: bool = False,
) -> DataFrame:
    """The full revision stage: candidates -> classify seam -> revise.

    Mirrors the reference write path (PropositionPipeline.kt:254-281: every
    store write revises against existing propositions): entity-overlap
    candidate generation, optionally the embedding fast path
    (``use_vector_fast_path`` — auto-merge at cosine >= 0.95, top-5
    candidates >= 0.5 to the classifier, rest dropped), the batched
    classification UDF, then the merge/reinforce/contradict arithmetic of
    ``revise``. IDENTICAL pairs from the fast path reinforce like
    high-similarity SIMILAR pairs would merge — the reviser's auto-merge.
    """
    mentions_existing = mentions_existing if mentions_existing is not None else prop_mentions(existing)
    mentions_incoming = mentions_incoming if mentions_incoming is not None else prop_mentions(incoming)
    pairs = candidate_pairs_by_overlap(mentions_existing, mentions_incoming)
    with_text = pairs.join(
        existing.select(F.col("prop_id").alias("existing_id"), F.col("text").alias("existing_text")),
        "existing_id",
    ).join(
        incoming.select(F.col("prop_id").alias("new_id"), F.col("text").alias("new_text")),
        "new_id",
    )
    classifier = classifier if classifier is not None else classify_pairs_udf
    if use_vector_fast_path:
        auto, to_classify = vector_fast_path(with_text)
        classified = classifier(to_classify).unionByName(
            # auto-identical pairs merge without a classifier call: surface
            # them as SIMILAR at their cosine so revise() reinforces them.
            auto.select(
                "existing_id", "new_id",
                F.lit("SIMILAR").alias("relation"),
                F.col("similarity"),
            )
        )
    else:
        classified = classifier(with_text)
    return revise(existing, incoming, classified)


def entity_overlap_prefilter(candidate_pairs: DataFrame, mentions_a: DataFrame, mentions_b: DataFrame) -> DataFrame:
    """Semi-join pre-filter: keep only pairs sharing >= 1 resolved entity
    (fallback: case-insensitive span), LlmPropositionReviser.kt:344-363.

    Two equi-joins (resolved_id, lowered span) unioned — an OR in one join
    condition cannot hash-partition, so Spark would plan a nested-loop join.
    """
    a = mentions_a.select(
        F.col("prop_id").alias("a_id"), F.lower("span").alias("ka"),
        F.col("resolved_id").alias("rida"),
    )
    b = mentions_b.select(
        F.col("prop_id").alias("b_id"), F.lower("span").alias("kb"),
        F.col("resolved_id").alias("ridb"),
    )
    by_entity = (
        a.filter(F.col("rida").isNotNull())
        .join(b.filter(F.col("ridb").isNotNull()), F.col("rida") == F.col("ridb"))
        .select("a_id", "b_id")
    )
    by_span = a.join(b, F.col("ka") == F.col("kb")).select("a_id", "b_id")
    shared = by_entity.unionByName(by_span).distinct()
    return candidate_pairs.join(
        shared,
        (candidate_pairs["existing_id"] == shared["a_id"]) & (candidate_pairs["new_id"] == shared["b_id"]),
        "left_semi",
    )


def classify_pairs_udf(pairs_with_text: DataFrame) -> DataFrame:
    """The batched classification UDF seam (classifyBatch, :372-456).

    Input rows: (existing_id, new_id, existing_text, new_text). Deterministic
    stand-in classifier: canonical-token Jaccard -> IDENTICAL (=1.0) /
    SIMILAR (>=0.5) / CONTRADICTORY (negation mismatch) / UNRELATED. A real
    LLM classifier replaces the body; the seam (grouped Arrow batches,
    integer-indexed pairs) is the engine contract.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue

            def canon_tokens(s: "pd.Series") -> "pd.Series":
                return (
                    s.str.lower()
                    .str.replace(r"[^a-z0-9\s]", "", regex=True)
                    .str.split()
                    .map(frozenset)
                )

            ta = canon_tokens(pdf["existing_text"])
            tb = canon_tokens(pdf["new_text"])
            inter = [len(x & y) for x, y in zip(ta, tb)]
            union = [max(len(x | y), 1) for x, y in zip(ta, tb)]
            sim = pd.Series([i / u for i, u in zip(inter, union)], index=pdf.index)
            neg_a = pdf["existing_text"].str.lower().str.contains(r"\b(?:not|never|no longer)\b", regex=True)
            neg_b = pdf["new_text"].str.lower().str.contains(r"\b(?:not|never|no longer)\b", regex=True)
            relation = pd.Series("UNRELATED", index=pdf.index)
            relation[(sim >= 0.5)] = "SIMILAR"
            relation[(sim >= 0.999)] = "IDENTICAL"
            relation[(sim >= 0.5) & (neg_a != neg_b)] = "CONTRADICTORY"
            out = pdf[["existing_id", "new_id"]].copy()
            out["relation"] = relation
            out["similarity"] = sim.round(6)
            yield out

    return pairs_with_text.mapInPandas(
        run, schema="existing_id string, new_id string, relation string, similarity double"
    )
