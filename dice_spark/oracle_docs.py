"""DuckDB oracle SQL for the training-data pipeline queries
(documents / embeddings tables). Counterparts of dice_spark/operators/dedup.py,
functions/textstats.py, operators/similarity.py — kept in lockstep."""

from __future__ import annotations

from dice_spark.functions.textfns import duckdb_canonicalize_text_sql
from dice_spark.functions.textstats import LANG_STOPWORDS

CANON = duckdb_canonicalize_text_sql("text")
TOKS = "str_split(" + CANON + ", ' ')"


def _stop_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"


def _hits(lang: str) -> str:
    return f"len(list_filter(toks, t -> list_contains({_stop_list(lang)}, t)))"


def q_doc_exact_dedup() -> str:
    return f"""
SELECT md5({CANON}) AS canon_hash,
       count(*) AS n_docs,
       min(doc_id) AS keep_id
FROM documents GROUP BY 1
"""


def q_doc_stats() -> str:
    langs = list(LANG_STOPWORDS)  # dict order = Spark tie-break priority
    lang_case = "case "
    for i, lg in enumerate(langs):
        conds = [f"h_{lg} >= h_{other}" for other in langs[i + 1 :]]
        conds.append(f"h_{lg} > 0")
        lang_case += f"when {' and '.join(conds)} then '{lg}' "
    lang_case += "else 'und' end"
    return f"""
WITH base AS (
  SELECT doc_id, text, str_split({CANON}, ' ') AS toks FROM documents
),
hits AS (
  SELECT *, {', '.join(f'{_hits(lg)} AS h_{lg}' for lg in langs)}
  FROM base
),
scored AS (
  SELECT doc_id, text, toks, {lang_case} AS lang_guess,
         len(toks) AS n_tokens,
         length(text) AS n_chars,
         h_en
  FROM hits
)
SELECT doc_id,
       n_tokens,
       lang_guess,
       round(
         0.25 * (case when n_tokens >= 5 and n_tokens <= 100000 then 1.0 else 0.0 end)
       + 0.25 * (case when n_chars / greatest(n_tokens, 1) >= 3
                       and n_chars / greatest(n_tokens, 1) <= 12 then 1.0 else 0.0 end)
       + 0.25 * least(h_en * 4.0 / greatest(n_tokens, 1), 1.0)
       + 0.25 * (len(regexp_extract_all(text, '[A-Za-z]')) / greatest(n_chars, 1))
       , 6) AS quality,
       list_min([
         md5(array_to_string(toks[i:i+7], ' '))
         for i in range(1, greatest(len(toks) - 7, 1) + 1)
       ]) AS fp
FROM scored
"""


def _shingles(tok_expr: str, n: int = 3) -> str:
    return (
        f"list_distinct([array_to_string({tok_expr}[i:i+{n-1}], ' ') "
        f"for i in range(1, greatest(len({tok_expr}) - {n - 1}, 1) + 1)])"
    )


def q_doc_ngram_dups(threshold: float = 0.5, n: int = 3, max_df: int = 1000) -> str:
    # max_df mirrors dedup.MAX_SHINGLE_DF: stop-shingles (document frequency
    # above the cap) are dropped from both sets before pairing, set sizes
    # recomputed after the cap — in lockstep with ngram_jaccard_pairs.
    return f"""
WITH sh AS (
  SELECT doc_id, {_shingles(TOKS, n)} AS sh
  FROM documents
),
raw AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
kept AS (
  SELECT doc_id, shingle FROM raw
  QUALIFY count(*) OVER (PARTITION BY shingle) <= {max_df}
),
inv AS (
  SELECT doc_id, shingle,
         cast(count(*) OVER (PARTITION BY doc_id) as int) AS n_sh
  FROM kept
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS inter
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, round(inter / (na + nb - inter), 6) AS jaccard
FROM inter WHERE round(inter / (na + nb - inter), 6) >= {threshold}
"""


def q_doc_minhash_dups(n_hashes: int = 16, bands: int = 4, n: int = 3) -> str:
    rows = n_hashes // bands
    sig_items = ", ".join(
        f"list_min([md5('{i}|' || s) for s in sh])" for i in range(n_hashes)
    )
    band_structs = ", ".join(
        "{'band': %d, 'key': md5(%s)}"
        % (bi, " || '|' || ".join(f"sig[{bi * rows + r + 1}]" for r in range(rows)))
        for bi in range(bands)
    )
    return f"""
WITH sh AS (
  SELECT doc_id, {_shingles(TOKS, n)} AS sh
  FROM documents
),
sig AS (SELECT doc_id, [{sig_items}] AS sig FROM sh),
banded AS (
  SELECT doc_id, unnest([{band_structs}], recursive := true)
  FROM sig
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands_matched
FROM banded a JOIN banded b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def q_doc_simhash_dups(max_hamming: int = 3) -> str:
    """SimHash near-dup pairs (counterpart of dedup.simhash_near_dups).

    Same 60-bit md5-derived token hash as the Spark side (token_hash60:
    '0x' || first-15-hex-of-md5 cast to bigint). The Spark operator blocks on
    15-bit quarters before filtering hamming <= 3; by pigeonhole, blocked +
    filtered == all-pairs + filtered, so the oracle can skip the blocking.
    """
    bits = 60
    bit_votes = ", ".join(
        f"sum(case when (h >> {b}) & 1 = 1 then 1 else -1 end) AS v{b}"
        for b in range(bits)
    )
    sh_expr = " + ".join(
        f"(case when v{b} > 0 then (1::bigint << {b}) else 0 end)" for b in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, ('0x' || substr(md5(t.tok), 1, 15))::bigint AS h
  FROM documents, unnest(str_split({CANON}, ' ')) AS t(tok)
),
votes AS (SELECT doc_id, {bit_votes} FROM toks GROUP BY doc_id),
sh AS (SELECT doc_id, ({sh_expr})::bigint AS sh FROM votes),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         cast(bit_count(xor(a.sh, b.sh)) as int) AS hamming
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= {max_hamming}
"""


def q_ann_ivf_topk(
    k: int = 5, max_query_id: int = 10, n_cells: int = 8, n_probe: int = 2,
    dim: int = 64, seed: int = 7,
) -> str:
    """IVF oracle (counterpart of similarity.ivf_topk with
    deterministic_centroids): corpus vectors assign to the max-dot centroid
    (FIRST index wins ties, matching the Spark strict-> comparison); each query
    probes the n_probe best cells ordered (dot DESC, cell DESC) — the exact
    order of Spark's reverse(array_sort(struct(dot, cell))); exact cosine only
    within probed cells."""
    from dice_spark.operators.similarity import deterministic_centroids

    cents = deterministic_centroids(dim=dim, n_cells=n_cells, seed=seed)
    rows = ", ".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(cents)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cents AS (SELECT * FROM (VALUES {rows}) AS c(cell, cv)),
assigned AS (
  SELECT e.vec_id, e.v,
         (SELECT c.cell FROM cents c
          ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell ASC LIMIT 1) AS cell
  FROM e
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {max_query_id}),
probes AS (
  SELECT * FROM (
    SELECT q.query_id, q.qv, c.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cell DESC
           ) AS pr
    FROM q CROSS JOIN cents c
  ) WHERE pr <= {n_probe}
),
scored AS (
  SELECT p.query_id, a.vec_id,
         round(list_cosine_similarity(p.qv, a.v), 6) AS cosine
  FROM probes p JOIN assigned a ON a.cell = p.cell
  WHERE p.query_id <> a.vec_id
)
SELECT query_id, vec_id,
       row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def q_ann_topk(k: int = 5, max_query_id: int = 10) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {max_query_id}),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qv, e.v), 6) AS cosine
  FROM q JOIN e ON q.query_id <> e.vec_id
)
SELECT query_id, vec_id,
       row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def q_doc_embedding_dups(threshold: float = 0.35) -> str:
    """Label-blocked embedding near-dup oracle (mirror of
    dedup.embedding_near_dups with block_col='label'); embeddings cast to
    double first to match the Spark side's arithmetic exactly."""
    return f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
"""


def q_media_features() -> str:
    """Multimodal stub-decode oracle: documents as media rows, feature =
    first 8 sha256 bytes / 255 (float32), n_bytes = UTF-8 byte length —
    mirror of multimodal._stub_decode + the q_media_features casting."""
    hexv = "'0123456789abcdef'"
    byte = (
        lambda i: f"(strpos({hexv}, substr(h, {2*i+1}, 1)) - 1) * 16"
        f" + (strpos({hexv}, substr(h, {2*i+2}, 1)) - 1)"
    )
    # Emitted as a comma-joined string of the raw byte ints (the Spark side
    # recovers them via round(feature*255)) — the driver canonicalizer sorts
    # columns in pandas and cannot handle list values, so both engines emit
    # a scalar here. Values are unchanged: byte/255.0 (float32) * 255 rounds
    # back to the exact byte.
    feats = ", ".join(f"CAST(({byte(i)}) AS INT)" for i in range(8))
    return f"""
WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         lower(sha256(text)) AS h,
         CAST(strlen(text) AS INT) AS n_bytes
  FROM documents
)
SELECT media_id, kind, n_bytes, h AS sha256,
       array_to_string([{feats}], ',') AS feature,
       TRUE AS decode_ok
FROM m
"""


def q_frame_plan(every_ms: int = 1000) -> str:
    """Frame-sampling-plan oracle: one row per planned frame timestamp for
    video media (mirror of multimodal.frame_sample_plan: inclusive sequence
    0..duration_ms step every_ms)."""
    return f"""
WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         n_chars * 10 AS duration_ms
  FROM documents
)
SELECT media_id, CAST(u.f AS BIGINT) AS frame_ts_ms
FROM m, unnest(generate_series(0, duration_ms, {every_ms})) AS u(f)
WHERE kind = 'video' AND duration_ms IS NOT NULL
"""


def q_ingestion_outcomes() -> str:
    """Ingestion oracle: validation reasons, sha256 content hash, and the
    min-source-id in-batch claim (mirror of ingestion.ingest_batch with no
    pre-seeded ledger)."""
    return """
WITH arts AS (
  SELECT CASE WHEN doc_id % 23 <> 3
              THEN 'a' || lpad(CAST(doc_id AS VARCHAR), 10, '0') END AS source_id,
         CASE WHEN doc_id % 17 <> 0 THEN text ELSE '  ' END AS text
  FROM documents
  UNION ALL
  SELECT 'b' || lpad(CAST(doc_id AS VARCHAR), 10, '0'), text
  FROM documents WHERE doc_id % 5 = 0
),
hashed AS (
  SELECT source_id, text, lower(sha256(coalesce(text, ''))) AS content_hash,
         CASE WHEN source_id IS NULL THEN 'missing_source_id'
              WHEN text IS NULL OR length(trim(text)) = 0 THEN 'blank_text'
         END AS fail_reason
  FROM arts
),
valid AS (
  SELECT source_id, content_hash,
         row_number() OVER (PARTITION BY content_hash ORDER BY source_id) AS rn
  FROM hashed WHERE fail_reason IS NULL
)
SELECT source_id, content_hash,
       CASE WHEN rn = 1 THEN 'INGESTED' ELSE 'DEDUPLICATED' END AS outcome,
       NULL::varchar AS fail_reason
FROM valid
UNION ALL
SELECT source_id, content_hash, 'FAILED', fail_reason
FROM hashed WHERE fail_reason IS NOT NULL
"""


def q_ann_lsh_topk(n_planes: int = 4, k: int = 5, dim: int = 64, max_query_id: int = 10) -> str:
    """Hyperplane-LSH ANN oracle: the seeded planes are literal floats, so
    the sign buckets, bucket join, and per-query top-k reproduce exactly
    (mirror of similarity.lsh_bucketed_topk; dot folds left-to-right like
    Spark's aggregate)."""
    from dice_spark.operators.dedup import hyperplane_planes

    planes = hyperplane_planes(dim, n_planes, seed=42)

    def dot(plane):
        return " + ".join(f"v[{i + 1}] * {plane[i]!r}" for i in range(dim))

    bucket = " || ".join(
        f"(CASE WHEN ({dot(p)}) >= 0 THEN '1' ELSE '0' END)" for p in planes
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < {max_query_id}),
scored AS (
  SELECT q.query_id, b.vec_id,
         round(list_cosine_similarity(q.qv, b.v), 6) AS cosine
  FROM q JOIN b USING (bucket)
  WHERE q.query_id <> b.vec_id
)
SELECT query_id, vec_id,
       row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def q_vector_linking(n_planes: int = 4, dim: int = 64, n_queries: int = 40) -> str:
    """VECTOR-tier linking oracle over REAL embedding vectors (mirror of
    linking.resolve_against_entities with mention/entity vec cols): mentions
    are embeddings rows vec_id < n_queries, the registry is every row; the
    name tiers cannot fire (letter-disjoint synthetic names), so resolution
    is exactly the hyperplane-bucket candidate join + the >=0.95 exactly-one
    auto-accept; non-auto candidates go to the letter-cosine bakeoff, which
    scores 0 on the disjoint names and never accepts."""
    from dice_spark.operators.dedup import hyperplane_planes

    planes = hyperplane_planes(dim, n_planes, seed=42)

    def dot(plane):
        return " + ".join(f"v[{i + 1}] * {plane[i]!r}" for i in range(dim))

    bucket = " || ".join(
        f"(CASE WHEN ({dot(p)}) >= 0 THEN '1' ELSE '0' END)" for p in planes
    )
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM base),
e AS (SELECT 'E' || CAST(vec_id AS varchar) AS entity_id, v, bucket FROM b),
m AS (
  SELECT 'q' || CAST(vec_id AS varchar) || 'x' AS span, v, bucket
  FROM b WHERE vec_id < {n_queries}
),
cand AS (
  SELECT m.span, e.entity_id,
         round(list_cosine_similarity(m.v, e.v), 6) AS cos
  FROM m JOIN e USING (bucket)
  WHERE round(list_cosine_similarity(m.v, e.v), 6) >= 0.7
),
auto AS (
  SELECT span, max(entity_id) AS entity_id
  FROM cand WHERE cos >= 0.95
  GROUP BY span HAVING count(*) = 1
)
SELECT m.span AS span,
       a.entity_id AS resolved_id,
       CASE WHEN a.entity_id IS NULL THEN 'NO_MATCH' ELSE 'VECTOR' END
         AS resolution_level
FROM m LEFT JOIN auto a USING (span)
"""


def q_doc_dup_clusters(n_hashes: int = 16, bands: int = 4, n: int = 3) -> str:
    """MinHash pairs closed into components + survivor election (counterpart
    of dedup.dedup_clusters over minhash_lsh_pairs). Components via recursive
    reachability closure (min reachable id == the Spark side's min-id label
    propagation); survivor = longest text, doc_id ascending tiebreak."""
    rows = n_hashes // bands
    sig_items = ", ".join(
        f"list_min([md5('{i}|' || s) for s in sh])" for i in range(n_hashes)
    )
    band_structs = ", ".join(
        "{'band': %d, 'key': md5(%s)}"
        % (bi, " || '|' || ".join(f"sig[{bi * rows + r + 1}]" for r in range(rows)))
        for bi in range(bands)
    )
    return f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, {_shingles(TOKS, n)} AS sh
  FROM documents
),
sig AS (SELECT doc_id, [{sig_items}] AS sig FROM sh),
banded AS (
  SELECT doc_id, unnest([{band_structs}], recursive := true)
  FROM sig
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id
),
comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
labeled AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id,
         length(d.text) AS len
  FROM documents d LEFT JOIN comp c USING (doc_id)
)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       (row_number() OVER (PARTITION BY cluster_id
                           ORDER BY len DESC, doc_id ASC) = 1) AS keep
FROM labeled
"""
