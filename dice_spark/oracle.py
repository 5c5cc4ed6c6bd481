"""DuckDB oracle SQL for the driver's correctness gate.

Each builder returns ANSI-ish SQL that DuckDB runs over the same parquet
tables the Spark queries read (views: region nation customer supplier part
orders lineitem events documents embeddings). The CTE chain mirrors the
engine's stage graph 1:1 — transcripts derivation, window assembly, extraction,
proposition dedup/merge, canonicalization (recursive-CTE connected
components), and edge emission — so every operator is value-checked end to end.

Constants here (window size 20 / overlap 2, thresholds, arithmetic) must stay
in lockstep with the operators; tests/test_oracle_parity.py enforces it.
"""

from __future__ import annotations

from dice_spark.functions.normalize import duckdb_norm_key_sql
from dice_spark.functions.textfns import (
    duckdb_canonical_name_score_sql,
    duckdb_canonicalize_text_sql,
)
from dice_spark.operators.assembly import OVERLAP_SIZE, WINDOW_SIZE
from dice_spark.operators.extraction import TEMPORAL_BASE_EPOCH
from dice_spark.operators.projection import DEFAULT_MIN_CONFIDENCE
from dice_spark.synth import ORGS, relations_cte, transcripts_cte

STRIDE = WINDOW_SIZE - OVERLAP_SIZE
CTX = "default"


def duckdb_normalize_name_sql(expr: str) -> str:
    """Case-preserving normalize (same chain as norm_key without lower)."""
    s = f"trim({expr})"
    s = f"trim(regexp_replace({s}, '^([^,]+),\\s*(.+)$', '\\2 \\1'))"
    s = f"regexp_replace({s}, '(?i)^(Mr\\.?|Mrs\\.?|Ms\\.?|Dr\\.?|Prof\\.?)\\s+', '')"
    s = f"regexp_replace({s}, '(?i)\\s+(Jr\\.?|Sr\\.?|II|III|IV)$', '')"
    s = f"regexp_replace({s}, '(\\w{{2,}})\\s+[A-Z]\\.?\\s+(\\w{{2,}})', '\\1 \\2', 'g')"
    return f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"


def _org_list() -> str:
    return "[" + ", ".join("'" + o.replace("'", "''") + "'" for o in ORGS) + "]"


def _etype(expr: str) -> str:
    return (
        f"(case when list_contains({_org_list()}, {expr}) then 'Org' "
        f"when starts_with({expr}, 'Project ') then 'Project' else 'Person' end)"
    )


def base_ctes(role: str | None = None) -> str:
    """transcripts -> winturns -> chunks -> triples -> propositions.

    ``role`` scopes the extraction stage to one speaker role — the
    ExtractionPerspective mirror (extraction.scope_to_perspective). Chunk
    assembly still sees every turn; only the matched/triples stage filters.
    """
    pos = "strpos(lower(w.text), r.predicate)"
    role_clause = f"\n  WHERE lower(w.role) = '{role}'" if role else ""
    return f"""
WITH RECURSIVE transcripts AS ({transcripts_cte()}),
relations AS ({relations_cte()}),
winturns AS (
  SELECT t.*, (turn_idx // {STRIDE}) AS window_id FROM transcripts t
  UNION ALL
  SELECT t.*, (turn_idx // {STRIDE}) - 1 AS window_id FROM transcripts t
  WHERE turn_idx % {STRIDE} < {OVERLAP_SIZE} AND turn_idx // {STRIDE} > 0
),
chunks AS (
  -- HAVING drops overlap-only sliver windows (conversation ends inside the
  -- previous window's overlap region) — mirrors assemble_windows' filter,
  -- which matches the incremental ladder's tiling.
  SELECT conv_id, window_id,
         min(turn_idx) AS window_start,
         max(turn_idx) + 1 AS window_end,
         count(*) AS n_turns,
         string_agg(role || ': ' || text, chr(10)||chr(10) ORDER BY turn_idx) AS text
  FROM winturns GROUP BY conv_id, window_id
  HAVING NOT (window_id >= 1 AND count(*) <= {OVERLAP_SIZE})
),
matched AS (
  SELECT w.conv_id, w.window_id, w.turn_idx, w.text AS sentence,
         r.predicate, r.priority, {pos} AS pos,
         row_number() OVER (
           PARTITION BY w.conv_id, w.window_id, w.turn_idx ORDER BY r.priority
         ) AS rn
  FROM winturns w JOIN relations r ON {pos} > 0{role_clause}
),
triples AS (
  SELECT m.conv_id,
         m.conv_id || ':' || cast(c.window_start as varchar) || ':' || cast(c.window_end as varchar) AS chunk_id,
         m.turn_idx, m.sentence, m.predicate, m.priority,
         trim(substr(m.sentence, 1, m.pos - 1)) AS subj_span,
         trim(rtrim(trim(substr(m.sentence, m.pos + length(m.predicate))), '.')) AS obj_span,
         0.5 + (length(m.sentence) % 50) / 100.0 AS confidence,
         (length(trim(substr(m.sentence, 1, m.pos - 1))) % 10) / 10.0 AS decay
  FROM matched m
  JOIN chunks c ON c.conv_id = m.conv_id AND c.window_id = m.window_id
  WHERE m.rn = 1
),
typed_triples AS (
  SELECT t.*, {_etype('t.subj_span')} AS subj_type, {_etype('t.obj_span')} AS obj_type
  FROM triples t
),
propositions AS (
  -- valid_from/valid_to mirror extraction.temporal_metadata_exprs: the
  -- deterministic temporal-extraction stand-in ('founded' -> dated CLOSED
  -- window, 'is employed by' -> dated OPEN, else null; h = first 6 md5 hex
  -- chars of the sentence). invalidated_at is never set at extraction.
  SELECT md5('{CTX}' || '|' || sentence) AS prop_id,
         '{CTX}' AS context_id,
         sentence AS text,
         min(predicate) AS predicate,
         min(subj_span) AS subj_span,
         min(obj_span) AS obj_span,
         min(subj_type) AS subj_type,
         min(obj_type) AS obj_type,
         round(least(min(confidence) * (1 + 0.3 * (count(*) - 1)), 0.99), 6) AS confidence,
         round(min(decay) * pow(0.7, count(*) - 1), 6) AS decay,
         count(*) - 1 AS reinforce_count,
         CASE WHEN min(predicate) IN ('founded', 'is employed by')
              THEN to_timestamp({TEMPORAL_BASE_EPOCH}
                   + (('0x' || substr(md5(sentence), 1, 6))::bigint % 365) * 86400)
         END AS valid_from,
         CASE WHEN min(predicate) = 'founded'
              THEN to_timestamp({TEMPORAL_BASE_EPOCH}
                   + (('0x' || substr(md5(sentence), 1, 6))::bigint % 365) * 86400
                   + (30 + ('0x' || substr(md5(sentence), 1, 6))::bigint % 300) * 86400)
         END AS valid_to,
         CAST(NULL AS TIMESTAMP) AS invalidated_at
  FROM typed_triples GROUP BY sentence
)
"""


def canonicalization_ctes() -> str:
    """mention nodes -> match edges -> recursive-CTE components -> entities."""
    nk = duckdb_norm_key_sql("span")
    nn = duckdb_normalize_name_sql("span")
    return f""",
mentions AS (
  SELECT subj_span AS span, subj_type AS entity_type FROM typed_triples
  UNION ALL
  SELECT obj_span AS span, obj_type AS entity_type FROM typed_triples
),
prepared AS (
  SELECT span, entity_type, {nn} AS norm_name, {nk} AS norm_key,
         lower(entity_type) AS type_key
  FROM mentions
),
nodes AS (
  SELECT type_key, norm_key,
         min(entity_type) AS entity_type,
         count(*) AS n_mentions,
         md5('{CTX}' || '|' || type_key || '|' || norm_key) AS node_id
  FROM prepared GROUP BY type_key, norm_key
),
node_forms AS (
  SELECT p.type_key, p.norm_key, p.norm_name
  FROM prepared p GROUP BY p.type_key, p.norm_key, p.norm_name
),
partial_edges AS (
  SELECT s.node_id AS a, t.node_id AS b
  FROM nodes s
  JOIN (
    SELECT n.node_id, n.type_key, u.tok
    FROM nodes n, unnest(str_split(n.norm_key, ' ')) AS u(tok)
    WHERE contains(n.norm_key, ' ') AND length(u.tok) >= 4
  ) t ON s.norm_key = t.tok AND s.type_key = t.type_key
  WHERE NOT contains(s.norm_key, ' ') AND length(s.norm_key) >= 4
),
fuzzy_edges AS (
  SELECT fa.node_id AS a, fb.node_id AS b
  FROM nodes fa JOIN nodes fb
    ON fa.type_key = fb.type_key
   AND fa.node_id < fb.node_id
   AND substr(fa.norm_key, 1, 1) = substr(fb.norm_key, 1, 1)
   AND (length(fa.norm_key) // 4) = (length(fb.norm_key) // 4)
  WHERE length(fa.norm_key) >= 4 AND length(fb.norm_key) >= 4
    AND levenshtein(fa.norm_key, fb.norm_key)
        <= floor(least(length(fa.norm_key), length(fb.norm_key)) * 0.2)
),
sym AS (
  SELECT a, b FROM partial_edges UNION SELECT b, a FROM partial_edges
  UNION SELECT a, b FROM fuzzy_edges UNION SELECT b, a FROM fuzzy_edges
),
reach(id, r) AS (
  SELECT node_id, node_id FROM nodes
  UNION
  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
),
components AS (
  SELECT id AS node_id, min(r) AS component FROM reach GROUP BY id
),
labeled AS (
  SELECT n.*, c.component FROM nodes n JOIN components c USING (node_id)
),
comp_forms AS (
  SELECT l.component, f.norm_name AS form,
         {duckdb_canonical_name_score_sql('f.norm_name')} AS score
  FROM labeled l JOIN node_forms f
    ON f.type_key = l.type_key AND f.norm_key = l.norm_key
),
best_name AS (
  SELECT component, form AS canonical_name
  FROM (
    SELECT component, form,
           row_number() OVER (PARTITION BY component ORDER BY score DESC, form ASC) AS rn
    FROM comp_forms
  ) WHERE rn = 1
),
entities AS (
  SELECT l.component AS entity_id, b.canonical_name,
         min(l.entity_type) AS entity_type,
         cast(sum(l.n_mentions) as bigint) AS n_mentions
  FROM labeled l JOIN best_name b ON b.component = l.component
  GROUP BY l.component, b.canonical_name
),
mapping AS (
  SELECT type_key, norm_key, component AS resolved_id FROM labeled
)
"""


def edges_ctes(min_confidence: float = DEFAULT_MIN_CONFIDENCE) -> str:
    nk_s = duckdb_norm_key_sql("p.subj_span")
    nk_o = duckdb_norm_key_sql("p.obj_span")
    return f""",
resolved_props AS (
  SELECT p.*, ms.resolved_id AS subj_id, mo.resolved_id AS obj_id,
         r.subject_type AS r_subj_type, r.object_type AS r_obj_type
  FROM propositions p
  LEFT JOIN mapping ms ON ms.norm_key = {nk_s} AND ms.type_key = lower(p.subj_type)
  LEFT JOIN mapping mo ON mo.norm_key = {nk_o} AND mo.type_key = lower(p.obj_type)
  LEFT JOIN relations r ON r.predicate = p.predicate
),
classified AS (
  SELECT p.*,
    case
      when p.confidence < {min_confidence} then 'PolicyRejected'
      when p.subj_id IS NULL OR p.obj_id IS NULL then 'UnresolvedMention'
      when (p.r_subj_type IS NOT NULL AND lower(p.r_subj_type) <> lower(p.subj_type))
        OR (p.r_obj_type IS NOT NULL AND lower(p.r_obj_type) <> lower(p.obj_type))
        then 'TypeMismatch'
    end AS reason
  FROM resolved_props p
),
edge_rows AS (
  SELECT subj_id AS source_id, obj_id AS target_id,
         regexp_replace(upper(trim(predicate)), '\\s+', '_', 'g') AS edge_type,
         confidence, text, prop_id
  FROM classified WHERE reason IS NULL
),
edges AS (
  SELECT source_id, target_id, edge_type,
         round(max(confidence), 6) AS confidence,
         min(text) AS description,
         count(*) AS n_props,
         source_id || '-[' || edge_type || ']->' || target_id AS edge_ref
  FROM edge_rows GROUP BY source_id, target_id, edge_type
)
"""


# --- Query-level oracle SQL -----------------------------------------------------------


def q_turn_assembly() -> str:
    return base_ctes() + """
SELECT conv_id, window_start, window_end, n_turns, text,
       conv_id || ':' || cast(window_start as varchar) || ':' || cast(window_end as varchar) AS chunk_id
FROM chunks
"""


def q_extraction() -> str:
    return base_ctes() + """
SELECT chunk_id, conv_id, turn_idx, sentence, predicate, priority,
       subj_span, obj_span, subj_type, obj_type,
       round(confidence, 6) AS confidence, round(decay, 6) AS decay
FROM typed_triples
"""


def q_extraction_perspective() -> str:
    """USER-perspective extraction (ExtractionPerspective.USER,
    LlmPropositionExtractor.kt:46-56): only user-role turns reach the
    extractor; chunk windows still assemble over the full dialogue."""
    return base_ctes(role="user") + """
SELECT chunk_id, conv_id, turn_idx, sentence, predicate, priority,
       subj_span, obj_span, subj_type, obj_type,
       round(confidence, 6) AS confidence, round(decay, 6) AS decay
FROM typed_triples
"""


def q_propositions() -> str:
    """Propositions incl. provenance locator keys (stampProvenance), the
    strongest authority tier across locators (StructuralAuthorityResolver) and
    the authority-weighted trust score (AuthorityWeightedTrustScorer)."""
    ordinal = (
        "coalesce(list_min(list_transform(prov_list, k -> "
        "case when starts_with(k, 'connector:') then 0 "
        "when starts_with(k, 'uri:') then 1 "
        "when starts_with(k, 'file:') then 1 "
        "when starts_with(k, 'content:') then 2 else 3 end)), 3)"
    )
    return base_ctes() + f""",
prov AS (
  -- mirror of the Spark-side MAX_GROUNDING=100 cap (rank-before-collect on
  -- chunk_id): provenance derives from the capped grounding list
  SELECT r.sentence,
         list_sort(list(DISTINCT 'content:' || sha256(c.text))) AS prov_list
  FROM (
    SELECT t.sentence, t.chunk_id,
           row_number() OVER (PARTITION BY t.sentence ORDER BY t.chunk_id) AS rn
    FROM typed_triples t
  ) r
  JOIN chunks c
    ON (c.conv_id || ':' || cast(c.window_start as varchar) || ':' ||
        cast(c.window_end as varchar)) = r.chunk_id
  WHERE r.rn <= 100
  GROUP BY r.sentence
)
SELECT p.prop_id, p.context_id, p.text, p.predicate, p.subj_span, p.obj_span,
       p.subj_type, p.obj_type, p.confidence, p.decay, p.reinforce_count,
       array_to_string(v.prov_list, ',') AS provenance_keys,
       (['PRIMARY','SECONDARY','DERIVED','UNKNOWN'])[{ordinal} + 1] AS authority_tier,
       cast(([0.9, 0.75, 0.6, 0.5])[{ordinal} + 1] as double) AS trust_score
FROM propositions p JOIN prov v ON v.sentence = p.text
"""


def q_entities() -> str:
    return base_ctes() + canonicalization_ctes() + """
SELECT entity_id, canonical_name, entity_type, n_mentions FROM entities
"""


def q_edges() -> str:
    return base_ctes() + canonicalization_ctes() + edges_ctes() + """
SELECT source_id, target_id, edge_type, confidence, description, n_props, edge_ref
FROM edges
"""


def q_projection_lineage() -> str:
    return base_ctes() + canonicalization_ctes() + edges_ctes() + """
SELECT coalesce(reason, 'PROJECTED') AS outcome, count(*) AS n
FROM classified GROUP BY 1
"""


def q_prolog_inference() -> str:
    """Horn-rule inference over the fact base (PrologEngine + dice-rules.pl):
    reports_to_chain / manages_chain = recursive transitive closure (UNION
    dedup terminates on cycles, like tabled resolution on ground facts);
    coworker = the works_at-analog self-join with X <> Y."""
    return base_ctes() + canonicalization_ctes() + edges_ctes() + """,
facts AS (
  SELECT DISTINCT lower(edge_type) AS predicate, source_id AS x, target_id AS y
  FROM edges
),
rt AS (SELECT x, y FROM facts WHERE predicate = 'reports_to'),
rtc(x, y) AS (
  SELECT x, y FROM rt
  UNION
  SELECT r.x, c.y FROM rt r JOIN rtc c ON r.y = c.x
),
mg AS (SELECT x, y FROM facts WHERE predicate = 'manages'),
mgc(x, y) AS (
  SELECT x, y FROM mg
  UNION
  SELECT m.x, c.y FROM mg m JOIN mgc c ON m.y = c.x
),
emp AS (SELECT x, y FROM facts WHERE predicate = 'is_employed_by')
SELECT 'reports_to_chain' AS predicate, x, y FROM rtc
UNION
SELECT 'manages_chain' AS predicate, x, y FROM mgc
UNION
SELECT 'coworker' AS predicate, a.x AS x, b.x AS y
FROM emp a JOIN emp b ON a.y = b.y AND a.x <> b.x
"""


def q_prolog_facts(max_source_ids: int = 100) -> str:
    """Prolog fact-base emission (DefaultPrologProjector.projectAll +
    PrologTypes toProlog formatting). Predicate = lower(edge_type): every
    DEFAULT_MAPPING maps UPPER_SNAKE -> its lowercase, and the camelToSnake
    fallback on an UPPER_SNAKE type is also a plain lowercase. quoteAtom =
    lower + non-[a-z0-9_] -> '_'. Grounding rows mirror the Spark side's
    MAX_EDGE_SOURCE_IDS rank-capped source_prop_ids array."""

    def atom(expr: str) -> str:
        return f"'''' || regexp_replace(lower({expr}), '[^a-z0-9_]', '_', 'g') || ''''"

    return base_ctes() + canonicalization_ctes() + edges_ctes() + f""",
prolog_base AS (
  SELECT source_id, target_id, edge_type,
         lower(edge_type) AS predicate,
         lower(edge_type) || '(' || {atom("source_id")} || ', ' || {atom("target_id")} || ')' AS term,
         confidence
  FROM edges
),
grounding_ranked AS (
  SELECT source_id, target_id, edge_type, prop_id,
         row_number() OVER (PARTITION BY source_id, target_id, edge_type
                            ORDER BY prop_id) AS rnk
  FROM edge_rows
)
SELECT 'fact' AS kind, predicate, term || '.' AS line FROM prolog_base
UNION ALL
SELECT 'confidence' AS kind, predicate,
       'confidence(' || term || ', ' || printf('%.6f', confidence) || ').' AS line
FROM prolog_base
UNION ALL
SELECT 'grounded_by' AS kind, b.predicate,
       'grounded_by(' || b.term || ', ''' || g.prop_id || ''').' AS line
FROM prolog_base b
JOIN grounding_ranked g USING (source_id, target_id, edge_type)
WHERE g.rnk <= {max_source_ids}
"""


def q_two_hop() -> str:
    """Indirect 2-hop links over the emitted edges (SemanticLinkDiscoverer)."""
    return base_ctes() + canonicalization_ctes() + edges_ctes() + """
, sym_e AS (
  SELECT source_id AS src, target_id AS dst FROM edges
  UNION
  SELECT target_id AS src, source_id AS dst FROM edges
),
cand AS (
  SELECT e1.src AS source, e2.dst AS target, e1.dst AS via
  FROM sym_e e1 JOIN sym_e e2 ON e1.dst = e2.src
  WHERE e1.src < e2.dst
),
indirect AS (
  SELECT DISTINCT c.source, c.target, c.via FROM cand c
  LEFT JOIN sym_e d ON d.src = c.source AND d.dst = c.target
  WHERE d.src IS NULL
),
ranked AS (
  SELECT source, target, via,
         row_number() OVER (PARTITION BY source, target ORDER BY via) AS rnk
  FROM indirect
)
SELECT source, target,
       string_agg(CASE WHEN rnk <= 100 THEN via END, ',' ORDER BY via) AS connecting,
       count(*) AS n_connecting
FROM ranked GROUP BY source, target
"""


def q_temporal_query(
    as_of_epoch: int = 1786924800,  # 2026-08-17T00:00:00Z
    content_revised_epoch: int = 1780272000,  # 2026-06-01T00:00:00Z
) -> str:
    """Temporal-branch effectiveConfidence oracle (mirror of
    __spark_entry__.q_temporal_query over the propositions CTE's
    deterministic temporal stand-in): invalidated -> 0; dated CLOSED and
    current -> confidence (never decays); dated, not current -> 0; dated
    OPEN -> decays from valid_from; else decays from content_revised.
    All instants handled as integral epochs (engine-portable)."""
    inv = (
        "CASE WHEN valid_from IS NOT NULL AND substr(prop_id, 1, 1) = '0' "
        f"THEN {TEMPORAL_BASE_EPOCH} END"
    )
    vf, vt = "floor(epoch(valid_from))", "floor(epoch(valid_to))"

    def decay_from(anchor: str) -> str:
        return (
            f"round(confidence * exp(-decay * 2.0 * "
            f"greatest(floor(({as_of_epoch} - {anchor}) / 86400), 0)), 6)"
        )

    return base_ctes() + f""",
tq AS (
  SELECT prop_id, predicate, confidence, decay,
         {vf} AS vf, {vt} AS vt, ({inv}) AS inv
  FROM propositions
)
SELECT prop_id, predicate,
       CAST(vf AS BIGINT) AS valid_from_epoch,
       CAST(vt AS BIGINT) AS valid_to_epoch,
       CASE
         WHEN inv IS NOT NULL AND inv <= {as_of_epoch} THEN 0.0
         WHEN vf IS NOT NULL AND NOT (vf <= {as_of_epoch}
              AND (vt IS NULL OR {as_of_epoch} < vt)) THEN 0.0
         WHEN vf IS NOT NULL AND vt IS NOT NULL THEN confidence
         WHEN vf IS NOT NULL THEN {decay_from("vf")}
         ELSE {decay_from(str(content_revised_epoch))}
       END AS eff_conf,
       CASE
         WHEN inv IS NOT NULL THEN 'INVALIDATED'
         WHEN vf IS NOT NULL AND vt IS NOT NULL THEN 'DATED_CLOSED'
         WHEN vf IS NOT NULL THEN 'DATED_OPEN'
         ELSE 'DECAYING'
       END AS branch
FROM tq
"""


def q_decay_sweep(as_of: str = "2024-12-31 00:00:00") -> str:
    """Effective confidence + hysteresis status over per-turn facts.

    Each turn is treated as a proposition anchored at its own ts (the decay
    anchor), using the extraction confidence/decay rules, evaluated at an
    explicit as_of — never now() (determinism).
    """
    return base_ctes() + f""",
turn_props AS (
  SELECT t.conv_id, t.turn_idx,
         0.5 + (length(t.text) % 50) / 100.0 AS confidence,
         (t.turn_idx % 10) / 10.0 AS decay,
         t.ts AS content_revised
  FROM transcripts t
),
decayed AS (
  SELECT conv_id, turn_idx, confidence, decay,
         round(confidence * exp(-decay * 2.0 *
           greatest(floor((epoch(timestamp '{as_of}') - epoch(content_revised)) / 86400), 0)), 6)
           AS eff_conf
  FROM turn_props
)
SELECT conv_id, turn_idx, eff_conf,
       case when eff_conf < 0.1 then 'STALE' else 'ACTIVE' end AS status
FROM decayed
"""


def q_status_events(as_of: str = "2024-12-31 00:00:00") -> str:
    """PropositionStatusChanged oracle (mirror of events.sweep_status_events
    over decay_sweep records, DefaultCollectorRunner.kt:190-218): one event
    per unpinned ACTIVE proposition below the retirement floor."""
    return base_ctes() + f""",
turn_props AS (
  SELECT md5(t.conv_id || '|' || t.turn_idx::varchar) AS prop_id,
         0.5 + (length(t.text) % 50) / 100.0 AS confidence,
         (t.turn_idx % 10) / 10.0 AS decay,
         (t.turn_idx % 7 = 0) AS pinned,
         t.ts AS content_revised
  FROM transcripts t
),
decayed AS (
  SELECT prop_id, pinned,
         round(confidence * exp(-decay * 2.0 *
           greatest(floor((epoch(timestamp '{as_of}') - epoch(content_revised)) / 86400), 0)), 6)
           AS eff_conf
  FROM turn_props
)
SELECT 'PropositionStatusChanged' AS event_type,
       'sweep-events' AS run_id,
       prop_id,
       'ACTIVE' AS previous_status,
       'STALE' AS new_status,
       'eff_conf<0.5' AS reason
FROM decayed
WHERE NOT pinned AND eff_conf < 0.5
"""


def q_structured_report(
    as_of_epoch: int = 1786924800,  # 2026-08-17T00:00:00Z
    content_revised_epoch: int = 1780272000,  # 2026-06-01T00:00:00Z
    retire_below: float = 0.3,
) -> str:
    """StructuredReportProjector oracle: decay-swept store -> status/level
    histograms + rank-pinned top-10 by (eff_conf desc, prop_id asc)."""

    def decay_from(anchor: str) -> str:
        return (
            f"round(confidence * exp(-decay * 2.0 * "
            f"greatest(floor(({as_of_epoch} - {anchor}) / 86400), 0)), 6)"
        )

    vf, vt = "floor(epoch(valid_from))", "floor(epoch(valid_to))"
    return base_ctes() + f""",
store AS (
  SELECT prop_id, text, confidence, decay, {vf} AS vfe, {vt} AS vte
  FROM propositions
),
eff AS (
  SELECT prop_id, text,
         CASE
           WHEN vfe IS NOT NULL AND NOT (vfe <= {as_of_epoch}
                AND (vte IS NULL OR {as_of_epoch} < vte)) THEN 0.0
           WHEN vfe IS NOT NULL AND vte IS NOT NULL THEN confidence
           WHEN vfe IS NOT NULL THEN {decay_from("vfe")}
           ELSE {decay_from(str(content_revised_epoch))}
         END AS eff_conf
  FROM store
),
swept AS (
  SELECT prop_id, text, eff_conf,
         CASE WHEN eff_conf < {retire_below} THEN 'STALE' ELSE 'ACTIVE' END AS status
  FROM eff
)
SELECT 'by_status' AS section, status AS key, cast(count(*) AS bigint) AS n,
       NULL::varchar AS prop_id, NULL::double AS eff_conf
FROM swept GROUP BY status
UNION ALL
SELECT 'by_level', '0', cast(count(*) AS bigint), NULL, NULL FROM swept
UNION ALL
SELECT 'top', cast(rn AS varchar), NULL,
       prop_id, cast(eff_conf AS double)
FROM (
  SELECT prop_id, eff_conf,
         row_number() OVER (ORDER BY eff_conf DESC, prop_id ASC) AS rn
  FROM swept
) WHERE rn <= 10
"""


def q_graph_neighborhood(max_depth: int = 3) -> str:
    """Neighborhood BFS oracle: recursive CTE over the undirected edge list;
    first-discovery distance = min distance per node, predecessor = min
    adjacent node at distance-1 (the Spark loop's min-id rule)."""
    return base_ctes() + canonicalization_ctes() + edges_ctes() + f""",
gsym AS MATERIALIZED (
  SELECT source_id AS src, target_id AS dst FROM edges
  UNION
  SELECT target_id, source_id FROM edges
),
bstart AS (SELECT min(src) AS sid FROM gsym),
walk(entity_id, distance) AS (
  SELECT sid, 0 FROM bstart
  UNION
  SELECT e.dst, w.distance + 1
  FROM walk w JOIN gsym e ON e.src = w.entity_id
  WHERE w.distance < {max_depth}
),
dist AS (SELECT entity_id, min(distance) AS distance FROM walk GROUP BY entity_id),
preds AS (
  SELECT d.entity_id, d.distance, min(e.src) AS pred
  FROM dist d
  JOIN gsym e ON e.dst = d.entity_id
  JOIN dist p ON p.entity_id = e.src AND p.distance = d.distance - 1
  GROUP BY d.entity_id, d.distance
)
SELECT entity_id, cast(distance AS int) AS distance, pred
FROM preds WHERE distance > 0
"""


def q_retrieval_temporal(
    from_ts: str = "2026-03-01 00:00:00",
    to_ts: str = "2026-03-05 00:00:00",
) -> str:
    """TEMPORAL retrieval oracle: created-range filter over the scoped store
    (created = base + (md5 prefix % 365) days, both engines recompute)."""
    return base_ctes() + f""",
tstore AS (
  SELECT prop_id, text,
         to_timestamp({TEMPORAL_BASE_EPOCH}
           + (('0x' || substr(prop_id, 1, 6))::bigint % 365) * 86400) AS created
  FROM propositions
)
SELECT prop_id, text, CAST(floor(epoch(created)) AS BIGINT) AS created_epoch
FROM tstore
WHERE created >= timestamp '{from_ts}' AND created <= timestamp '{to_ts}'
"""


def q_hysteresis(
    as_of_epoch: int = 1786924800,
    content_revised_epoch: int = 1780272000,
    importance_weight: float = 0.5,
    reinforce_weight: float = 0.25,
) -> str:
    """DecayStatusPolicy hysteresis oracle with the full utility composite
    (StatusTransitionPolicy.kt:91-148): seeded prior status / pinned /
    importance by prop_id hex; pinned rows hold their status; utility =
    eff_conf * (1 + iw*importance) * (1 + rw*ln1p(reinforce_count));
    ACTIVE < 0.1 -> STALE, STALE > 0.2 -> ACTIVE, dead band holds."""

    def decay_from(anchor: str) -> str:
        return (
            f"round(confidence * exp(-decay * 2.0 * "
            f"greatest(floor(({as_of_epoch} - {anchor}) / 86400), 0)), 6)"
        )

    vf, vt = "floor(epoch(valid_from))", "floor(epoch(valid_to))"
    return base_ctes() + f""",
hstore AS (
  SELECT prop_id, confidence, decay, reinforce_count,
         {vf} AS vfe, {vt} AS vte,
         CASE WHEN substr(prop_id, 1, 1) IN ('0','1','2','3','4','5','6','7')
              THEN 'STALE' ELSE 'ACTIVE' END AS prior_status,
         substr(prop_id, 2, 1) IN ('0','1','2','3') AS pinned,
         ('0x' || substr(prop_id, 3, 1))::bigint / 15.0 AS importance
  FROM propositions
),
heff AS (
  SELECT prop_id, prior_status, pinned,
         round(CASE
           WHEN vfe IS NOT NULL AND NOT (vfe <= {as_of_epoch}
                AND (vte IS NULL OR {as_of_epoch} < vte)) THEN 0.0
           WHEN vfe IS NOT NULL AND vte IS NOT NULL THEN confidence
           WHEN vfe IS NOT NULL THEN {decay_from("vfe")}
           ELSE {decay_from(str(content_revised_epoch))}
         END
         * (1.0 + {importance_weight} * importance)
         * (1.0 + {reinforce_weight} * ln(1.0 + reinforce_count)), 6) AS utility
  FROM hstore
)
SELECT prop_id, utility, prior_status, pinned,
       CASE
         WHEN pinned THEN prior_status
         WHEN prior_status = 'ACTIVE' AND utility < 0.1 THEN 'STALE'
         WHEN prior_status = 'STALE' AND utility > 0.2 THEN 'ACTIVE'
         ELSE prior_status
       END AS status
FROM heff
"""


def q_known_entities() -> str:
    """KnownEntityResolver fast-path oracle: normalized-name broadcast match
    with covered-label preference then min entity id; unmatched mentions
    UNRESOLVED."""
    nk_name = duckdb_norm_key_sql("canonical_name")
    nk_span = duckdb_norm_key_sql("span")
    return base_ctes() + canonicalization_ctes() + f""",
kents AS MATERIALIZED (SELECT * FROM entities),
known AS (
  SELECT entity_id AS k_id, {nk_name} AS k_key,
         CASE WHEN substr(entity_id, 1, 1) IN ('0','1','2','3')
              THEN [lower(entity_type)] ELSE ['external'] END AS k_labels
  FROM kents
  WHERE substr(entity_id, 1, 1) IN ('0','1','2','3','4','5','6','7')
),
kmention AS (
  SELECT DISTINCT span, entity_type FROM (
    SELECT 'Dr. ' || canonical_name AS span, entity_type FROM kents
    UNION ALL
    SELECT array_to_string(list_reverse(str_split(canonical_name, ' ')), ' '), entity_type FROM kents
  )
),
km AS (SELECT span, lower(entity_type) AS type_key, {nk_span} AS norm_key FROM kmention),
kcand AS (
  SELECT km.span, km.type_key, k.k_id, k.k_labels
  FROM km LEFT JOIN known k ON km.norm_key = k.k_key
),
kpicked AS (
  SELECT * FROM (
    SELECT span, type_key, k_id,
           list_contains(k_labels, type_key) AS covered,
           row_number() OVER (
             PARTITION BY span, type_key
             ORDER BY CASE WHEN list_contains(k_labels, type_key) THEN 1 ELSE 0 END DESC,
                      k_id ASC
           ) AS rn
    FROM kcand WHERE k_id IS NOT NULL
  ) WHERE rn = 1
)
SELECT span, type_key, k_id AS resolved_id,
       CASE WHEN covered THEN 'KNOWN_REFERENCE' ELSE 'KNOWN_WIDENED' END AS resolution_level
FROM kpicked
UNION ALL
SELECT km.span, km.type_key, NULL, 'UNRESOLVED'
FROM km ANTI JOIN kpicked USING (span, type_key)
"""


def q_stale_cascade() -> str:
    """Stale-cascade oracle: per-record lineage rows with the terminal-status
    semi-join flag (statuses seeded by prop_id hex prefix)."""
    return base_ctes() + canonicalization_ctes() + edges_ctes() + """,
lrecords AS (
  SELECT 'run-r3' AS run_id, prop_id,
         CASE WHEN reason IS NULL THEN 'PROJECTED' ELSE 'SKIPPED' END AS lifecycle,
         CASE WHEN reason IS NULL
              THEN subj_id || '-[' || regexp_replace(upper(trim(predicate)), '\\s+', '_', 'g')
                   || ']->' || obj_id END AS target_ref,
         reason
  FROM classified
)
SELECT run_id, prop_id, lifecycle, target_ref, reason,
       substr(prop_id, 1, 1) IN ('0','1','2','3') AS stale
FROM lrecords
"""


def q_grounding_wiring() -> str:
    """Grounding-wiring oracle: capped grounding ids resolve exactly against
    the seeded registry, else by namespace suffix (after the first ':',
    node ids ending with it)."""
    return base_ctes() + f""",
gr AS (
  SELECT r.sentence, r.chunk_id AS gid
  FROM (
    SELECT t.sentence, t.chunk_id,
           row_number() OVER (PARTITION BY t.sentence ORDER BY t.chunk_id) AS rn
    FROM typed_triples t
  ) r
  WHERE r.rn <= 100
  GROUP BY r.sentence, r.chunk_id
),
greg AS (
  SELECT (conv_id || ':' || cast(window_start as varchar) || ':' ||
          cast(window_end as varchar)) AS node_id
  FROM chunks WHERE substr(conv_id, length(conv_id) - 1, 2) = '33'
  UNION SELECT 'node:0:20'
),
gexact AS (
  SELECT g.sentence, g.gid, r.node_id AS target_id
  FROM gr g JOIN greg r ON g.gid = r.node_id
),
gmissed AS (SELECT g.* FROM gr g ANTI JOIN gexact USING (sentence, gid)),
gsuffix AS (
  SELECT m.sentence, m.gid, r.node_id AS target_id
  FROM (
    SELECT *, substr(gid, strpos(gid, ':') + 1) AS sfx FROM gmissed
    WHERE contains(gid, ':')
      AND length(substr(gid, strpos(gid, ':') + 1)) > 0
      AND substr(gid, strpos(gid, ':') + 1) <> gid
  ) m
  JOIN greg r ON ends_with(r.node_id, m.sfx)
),
gres AS (
  SELECT sentence, target_id FROM gexact
  UNION ALL SELECT sentence, target_id FROM gsuffix
)
SELECT DISTINCT md5('{CTX}' || '|' || sentence) AS source_id, target_id,
       'GROUNDED_IN' AS edge_type,
       md5('{CTX}' || '|' || sentence) || '-[GROUNDED_IN]->' || target_id AS edge_ref
FROM gres
"""


def q_path_between(max_depth: int = 5) -> str:
    """pathBetween oracle: BFS layers with the min-predecessor rule, then a
    recursive backtrack from the largest entity to the smallest; steps
    re-indexed from the start."""
    return base_ctes() + canonicalization_ctes() + edges_ctes() + f""",
gsym AS MATERIALIZED (
  SELECT source_id AS src, target_id AS dst FROM edges
  UNION
  SELECT target_id, source_id FROM edges
),
pstart AS (SELECT min(src) AS sid FROM gsym),
ptarget AS (SELECT max(src) AS tid FROM gsym),
walk(entity_id, distance) AS (
  SELECT sid, 0 FROM pstart
  UNION
  SELECT e.dst, w.distance + 1
  FROM walk w JOIN gsym e ON e.src = w.entity_id
  WHERE w.distance < {max_depth}
),
dist AS (SELECT entity_id, min(distance) AS distance FROM walk GROUP BY entity_id),
preds_all AS (
  SELECT d.entity_id, min(e.src) AS pred
  FROM dist d
  JOIN gsym e ON e.dst = d.entity_id
  JOIN dist p ON p.entity_id = e.src AND p.distance = d.distance - 1
  GROUP BY d.entity_id, d.distance
  UNION ALL
  SELECT sid, NULL FROM pstart
),
trail(step, entity_id) AS (
  SELECT 0, d.entity_id FROM dist d, ptarget WHERE d.entity_id = ptarget.tid
  UNION ALL
  SELECT t.step + 1, p.pred
  FROM trail t JOIN preds_all p ON p.entity_id = t.entity_id
  WHERE p.pred IS NOT NULL
)
SELECT CAST((SELECT max(step) FROM trail) - step AS INT) AS step, entity_id
FROM trail
"""


def q_why_explain() -> str:
    """whyExplain oracle: durable lineage fields for the ten smallest
    prop_ids — capped grounding ids, content-addressed provenance, strongest
    authority tier, authority-weighted trust."""
    ordinal = (
        "coalesce(list_min(list_transform(prov_list, k -> "
        "case when starts_with(k, 'connector:') then 0 "
        "when starts_with(k, 'uri:') then 1 "
        "when starts_with(k, 'file:') then 1 "
        "when starts_with(k, 'content:') then 2 else 3 end)), 3)"
    )
    return base_ctes() + f""",
wprov AS (
  SELECT r.sentence,
         list_sort(list(DISTINCT r.chunk_id)) AS g_list,
         list_sort(list(DISTINCT 'content:' || sha256(c.text))) AS prov_list
  FROM (
    SELECT t.sentence, t.chunk_id,
           row_number() OVER (PARTITION BY t.sentence ORDER BY t.chunk_id) AS rn
    FROM typed_triples t
  ) r
  JOIN chunks c
    ON (c.conv_id || ':' || cast(c.window_start as varchar) || ':' ||
        cast(c.window_end as varchar)) = r.chunk_id
  WHERE r.rn <= 100
  GROUP BY r.sentence
)
SELECT p.prop_id, p.text,
       array_to_string(v.g_list, ',') AS grounding_keys,
       array_to_string(v.prov_list, ',') AS provenance_keys,
       (['PRIMARY','SECONDARY','DERIVED','UNKNOWN'])[{ordinal} + 1] AS authority_tier,
       cast(([0.9, 0.75, 0.6, 0.5])[{ordinal} + 1] as double) AS trust_score,
       p.reinforce_count, 'ACTIVE' AS status, p.confidence, p.decay
FROM propositions p JOIN wprov v ON v.sentence = p.text
QUALIFY row_number() OVER (ORDER BY p.prop_id) <= 10
"""


def q_gate_decisions(
    as_of_epoch: int = 1786924800,
    content_revised_epoch: int = 1780272000,
) -> str:
    """Gate-pipeline oracle: ordered when-chain — Reject (< 0.1), evidence
    floor Demote/RouteToReview (first-declared substring floor), projection
    eligibility SkipProjection (< 0.3), else Persist."""

    def decay_from(anchor: str) -> str:
        return (
            f"round(confidence * exp(-decay * 2.0 * "
            f"greatest(floor(({as_of_epoch} - {anchor}) / 86400), 0)), 6)"
        )

    vf, vt = "floor(epoch(valid_from))", "floor(epoch(valid_to))"
    return base_ctes() + f""",
gstore AS (
  SELECT prop_id, text, predicate, confidence, decay, {vf} AS vfe, {vt} AS vte
  FROM propositions
),
geff AS (
  SELECT prop_id, text, predicate,
         CASE
           WHEN vfe IS NOT NULL AND NOT (vfe <= {as_of_epoch}
                AND (vte IS NULL OR {as_of_epoch} < vte)) THEN 0.0
           WHEN vfe IS NOT NULL AND vte IS NOT NULL THEN confidence
           WHEN vfe IS NOT NULL THEN {decay_from("vfe")}
           ELSE {decay_from(str(content_revised_epoch))}
         END AS eff_conf
  FROM gstore
),
floors(fprio, fpred, fmin, fdemote) AS (
  VALUES (0, 'is employed by', 0.9, 'works with'),
         (1, 'works with', 0.8, NULL)
),
floored AS (
  SELECT * FROM (
    SELECT g.*, f.fmin AS floor_min, f.fdemote AS demote_to,
           row_number() OVER (
             PARTITION BY g.prop_id ORDER BY f.fprio ASC NULLS LAST
           ) AS rn
    FROM geff g LEFT JOIN floors f ON strpos(lower(g.text), f.fpred) > 0
  ) WHERE rn = 1
)
SELECT prop_id,
       CASE WHEN decision = 'Demote' THEN demote_to ELSE predicate END AS predicate,
       eff_conf, decision AS gate_decision
FROM (
  SELECT *,
    CASE
      WHEN eff_conf < 0.1 THEN 'Reject'
      WHEN floor_min IS NOT NULL AND eff_conf < floor_min
           AND demote_to IS NOT NULL THEN 'Demote'
      WHEN floor_min IS NOT NULL AND eff_conf < floor_min THEN 'RouteToReview'
      WHEN eff_conf < 0.3 THEN 'SkipProjection'
      ELSE 'Persist'
    END AS decision
  FROM floored
)
"""


def q_prop_query(
    as_of: str = "2024-12-31 00:00:00",
    created_after: str = "2024-01-01 00:00:00",
    min_reinforce: int = 1,
    min_eff: float = 0.05,
    limit: int = 200,
) -> str:
    """PropositionQuery oracle: context + created-range + min-reinforce +
    min-effective-confidence + any-entity filters, EFFECTIVE_CONFIDENCE_DESC
    ordering (prop_id tie-break), limit — mirrors operators/propquery.py.

    The Spark side additionally applies statuses=['ACTIVE'] and pinned=False,
    which are constant-true on this synthetic store (every proposition is
    minted ACTIVE/unpinned), so the oracle omits them.
    """
    return base_ctes() + canonicalization_ctes() + edges_ctes() + f""",
times AS (
  SELECT t.sentence, min(tr.ts) AS created, max(tr.ts) AS last_touched
  FROM typed_triples t
  JOIN transcripts tr ON tr.conv_id = t.conv_id AND tr.turn_idx = t.turn_idx
  GROUP BY t.sentence
),
proj_ents AS (SELECT entity_id FROM entities WHERE canonical_name LIKE 'Project %'),
eff AS (
  -- Full effectiveConfidenceAt branches (Proposition.kt:326-344): the store
  -- now carries the temporal stand-in columns, so dated propositions route
  -- through the valid-window branches (at this as_of, before every
  -- valid_from, dated facts are not yet current -> 0).
  SELECT rp.prop_id, rp.text, rp.reinforce_count, ti.created, ti.last_touched,
         rp.subj_id, rp.obj_id,
         round(CASE
           WHEN rp.valid_from IS NOT NULL AND NOT (
                  floor(epoch(rp.valid_from)) <= floor(epoch(timestamp '{as_of}'))
                  AND (rp.valid_to IS NULL
                       OR floor(epoch(timestamp '{as_of}')) < floor(epoch(rp.valid_to)))
                ) THEN 0.0
           WHEN rp.valid_from IS NOT NULL AND rp.valid_to IS NOT NULL THEN rp.confidence
           WHEN rp.valid_from IS NOT NULL THEN rp.confidence * exp(-rp.decay * 2.0 *
             greatest(floor((epoch(timestamp '{as_of}') - epoch(rp.valid_from)) / 86400), 0))
           ELSE rp.confidence * exp(-rp.decay * 2.0 *
             greatest(floor((epoch(timestamp '{as_of}') - epoch(ti.last_touched)) / 86400), 0))
         END, 6) AS eff_conf
  FROM resolved_props rp JOIN times ti ON ti.sentence = rp.text
),
filtered AS (
  SELECT * FROM eff
  WHERE created >= timestamp '{created_after}'
    AND reinforce_count >= {min_reinforce}
    AND eff_conf >= {min_eff}
    AND (subj_id IN (SELECT entity_id FROM proj_ents)
         OR obj_id IN (SELECT entity_id FROM proj_ents))
)
SELECT prop_id, text, reinforce_count,
       cast(floor(epoch(created)) as bigint) AS created_s,
       cast(floor(epoch(last_touched)) as bigint) AS touched_s,
       eff_conf
FROM filtered ORDER BY eff_conf DESC, prop_id LIMIT {limit}
"""


def _char_emb_sql(expr: str) -> str:
    """26-dim letter-count embedding (mirror of linking.char_embedding)."""
    items = ", ".join(
        f"cast(length({expr}) - length(replace({expr}, '{c}', '')) as double)"
        for c in "abcdefghijklmnopqrstuvwxyz"
    )
    return f"[{items}]"


def q_linking_ladder(
    auto_accept: float = 0.95,
    cand_floor: float = 0.7,
    bake_accept: float = 0.8,
    bucket_planes: int | None = 4,
) -> str:
    """Full escalation-ladder oracle (mirror of linking.resolve_against_entities
    with vector_tier=True): per-level counters over a probe set of word-reversed
    canonical entity names — EXACT catches single-word names, the VECTOR tier
    (letter-count cosine) catches the reordered multi-word names that every
    string tier misses, ambiguity falls through to the BAKEOFF argmax rule.

    ``bucket_planes`` mirrors the Spark side's (type, hyperplane-bucket)
    candidate blocking: sign bits of the embedding against the same seeded
    literal planes, dot folded left-to-right like Spark's aggregate.
    """
    nk_span = duckdb_norm_key_sql("span")
    nk_name = duckdb_norm_key_sql("canonical_name")
    emb_m = _char_emb_sql("u4.norm_key")
    emb_e = _char_emb_sql("r.e_norm_key")
    bucket_cond = ""
    if bucket_planes:
        from dice_spark.operators.dedup import hyperplane_planes

        planes = hyperplane_planes(26, bucket_planes, seed=42)

        def bucket_sql(col: str) -> str:
            parts = []
            for p in planes:
                dot = " + ".join(f"{col}[{i + 1}] * {p[i]!r}" for i in range(26))
                parts.append(f"(CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END)")
            return " || ".join(parts)

        bucket_cond = f"\n     AND ({bucket_sql('u4e.m_emb')}) = ({bucket_sql('r.e_emb')})"
    return base_ctes() + canonicalization_ctes() + f""",
ents_m AS MATERIALIZED (SELECT * FROM entities),
probe AS MATERIALIZED (
  SELECT DISTINCT span, entity_type, suggested_id FROM (
    SELECT canonical_name AS span, entity_type, NULL::varchar AS suggested_id FROM ents_m
    UNION ALL SELECT 'Dr. ' || canonical_name, entity_type, NULL FROM ents_m
    UNION ALL SELECT array_to_string(list_reverse(str_split(canonical_name, ' ')), ' '), entity_type, NULL FROM ents_m
    UNION ALL SELECT str_split(canonical_name, ' ')[-1], entity_type, NULL FROM ents_m
    UNION ALL SELECT canonical_name || 'x', entity_type, NULL FROM ents_m
    UNION ALL SELECT 'ref#' || entity_id, entity_type, entity_id FROM ents_m
    UNION ALL SELECT 'qqqq ' || entity_id, entity_type, NULL FROM ents_m
  )
),
m AS (SELECT span, lower(entity_type) AS type_key, {nk_span} AS norm_key, suggested_id FROM probe),
reg AS MATERIALIZED (
  SELECT entity_id, canonical_name AS e_name, {nk_name} AS e_norm_key,
         lower(entity_type) AS e_type_key
  FROM ents_m
),
byid_r AS (
  SELECT DISTINCT m.span, m.type_key FROM m
  JOIN reg r ON m.suggested_id = r.entity_id
),
u0 AS (SELECT m.* FROM m ANTI JOIN byid_r USING (span, type_key)),
exact_r AS (
  SELECT u0.span, u0.type_key FROM u0
  JOIN reg r ON lower(u0.span) = lower(r.e_name) AND u0.type_key = r.e_type_key
  GROUP BY 1, 2 HAVING count(DISTINCT r.entity_id) = 1
),
u1 AS (SELECT u0.* FROM u0 ANTI JOIN exact_r USING (span, type_key)),
norm_r AS (
  SELECT u1.span, u1.type_key FROM u1
  JOIN reg r ON u1.norm_key = r.e_norm_key AND u1.type_key = r.e_type_key
  GROUP BY 1, 2 HAVING count(DISTINCT r.entity_id) = 1
),
u2 AS (SELECT u1.* FROM u1 ANTI JOIN norm_r USING (span, type_key)),
part_c AS (
  SELECT u2.span, u2.type_key, t.entity_id
  FROM u2
  JOIN (
    SELECT r.entity_id, r.e_type_key, tok.tok
    FROM reg r, unnest(str_split(r.e_norm_key, ' ')) AS tok(tok)
    WHERE contains(r.e_norm_key, ' ') AND length(tok.tok) >= 4
  ) t ON u2.norm_key = t.tok AND u2.type_key = t.e_type_key
  WHERE NOT contains(u2.norm_key, ' ') AND length(u2.norm_key) >= 4
  UNION
  SELECT u2.span, u2.type_key, r.entity_id
  FROM (
    SELECT u2.span, u2.type_key, tok.tok
    FROM u2, unnest(str_split(u2.norm_key, ' ')) AS tok(tok)
    WHERE contains(u2.norm_key, ' ') AND length(tok.tok) >= 4
  ) u2 JOIN reg r
    ON u2.tok = r.e_norm_key AND u2.type_key = r.e_type_key
   AND NOT contains(r.e_norm_key, ' ')
),
part_r AS (
  SELECT span, type_key FROM part_c
  GROUP BY 1, 2 HAVING count(DISTINCT entity_id) = 1
),
u3 AS (SELECT u2.* FROM u2 ANTI JOIN part_r USING (span, type_key)),
fuzzy_r AS (
  SELECT u3.span, u3.type_key FROM u3
  JOIN reg r
    ON u3.type_key = r.e_type_key
   AND substr(u3.norm_key, 1, 1) = substr(r.e_norm_key, 1, 1)
   AND (length(u3.norm_key) // 4) = (length(r.e_norm_key) // 4)
  WHERE length(u3.norm_key) >= 4 AND length(r.e_norm_key) >= 4
    AND levenshtein(u3.norm_key, r.e_norm_key)
        <= floor(least(length(u3.norm_key), length(r.e_norm_key)) * 0.2)
  GROUP BY 1, 2 HAVING count(DISTINCT r.entity_id) = 1
),
u4 AS (SELECT u3.* FROM u3 ANTI JOIN fuzzy_r USING (span, type_key)),
u4e AS MATERIALIZED (SELECT u4.*, {emb_m} AS m_emb FROM u4),
rege AS MATERIALIZED (SELECT r.*, {emb_e} AS e_emb FROM reg r),
vec_cand AS (
  SELECT * FROM (
    SELECT u4e.span, u4e.type_key, r.entity_id,
           round(list_cosine_similarity(u4e.m_emb, r.e_emb), 6) AS cos
    FROM u4e JOIN rege r ON u4e.type_key = r.e_type_key{bucket_cond}
  ) WHERE cos >= {cand_floor}
),
auto_r AS (
  SELECT span, type_key FROM vec_cand WHERE cos >= {auto_accept}
  GROUP BY 1, 2 HAVING count(DISTINCT entity_id) = 1
),
bake_r AS (
  SELECT span, type_key FROM (
    SELECT v.*, row_number() OVER (
      PARTITION BY span, type_key ORDER BY cos DESC, entity_id ASC
    ) AS rn
    FROM vec_cand v ANTI JOIN auto_r USING (span, type_key)
  ) WHERE rn = 1 AND cos >= {bake_accept}
),
levels AS (
  SELECT span, type_key, 'BY_ID' AS resolution_level FROM byid_r
  UNION ALL SELECT span, type_key, 'EXACT' FROM exact_r
  UNION ALL SELECT span, type_key, 'NORMALIZED' FROM norm_r
  UNION ALL SELECT span, type_key, 'PARTIAL' FROM part_r
  UNION ALL SELECT span, type_key, 'FUZZY' FROM fuzzy_r
  UNION ALL SELECT span, type_key, 'VECTOR' FROM auto_r
  UNION ALL SELECT span, type_key, 'BAKEOFF' FROM bake_r
)
SELECT CASE WHEN l.resolution_level IS NOT NULL THEN l.resolution_level
            WHEN m.type_key = 'org' THEN 'VETOED'
            ELSE 'NO_MATCH' END AS resolution_level, count(*) AS n
FROM m LEFT JOIN levels l USING (span, type_key)
GROUP BY 1 ORDER BY 1
"""


def q_revision_outcomes() -> str:
    """Two-batch revision oracle (mirror of revision.revise_batch feeding
    revision.revise): conversations split by user-id parity into an 'existing'
    store (~90%) and a small 'incoming' batch (user id ending '1', ~10% — the
    reference revises small per-ingest batches against the store, so candidate
    volume stays incoming-bounded); candidate pairs share a
    lowered mention span; the classifier is the deterministic token-Jaccard /
    negation rule of classify_pairs_udf; outcomes follow LlmPropositionReviser
    arithmetic (:666-708 merge/reinforce, :513-550 contradict)."""
    canon = duckdb_canonicalize_text_sql("text")
    toks = (
        "list_distinct(list_filter(str_split_regex("
        "regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+'), t -> t <> ''))"
    )
    neg = "regexp_matches(lower(text), '\\b(not|never|no longer)\\b')"
    return base_ctes() + f""",
bprops AS MATERIALIZED (
  SELECT case when substr(conv_id, -1, 1) = '1' then 1 else 0 end AS batch,
         md5('{CTX}' || '|' || sentence) AS prop_id,
         sentence AS text,
         min(subj_span) AS subj_span,
         min(obj_span) AS obj_span,
         round(least(min(confidence) * (1 + 0.3 * (count(*) - 1)), 0.99), 6) AS confidence,
         round(min(decay) * pow(0.7, count(*) - 1), 6) AS decay,
         count(*) - 1 AS reinforce_count
  FROM typed_triples GROUP BY 1, sentence
),
ex AS (SELECT *, {canon} AS canon, {toks} AS toks, {neg} AS neg FROM bprops WHERE batch = 0),
inc_all AS (SELECT *, {canon} AS canon, {toks} AS toks, {neg} AS neg FROM bprops WHERE batch = 1),
inc AS (
  SELECT * FROM (
    SELECT i.*, row_number() OVER (PARTITION BY canon ORDER BY prop_id) AS rn
    FROM inc_all i
  ) WHERE rn = 1
),
ments AS MATERIALIZED (
  SELECT batch, prop_id, lower(subj_span) AS k FROM bprops
  UNION ALL SELECT batch, prop_id, lower(obj_span) FROM bprops
),
pairs AS MATERIALIZED (
  SELECT DISTINCT a.prop_id AS existing_id, b.prop_id AS new_id
  FROM ments a JOIN ments b ON a.k = b.k AND a.batch = 0 AND b.batch = 1
),
cls AS (
  SELECT existing_id, new_id,
         case when sim >= 0.5 and neg_a <> neg_b then 'CONTRADICTORY'
              when sim >= 0.999 then 'IDENTICAL'
              when sim >= 0.5 then 'SIMILAR'
              else 'UNRELATED' end AS relation,
         round(sim, 6) AS similarity
  FROM (
    SELECT p.existing_id, p.new_id,
           len(list_intersect(a.toks, b.toks))
             / greatest(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)), 1)::double AS sim,
           a.neg AS neg_a, b.neg AS neg_b
    FROM pairs p
    JOIN ex a ON a.prop_id = p.existing_id
    JOIN inc_all b ON b.prop_id = p.new_id
  )
),
merged AS (
  SELECT e.prop_id AS e_id, i.prop_id AS i_id,
         round(least(e.confidence + 0.3 * i.confidence, 0.99), 6) AS confidence
  FROM ex e JOIN inc i ON e.canon = i.canon
),
rest_ex AS (SELECT * FROM ex ANTI JOIN (SELECT e_id AS prop_id FROM merged) USING (prop_id)),
rest_inc AS (SELECT * FROM inc ANTI JOIN (SELECT i_id AS prop_id FROM merged) USING (prop_id)),
ident_one AS (
  -- identical outranks contradictory outranks similar per new prop
  -- (classifiedToResult); first-found candidate = min existing_id
  SELECT * FROM (
    SELECT c.*, row_number() OVER (PARTITION BY new_id ORDER BY existing_id) AS irn
    FROM cls c WHERE relation = 'IDENTICAL'
  ) WHERE irn = 1
),
-- same-branch multi-hit fold per existing (sequential arithmetic folds
-- exactly: caps are terminal), mirroring revision.revise _fold
ident_pairs AS (
  SELECT c.existing_id, c.new_id, i.confidence AS i_conf
  FROM ident_one c
  JOIN rest_ex e ON e.prop_id = c.existing_id
  JOIN rest_inc i ON i.prop_id = c.new_id
),
ident_m AS (
  SELECT p.existing_id AS e_id, min(p.new_id) AS hit,
         round(least(any_value(e.confidence) + 0.3 * sum(p.i_conf), 0.99), 6) AS confidence
  FROM ident_pairs p JOIN rest_ex e ON e.prop_id = p.existing_id
  GROUP BY p.existing_id
),
reinforce_pairs AS (
  SELECT c.existing_id, c.new_id, i.confidence AS i_conf
  FROM cls c
  JOIN rest_ex e ON e.prop_id = c.existing_id
  JOIN rest_inc i ON i.prop_id = c.new_id
  WHERE c.relation = 'SIMILAR' AND c.similarity >= 0.7
    AND c.new_id NOT IN (SELECT new_id FROM ident_one)
),
reinforced AS (
  SELECT p.existing_id AS e_id, min(p.new_id) AS hit,
         round(least(any_value(e.confidence) + 0.1 * sum(p.i_conf), 0.95), 6) AS confidence
  FROM reinforce_pairs p JOIN rest_ex e ON e.prop_id = p.existing_id
  GROUP BY p.existing_id
),
contradicted AS (
  SELECT e.prop_id AS e_id, min(c.new_id) AS hit,
         round(greatest(any_value(e.confidence) * 0.3, 0.05), 6) AS confidence
  FROM cls c JOIN rest_ex e ON e.prop_id = c.existing_id
  WHERE c.relation = 'CONTRADICTORY'
    AND c.new_id NOT IN (SELECT new_id FROM ident_one)
  GROUP BY e.prop_id
),
-- cross-branch collapse: one revision per existing, classifiedToResult
-- priority (identical-merge > contradiction > reinforce), min new_id tiebreak
hits AS (
  SELECT e_id, 1 AS rank, hit, confidence, 'MERGED' AS revision_outcome FROM ident_m
  UNION ALL SELECT e_id, 2, hit, confidence, 'CONTRADICTED' FROM contradicted
  UNION ALL SELECT e_id, 3, hit, confidence, 'REINFORCED' FROM reinforced
),
hit_one AS (
  SELECT * FROM (
    SELECT h.*, row_number() OVER (PARTITION BY e_id ORDER BY rank, hit) AS hrn
    FROM hits h
  ) WHERE hrn = 1
),
touched AS (SELECT DISTINCT e_id AS prop_id FROM hits),
unchanged AS (SELECT * FROM rest_ex ANTI JOIN touched USING (prop_id)),
consumed AS (
  SELECT DISTINCT new_id AS prop_id FROM reinforce_pairs
  UNION SELECT new_id FROM ident_pairs
),
new_rows AS (SELECT * FROM rest_inc ANTI JOIN consumed USING (prop_id)),
outcomes AS (
  SELECT 'MERGED' AS revision_outcome, confidence FROM merged
  UNION ALL SELECT revision_outcome, confidence FROM hit_one
  UNION ALL SELECT 'UNCHANGED', confidence FROM unchanged
  UNION ALL SELECT 'NEW', confidence FROM new_rows
)
SELECT revision_outcome, count(*) AS n, round(sum(confidence), 6) AS sum_conf
FROM outcomes GROUP BY 1
"""


def q_temporal_revision() -> str:
    """TemporalConflictDetector oracle (mirror of revision.revise with
    temporal_conflicts=True, spi/ConflictDetector.kt:96-130): the incoming
    batch's employment facts are negated, every CONTRADICTORY pair classifies
    by predicate + valid_from recency, and per existing prop ANY genuine
    contradiction outranks progression; all-WP existing rows retire with
    confidence intact."""
    canon = duckdb_canonicalize_text_sql("text")
    toks = (
        "list_distinct(list_filter(str_split_regex("
        "regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+'), t -> t <> ''))"
    )
    neg = "regexp_matches(lower(text), '\\b(not|never|no longer)\\b')"
    h6 = "('0x' || substr(md5(sentence), 1, 6))::bigint"
    return base_ctes() + f""",
bprops AS MATERIALIZED (
  SELECT case when substr(conv_id, -1, 1) = '1' then 1 else 0 end AS batch,
         md5('{CTX}' || '|' || sentence) AS prop_id,
         sentence AS text,
         min(predicate) AS predicate,
         min(subj_span) AS subj_span,
         min(obj_span) AS obj_span,
         round(least(min(confidence) * (1 + 0.3 * (count(*) - 1)), 0.99), 6) AS confidence,
         round(min(decay) * pow(0.7, count(*) - 1), 6) AS decay,
         count(*) - 1 AS reinforce_count,
         CASE WHEN min(predicate) IN ('founded', 'is employed by')
              THEN to_timestamp({TEMPORAL_BASE_EPOCH} + ({h6} % 365) * 86400)
         END AS valid_from
  FROM typed_triples GROUP BY 1, sentence
),
ex AS (SELECT *, {canon} AS canon, {toks} AS toks, {neg} AS neg FROM bprops WHERE batch = 0),
-- incoming employment facts arrive negated: the world-progression stream
inc_base AS (
  SELECT * REPLACE (
    replace(text, ' is employed by ', ' is no longer employed by ') AS text
  ) FROM bprops WHERE batch = 1
),
inc_all AS (SELECT *, {canon} AS canon, {toks} AS toks, {neg} AS neg FROM inc_base),
inc AS (
  SELECT * FROM (
    SELECT i.*, row_number() OVER (PARTITION BY canon ORDER BY prop_id) AS rn
    FROM inc_all i
  ) WHERE rn = 1
),
ments AS MATERIALIZED (
  SELECT batch, prop_id, lower(subj_span) AS k FROM bprops
  UNION ALL SELECT batch, prop_id, lower(obj_span) FROM bprops
),
pairs AS MATERIALIZED (
  SELECT DISTINCT a.prop_id AS existing_id, b.prop_id AS new_id
  FROM ments a JOIN ments b ON a.k = b.k AND a.batch = 0 AND b.batch = 1
),
cls AS (
  SELECT existing_id, new_id,
         case when sim >= 0.5 and neg_a <> neg_b then 'CONTRADICTORY'
              when sim >= 0.999 then 'IDENTICAL'
              when sim >= 0.5 then 'SIMILAR'
              else 'UNRELATED' end AS relation,
         round(sim, 6) AS similarity
  FROM (
    SELECT p.existing_id, p.new_id,
           len(list_intersect(a.toks, b.toks))
             / greatest(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)), 1)::double AS sim,
           a.neg AS neg_a, b.neg AS neg_b
    FROM pairs p
    JOIN ex a ON a.prop_id = p.existing_id
    JOIN inc_all b ON b.prop_id = p.new_id
  )
),
merged AS (
  SELECT e.prop_id AS e_id, i.prop_id AS i_id,
         round(least(e.confidence + 0.3 * i.confidence, 0.99), 6) AS confidence
  FROM ex e JOIN inc i ON e.canon = i.canon
),
rest_ex AS (SELECT * FROM ex ANTI JOIN (SELECT e_id AS prop_id FROM merged) USING (prop_id)),
rest_inc AS (SELECT * FROM inc ANTI JOIN (SELECT i_id AS prop_id FROM merged) USING (prop_id)),
ident_one AS (
  SELECT * FROM (
    SELECT c.*, row_number() OVER (PARTITION BY new_id ORDER BY existing_id) AS irn
    FROM cls c WHERE relation = 'IDENTICAL'
  ) WHERE irn = 1
),
ident_pairs AS (
  SELECT c.existing_id, c.new_id, i.confidence AS i_conf
  FROM ident_one c
  JOIN rest_ex e ON e.prop_id = c.existing_id
  JOIN rest_inc i ON i.prop_id = c.new_id
),
ident_m AS (
  SELECT p.existing_id AS e_id, min(p.new_id) AS hit,
         round(least(any_value(e.confidence) + 0.3 * sum(p.i_conf), 0.99), 6) AS confidence
  FROM ident_pairs p JOIN rest_ex e ON e.prop_id = p.existing_id
  GROUP BY p.existing_id
),
reinforce_pairs AS (
  SELECT c.existing_id, c.new_id, i.confidence AS i_conf
  FROM cls c
  JOIN rest_ex e ON e.prop_id = c.existing_id
  JOIN rest_inc i ON i.prop_id = c.new_id
  WHERE c.relation = 'SIMILAR' AND c.similarity >= 0.7
    AND c.new_id NOT IN (SELECT new_id FROM ident_one)
),
reinforced AS (
  SELECT p.existing_id AS e_id, min(p.new_id) AS hit,
         round(least(any_value(e.confidence) + 0.1 * sum(p.i_conf), 0.95), 6) AS confidence
  FROM reinforce_pairs p JOIN rest_ex e ON e.prop_id = p.existing_id
  GROUP BY p.existing_id
),
-- conflict classification per CONTRADICTORY pair: incoming predicate
-- (fallback existing), recency = valid_from (no observed_at/content_revised
-- in this store); null anchors classify conservatively as CONTRADICTION.
-- Incoming metadata comes from the post-dedup batch (inc) via LEFT join.
contra_pairs AS (
  SELECT e.prop_id AS e_id, c.new_id, e.confidence, e.decay,
         case when lower(coalesce(i.predicate, e.predicate)) IS DISTINCT FROM 'is employed by'
                THEN 'CONTRADICTION'
              when i.valid_from IS NULL or e.valid_from IS NULL THEN 'CONTRADICTION'
              when i.valid_from < e.valid_from THEN 'CONTRADICTION'
              else 'WORLD_PROGRESSION' end AS ctype
  FROM cls c
  JOIN rest_ex e ON e.prop_id = c.existing_id
  LEFT JOIN inc i ON i.prop_id = c.new_id
  WHERE c.relation = 'CONTRADICTORY'
    AND c.new_id NOT IN (SELECT new_id FROM ident_one)
),
contra_g AS (
  SELECT e_id, min(new_id) AS hit, any_value(confidence) AS e_conf,
         max(case when ctype = 'CONTRADICTION' then 1 else 0 end) AS any_contra
  FROM contra_pairs GROUP BY e_id
),
hits AS (
  SELECT e_id, 1 AS rank, hit, confidence, 'MERGED' AS revision_outcome FROM ident_m
  UNION ALL
  SELECT e_id, 2, hit, round(greatest(e_conf * 0.3, 0.05), 6), 'CONTRADICTED'
  FROM contra_g WHERE any_contra = 1
  UNION ALL
  SELECT e_id, 2, hit, round(e_conf, 6), 'WORLD_PROGRESSION'
  FROM contra_g WHERE any_contra = 0
  UNION ALL SELECT e_id, 3, hit, confidence, 'REINFORCED' FROM reinforced
),
hit_one AS (
  SELECT * FROM (
    SELECT h.*, row_number() OVER (PARTITION BY e_id ORDER BY rank, hit) AS hrn
    FROM hits h
  ) WHERE hrn = 1
),
touched AS (SELECT DISTINCT e_id AS prop_id FROM hits),
unchanged AS (SELECT * FROM rest_ex ANTI JOIN touched USING (prop_id)),
consumed AS (
  SELECT DISTINCT new_id AS prop_id FROM reinforce_pairs
  UNION SELECT new_id FROM ident_pairs
),
new_rows AS (SELECT * FROM rest_inc ANTI JOIN consumed USING (prop_id)),
outcomes AS (
  SELECT 'MERGED' AS revision_outcome, confidence FROM merged
  UNION ALL SELECT revision_outcome, confidence FROM hit_one
  UNION ALL SELECT 'UNCHANGED', confidence FROM unchanged
  UNION ALL SELECT 'NEW', confidence FROM new_rows
)
SELECT revision_outcome, count(*) AS n, round(sum(confidence), 6) AS sum_conf
FROM outcomes GROUP BY 1
"""


def q_consolidation(threshold: int = 5) -> str:
    """AbstractionPass oracle (mirror of consolidation.abstraction_pass over
    the fresh store, where no prior abstraction exists so the idempotency
    guard is pass-through): level-0 ACTIVE propositions group by resolved
    entity; groups with >= threshold distinct members produce one abstraction
    (confidence = round(avg member confidence, 6)) and retire their unpinned
    members to SUPERSEDED."""
    return base_ctes() + canonicalization_ctes() + edges_ctes() + f""",
pm AS MATERIALIZED (
  -- explicit DISTINCT over UNION ALL: inside this recursive-CTE plan,
  -- DuckDB's bare UNION left a handful of duplicate pairs un-deduplicated
  SELECT DISTINCT prop_id, rid FROM (
    SELECT prop_id, subj_id AS rid FROM resolved_props WHERE subj_id IS NOT NULL
    UNION ALL
    SELECT prop_id, obj_id FROM resolved_props WHERE obj_id IS NOT NULL
  )
),
grp AS (
  SELECT rid, count(DISTINCT prop_id) AS n_members
  FROM pm GROUP BY rid HAVING count(DISTINCT prop_id) >= {threshold}
),
elig AS (SELECT DISTINCT pm.prop_id FROM pm JOIN grp USING (rid)),
abs_rows AS (
  SELECT round(avg(p.confidence), 6) AS confidence
  FROM pm JOIN grp USING (rid) JOIN propositions p USING (prop_id)
  GROUP BY pm.rid
),
outcomes AS (
  SELECT 'ABSTRACTED' AS consolidation_outcome, confidence FROM abs_rows
  UNION ALL
  SELECT 'SUPERSEDED', p.confidence FROM propositions p JOIN elig USING (prop_id)
  UNION ALL
  SELECT 'UNCHANGED', p.confidence FROM propositions p ANTI JOIN elig USING (prop_id)
)
SELECT consolidation_outcome, count(*) AS n, round(sum(confidence), 6) AS sum_conf
FROM outcomes GROUP BY 1
"""


def q_retrieval_vector(
    text: str = "alice nguyen collaborates with project apollo",
    threshold: float = 0.9,
    top_k: int = 50,
) -> str:
    """RetrievalRouter VECTOR-mode oracle: letter-count-cosine similarity of
    each proposition's lowered text against the query text, threshold filter,
    (score desc, prop_id asc) order, topK clamp — mirror of router.retrieve."""
    emb_p = _char_emb_sql("lower(text)")
    emb_q = _char_emb_sql(f"'{text}'")
    return base_ctes() + f""",
scored AS (
  SELECT prop_id, text,
         round(list_cosine_similarity({emb_p}, {emb_q}), 6) AS score
  FROM propositions
)
SELECT prop_id, text, score FROM scored
WHERE score >= {threshold}
ORDER BY score DESC, prop_id ASC LIMIT {top_k}
"""


def q_incremental_trigger(trigger: int = 4) -> str:
    return base_ctes() + f"""
SELECT conv_id,
       0 AS window_start,
       cast(least(max(turn_idx) + 1, {WINDOW_SIZE}) as int) AS window_end
FROM transcripts
GROUP BY conv_id
HAVING max(turn_idx) + 1 >= {trigger}
"""


def q_prop_dup_clusters(
    threshold: float = 0.95,
    top_k: int = 10,
    use_lsh: bool = False,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> str:
    """findClusters + DuplicateCollectorStrategy oracle (mirror of
    operators/propcluster.py): letter-count-cosine pairs, anchor<other + topK
    per anchor, recursive-CTE connected components, survivor =
    max(confidence, reinforce_count, id).

    use_lsh=False mirrors the reference-exact candidate blocking
    ((context_id, predicate) equi-keys + canonical-length band);
    use_lsh=True mirrors the 100 TB path — banded-MinHash candidates over
    canonical-text shingles with the block key folded into the band key,
    exact cosine only within candidates (find_clusters(use_lsh=True))."""
    canon = duckdb_canonicalize_text_sql("text")
    emb = _char_emb_sql("canon")
    if use_lsh:
        rows = n_hashes // bands
        toks = "str_split(canon, ' ')"
        sh = (
            f"list_distinct([array_to_string({toks}[i:i+{shingle_n - 1}], ' ') "
            f"for i in range(1, greatest(len({toks}) - {shingle_n - 1}, 1) + 1)])"
        )
        sig_items = ", ".join(
            f"list_min([md5('{i}|' || s) for s in sh])" for i in range(n_hashes)
        )
        band_structs = ", ".join(
            "{'band': %d, 'key': md5(bkey %s)}"
            % (bi, "".join(f" || '|' || sig[{bi * rows + r + 1}]" for r in range(rows)))
            for bi in range(bands)
        )
        pair_source = f"""
lsh_sh AS (
  SELECT prop_id, md5(context_id || '|' || predicate) AS bkey, {sh} AS sh
  FROM canon_props
),
lsh_sig AS (SELECT prop_id, bkey, [{sig_items}] AS sig FROM lsh_sh),
lsh_banded AS MATERIALIZED (
  SELECT prop_id, unnest([{band_structs}], recursive := true)
  FROM lsh_sig
),
lsh_cand AS (
  SELECT DISTINCT a.prop_id AS a_pid, b.prop_id AS b_pid
  FROM lsh_banded a JOIN lsh_banded b
    ON a.band = b.band AND a.key = b.key AND a.prop_id < b.prop_id
),
raw_pairs AS (
  SELECT c.a_pid AS anchor_id, c.b_pid AS other_id,
         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
  FROM lsh_cand c
  JOIN emb_props a ON a.prop_id = c.a_pid
  JOIN emb_props b ON b.prop_id = c.b_pid
),"""
    else:
        pair_source = """
raw_pairs AS (
  SELECT a.prop_id AS anchor_id, b.prop_id AS other_id,
         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
  FROM emb_props a JOIN emb_props b
    ON a.context_id = b.context_id AND a.predicate = b.predicate
   AND a.band = b.band
   AND a.prop_id < b.prop_id
),"""
    return base_ctes() + f""",
canon_props AS MATERIALIZED (
  SELECT prop_id, context_id, predicate, confidence, reinforce_count,
         {canon} AS canon
  FROM propositions
),
emb_props AS MATERIALIZED (
  SELECT prop_id, context_id, predicate, confidence, reinforce_count,
         {emb} AS emb, length(canon) // 8 AS band
  FROM canon_props
),{pair_source}
pairs AS (
  SELECT anchor_id, other_id FROM (
    SELECT anchor_id, other_id,
           row_number() OVER (PARTITION BY anchor_id
                              ORDER BY cosine DESC, other_id ASC) AS rn
    FROM raw_pairs WHERE cosine >= {threshold}
  ) WHERE rn <= {top_k}
),
members AS (
  SELECT anchor_id AS pid FROM pairs UNION SELECT other_id FROM pairs
),
csym AS (
  SELECT anchor_id AS a, other_id AS b FROM pairs
  UNION SELECT other_id, anchor_id FROM pairs
),
creach(id, r) AS (
  SELECT pid, pid FROM members
  UNION
  SELECT s.b, creach.r FROM creach JOIN csym s ON s.a = creach.id
),
ccomps AS (
  SELECT id AS pid, min(r) AS component FROM creach GROUP BY id
),
cscored AS (
  SELECT c.pid, c.component, p.confidence, p.reinforce_count
  FROM ccomps c JOIN propositions p ON p.prop_id = c.pid
),
cranked AS (
  SELECT pid, component,
         row_number() OVER (PARTITION BY component
                            ORDER BY confidence DESC, reinforce_count DESC,
                                     pid DESC) AS rn,
         count(*) OVER (PARTITION BY component) AS cluster_size
  FROM cscored
),
csurv AS (
  SELECT component, pid AS survivor_id FROM cranked WHERE rn = 1
)
SELECT r.pid AS prop_id, s.survivor_id,
       cast(r.cluster_size AS bigint) AS cluster_size,
       CASE WHEN r.pid = s.survivor_id THEN 'SURVIVOR' ELSE 'DUPLICATE' END AS mark
FROM cranked r JOIN csurv s USING (component)
"""


def q_memory_consolidation(
    promotion: float = 0.6,
    similarity: float = 0.7,
    reinforce_above: float = 0.9,
    use_lsh: bool = False,
    n_hashes: int = 15,
    bands: int = 5,
) -> str:
    """MemoryConsolidator oracle (mirror of operators/memory.py over the
    prop_id-prefix session/long-term split in __spark_entry__): similarity =
    0.7 * word-Jaccard + 0.3 * entity-Jaccard; no entity relations are
    supplied, so the both-empty convention fixes the entity term at 0.5.

    use_lsh=False mirrors the shared-word inverted index with
    max_token_df=0.5 common-token exclusion; use_lsh=True mirrors the
    100 TB path — banded-MinHash candidates over the word sets
    (consolidate_session(use_lsh=True))."""
    sim_expr = """(CASE WHEN len(list_distinct(list_concat(s.words, e.words))) = 0
               THEN 1.0
               ELSE cast(len(list_intersect(s.words, e.words)) AS double)
                    / cast(len(list_distinct(list_concat(s.words, e.words))) AS double)
          END) * 0.7 + 0.5 * 0.3"""
    if use_lsh:
        rows = n_hashes // bands
        sig_items = ", ".join(
            f"list_min([md5('{i}|' || w) for w in words])" for i in range(n_hashes)
        )
        band_structs = ", ".join(
            "{'band': %d, 'key': md5(%s)}"
            % (bi, " || '|' || ".join(f"sig[{bi * rows + r + 1}]" for r in range(rows)))
            for bi in range(bands)
        )
        pair_ctes = f"""
mem_sig AS (
  SELECT prop_id, is_session, [{sig_items}] AS sig
  FROM mem_words WHERE len(words) > 0
),
mem_banded AS MATERIALIZED (
  SELECT prop_id, is_session, unnest([{band_structs}], recursive := true)
  FROM mem_sig
),
mem_cand AS (
  SELECT DISTINCT s.prop_id AS s_id, e.prop_id AS e_id
  FROM mem_banded s JOIN mem_banded e
    ON s.band = e.band AND s.key = e.key
  WHERE s.is_session AND NOT e.is_session
),
mem_pairs AS (
  SELECT c.s_id, c.e_id, s.confidence AS s_conf,
         {sim_expr} AS sim
  FROM mem_cand c
  JOIN mem_words s ON s.prop_id = c.s_id
  JOIN mem_words e ON e.prop_id = c.e_id
),"""
    else:
        pair_ctes = f"""
mem_lt_df AS (
  SELECT u.tok, count(*) AS df
  FROM mem_words w, unnest(w.words) AS u(tok)
  WHERE NOT w.is_session GROUP BY u.tok
),
mem_common AS (
  -- tokens in more than max_token_df (0.5) of the long-term store are
  -- excluded from candidate BLOCKING (mirror of memory.consolidate_session
  -- with max_token_df=0.5); they still count toward similarity.
  SELECT coalesce(list(tok), []) AS toks
  FROM mem_lt_df
  WHERE df > 0.5 * (SELECT count(*) FROM mem_words WHERE NOT is_session)
),
mem_pairs AS (
  SELECT s.prop_id AS s_id, e.prop_id AS e_id, s.confidence AS s_conf,
         {sim_expr} AS sim
  FROM mem_words s JOIN mem_words e
    ON s.is_session AND NOT e.is_session
  CROSS JOIN mem_common c
  WHERE len(list_filter(list_intersect(s.words, e.words),
            t -> NOT list_contains(c.toks, t))) > 0
),"""
    return base_ctes() + f""",
mem_words AS MATERIALIZED (
  SELECT prop_id, text, confidence,
         list_sort(list_distinct(list_filter(
           str_split_regex(lower(text), '\\s+'), w -> length(w) > 0
         ))) AS words,
         substr(prop_id, 1, 1) BETWEEN '0' AND '7' AS is_session
  FROM propositions
),{pair_ctes}
mem_best AS (
  SELECT s_id, e_id, sim FROM (
    SELECT s_id, e_id, sim,
           row_number() OVER (PARTITION BY s_id ORDER BY sim DESC, e_id ASC) AS rn
    FROM mem_pairs WHERE sim >= {similarity}
  ) WHERE rn = 1
),
mem_outcomes AS (
  SELECT s_id AS prop_id,
         CASE WHEN round(sim, 6) > {reinforce_above} THEN 'REINFORCED'
              ELSE 'MERGED' END AS outcome,
         e_id AS matched_id,
         round(sim, 6) AS similarity
  FROM mem_best
  UNION ALL
  SELECT w.prop_id,
         CASE WHEN w.confidence >= {promotion} THEN 'PROMOTED'
              ELSE 'DISCARDED' END AS outcome,
         NULL AS matched_id,
         NULL AS similarity
  FROM mem_words w
  WHERE w.is_session
    AND NOT EXISTS (SELECT 1 FROM mem_best b WHERE b.s_id = w.prop_id)
)
SELECT prop_id, outcome, matched_id, cast(similarity AS double) AS similarity
FROM mem_outcomes
"""


def q_retrieval_hybrid(
    text: str = "alice nguyen collaborates with project apollo",
    threshold: float = 0.9,
    top_k: int = 50,
    depth: int = 2,
) -> str:
    """RetrievalRouter HYBRID oracle: vector tier (letter-count cosine >=
    threshold) plus graph tier (props mentioning entities within ``depth``
    hops of the alice-nguyen component over the projected edges, minus the
    vector hits, -inf sentinel score), ordered (tier, score desc, prop_id)."""
    emb_p = _char_emb_sql("lower(text)")
    emb_q = _char_emb_sql(f"'{text}'")
    return base_ctes() + canonicalization_ctes() + edges_ctes() + f""",
rh_start AS (
  SELECT resolved_id AS eid FROM mapping
  WHERE norm_key = 'alice nguyen' AND type_key = 'person'
),
rh_und AS (
  SELECT source_id AS src, target_id AS dst FROM edges
  UNION SELECT target_id, source_id FROM edges
),
rh_walk(id, d) AS (
  SELECT eid, 0 FROM rh_start
  UNION
  SELECT u.dst, rh_walk.d + 1 FROM rh_walk JOIN rh_und u ON u.src = rh_walk.id
  WHERE rh_walk.d < {depth}
),
rh_reach AS (
  SELECT DISTINCT id FROM rh_walk
  WHERE id NOT IN (SELECT eid FROM rh_start)
),
rh_pe AS (
  SELECT prop_id, subj_id AS rid FROM resolved_props WHERE subj_id IS NOT NULL
  UNION
  SELECT prop_id, obj_id FROM resolved_props WHERE obj_id IS NOT NULL
),
rh_vec AS (
  SELECT prop_id, tier, score FROM (
    SELECT prop_id, 0 AS tier,
           round(list_cosine_similarity({emb_p}, {emb_q}), 6) AS score
    FROM propositions
  ) WHERE score >= {threshold}
),
rh_graph AS (
  SELECT DISTINCT pe.prop_id, 1 AS tier, CAST('-infinity' AS DOUBLE) AS score
  FROM rh_pe pe JOIN rh_reach r ON pe.rid = r.id
  WHERE pe.prop_id NOT IN (SELECT prop_id FROM rh_vec)
)
SELECT prop_id, tier, score FROM (
  SELECT * FROM rh_vec UNION ALL SELECT * FROM rh_graph
)
ORDER BY tier ASC, score DESC, prop_id ASC
LIMIT {top_k}
"""


def q_reconciler(min_confidence: float = DEFAULT_MIN_CONFIDENCE) -> str:
    """Reconciler oracle (mirror of projection.reconcile_edges over the
    conv-id split in __spark_entry__): per-batch propositions resolved
    against the GLOBAL mapping, classified, projected to edges; the incoming
    batch's edge_refs that already exist in the store read ADOPTED."""
    nk_s = duckdb_norm_key_sql("p.subj_span")
    nk_o = duckdb_norm_key_sql("p.obj_span")
    return base_ctes() + canonicalization_ctes() + f""",
rc_props AS MATERIALIZED (
  SELECT case when substr(conv_id, -1, 1) = '1' then 1 else 0 end AS batch,
         md5('{CTX}' || '|' || sentence) AS prop_id,
         sentence AS text,
         min(predicate) AS predicate,
         min(subj_span) AS subj_span,
         min(obj_span) AS obj_span,
         min(subj_type) AS subj_type,
         min(obj_type) AS obj_type,
         round(least(min(confidence) * (1 + 0.3 * (count(*) - 1)), 0.99), 6) AS confidence
  FROM typed_triples GROUP BY 1, sentence
),
rc_resolved AS (
  SELECT p.*, ms.resolved_id AS subj_id, mo.resolved_id AS obj_id,
         r.subject_type AS r_subj_type, r.object_type AS r_obj_type
  FROM rc_props p
  LEFT JOIN mapping ms ON ms.norm_key = {nk_s} AND ms.type_key = lower(p.subj_type)
  LEFT JOIN mapping mo ON mo.norm_key = {nk_o} AND mo.type_key = lower(p.obj_type)
  LEFT JOIN relations r ON r.predicate = p.predicate
),
rc_edge_rows AS (
  SELECT batch, subj_id AS source_id, obj_id AS target_id,
         regexp_replace(upper(trim(predicate)), '\\s+', '_', 'g') AS edge_type,
         confidence
  FROM rc_resolved
  WHERE confidence >= {min_confidence}
    AND subj_id IS NOT NULL AND obj_id IS NOT NULL
    AND NOT ((r_subj_type IS NOT NULL AND lower(r_subj_type) <> lower(subj_type))
          OR (r_obj_type IS NOT NULL AND lower(r_obj_type) <> lower(obj_type)))
),
rc_edges AS (
  SELECT batch, source_id, target_id, edge_type,
         round(max(confidence), 6) AS confidence,
         source_id || '-[' || edge_type || ']->' || target_id AS edge_ref
  FROM rc_edge_rows GROUP BY batch, source_id, target_id, edge_type
)
SELECT b.edge_ref, b.edge_type, b.confidence,
       case when e.edge_ref IS NOT NULL then 'ADOPTED' else 'PROJECTED' end AS lifecycle
FROM (SELECT * FROM rc_edges WHERE batch = 1) b
LEFT JOIN (SELECT DISTINCT edge_ref FROM rc_edges WHERE batch = 0) e
  ON e.edge_ref = b.edge_ref
"""


def q_kg_delta(min_confidence: float = DEFAULT_MIN_CONFIDENCE) -> str:
    """KnowledgeGraphDelta oracle (mirror of operators/delta.compute_delta over
    the conv-id split in __spark_entry__): one global canonicalization shared
    by store and batch; per-side entity sets via resolved mentions; batch
    entities match the store registry by id or by normalized canonical name +
    type (min existing id wins); batch edge_refs already in the store are
    merged relationships, unseen refs new."""
    nk_s = duckdb_norm_key_sql("p.subj_span")
    nk_o = duckdb_norm_key_sql("p.obj_span")
    nk_span = duckdb_norm_key_sql("t.span")
    nk_bn = duckdb_norm_key_sql("b.canonical_name")
    nk_sn = duckdb_norm_key_sql("s.canonical_name")
    return base_ctes() + canonicalization_ctes() + f""",
kd_map AS MATERIALIZED (SELECT * FROM mapping),
kd_ents AS MATERIALIZED (SELECT * FROM entities),
kd_side_ids AS MATERIALIZED (
  SELECT DISTINCT case when substr(t.conv_id, -1, 1) = '1' then 1 else 0 end AS batch,
         m.resolved_id
  FROM (
    SELECT conv_id, subj_span AS span, subj_type AS entity_type FROM typed_triples
    UNION ALL
    SELECT conv_id, obj_span, obj_type FROM typed_triples
  ) t
  JOIN kd_map m ON m.norm_key = {nk_span} AND m.type_key = lower(t.entity_type)
),
kd_batch_ents AS MATERIALIZED (
  SELECT e.* FROM kd_ents e
  JOIN (SELECT resolved_id FROM kd_side_ids WHERE batch = 1) i ON i.resolved_id = e.entity_id
),
kd_store_ents AS MATERIALIZED (
  SELECT e.* FROM kd_ents e
  JOIN (SELECT resolved_id FROM kd_side_ids WHERE batch = 0) i ON i.resolved_id = e.entity_id
),
kd_matches AS (
  SELECT entity_id, min(existing_id) AS existing_id FROM (
    SELECT b.entity_id, s.entity_id AS existing_id
    FROM kd_batch_ents b JOIN kd_store_ents s ON s.entity_id = b.entity_id
    UNION
    SELECT b.entity_id, s.entity_id
    FROM kd_batch_ents b JOIN kd_store_ents s
      ON {nk_sn} = {nk_bn} AND lower(s.entity_type) = lower(b.entity_type)
  ) GROUP BY entity_id
),
kd_props AS MATERIALIZED (
  SELECT case when substr(conv_id, -1, 1) = '1' then 1 else 0 end AS batch,
         sentence AS text,
         min(predicate) AS predicate,
         min(subj_span) AS subj_span,
         min(obj_span) AS obj_span,
         min(subj_type) AS subj_type,
         min(obj_type) AS obj_type,
         round(least(min(confidence) * (1 + 0.3 * (count(*) - 1)), 0.99), 6) AS confidence
  FROM typed_triples GROUP BY 1, sentence
),
kd_edges AS MATERIALIZED (
  SELECT batch, source_id, target_id, edge_type,
         source_id || '-[' || edge_type || ']->' || target_id AS edge_ref
  FROM (
    SELECT p.batch, ms.resolved_id AS source_id, mo.resolved_id AS target_id,
           regexp_replace(upper(trim(p.predicate)), '\\s+', '_', 'g') AS edge_type,
           p.confidence,
           r.subject_type AS r_subj_type, r.object_type AS r_obj_type,
           p.subj_type, p.obj_type
    FROM kd_props p
    LEFT JOIN kd_map ms ON ms.norm_key = {nk_s} AND ms.type_key = lower(p.subj_type)
    LEFT JOIN kd_map mo ON mo.norm_key = {nk_o} AND mo.type_key = lower(p.obj_type)
    LEFT JOIN relations r ON r.predicate = p.predicate
  )
  WHERE confidence >= {min_confidence}
    AND source_id IS NOT NULL AND target_id IS NOT NULL
    AND NOT ((r_subj_type IS NOT NULL AND lower(r_subj_type) <> lower(subj_type))
          OR (r_obj_type IS NOT NULL AND lower(r_obj_type) <> lower(obj_type)))
  GROUP BY batch, source_id, target_id, edge_type
),
kd_batch_edges AS (
  SELECT b.edge_ref, b.edge_type,
         (s.edge_ref IS NOT NULL) AS adopted
  FROM (SELECT DISTINCT edge_ref, edge_type FROM kd_edges WHERE batch = 1) b
  LEFT JOIN (SELECT DISTINCT edge_ref FROM kd_edges WHERE batch = 0) s
    ON s.edge_ref = b.edge_ref
)
SELECT 'CHUNK' AS category, chunk_id AS item_id, CAST(NULL AS VARCHAR) AS detail
FROM (SELECT DISTINCT chunk_id FROM typed_triples WHERE substr(conv_id, -1, 1) = '1')
UNION ALL
SELECT 'NEW_ENTITY', b.entity_id, b.canonical_name
FROM kd_batch_ents b
WHERE b.entity_id NOT IN (SELECT entity_id FROM kd_matches)
UNION ALL
SELECT 'MERGED_ENTITY', b.entity_id, m.existing_id
FROM kd_batch_ents b JOIN kd_matches m ON m.entity_id = b.entity_id
UNION ALL
SELECT 'NEW_RELATIONSHIP', edge_ref, edge_type FROM kd_batch_edges WHERE NOT adopted
UNION ALL
SELECT 'MERGED_RELATIONSHIP', edge_ref, edge_type FROM kd_batch_edges WHERE adopted
"""


def q_edge_descriptions() -> str:
    """Edge-description synthesis oracle (mirror of
    llm_projection.synthesis_requests + default_synthesize): per edge the
    top-5 supporting resolved propositions by (confidence desc, prop_id),
    description templated from the display names + top text, confidence =
    mean of the supporting confidences; an unsupported edge keeps its
    existing description with confidence 0."""
    return base_ctes() + canonicalization_ctes() + edges_ctes() + """,
ed_rows AS (
  SELECT source_id, target_id, edge_type, prop_id, text, confidence,
         row_number() OVER (PARTITION BY source_id, target_id, edge_type
                            ORDER BY confidence DESC, prop_id ASC) AS rn
  FROM (
    SELECT subj_id AS source_id, obj_id AS target_id,
           regexp_replace(upper(trim(predicate)), '\\s+', '_', 'g') AS edge_type,
           prop_id, text, confidence
    FROM resolved_props
    WHERE subj_id IS NOT NULL AND obj_id IS NOT NULL
  )
),
ed_top AS (
  SELECT source_id, target_id, edge_type,
         min(CASE WHEN rn = 1 THEN text END) AS top_text,
         round(avg(confidence), 6) AS conf,
         string_agg(prop_id, ',' ORDER BY rn) AS source_ids
  FROM ed_rows WHERE rn <= 5
  GROUP BY source_id, target_id, edge_type
)
SELECT e.edge_ref,
       CASE WHEN t.top_text IS NULL THEN coalesce(e.description, '')
            ELSE ns.canonical_name || ' ' || lower(replace(e.edge_type, '_', ' '))
                 || ' ' || nt.canonical_name || ': ' || t.top_text
       END AS description,
       CAST(CASE WHEN t.top_text IS NULL THEN 0.0 ELSE t.conf END AS DOUBLE) AS confidence,
       CASE WHEN t.top_text IS NULL THEN '' ELSE t.source_ids END AS source_ids
FROM edges e
LEFT JOIN ed_top t
  ON t.source_id = e.source_id AND t.target_id = e.target_id
 AND t.edge_type = e.edge_type
LEFT JOIN entities ns ON ns.entity_id = e.source_id
LEFT JOIN entities nt ON nt.entity_id = e.target_id
"""


def q_contrast(target_count: int = 5, pair_cap: int = 8) -> str:
    """Contrast-pass oracle (mirror of operators/contrast.py — the
    PropositionContraster contract with the deterministic default
    contraster): per-predicate top-``pair_cap`` rows per side, A x B pairs on
    a shared predicate with divergent objects, best ``target_count`` pairs by
    (min confidence desc, a_id, b_id), text-deduped; level = max over A∪B + 1,
    decay = mean of the pair's sources, confidence clamped."""
    lvl_case = (
        "CASE WHEN substr(prop_id, 1, 1) IN ('0','1','2','3') THEN 0 "
        "WHEN substr(prop_id, 1, 1) IN ('4','5','6','7') THEN 1 ELSE 2 END"
    )
    return base_ctes() + f""",
lvlprops AS (SELECT p.*, {lvl_case} AS level FROM propositions p),
ga AS (SELECT * FROM lvlprops WHERE contains(subj_span, 'Alice')),
gb AS (SELECT * FROM lvlprops WHERE contains(subj_span, 'Bob')),
sa AS (
  SELECT * FROM (
    SELECT prop_id, predicate, subj_span, obj_span, confidence, decay,
           row_number() OVER (PARTITION BY predicate
                              ORDER BY confidence DESC, prop_id) AS rn
    FROM ga) WHERE rn <= {pair_cap}
),
sb AS (
  SELECT * FROM (
    SELECT prop_id, predicate, subj_span, obj_span, confidence, decay,
           row_number() OVER (PARTITION BY predicate
                              ORDER BY confidence DESC, prop_id) AS rn
    FROM gb) WHERE rn <= {pair_cap}
),
pairs AS (
  SELECT sa.prop_id AS a_id, sb.prop_id AS b_id, sa.predicate,
         sa.subj_span AS a_subj, sa.obj_span AS a_obj,
         sb.subj_span AS b_subj, sb.obj_span AS b_obj,
         least(sa.confidence, sb.confidence) AS conf,
         (sa.decay + sb.decay) / 2.0 AS avg_decay
  FROM sa JOIN sb ON sa.predicate = sb.predicate AND sa.obj_span <> sb.obj_span
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY conf DESC, a_id, b_id) AS rnk
    FROM pairs) WHERE rnk <= {target_count}
),
contrasts AS (
  SELECT a_subj || ' ' || predicate || ' ' || a_obj || ' whereas ' ||
         b_subj || ' ' || predicate || ' ' || b_obj || '.' AS text,
         conf, avg_decay, a_id, b_id
  FROM best
),
cdedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY a_id, b_id) AS tr
    FROM contrasts) WHERE tr = 1
),
cscal AS (
  SELECT coalesce(max(level), 0) + 1 AS new_level
  FROM (SELECT level FROM ga UNION ALL SELECT level FROM gb)
)
SELECT md5('{CTX}' || '|' || d.text) AS prop_id,
       '{CTX}' AS context_id,
       d.text,
       round(least(greatest(d.conf, 0.0), 1.0), 6) AS confidence,
       round(least(greatest(d.avg_decay, 0.0), 1.0), 6) AS decay,
       'ACTIVE' AS status,
       (SELECT new_level FROM cscal) AS level,
       2 AS n_sources
FROM cdedup d
"""


def q_memory_search(
    query_text: str = "evidence alice collaborates with project apollo",
    as_of_epoch: int = 1735603200,
    content_revised_epoch: int = 1717200000,
    limit: int = 10,
) -> str:
    """Agent-memory RRF hybrid-search oracle (mirror of
    operators/agent_memory.memory_search — MemoryRetriever.kt:59-215):
    vector probe (letter-count cosine, topK=limit), keyword term-overlap
    probe over the top limit*10 by effective confidence, entity-expansion
    probe gated on thin direct hits, RRF 1/(60+rank) fusion, eager-id rows
    ranked inside probes but filtered from the final result."""
    from dice_spark.operators.agent_memory import (
        KEYWORD_POOL_FACTOR,
        MAX_EXPANSION_SEEDS,
        MIN_TOKEN_LEN,
        RELATED_POOL_FACTOR,
        RRF_K,
        tokenize,
    )

    tokens = tokenize(query_text)
    assert all(len(t) >= MIN_TOKEN_LEN and "'" not in t for t in tokens)
    overlap = " + ".join(
        f"CASE WHEN contains(lower(text), '{t}') THEN 1 ELSE 0 END" for t in tokens
    )
    emb_t = _char_emb_sql("lower(text)")
    emb_q = _char_emb_sql(f"'{query_text.lower()}'")

    def eff_sql(prefix: str = "") -> str:
        vf = f"floor(epoch({prefix}valid_from))"
        vt = f"floor(epoch({prefix}valid_to))"

        def decay_from(anchor: str) -> str:
            return (
                f"round({prefix}confidence * exp(-{prefix}decay * 2.0 * "
                f"greatest(floor(({as_of_epoch} - {anchor}) / 86400), 0)), 6)"
            )

        return f"""CASE
           WHEN {prefix}valid_from IS NOT NULL AND NOT ({vf} <= {as_of_epoch}
                AND ({prefix}valid_to IS NULL OR {as_of_epoch} < {vt})) THEN 0.0
           WHEN {prefix}valid_from IS NOT NULL AND {prefix}valid_to IS NOT NULL
                THEN {prefix}confidence
           WHEN {prefix}valid_from IS NOT NULL THEN {decay_from(vf)}
           ELSE {decay_from(str(content_revised_epoch))}
         END"""

    return base_ctes() + canonicalization_ctes() + edges_ctes() + f""",
mstore AS MATERIALIZED (
  SELECT prop_id, text, confidence, decay, valid_from, valid_to,
         subj_id, obj_id, round({eff_sql()}, 6) AS eff
  FROM resolved_props
),
meager AS (SELECT prop_id FROM mstore
           WHERE substr(prop_id, 1, 1) IN ('0','1','2','3','4','5','6','7')),
mvec AS (
  SELECT prop_id, row_number() OVER (ORDER BY score DESC, prop_id) AS rank
  FROM (
    SELECT prop_id, round(list_cosine_similarity({emb_t}, {emb_q}), 6) AS score
    FROM mstore
  ) WHERE NOT isnan(score) AND score >= 0.0
  ORDER BY score DESC, prop_id LIMIT {limit}
),
mpool AS (
  SELECT prop_id, text,
         row_number() OVER (ORDER BY eff DESC, prop_id) AS pool_rn
  FROM mstore ORDER BY eff DESC, prop_id LIMIT {limit * KEYWORD_POOL_FACTOR}
),
mkw AS (
  SELECT prop_id, row_number() OVER (ORDER BY ovl DESC, pool_rn) AS rank
  FROM (SELECT prop_id, pool_rn, ({overlap}) AS ovl FROM mpool)
  WHERE ovl > 0 ORDER BY ovl DESC, pool_rn LIMIT {limit}
),
mdirect AS (
  SELECT prop_id, rank, 0 AS tier FROM mvec
  UNION ALL SELECT prop_id, rank, 1 AS tier FROM mkw
),
mthin AS (
  SELECT count(DISTINCT prop_id) < {limit} AS thin
  FROM mdirect WHERE prop_id NOT IN (SELECT prop_id FROM meager)
),
mins AS (
  SELECT prop_id, min(tier * 1000000 + rank) AS ins
  FROM mdirect GROUP BY prop_id
),
mpe AS (
  SELECT prop_id, subj_id AS resolved_id, 0 AS midx FROM mstore
  WHERE subj_id IS NOT NULL AND subj_id <> ''
  UNION ALL
  SELECT prop_id, obj_id AS resolved_id, 1 AS midx FROM mstore
  WHERE obj_id IS NOT NULL AND obj_id <> ''
),
mseeds AS (
  SELECT resolved_id FROM (
    SELECT resolved_id,
           row_number() OVER (ORDER BY first_seen, resolved_id) AS srank
    FROM (
      SELECT pe.resolved_id, min(i.ins * 1000 + pe.midx) AS first_seen
      FROM mins i JOIN mpe pe ON pe.prop_id = i.prop_id
      GROUP BY pe.resolved_id
    )
  ) WHERE srank <= {MAX_EXPANSION_SEEDS} AND (SELECT thin FROM mthin)
),
mrelated AS (
  SELECT prop_id, row_number() OVER (ORDER BY eff DESC, prop_id) AS rank
  FROM mstore
  WHERE prop_id IN (SELECT DISTINCT prop_id FROM mpe
                    WHERE resolved_id IN (SELECT resolved_id FROM mseeds))
  ORDER BY eff DESC, prop_id LIMIT {limit * RELATED_POOL_FACTOR}
),
mall AS (
  SELECT prop_id, rank, tier FROM mdirect
  UNION ALL SELECT prop_id, rank, 2 AS tier FROM mrelated
),
mfused AS (
  SELECT prop_id,
         round(sum(1.0 / ({RRF_K} + rank)), 6) AS rrf,
         string_agg(DISTINCT (['vector','keyword','related'])[tier + 1], ','
                    ORDER BY (['vector','keyword','related'])[tier + 1]) AS sources,
         min(tier * 1000000 + rank) AS ins
  FROM mall GROUP BY prop_id
),
mkept AS (
  SELECT prop_id, rrf, sources,
         row_number() OVER (ORDER BY rrf DESC, ins) AS rank
  FROM mfused
  WHERE prop_id NOT IN (SELECT prop_id FROM meager)
  ORDER BY rrf DESC, ins LIMIT {limit}
)
SELECT k.rank, k.prop_id, s.text, k.sources, k.rrf
FROM mkept k JOIN mstore s ON s.prop_id = k.prop_id
"""


def q_oracle_answers() -> str:
    """Oracle.ask layered-answer oracle (mirror of operators/oracle_query.py
    — LlmOracle.kt:48-140): per fixed question, either the symbolic pass
    over the projected edge relation (bindings join, confident-negative on
    zero matches) or the proposition-similarity fallback (top-5 letter-count
    cosine, max-confidence, sorted grounding ids). The question -> plan parse
    is the SAME python helper both engines call at SQL-build time."""
    from dice_spark.operators.oracle_query import (
        MAX_BINDINGS,
        PROP_TOP_K,
        _edge_type,
        parse_question,
    )
    from dice_spark.synth import FIRST_NAMES, LAST_NAMES, RELATIONS

    relations = [r[0] for r in RELATIONS] + ["is allergic to"]
    entity_names = [f"{f} {l}" for f in FIRST_NAMES for l in LAST_NAMES]
    questions = [
        "Who collaborates with Alice Nguyen?",
        "Who is allergic to peanuts?",
        "Tell me about the Apollo initiative",
    ]
    neg_text = "No, I couldn''t find information about that."
    ctes = ["""
oe_ids AS (
  SELECT source_id, target_id, edge_type,
         list_sort(list(DISTINCT prop_id)) AS sids
  FROM (
    SELECT source_id, target_id, edge_type, prop_id,
           row_number() OVER (PARTITION BY source_id, target_id, edge_type
                              ORDER BY prop_id) AS rn
    FROM edge_rows
  ) WHERE rn <= 100
  GROUP BY source_id, target_id, edge_type
)"""]
    finals = []
    for i, q in enumerate(questions):
        pred, bound = parse_question(q, relations, entity_names)
        if pred is not None:
            etype = _edge_type(pred)
            binding = ""
            if bound:
                ors = " OR ".join(
                    f"ns.canonical_name = '{n}' OR nt.canonical_name = '{n}'"
                    for n in bound
                )
                binding = f" AND ({ors})"
            render = f"sn || ' {pred} ' || tn"
            ctes.append(f"""
q{i}m AS (
  SELECT e.edge_ref, ns.canonical_name AS sn, nt.canonical_name AS tn, i2.sids
  FROM edges e
  JOIN entities ns ON ns.entity_id = e.source_id
  JOIN entities nt ON nt.entity_id = e.target_id
  JOIN oe_ids i2 ON i2.source_id = e.source_id AND i2.target_id = e.target_id
                AND i2.edge_type = e.edge_type
  WHERE e.edge_type = '{etype}'{binding}
  ORDER BY e.edge_ref LIMIT {MAX_BINDINGS}
),
q{i} AS (
  SELECT '{q}' AS question,
         CASE WHEN count(*) > 0
              THEN string_agg({render}, '; ' ORDER BY {render})
              ELSE '{neg_text}' END AS answer,
         cast(CASE WHEN count(*) > 0 THEN 0.9 ELSE 0.8 END AS double) AS confidence,
         count(*) = 0 AS negative,
         'PROLOG' AS source,
         cast(CASE WHEN count(*) > 0
              THEN len(flatten(list(sids))) ELSE 0 END AS int) AS n_grounding,
         CASE WHEN count(*) > 0
              THEN array_to_string(list_sort(flatten(list(sids))), ',')
              ELSE '' END AS grounding
  FROM q{i}m
)""")
        else:
            emb_t = _char_emb_sql("lower(text)")
            emb_q = _char_emb_sql(f"'{q.lower()}'")
            ctes.append(f"""
q{i}t AS (
  SELECT prop_id, text, confidence,
         row_number() OVER (ORDER BY score DESC, prop_id) AS rn
  FROM (
    SELECT prop_id, text, confidence,
           round(list_cosine_similarity({emb_t}, {emb_q}), 6) AS score
    FROM resolved_props
  ) WHERE NOT isnan(score) AND score >= 0.0
  ORDER BY score DESC, prop_id LIMIT {PROP_TOP_K}
),
q{i} AS (
  SELECT '{q}' AS question,
         CASE WHEN count(*) > 0
              THEN max(CASE WHEN rn = 1 THEN text END)
              ELSE 'I don''t have enough information to answer: {q}' END AS answer,
         cast(CASE WHEN count(*) > 0
              THEN round(coalesce(max(confidence), 0.7), 6)
              ELSE 0.0 END AS double) AS confidence,
         count(*) = 0 AS negative,
         CASE WHEN count(*) > 0 THEN 'PROPOSITIONS' ELSE 'NONE' END AS source,
         cast(count(*) AS int) AS n_grounding,
         coalesce(string_agg(prop_id, ',' ORDER BY prop_id), '') AS grounding
  FROM q{i}t
)""")
        finals.append(f"SELECT * FROM q{i}")
    return (
        base_ctes()
        + canonicalization_ctes()
        + edges_ctes()
        + ","
        + ",".join(ctes)
        + "\n"
        + " UNION ALL ".join(finals)
    )


def q_knowledge_types(n_declared: int = 5) -> str:
    """Knowledge-type classification oracle (mirror of
    functions/knowledge_type.py — RelationBasedKnowledgeTypeClassifier first-
    contained-predicate ladder over the first ``n_declared`` declared
    relations, HeuristicKnowledgeTypeClassifier fallback)."""
    from dice_spark.synth import RELATION_KNOWLEDGE_TYPES

    declared = RELATION_KNOWLEDGE_TYPES[:n_declared]
    ladder = " ".join(
        f"WHEN contains(lower(text), '{p.lower()}') THEN '{k}'" for p, k in declared
    )
    heuristic = (
        "CASE WHEN decay > 0.5 THEN 'EPISODIC' "
        "WHEN confidence > 0.7 AND decay < 0.3 THEN 'SEMANTIC' "
        "ELSE 'WORKING' END"
    )
    return base_ctes() + f"""
SELECT prop_id,
       CASE {ladder} ELSE {heuristic} END AS knowledge_type,
       {heuristic} AS heuristic_type
FROM propositions
"""


def q_collector_run(
    as_of: str = "2024-12-31 00:00:00",
    content_revised_epoch: int = 1717200000,
    retire_below: float = 0.5,
) -> str:
    """CollectorRun header oracle (mirror of sweep.collector_run_header over
    sweep.decay_sweep records): one summary row per run — the dry run marks
    (n_marked = eligible, n_swept = 0), the applied run sweeps. Eligibility
    mirrors decay_sweep: unpinned ACTIVE with effective confidence below the
    threshold (every synthetic proposition is minted ACTIVE/unpinned)."""
    as_of_epoch = f"floor(epoch(timestamp '{as_of}'))"

    def decay_from(anchor: str) -> str:
        return (
            f"round(confidence * exp(-decay * 2.0 * "
            f"greatest(floor(({as_of_epoch} - {anchor}) / 86400), 0)), 6)"
        )

    vf, vt = "floor(epoch(valid_from))", "floor(epoch(valid_to))"
    return base_ctes() + f""",
cr_eff AS (
  SELECT prop_id,
         CASE
           WHEN valid_from IS NOT NULL AND NOT ({vf} <= {as_of_epoch}
                AND (valid_to IS NULL OR {as_of_epoch} < {vt})) THEN 0.0
           WHEN valid_from IS NOT NULL AND valid_to IS NOT NULL THEN confidence
           WHEN valid_from IS NOT NULL THEN {decay_from(vf)}
           ELSE {decay_from(str(content_revised_epoch))}
         END AS eff_conf
  FROM propositions
),
cr_marked AS (SELECT prop_id FROM cr_eff WHERE eff_conf < {retire_below})
SELECT 'dry-1' AS run_id, true AS dry_run,
       timestamp '{as_of}' AS as_of,
       count(*) AS n_records, count(*) AS n_marked, cast(0 AS bigint) AS n_swept
FROM cr_marked
UNION ALL
SELECT 'wet-1', false, timestamp '{as_of}',
       count(*), cast(0 AS bigint), count(*)
FROM cr_marked
"""


def q_revision_fast_path(
    auto_merge: float = 0.95, cand_floor: float = 0.5
) -> str:
    """Revision vector-fast-path oracle (mirror of revision.vector_fast_path
    — LlmPropositionReviser.kt:306-339): letter-count cosine over
    canonicalized pair texts, bucketed AUTO_IDENTICAL / CLASSIFY / DROPPED."""
    canon_e = duckdb_canonicalize_text_sql("existing_text")
    canon_n = duckdb_canonicalize_text_sql("new_text")
    emb_e = _char_emb_sql("ce")
    emb_n = _char_emb_sql("cn")
    return base_ctes() + f""",
rfp_pairs AS (
  SELECT prop_id AS existing_id, text AS existing_text,
         'punct' AS variant, text || ' !!' AS new_text FROM propositions
  UNION ALL
  SELECT prop_id, text, 'padded', text || ' and nothing else matters today'
  FROM propositions
  UNION ALL
  SELECT prop_id, text, 'unrelated', 'zzz qqq xxx' FROM propositions
),
rfp_canon AS (
  SELECT existing_id, variant, {canon_e} AS ce, {canon_n} AS cn FROM rfp_pairs
),
rfp_cos AS (
  SELECT existing_id, variant,
         round(list_cosine_similarity({emb_e}, {emb_n}), 6) AS cos
  FROM rfp_canon
)
SELECT existing_id, variant,
       CASE WHEN cos >= {auto_merge} THEN 'AUTO_IDENTICAL'
            WHEN cos >= {cand_floor} THEN 'CLASSIFY'
            ELSE 'DROPPED' END AS bucket,
       CASE WHEN cos >= {auto_merge} THEN cos END AS cosine
FROM rfp_cos
"""


def q_generalization() -> str:
    """GENERALIZES revision oracle (mirror of revision.revise with
    classify_pairs_udf(detect_generalizes=True)): incoming abstractions are
    the hex-0 slice's sentences with the final word dropped (strict token
    subsets); priority identical > contradictory > generalizes > similar per
    incoming; GENERALIZED incoming stores as-is, covered existing stays
    UNCHANGED and unreinforced."""
    canon = duckdb_canonicalize_text_sql("text")
    toks = (
        "list_distinct(list_filter(str_split_regex("
        "regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+'), t -> t <> ''))"
    )
    neg = "regexp_matches(lower(text), '\\b(not|never|no longer)\\b')"
    return base_ctes() + f""",
gex AS MATERIALIZED (
  SELECT prop_id, text, subj_span, obj_span, confidence, decay,
         {canon} AS canon, {toks} AS toks, {neg} AS neg
  FROM propositions
),
ginc AS MATERIALIZED (
  SELECT md5('{CTX}' || '|gen|' || text) AS prop_id, text, subj_span,
         confidence, decay, {canon} AS canon, {toks} AS toks, {neg} AS neg
  FROM (
    SELECT text, min(subj_span) AS subj_span,
           round(min(confidence), 6) AS confidence,
           round(min(decay), 6) AS decay
    FROM (
      SELECT regexp_replace(text, '\\s+\\S+\\.$', '.') AS text,
             subj_span, confidence, decay
      FROM propositions WHERE substr(prop_id, 1, 1) = '0'
    ) WHERE length(text) > 1
    GROUP BY text
  )
),
gpairs AS MATERIALIZED (
  SELECT DISTINCT e.prop_id AS existing_id, i.prop_id AS new_id
  FROM (SELECT prop_id, lower(subj_span) AS k FROM gex
        UNION ALL SELECT prop_id, lower(obj_span) FROM gex) e
  JOIN (SELECT prop_id, lower(subj_span) AS k FROM ginc
        WHERE subj_span IS NOT NULL) i ON e.k = i.k
),
gcls AS MATERIALIZED (
  SELECT existing_id, new_id,
         CASE WHEN sim >= 0.5 AND neg_a <> neg_b THEN 'CONTRADICTORY'
              WHEN sim >= 0.999 THEN 'IDENTICAL'
              WHEN nb > 0 AND ib = nb AND na > nb AND NOT (neg_a <> neg_b)
                   THEN 'GENERALIZES'
              WHEN sim >= 0.5 THEN 'SIMILAR'
              ELSE 'UNRELATED' END AS relation,
         round(sim, 6) AS similarity
  FROM (
    SELECT p.existing_id, p.new_id,
           len(list_intersect(a.toks, b.toks)) AS ib,
           len(a.toks) AS na, len(b.toks) AS nb,
           len(list_intersect(a.toks, b.toks))
             / greatest(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)), 1)::double AS sim,
           a.neg AS neg_a, b.neg AS neg_b
    FROM gpairs p
    JOIN gex a ON a.prop_id = p.existing_id
    JOIN ginc b ON b.prop_id = p.new_id
  )
),
gmerged AS (
  SELECT e.prop_id AS e_id, i.prop_id AS i_id,
         round(least(e.confidence + 0.3 * i.confidence, 0.99), 6) AS confidence
  FROM gex e JOIN ginc i ON e.canon = i.canon
),
grest_ex AS (SELECT * FROM gex ANTI JOIN (SELECT e_id AS prop_id FROM gmerged) USING (prop_id)),
grest_inc AS (SELECT * FROM ginc ANTI JOIN (SELECT i_id AS prop_id FROM gmerged) USING (prop_id)),
gident_one AS (
  SELECT * FROM (
    SELECT c.*, row_number() OVER (PARTITION BY new_id ORDER BY existing_id) AS irn
    FROM gcls c WHERE relation = 'IDENTICAL'
  ) WHERE irn = 1
),
ggen_inc AS (
  SELECT DISTINCT new_id FROM gcls WHERE relation = 'GENERALIZES'
    AND new_id NOT IN (SELECT new_id FROM gident_one)
    AND new_id NOT IN (SELECT new_id FROM gcls WHERE relation = 'CONTRADICTORY')
),
gident_pairs AS (
  SELECT c.existing_id, c.new_id, i.confidence AS i_conf
  FROM gident_one c
  JOIN grest_ex e ON e.prop_id = c.existing_id
  JOIN grest_inc i ON i.prop_id = c.new_id
),
gident_m AS (
  SELECT p.existing_id AS e_id, min(p.new_id) AS hit,
         round(least(any_value(e.confidence) + 0.3 * sum(p.i_conf), 0.99), 6) AS confidence
  FROM gident_pairs p JOIN grest_ex e ON e.prop_id = p.existing_id
  GROUP BY p.existing_id
),
greinforce_pairs AS (
  SELECT c.existing_id, c.new_id, i.confidence AS i_conf
  FROM gcls c
  JOIN grest_ex e ON e.prop_id = c.existing_id
  JOIN grest_inc i ON i.prop_id = c.new_id
  WHERE c.relation = 'SIMILAR' AND c.similarity >= 0.7
    AND c.new_id NOT IN (SELECT new_id FROM gident_one)
    AND c.new_id NOT IN (SELECT new_id FROM ggen_inc)
),
greinforced AS (
  SELECT p.existing_id AS e_id, min(p.new_id) AS hit,
         round(least(any_value(e.confidence) + 0.1 * sum(p.i_conf), 0.95), 6) AS confidence
  FROM greinforce_pairs p JOIN grest_ex e ON e.prop_id = p.existing_id
  GROUP BY p.existing_id
),
gcontradicted AS (
  SELECT e.prop_id AS e_id, min(c.new_id) AS hit,
         round(greatest(any_value(e.confidence) * 0.3, 0.05), 6) AS confidence
  FROM gcls c JOIN grest_ex e ON e.prop_id = c.existing_id
  JOIN grest_inc i ON i.prop_id = c.new_id
  WHERE c.relation = 'CONTRADICTORY'
    AND c.new_id NOT IN (SELECT new_id FROM gident_one)
  GROUP BY e.prop_id
),
ghits AS (
  SELECT e_id, 1 AS rank, hit, confidence, 'MERGED' AS revision_outcome FROM gident_m
  UNION ALL SELECT e_id, 2, hit, confidence, 'CONTRADICTED' FROM gcontradicted
  UNION ALL SELECT e_id, 3, hit, confidence, 'REINFORCED' FROM greinforced
),
ghit_one AS (
  SELECT * FROM (
    SELECT h.*, row_number() OVER (PARTITION BY e_id ORDER BY rank, hit) AS hrn
    FROM ghits h
  ) WHERE hrn = 1
),
gtouched AS (SELECT DISTINCT e_id AS prop_id FROM ghits),
gunchanged AS (SELECT * FROM grest_ex ANTI JOIN gtouched USING (prop_id)),
gconsumed AS (
  SELECT DISTINCT new_id AS prop_id FROM greinforce_pairs
  UNION SELECT new_id FROM gident_pairs
),
gnew AS (
  SELECT r.*, CASE WHEN r.prop_id IN (SELECT new_id FROM ggen_inc)
                   THEN 'GENERALIZED' ELSE 'NEW' END AS revision_outcome
  FROM (SELECT * FROM grest_inc ANTI JOIN gconsumed USING (prop_id)) r
),
goutcomes AS (
  SELECT 'MERGED' AS revision_outcome, confidence FROM gmerged
  UNION ALL SELECT revision_outcome, confidence FROM ghit_one
  UNION ALL SELECT 'UNCHANGED', confidence FROM gunchanged
  UNION ALL SELECT revision_outcome, confidence FROM gnew
)
SELECT revision_outcome, count(*) AS n, round(sum(confidence), 6) AS sum_conf
FROM goutcomes GROUP BY 1
"""
