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


def base_ctes() -> str:
    """transcripts -> winturns -> chunks -> triples -> propositions."""
    pos = "strpos(lower(w.text), r.predicate)"
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
  SELECT conv_id, window_id,
         min(turn_idx) AS window_start,
         max(turn_idx) + 1 AS window_end,
         count(*) AS n_turns,
         string_agg(role || ': ' || text, chr(10)||chr(10) ORDER BY turn_idx) AS text
  FROM winturns GROUP BY conv_id, window_id
),
matched AS (
  SELECT w.conv_id, w.window_id, w.turn_idx, w.text AS sentence,
         r.predicate, r.priority, {pos} AS pos,
         row_number() OVER (
           PARTITION BY w.conv_id, w.window_id, w.turn_idx ORDER BY r.priority
         ) AS rn
  FROM winturns w JOIN relations r ON {pos} > 0
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
         count(*) - 1 AS reinforce_count
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


def q_propositions() -> str:
    return base_ctes() + """
SELECT prop_id, context_id, text, predicate, subj_span, obj_span, subj_type,
       obj_type, confidence, decay, reinforce_count
FROM propositions
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
  SELECT c.* FROM cand c
  LEFT JOIN sym_e d ON d.src = c.source AND d.dst = c.target
  WHERE d.src IS NULL
)
SELECT source, target,
       string_agg(DISTINCT via, ',' ORDER BY via) AS connecting
FROM indirect GROUP BY source, target
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


def q_incremental_trigger(trigger: int = 4) -> str:
    return base_ctes() + f"""
SELECT conv_id,
       0 AS window_start,
       cast(least(max(turn_idx) + 1, {WINDOW_SIZE}) as int) AS window_end
FROM transcripts
GROUP BY conv_id
HAVING max(turn_idx) + 1 >= {trigger}
"""
