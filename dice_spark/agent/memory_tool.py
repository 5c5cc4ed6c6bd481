"""Memory — the agent tool facade over the hybrid retriever.

Semantics match agent/Memory.kt (/root/reference/dice/src/main/kotlin/com/
embabel/dice/agent/Memory.kt:113-465) and the MemoryRetriever rendering
(MemoryRetriever.kt:180-265):

* immutable builder chain (for_context / with_* / narrowed_by — each returns
  a new Memory, Memory.kt:144-370);
* base_query (Memory.kt:185-196): contextId + minEffectiveConfidence +
  statuses={ACTIVE} applied FIRST, then ``narrowed_by`` — so a consumer can
  still explicitly widen the status set via the narrowing operator, but the
  default never leaks STALE/SUPERSEDED/CONTRADICTED into LLM context;
* eager preload (Memory.kt:198-235): about-search + topic-search +
  structured-query memories merged in that order, deduplicated by id; their
  ids are excluded from every later tool call so the LLM always receives
  new information;
* contribution() (Memory.kt:240-262): the LlmReference system-prompt block
  with the memory count, numbered key memories, and the
  "[N more retrievable…]" tail;
* call(input) (Memory.kt:394-420): JSON input, ``query`` canonical with
  ``topic`` as silent fallback, blank/invalid JSON -> {} (list-all mode),
  ``limit`` defaulting to default_limit (list-all coerces to at least
  default_limit);
* result rendering (MemoryRetriever.kt:180-265): "Memories about 'q' (n):"
  header, "- [probe,tags] text" lines with capped "— source: …" and
  "— entities: name (id); …" suffixes, and the no-match / no-memories
  nudge messages.

The heavy lifting (probes, RRF fusion, entity expansion) is the
already-driver-checked ``operators/agent_memory.py``; this module is the
deployment scaffolding: scope enforcement, eager dedup, prompt/tool text.
Driver-side collects here are bounded by ``limit`` — the facade renders a
tool result for an LLM, it is not a data-plane operator.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dice_spark.operators.agent_memory import memory_list_all, memory_search
from dice_spark.operators.propquery import PropQuery, apply_prop_query, find_similar_with_scores

NAME = "memory"
DEFAULT_MIN_CONFIDENCE = 0.5  # Memory.kt companion
DEFAULT_LIMIT = 10

# MemoryRetriever.kt display caps
MAX_SOURCES_PER_PROP = 2
MAX_SOURCE_CHARS = 80
MAX_ENTITIES_PER_PROP = 4
MAX_ENTITY_CHARS = 40

QueryTransform = Callable[[PropQuery], PropQuery]
ProvenanceResolver = Callable[[list[str]], dict[str, list[str]]]


@dataclass(frozen=True)
class Memory:
    """Context-scoped agent memory tool. Build with ``Memory.for_context(
    ctx).with_store(props)`` then chain ``with_*`` configurators."""

    context_id: str
    props: DataFrame | None = None
    prop_entities: DataFrame | None = None
    as_of: str | None = None  # effective-confidence anchor (None = now)
    min_confidence: float = DEFAULT_MIN_CONFIDENCE
    default_limit: int = DEFAULT_LIMIT
    topic: str = "the user & context"
    use_when: str | None = None
    narrowed: QueryTransform | None = None
    eager_query: QueryTransform | None = None
    eager_topic_search: int | None = None
    eager_text_search: tuple[str, int] | None = None
    provenance_resolver: ProvenanceResolver | None = None
    _eager_cache: list = field(default=None, compare=False, repr=False)

    # -- builder chain (Memory.kt:144-370) --------------------------------

    @staticmethod
    def for_context(context_id: str) -> "Memory":
        return Memory(context_id=context_id)

    def with_store(self, props: DataFrame, prop_entities: DataFrame | None = None) -> "Memory":
        """withRepository (Memory.kt:452-459): the proposition table (and the
        optional prop->entity mention relation used for entity handles)."""
        return replace(self, props=props, prop_entities=prop_entities, _eager_cache=None)

    def with_topic(self, topic: str) -> "Memory":
        return replace(self, topic=topic, _eager_cache=None)

    def with_use_when(self, use_when: str) -> "Memory":
        return replace(self, use_when=use_when)

    def with_min_confidence(self, min_confidence: float) -> "Memory":
        if not 0.0 <= min_confidence <= 1.0:
            raise ValueError("minConfidence must be between 0.0 and 1.0")
        return replace(self, min_confidence=min_confidence, _eager_cache=None)

    def with_default_limit(self, limit: int) -> "Memory":
        if limit <= 0:
            raise ValueError("limit must be positive")
        return replace(self, default_limit=limit)

    def with_as_of(self, as_of: str) -> "Memory":
        """Deterministic effective-confidence anchor (tests/replays)."""
        return replace(self, as_of=as_of, _eager_cache=None)

    def narrowed_by(self, fn: QueryTransform) -> "Memory":
        """Each call REPLACES the previous narrowing (Memory.kt:178-181)."""
        return replace(self, narrowed=fn, _eager_cache=None)

    def with_eager_query(self, fn: QueryTransform) -> "Memory":
        return replace(self, eager_query=fn, _eager_cache=None)

    def with_eager_topic_search(self, limit: int = DEFAULT_LIMIT) -> "Memory":
        if limit <= 0:
            raise ValueError("limit must be positive")
        return replace(self, eager_topic_search=limit, _eager_cache=None)

    def with_eager_search_about(self, query: str, top_k: int) -> "Memory":
        if top_k <= 0:
            raise ValueError("topK must be positive")
        return replace(self, eager_text_search=(query, top_k), _eager_cache=None)

    def with_provenance(self, resolver: ProvenanceResolver) -> "Memory":
        return replace(self, provenance_resolver=resolver)

    # -- scope (Memory.kt:185-196) ----------------------------------------

    def base_query(self) -> PropQuery:
        base = PropQuery(
            context_id=self.context_id,
            min_effective_confidence=self.min_confidence,
            effective_confidence_as_of=self.as_of,
            statuses=["ACTIVE"],
        )
        return self.narrowed(base) if self.narrowed else base

    def _as_of_col(self) -> Column:
        return F.to_timestamp(F.lit(self.as_of)) if self.as_of else F.current_timestamp()

    def _scoped(self) -> DataFrame:
        return apply_prop_query(self.props, self.base_query(), self.prop_entities)

    # -- eager preload (Memory.kt:198-235) --------------------------------

    def _load_eager(self) -> list:
        """(prop_id, text) rows: about + topic + query, deduped, in order."""
        if self._eager_cache is not None:
            return self._eager_cache
        base, rows = self.base_query(), []
        if self.eager_text_search is not None:
            q, k = self.eager_text_search
            rows += (
                find_similar_with_scores(self.props, q, threshold=0.0, top_k=k,
                                         query=base, prop_entities=self.prop_entities)
                .select("prop_id", "text").collect()
            )
        if self.eager_topic_search is not None:
            rows += (
                find_similar_with_scores(self.props, self.topic, threshold=0.0,
                                         top_k=self.eager_topic_search,
                                         query=base, prop_entities=self.prop_entities)
                .select("prop_id", "text").collect()
            )
        if self.eager_query is not None:
            rows += (
                apply_prop_query(self.props, self.eager_query(base), self.prop_entities)
                .select("prop_id", "text").collect()
            )
        seen, out = set(), []
        for r in rows:
            if r["prop_id"] not in seen:
                seen.add(r["prop_id"])
                out.append(r)
        object.__setattr__(self, "_eager_cache", out)
        return out

    def eager_proposition_ids(self) -> set[str]:
        return {r["prop_id"] for r in self._load_eager()}

    # -- LlmReference surface (Memory.kt:238-262) --------------------------

    @property
    def description(self) -> str:
        return f"Memories about {self.topic}"

    def notes(self) -> str:
        use_when = self.use_when or (
            f"whenever you need to recall information about {self.topic}"
        )
        return f"Use when: {use_when}"

    def contribution(self) -> str:
        memory_count = self._scoped().count()
        eager = self._load_eager()
        lines = [f"Reference: {NAME}",
                 f"Description: {self.description}. {memory_count} memories available."]
        if eager:
            lines += ["", f"Key memories about {self.topic}:"]
            lines += [f"{i + 1}. {r['text']}" for i, r in enumerate(eager)]
            if len(eager) < memory_count:
                lines.append(
                    f"[{memory_count - len(eager)} more retrievable via the {NAME} tool]"
                )
        lines += ["", f"Notes: {self.notes()}"]
        return "\n".join(lines).rstrip()

    # -- Tool surface (Memory.kt:374-420) ----------------------------------

    def tool_description(self) -> str:
        n = self._scoped().count()
        status = (
            "No memories stored yet." if n == 0
            else "1 memory available." if n == 1
            else f"{n} memories available."
        )
        use_when = self.use_when or (
            f"whenever you need to recall information about {self.topic}"
        )
        return (
            f"Search memories about {self.topic} via hybrid semantic + keyword "
            f"retrieval. {status}\nUse when: {use_when}. If a query comes back "
            "empty or unconvincing, retry with\ndifferent wording or a broader "
            "query before concluding nothing is known."
        )

    def definition(self) -> dict:
        """Tool.Definition parity: name, description, input schema."""
        return {
            "name": NAME,
            "description": self.tool_description(),
            "inputSchema": {
                "type": "object",
                "properties": {
                    "query": {"type": "string"},
                    "limit": {"type": "integer"},
                },
                "required": [],
            },
        }

    @staticmethod
    def parse_input(input_str: str) -> dict:
        """Blank or invalid JSON -> {} (Memory.kt:412-420)."""
        if not input_str or not input_str.strip():
            return {}
        try:
            parsed = json.loads(input_str)
            return parsed if isinstance(parsed, dict) else {}
        except (json.JSONDecodeError, ValueError):
            return {}

    def call(self, input_str: str = "") -> str:
        params = self.parse_input(input_str)
        query = params.get("query") or params.get("topic")  # silent fallback
        query = query.strip() if isinstance(query, str) and query.strip() else None
        limit = params["limit"] if isinstance(params.get("limit"), (int, float)) else None
        limit = int(limit) if limit is not None else self.default_limit
        eager_ids = sorted(self.eager_proposition_ids())
        base, as_of = self.base_query(), self._as_of_col()
        if query is None:
            rows = memory_list_all(
                self.props, as_of, eager_ids=eager_ids,
                limit=max(limit, self.default_limit), base=base,
                prop_entities=self.prop_entities,
            ).collect()
            if not rows:
                return ("No additional memories beyond those already provided."
                        if eager_ids else "No memories stored yet.")
            lines = [f"All memories ({len(rows)}):"]
            suffix = self._suffixes([r["prop_id"] for r in rows])
            lines += [f"- {r['text']}{suffix.get(r['prop_id'], '')}" for r in rows]
            return "\n".join(lines)
        hits = memory_search(
            self.props, query, as_of, prop_entities=self.prop_entities,
            eager_ids=eager_ids, limit=limit, base=base,
        ).collect()
        if not hits:
            total = self._scoped().count()
            tail = (f" — {total} memories are stored about {self.topic}."
                    if total > 0 else ".")
            return f"No memories matched '{query}'. Try rephrasing or a broader query{tail}"
        lines = [f"Memories about '{query}' ({len(hits)}):"]
        suffix = self._suffixes([h["prop_id"] for h in hits])
        lines += [f"- [{h['sources']}] {h['text']}{suffix.get(h['prop_id'], '')}"
                  for h in hits]
        return "\n".join(lines)

    # -- per-line suffixes (MemoryRetriever.kt:216-265) ---------------------

    def _suffixes(self, prop_ids: list[str]) -> dict[str, str]:
        out: dict[str, str] = {}
        provenance: dict[str, list[str]] = {}
        if self.provenance_resolver is not None and prop_ids:
            try:
                provenance = self.provenance_resolver(prop_ids) or {}
            except Exception:
                provenance = {}  # memory still answers, just uncited
        entities: dict[str, list[tuple[str, str]]] = {}
        if self.prop_entities is not None and prop_ids:
            # canonical mention relation: (prop_id, resolved_id[, span])
            span = (
                F.col("span") if "span" in self.prop_entities.columns
                else F.col("resolved_id")
            )
            mention_rows = (
                self.prop_entities.filter(F.col("prop_id").isin(prop_ids))
                .select("prop_id", span.alias("span"), "resolved_id")
                .collect()
            )
            for r in mention_rows:
                if r["resolved_id"]:
                    entities.setdefault(r["prop_id"], []).append(
                        (r["span"], r["resolved_id"])
                    )
        for pid in prop_ids:
            parts = ""
            srcs = [s.strip()[:MAX_SOURCE_CHARS]
                    for s in dict.fromkeys(provenance.get(pid, [])) if s and s.strip()]
            if srcs:
                parts += " — source: " + "; ".join(srcs[:MAX_SOURCES_PER_PROP])
            ents, seen = [], set()
            for span, eid in entities.get(pid, []):
                if eid not in seen:
                    seen.add(eid)
                    ents.append(f"{span.strip()[:MAX_ENTITY_CHARS]} ({eid})")
            if ents:
                parts += " — entities: " + "; ".join(sorted(ents)[:MAX_ENTITIES_PER_PROP])
            if parts:
                out[pid] = parts
        return out
