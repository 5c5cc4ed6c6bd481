"""Context compression for entity-resolution seams.

Ports common/resolver/ContextCompressor.kt (/root/reference/dice/src/main/
kotlin/com/embabel/dice/common/resolver/ContextCompressor.kt):

* ``window_compress`` — WindowContextCompressor (:86-221): snippets of
  ``window_chars`` around each mention (word-boundary adjusted, overlapping
  ranges merged), at most ``max_snippets``, joined with " ... " and capped at
  ``max_total_chars``; an unmentioned entity falls back to sentence-truncated
  head text.
* ``sentence_compress`` — SentenceContextCompressor (:224-271): sentences
  containing the entity (full name or any >= 3-char word), optionally with
  their neighbors; unmentioned -> first ``max_sentences``.
* ``adaptive_compress`` — AdaptiveContextCompressor (:273-300): identity
  under 500 chars, sentence strategy under 2000, window strategy beyond.
* ``compress_for_all`` — ContextCompressor.compressForAll (:56-61): distinct
  per-entity snippets joined with " ... ".
* ``compress_context`` — the Spark column: an Arrow-batched pandas UDF
  applying a strategy per (source_text, entity_name) row. This is
  LLM-prompt preparation (EscalatingEntityResolver.kt:183 compresses right
  before the resolution call), so it lives on the same declared Python seam
  as the bakeoff scorer itself — never in a JVM hot path.
"""

from __future__ import annotations

import re

SHORT_THRESHOLD = 500
MEDIUM_THRESHOLD = 2000

_SENTENCE_SPLIT = re.compile(r"[.!?]+\s+")
_WS = re.compile(r"\s+")


def _find_mentions(text: str, name: str, window_chars: int) -> list[tuple[int, int]]:
    """Mention ranges of ``name`` in ``text`` — exact occurrences first, else
    word-boundary hits of the name's >= 3-char words; overlapping/close ranges
    merged (ContextCompressor.kt:121-154)."""
    low = text.lower()
    low_name = name.lower()
    mentions: list[tuple[int, int]] = []
    i = low.find(low_name)
    while i >= 0:
        mentions.append((i, i + len(name)))
        i = low.find(low_name, i + 1)
    if not mentions:
        for word in (w for w in _WS.split(name) if len(w) >= 3):
            lw = word.lower()
            i = low.find(lw)
            while i >= 0:
                before_ok = i == 0 or not low[i - 1].isalnum()
                after = i + len(word)
                after_ok = after >= len(low) or not low[after].isalnum()
                if before_ok and after_ok:
                    mentions.append((i, after))
                i = low.find(lw, i + 1)
    if not mentions:
        return []
    mentions.sort()
    merged = [mentions[0]]
    for s, e in mentions[1:]:
        cs, ce = merged[-1]
        if s <= ce + window_chars:
            merged[-1] = (cs, max(ce, e))
        else:
            merged.append((s, e))
    return merged


def _snippet(text: str, start: int, end: int, window_chars: int) -> str:
    """Window around one mention, expanded to word boundaries within 20 chars
    (ContextCompressor.kt:156-182)."""
    s = max(0, start - window_chars)
    e = min(len(text), end + window_chars)
    if s > 0:
        sp = text.rfind(" ", 0, s + 1)
        if sp >= s - 20:
            s = sp + 1
    if e < len(text):
        sp = text.find(" ", e)
        if 0 <= sp <= e + 20:
            e = sp
    out = text[s:e].strip()
    return ("..." if s > 0 else "") + out + ("..." if e < len(text) else "")


def _truncate_to_sentences(text: str, max_chars: int) -> str:
    """Complete-sentence truncation (ContextCompressor.kt:207-219)."""
    if len(text) <= max_chars:
        return text
    head = text[:max_chars]
    last = max(head.rfind("."), head.rfind("!"), head.rfind("?"))
    if last > max_chars // 2:
        return head[: last + 1]
    cut = head.rsplit(" ", 1)[0] if " " in head else head
    return cut + "..."


def window_compress(
    text: str | None,
    name: str,
    window_chars: int = 100,
    max_snippets: int = 3,
    max_total_chars: int = 500,
) -> str | None:
    if text is None or not text.strip() or not name.strip():
        return None
    mentions = _find_mentions(text, name, window_chars)
    if not mentions:
        return _truncate_to_sentences(text, max_total_chars)
    combined = " ... ".join(
        _snippet(text, s, e, window_chars) for s, e in mentions[:max_snippets]
    )
    if len(combined) > max_total_chars:
        return combined[:max_total_chars] + "..."
    return combined


def sentence_compress(
    text: str | None,
    name: str,
    max_sentences: int = 3,
    include_surrounding: bool = True,
) -> str | None:
    if text is None or not text.strip() or not name.strip():
        return None
    sentences = [s.strip() for s in _SENTENCE_SPLIT.split(text) if s.strip()]
    if not sentences:
        return text
    low_name = name.lower()
    words = [w.lower() for w in _WS.split(name) if len(w) >= 3]
    hits = [
        i
        for i, s in enumerate(sentences)
        if low_name in s.lower() or any(w in s.lower() for w in words)
    ]
    if not hits:
        return ". ".join(sentences[:max_sentences]) + "."
    selected: set[int] = set()
    for i in hits[:max_sentences]:
        if include_surrounding and i > 0:
            selected.add(i - 1)
        selected.add(i)
        if include_surrounding and i < len(sentences) - 1:
            selected.add(i + 1)
    picked = sorted(selected)[: max_sentences + 2]
    return ". ".join(sentences[i] for i in picked) + "."


def adaptive_compress(
    text: str | None,
    name: str,
    short_threshold: int = SHORT_THRESHOLD,
    medium_threshold: int = MEDIUM_THRESHOLD,
) -> str | None:
    if text is None:
        return None
    if len(text) < short_threshold:
        return text
    if len(text) < medium_threshold:
        return sentence_compress(text, name)
    return window_compress(text, name)


def compress_for_all(text: str | None, names: list[str]) -> str | None:
    if text is None:
        return None
    seen: list[str] = []
    for n in names:
        s = window_compress(text, n)
        if s is not None and s not in seen:
            seen.append(s)
    return " ... ".join(seen) if seen else None


_STRATEGIES = {
    "window": window_compress,
    "sentence": sentence_compress,
    "adaptive": adaptive_compress,
    "none": lambda text, name: text,
}


def compress_context(text_col, name_col, strategy: str = "adaptive"):
    """Column form: compressed context per (source_text, entity_name) row via
    an Arrow-batched pandas UDF (the declared LLM-prep seam)."""
    try:
        fn = _STRATEGIES[strategy]
    except KeyError:
        raise ValueError(
            f"unknown compression strategy {strategy!r}; one of {sorted(_STRATEGIES)}"
        ) from None
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def run(texts, names):
        import pandas as pd

        return pd.Series(
            [
                fn(t, n) if n is not None else None
                for t, n in zip(texts, names)
            ],
            dtype="object",
        )

    return run(text_col, name_col)
