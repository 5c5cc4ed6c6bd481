from dice_spark.functions.normalize import norm_key, normalize_name
from dice_spark.functions.textfns import (
    canonical_name_score,
    canonicalize_text,
    content_hash,
    mint_entity_id,
    upper_snake,
)
from dice_spark.functions.decay import effective_confidence

__all__ = [
    "normalize_name",
    "norm_key",
    "canonicalize_text",
    "content_hash",
    "upper_snake",
    "mint_entity_id",
    "canonical_name_score",
    "effective_confidence",
]
