"""Aggregated LLM-data-pipeline operator registry: dedup + similarity +
text analysis + multimodal (BASELINE.json north-star ops)."""

from . import (bloom, dedup, dsir, imagedup, multimodal, paragraphs,
               quality, similarity, textstats)

QUERIES: dict = {}
ORACLES: dict[str, str] = {}
for _mod in (textstats, dedup, paragraphs, dsir, quality, similarity,
             multimodal, imagedup, bloom):
    QUERIES.update(_mod.QUERIES)
    ORACLES.update(_mod.ORACLES)
