"""Beyond-parity training-data pipeline query entries (dedup, similarity
search, text analysis, multimodal) — filled by operators/ modules."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
