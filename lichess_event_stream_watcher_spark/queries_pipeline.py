"""Beyond-reference training-data-pipeline query family: dedup, similarity
search, text analysis over documents/embeddings (SURVEY.md §7 stage 7).
Populated in stages; see queries.py for the registry contract."""

from __future__ import annotations
