"""North-star extension queries (SURVEY §2.4): dedup, similarity
search, text analysis, multimodal — filled in as operators land."""

from __future__ import annotations
