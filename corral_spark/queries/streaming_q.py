"""Streaming-analytics queries over ``events`` in deterministic batch
form (the streaming module runs the same logic via readStream)."""

from __future__ import annotations
