"""Table lifecycle API (M1–M9 surface) — filled in as the engine layers land."""

from __future__ import annotations


class RetrievalCluster:  # placeholder; implemented with the index/serving layers
    pass
