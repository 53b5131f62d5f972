"""Re-export of the per-subquery quantized-score CTE builder for modules
that need it without importing all of relevance (avoids a bm25 <->
relevance import cycle: relevance imports bm25 at module level)."""

from __future__ import annotations


def scores_cte(i: int, table: str, field_expr: str, terms, id_col="doc_id",
               k1: float = 1.2, b: float = 0.75) -> str:
    from .relevance import _scores_cte

    return _scores_cte(i, table, field_expr, terms, id_col, k1, b)
