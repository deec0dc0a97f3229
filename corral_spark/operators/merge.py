"""MERGE INTO (upsert) semantics as a batch DataFrame operator.

Spark core has no MERGE against plain parquet (that's a table-format
feature); the engine-level semantics — matched rows take the update's
values, unmatched updates are inserted, everything else is carried
over — are a single full-outer join on the merge key with per-column
COALESCE. One shuffle on the key for both sides; AQE handles skew, and
when the updates side is small the join broadcasts automatically.

Deletes follow the CDC convention: an optional tombstone column on the
updates side marks keys to drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Return ``current`` with ``updates`` applied by ``key_col``:
    update-over-insert-over-carry, optionally dropping rows whose
    update marks ``delete_col`` true. Both inputs must share a schema
    (minus the tombstone column). Column updates are partial: a NULL
    in an update column keeps the current value (CDC patch-style);
    use a delete+insert pair to force a column to NULL.
    """
    value_cols = [c for c in current.columns if c != key_col]
    up = updates
    if delete_col is not None:
        # NULL tombstone flag means "not a delete" (CDC feeds often
        # populate the flag only on deletes); a bare ~col() would drop
        # NULL-flagged updates from BOTH branches under three-valued
        # logic, silently discarding them.
        is_delete = F.coalesce(F.col(delete_col), F.lit(False))
        tomb = up.filter(is_delete).select(key_col)
        up = up.filter(~is_delete).drop(delete_col)
    cur = current.alias("c")
    upd = up.alias("u")
    merged = cur.join(upd, on=key_col, how="full_outer").select(
        F.col(key_col),
        *[
            F.coalesce(F.col(f"u.{c}"), F.col(f"c.{c}")).alias(c)
            for c in value_cols
        ],
    )
    if delete_col is not None:
        merged = merged.join(tomb, on=key_col, how="left_anti")
    return merged
