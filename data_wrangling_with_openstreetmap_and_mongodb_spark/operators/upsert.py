"""Upsert / enrichment-update operators (SURVEY.md §2.3 J1).

The reference's update pass (04-working-with-mongodb/update.py:56-76) builds a
small ``{label → binomialAuthority}`` dict, then per key runs ``find_one`` +
mutate + ``save()`` — a client-side point-update loop.  DataFrames are
immutable, so the same semantics re-express as one broadcast left-join +
column recompute: every target row survives, matched rows take the update
value, unmatched keep their own (Mongo ``save`` upsert on existing docs).

Scale: the updates side is a dimension table → broadcast hash join, no
shuffle of the big side; the whole update is one narrow projection after the
join, so it pipelines with whatever comes next.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def merge_update(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    set_map: dict[str, Column | str],
    broadcast: bool = True,
) -> DataFrame:
    """Left-join ``updates`` on ``key`` and apply ``set_map``.

    ``set_map`` maps target column name → update-side column (name or
    Column); matched rows take the update value, unmatched rows keep the
    original (coalesce).  Mirrors update.py:72-76's set-then-save.
    """
    upd = F.broadcast(updates) if broadcast else updates
    joined = target.join(upd, on=key, how="left")
    out = joined
    for tgt_col, src in set_map.items():
        src_col = F.col(src) if isinstance(src, str) else src
        out = out.withColumn(tgt_col, F.coalesce(src_col, F.col(tgt_col)))
    # drop update-side payload columns that aren't being kept
    keep = set(target.columns)
    return out.select(*[c for c in out.columns if c in keep])


def merge_update_struct(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    struct_col: str,
    field: str,
    src: str,
    broadcast: bool = True,
) -> DataFrame:
    """Struct-field variant: set ``struct_col.field`` from the update side,
    keeping all other struct fields — the exact ``classification.
    binomialAuthority`` shape of update.py:72-74."""
    upd = F.broadcast(updates) if broadcast else updates
    joined = target.join(upd, on=key, how="left")
    merged = F.col(struct_col).withField(field, F.coalesce(F.col(src), F.col(struct_col)[field]))
    keep = set(target.columns)
    return joined.withColumn(struct_col, merged).select(
        *[c for c in joined.columns if c in keep]
    )
