"""Streaming exact deduplication — the streaming twin of
``operators/dedup.exact_duplicates`` for continuously-arriving corpora.

``dropDuplicatesWithinWatermark`` keeps the FIRST arrival of each key and
drops later duplicates, with state bounded by the event-time watermark: a
key's dedup state evicts once the watermark passes its event time + the
allowed lateness, so state is O(keys-per-watermark-window), not O(all keys
ever) — the property that makes exact streaming dedup viable at an unbounded
100 TB/day ingest.  (Plain streaming ``dropDuplicates`` would keep state
forever.)

The semantic contract — duplicates are only suppressed while the first
arrival is still inside the watermark window; a re-arrival after eviction is
emitted again — is exactly what a training-data ingest wants: bounded-memory
within-window dedup at ingest, with the batch operators
(``dedup_exact``/MinHash/SimHash) handling cross-window duplicates offline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str],
    event_time_col: str = "ts_utc",
    within: str = "2 hours",
) -> DataFrame:
    """First-arrival-wins streaming dedup on ``key_cols`` with watermark-
    bounded state.  ``events`` must be a streaming DataFrame carrying an
    event-time column (see ``catalog.events_with_time`` for the batch-
    equivalent shape)."""
    return events.withWatermark(event_time_col, within).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
