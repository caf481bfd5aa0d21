"""Registry for the query catalog wired into ``__spark_entry__.py``.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus, when
SQL-expressible, the equivalent ANSI SQL for the DuckDB oracle.  Column names
must match exactly between the two (the driver hash-compares after sorting
columns by name), so every computed column is aliased identically on both
sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    driver_visible: bool = True


QUERIES: dict[str, Query] = {}

# The external driver hash-checks at most this many queries per round; the
# catalog keeps every query in the local parity gate (tests/test_oracle_parity)
# but exposes only `driver_visible` ones through __spark_entry__, near-duplicate
# shapes hidden so every exposed query receives a correctness row.
DRIVER_WINDOW = 50


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    driver_visible: bool = True,
):
    """Decorator: add a query to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:  # pragma: no cover - programming error guard
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc,
            tags=tags,
            driver_visible=driver_visible,
        )
        return fn

    return deco


def driver_catalog() -> dict[str, Query]:
    """The ≤DRIVER_WINDOW queries exposed to the external driver, oracle-bearing
    first so every hash-checkable query lands inside the correctness window.

    Raises rather than truncates when more than DRIVER_WINDOW queries are
    marked visible: a silent cut would push the tail queries out of the
    correctness window, leaving them registered-but-never-verified.
    """
    visible = [q for q in QUERIES.values() if q.driver_visible]
    if len(visible) > DRIVER_WINDOW:
        over = [q.name for q in visible[DRIVER_WINDOW:]]
        raise ValueError(
            f"{len(visible)} driver_visible queries exceed DRIVER_WINDOW="
            f"{DRIVER_WINDOW}; hide {len(over)} (would be evicted: {over})"
        )
    ordered = [q for q in visible if q.oracle is not None] + [
        q for q in visible if q.oracle is None
    ]
    return {q.name: q for q in ordered}
