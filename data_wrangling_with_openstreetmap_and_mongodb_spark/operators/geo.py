"""Geospatial operators: haversine distance, point-in-polygon, $geoNear-style
ranking, and a grid-bucketed radius join.

The reference corpus is OpenStreetMap data whose node documents carry a
``pos`` coordinate pair (reference ``data.py:105-108``), and its MongoDB
storage tier supports ``$geoWithin``/``$near`` queries over exactly that
shape — this module is the Spark-first geo tier those users expect.

Coordinate conventions: functions take latitude/longitude in DEGREES as
separate columns; the docstore surface (``$geoWithin``/``$geoNear`` in
``docstore/``) adapts Mongo's legacy ``[x, y]`` pair fields onto these.
Spherical math returns the great-circle CENTRAL ANGLE in radians (Mongo's
legacy spherical unit); multiply by :data:`EARTH_RADIUS_KM` for kilometres.

Engine-exactness: every formula here is a fixed chain of IEEE double ops
(sin/cos/asin/sqrt/*, left-associated) with a DuckDB twin generator beside
it (``central_angle_sql``), so oracle queries reproduce distances
bit-for-bit up to transcendental-library ulps — quantize with
``functions.detagg.quantize6`` before any threshold or rank, as with cosine
scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088

# km per degree of latitude (WGS-84 mean); used only to SIZE grid cells in
# geo_radius_join — candidate cells over-cover, the exact haversine filter
# decides membership, so the constant's precision never affects results
_KM_PER_DEG_LAT = 110.574
_KM_PER_DEG_LON_EQ = 111.320


def central_angle_rad(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle central angle (radians) between two degree coordinates —
    the haversine formula as one codegen'd expression chain."""
    s1 = F.sin(F.radians(lat2 - lat1) / F.lit(2.0))
    s2 = F.sin(F.radians(lon2 - lon1) / F.lit(2.0))
    a = s1 * s1 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * s2 * s2
    return F.lit(2.0) * F.asin(F.sqrt(a))


def central_angle_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB fragment mirroring :func:`central_angle_rad` op-for-op (same
    association order, so the only divergence is transcendental ulps)."""
    s1 = f"sin(radians(({lat2}) - ({lat1})) / 2.0)"
    s2 = f"sin(radians(({lon2}) - ({lon1})) / 2.0)"
    a = f"{s1} * {s1} + cos(radians({lat1})) * cos(radians({lat2})) * {s2} * {s2}"
    return f"(2.0 * asin(sqrt({a})))"


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    return central_angle_rad(lat1, lon1, lat2, lon2) * F.lit(EARTH_RADIUS_KM)


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return f"({central_angle_sql(lat1, lon1, lat2, lon2)} * {EARTH_RADIUS_KM!r})"


def point_in_polygon(
    x: Column, y: Column, vertices: list[tuple[float, float]]
) -> Column:
    """Planar point-in-polygon (even-odd ray casting) against a CONSTANT
    vertex ring — compiles to a fixed per-edge boolean chain summed for
    parity, fully inside whole-stage codegen (no HOF fold, no UDF).

    Points exactly on an edge are implementation-defined (as in Mongo's
    planar ``$polygon``); callers with gridded data should pick vertices
    off-grid.  The ring closes itself (last vertex joins back to first).
    """
    if len(vertices) < 3:
        raise ValueError("polygon needs at least 3 vertices")
    crossings: Column = F.lit(0)
    n = len(vertices)
    for i in range(n):
        x1, y1 = (float(v) for v in vertices[i])
        x2, y2 = (float(v) for v in vertices[(i + 1) % n])
        if y1 == y2:
            continue  # horizontal edge: never crosses a horizontal ray
        straddles = (F.lit(y1) > y) != (F.lit(y2) > y)
        x_cross = F.lit(x2 - x1) * (y - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
        crossings = crossings + F.when(straddles & (x < x_cross), 1).otherwise(0)
    return crossings % 2 == 1


def point_in_polygon_sql(x: str, y: str, vertices: list[tuple[float, float]]) -> str:
    """DuckDB twin of :func:`point_in_polygon`, same edge order and ops."""
    terms = []
    n = len(vertices)
    for i in range(n):
        x1, y1 = (float(v) for v in vertices[i])
        x2, y2 = (float(v) for v in vertices[(i + 1) % n])
        if y1 == y2:
            continue
        terms.append(
            f"(CASE WHEN (({y1!r} > ({y})) <> ({y2!r} > ({y})))"
            f" AND (({x}) < {x2 - x1!r} * (({y}) - {y1!r}) / {y2 - y1!r} + {x1!r})"
            f" THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_plan(precision: int) -> tuple[int, int, int]:
    if not 1 <= int(precision) <= 12:
        raise ValueError("geohash precision must be 1..12")
    t = 5 * int(precision)
    return t, (t + 1) // 2, t // 2  # total bits, lon bits, lat bits


def geohash(lat: Column, lon: Column, precision: int = 9) -> Column:
    """Standard base32 geohash of a degree coordinate — one codegen'd
    integer-bit expression (no UDF).

    The classic bisection algorithm is equivalent to scaling each axis to a
    fixed-point integer (``floor((lon+180)/360 * 2^nlon)``, lon owning the
    odd extra bit) and MSB-interleaving lon-first; that integer form is
    what compiles here, the Z-order treatment (``scale.zvalue_n``) with
    geohash's bit order and alphabet.  Top-edge inputs (lat=90, lon=180)
    clamp into the last cell, as every published implementation does.
    Geohash cells are the textbook spatial bucketing key: prefix-truncate
    for coarser cells, group/join/cluster files by it."""
    t, nlon, nlat = _geohash_plan(precision)
    ilon = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << nlon))).cast("long"),
        F.lit((1 << nlon) - 1),
    )
    ilat = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << nlat))).cast("long"),
        F.lit((1 << nlat) - 1),
    )
    code = F.lit(0).cast("long")
    for s in range(t):
        src, idx = (ilon, nlon - 1 - s // 2) if s % 2 == 0 else (ilat, nlat - 1 - s // 2)
        bit = F.shiftright(src, idx).bitwiseAND(F.lit(1))
        code = code + bit * F.lit(1 << (t - 1 - s)).cast("long")
    arr = F.array(*[F.lit(c) for c in _B32])
    out: Column | None = None
    for d in range(int(precision)):
        digit = F.shiftright(code, 5 * (int(precision) - 1 - d)).bitwiseAND(F.lit(31))
        ch = F.element_at(arr, (digit + F.lit(1)).cast("int"))
        out = ch if out is None else F.concat(out, ch)
    return out


def geohash_sql(lat: str, lon: str, precision: int = 9) -> str:
    """DuckDB twin of :func:`geohash`, identical integer math op-for-op."""
    t, nlon, nlat = _geohash_plan(precision)
    ilon = (
        f"least(CAST(floor((({lon}) + 180.0) / 360.0 * {float(1 << nlon)!r}) "
        f"AS BIGINT), {(1 << nlon) - 1})"
    )
    ilat = (
        f"least(CAST(floor((({lat}) + 90.0) / 180.0 * {float(1 << nlat)!r}) "
        f"AS BIGINT), {(1 << nlat) - 1})"
    )
    terms = []
    for s in range(t):
        src, idx = (ilon, nlon - 1 - s // 2) if s % 2 == 0 else (ilat, nlat - 1 - s // 2)
        terms.append(f"((({src}) >> {idx}) & 1) * {1 << (t - 1 - s)}")
    code = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{_B32}', CAST((({code}) >> {5 * (int(precision) - 1 - d)}) & 31 "
        f"AS INT) + 1, 1)"
        for d in range(int(precision))
    ]
    return "(" + " || ".join(chars) + ")"


def geo_near(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    point: tuple[float, float],
    distance_field: str = "distance_km",
    max_distance_km: float | None = None,
    limit: int | None = None,
) -> DataFrame:
    """$geoNear-shaped ranking: distance to a fixed point, nearest first.
    With ``limit``, the plan is a TakeOrderedAndProject (top-k, no full
    sort).  Ties are NOT broken — callers needing determinism add their own
    tiebreak before relying on a cutoff (as Mongo users do)."""
    plat, plon = float(point[0]), float(point[1])
    d = haversine_km(F.col(lat_col), F.col(lon_col), F.lit(plat), F.lit(plon))
    out = df.withColumn(distance_field, d)
    if max_distance_km is not None:
        out = out.filter(F.col(distance_field) <= F.lit(float(max_distance_km)))
    out = out.orderBy(F.col(distance_field).asc())
    if limit is not None:
        out = out.limit(int(limit))
    return out


def geo_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_coords: tuple[str, str] = ("lat", "lon"),
    right_coords: tuple[str, str] = ("lat", "lon"),
    distance_field: str = "distance_km",
    max_abs_lat: float = 75.0,
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` — grid-bucketed, never
    all-pairs.

    Scale shape: the right side maps each point to ONE grid cell (sized so
    a radius-ball never spans more than the 3x3 neighborhood at
    ``max_abs_lat``); the left side expands to its 9 candidate cells
    map-side (a x9 row fan-out of narrow key rows, not a shuffle explosion)
    and equi-joins on the cell key, so candidate pairs are bounded by local
    density x 9 rather than |L|x|R|.  The exact haversine predicate then
    decides membership — the grid only over-covers, never misses (each pair
    meets in exactly ONE cell: the right point's own, so no dedup pass).

    Scope: |lat| must stay <= ``max_abs_lat`` (longitude cells degenerate at
    the poles) and the data must not straddle the antimeridian; both are
    documented contracts, not runtime scans.

    100 TB note: the x9 fan-out carries FULL left rows through the cell
    shuffle.  With wide rows, project each side to (key, lat, lon) before
    calling and join the matched (key, key, distance) pairs back to the
    full tables afterwards — the fan-out then moves 9 narrow rows instead
    of 9 wide ones.
    """
    rad = float(radius_km)
    if rad <= 0:
        raise ValueError("radius_km must be positive")
    import math

    dlat = rad / _KM_PER_DEG_LAT
    dlon = rad / (_KM_PER_DEG_LON_EQ * math.cos(math.radians(float(max_abs_lat))))

    def cell(lat: Column, lon: Column) -> tuple[Column, Column]:
        return (
            F.floor(lat / F.lit(dlat)).cast("long"),
            F.floor(lon / F.lit(dlon)).cast("long"),
        )

    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint (alias first): {sorted(overlap)}"
        )
    llat, llon = (F.col(c) for c in left_coords)
    rlat, rlon = (F.col(c) for c in right_coords)
    lcell = cell(llat, llon)
    lat_off = [-1, -1, -1, 0, 0, 0, 1, 1, 1]
    lon_off = [-1, 0, 1, -1, 0, 1, -1, 0, 1]
    neigh = F.array(
        *[
            F.struct(
                (lcell[0] + F.lit(la)).alias("clat"),
                (lcell[1] + F.lit(lo)).alias("clon"),
            )
            for la, lo in zip(lat_off, lon_off)
        ]
    )
    lkeyed = left.select(
        F.struct(*left.columns).alias("__l"), F.explode(neigh).alias("__c")
    ).select("__l", F.col("__c.clat").alias("__clat"), F.col("__c.clon").alias("__clon"))
    rc = cell(rlat, rlon)
    rkeyed = right.select(
        F.struct(*right.columns).alias("__r"),
        rc[0].alias("__clat"),
        rc[1].alias("__clon"),
    )
    d = haversine_km(
        F.col("__l." + left_coords[0]),
        F.col("__l." + left_coords[1]),
        F.col("__r." + right_coords[0]),
        F.col("__r." + right_coords[1]),
    )
    return (
        lkeyed.join(rkeyed, ["__clat", "__clon"])
        .withColumn(distance_field, d)
        .filter(F.col(distance_field) <= F.lit(rad))
        .select("__l.*", "__r.*", distance_field)
    )
