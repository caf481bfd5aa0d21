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
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` — latitude-band grid
    over the WHOLE sphere (poles and antimeridian included, r8), never
    all-pairs.

    Scale shape: the sphere splits into latitude bands of height
    ``dlat = radius/110.574°`` (> the spherical maximum Δlat of
    ``radius/111.195°``, so a radius-ball spans at most the ±1 bands).
    Each band owns its own ring of ``nlon(band)`` equal longitude cells,
    sized from the rigorous longitude bound: a point within central angle
    σ of a point at latitude φ satisfies ``Δλ ≤ asin(sin σ / cos φ)``
    (valid while ``|φ|+σ < 90°``; past that the ball wraps the pole and
    the band collapses to ``nlon = 1`` — the polar cap is one cell).  The
    cell width is that bound at the band's most poleward edge × 1.001
    slack, so ±1 cells per ring always cover — including across the
    antimeridian, where cell indices are computed modulo the ring size
    (lon −180 and +180 share cell 0).

    The right side maps each point to ONE (band, cell) key; the left side
    expands map-side to its ≤9 DISTINCT candidate keys (3 bands × ±1 ring
    positions, ring wrap deduplicated — a bounded row fan-out, not a
    shuffle explosion) and equi-joins on the key, so candidate pairs are
    bounded by local density × 9 rather than |L|×|R|.  The exact haversine
    predicate then decides membership — the grid only over-covers, never
    misses, and each pair meets in exactly ONE cell (the right point's
    own, so no dedup pass).

    100 TB note: the ×9 fan-out carries FULL left rows through the cell
    shuffle.  With wide rows, project each side to (key, lat, lon) before
    calling and join the matched (key, key, distance) pairs back to the
    full tables afterwards — the fan-out then moves 9 narrow rows instead
    of 9 wide ones.  Pole-dense data concentrates in the single polar-cap
    cell per band ring; that skew is inherent to any longitude bucketing
    (AQE skew-join handles moderate cases).
    """
    rad = float(radius_km)
    if rad <= 0:
        raise ValueError("radius_km must be positive")
    import math

    dlat = rad / _KM_PER_DEG_LAT
    nbands = max(1, int(math.ceil(180.0 / dlat)))
    sin_sigma = math.sin(min(rad / EARTH_RADIUS_KM, math.pi / 2))

    def band(lat: Column) -> Column:
        b = F.floor((lat + F.lit(90.0)) / F.lit(dlat)).cast("long")
        return F.least(F.greatest(b, F.lit(0)), F.lit(nbands - 1))

    def _nlon_py(b: int) -> int:
        """Cells in band b's longitude ring (≥1); 1 when the radius ball
        can wrap the pole from anywhere in the band."""
        lo = b * dlat - 90.0
        maxabs = min(max(abs(lo), abs(lo + dlat)), 90.0)
        cosb = math.cos(math.radians(maxabs))
        if cosb <= 0.0 or sin_sigma / cosb >= 1.0:
            return 1
        width_deg = math.degrees(math.asin(sin_sigma / cosb)) * 1.001
        return max(1, int(360.0 // width_deg))

    # The ring sizes are a pure function of the band index — precompute
    # them driver-side and ship a literal lookup table when it fits (the
    # expression form costs 9 asin/cos chains PER LEFT ROW and measured 3x
    # the whole fan-out at sf0.1).  Above the cap (radius < ~5 km →
    # >4096 bands) fall back to the in-expression computation.
    if nbands <= 4096:
        _tab = F.array(*[F.lit(_nlon_py(b)).cast("long") for b in range(nbands)])

        def nlon(b: Column) -> Column:
            clamped = F.least(F.greatest(b, F.lit(0)), F.lit(nbands - 1))
            return F.element_at(_tab, (clamped + F.lit(1)).cast("int"))

    else:

        def nlon(b: Column) -> Column:
            lo = b.cast("double") * F.lit(dlat) - F.lit(90.0)
            maxabs = F.least(
                F.greatest(F.abs(lo), F.abs(lo + F.lit(dlat))), F.lit(90.0)
            )
            ratio = F.lit(sin_sigma) / F.cos(F.radians(maxabs))
            width_deg = F.degrees(F.asin(F.least(ratio, F.lit(1.0)))) * F.lit(1.001)
            return F.when(ratio >= F.lit(1.0), F.lit(1).cast("long")).otherwise(
                F.greatest(F.floor(F.lit(360.0) / width_deg).cast("long"), F.lit(1))
            )

    def loncell(lon: Column, n: Column) -> Column:
        # pmod wraps lon=+180 into cell 0 — the same cell as lon=−180
        raw = F.floor((lon + F.lit(180.0)) * n.cast("double") / F.lit(360.0))
        return F.pmod(raw.cast("long"), n)

    if distance_field in left.columns or distance_field in right.columns:
        raise ValueError(
            f"distance_field {distance_field!r} collides with an input column"
        )
    llat, llon = (F.col(c) for c in left_coords)
    rlat, rlon = (F.col(c) for c in right_coords)
    lband = band(llat)
    cands = []
    for db in (-1, 0, 1):
        b2 = lband + F.lit(db)
        n2 = nlon(b2)  # safe for out-of-range b2 (cos→0 ⇒ nlon=1); filtered below
        base = loncell(llon, n2)
        for dc in (-1, 0, 1):
            cands.append(
                F.struct(
                    b2.alias("cband"),
                    F.pmod(base + F.lit(dc), n2).alias("ccell"),
                )
            )
    neigh = F.filter(
        F.array_distinct(F.array(*cands)),
        lambda s: (s["cband"] >= 0) & (s["cband"] < F.lit(nbands)),
    )
    lkeyed = left.select(
        F.struct(*left.columns).alias("__l"), F.explode(neigh).alias("__c")
    ).select("__l", F.col("__c.cband").alias("__clat"), F.col("__c.ccell").alias("__clon"))
    rb = band(rlat)
    rkeyed = right.select(
        F.struct(*right.columns).alias("__r"),
        rb.alias("__clat"),
        loncell(rlon, nlon(rb)).alias("__clon"),
    )
    d = haversine_km(
        F.col("__l." + left_coords[0]),
        F.col("__l." + left_coords[1]),
        F.col("__r." + right_coords[0]),
        F.col("__r." + right_coords[1]),
    )
    # Shared column names are legal (the default ("lat","lon") on both
    # sides is the documented invocation): each side rides the join inside
    # its own struct so nothing is ambiguous mid-plan, and the output
    # renames right-side collisions with an ``_r`` suffix (left keeps the
    # original name), pandas-merge style.
    rename_right = _suffix_collisions(left.columns, right.columns, distance_field)
    return (
        lkeyed.join(rkeyed, ["__clat", "__clon"])
        .withColumn(distance_field, d)
        .filter(F.col(distance_field) <= F.lit(rad))
        .select(
            *[F.col(f"__l.{c}").alias(c) for c in left.columns],
            *[F.col(f"__r.{c}").alias(rename_right[c]) for c in right.columns],
            distance_field,
        )
    )


def _suffix_collisions(
    lcols: list[str], rcols: list[str], distance_field: str
) -> dict[str, str]:
    """Output name for each right column: unchanged unless it collides with
    a left column, the distance field, or an earlier right output name — then
    ``_r`` suffixes are appended until unique (deterministic, order-stable)."""
    taken = set(lcols) | {distance_field}
    out: dict[str, str] = {}
    for c in rcols:
        name = c
        while name in taken:
            name += "_r"
        taken.add(name)
        out[c] = name
    return out


def geo_radius_join_narrow(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_id: str,
    right_id: str,
    left_coords: tuple[str, str] = ("lat", "lon"),
    right_coords: tuple[str, str] = ("lat", "lon"),
    distance_field: str = "distance_km",
) -> DataFrame:
    """Wide-row form of :func:`geo_radius_join` — the docstring's 100 TB
    recipe as code: only ``(id, lat, lon)`` triples ride the ×9 cell
    fan-out and the cell-key shuffle; the matched ``(left_id, right_id,
    distance)`` pairs then join the FULL rows back by their unique ids.
    With payloads of hundreds of columns (documents, embeddings) this
    moves 9 narrow rows per left point instead of 9 wide ones — the
    fan-out shuffle shrinks by the payload width while the two id joins
    shuffle each table exactly once at its natural size.

    ``left_id`` / ``right_id`` must be UNIQUE keys of their tables
    (duplicate ids would cross-multiply the pair rows on the way back).
    Shared column names between the two tables are fine — the narrow
    frames use side-prefixed internal names and the output renames
    right-side collisions with an ``_r`` suffix, exactly like
    :func:`geo_radius_join`.  Same whole-sphere coverage contract."""
    # same guard as the wide form (r10, ADVICE r9): the inner
    # geo_radius_join only sees the renamed __gl_/__gr_ frames, so a left
    # column named like the distance field would otherwise duplicate in
    # the join-back output (right-side collisions are _r-renamed instead)
    if distance_field in left.columns:
        raise ValueError(
            f"distance_field {distance_field!r} collides with an input column"
        )
    lk = left.select(
        F.col(left_id).alias("__gl_id"),
        F.col(left_coords[0]).alias("__gl_lat"),
        F.col(left_coords[1]).alias("__gl_lon"),
    )
    rk = right.select(
        F.col(right_id).alias("__gr_id"),
        F.col(right_coords[0]).alias("__gr_lat"),
        F.col(right_coords[1]).alias("__gr_lon"),
    )
    pairs = geo_radius_join(
        lk, rk, radius_km, ("__gl_lat", "__gl_lon"), ("__gr_lat", "__gr_lon"),
        distance_field,
    ).select("__gl_id", "__gr_id", distance_field)
    rename_right = _suffix_collisions(left.columns, right.columns, distance_field)
    # pairs shares lineage with left/right (lk/rk project them), so the
    # join-back is a self-join — dataset aliases disambiguate.
    return (
        pairs.alias("__p")
        .join(left.alias("__L"), F.col("__p.__gl_id") == F.col(f"__L.`{left_id}`"))
        .join(right.alias("__R"), F.col("__p.__gr_id") == F.col(f"__R.`{right_id}`"))
        .select(
            *[F.col(f"__L.`{c}`").alias(c) for c in left.columns],
            *[F.col(f"__R.`{c}`").alias(rename_right[c]) for c in right.columns],
            F.col(f"__p.`{distance_field}`"),
        )
    )
