"""Mongo find-query → Catalyst predicate compiler (SURVEY.md §3.3, P1–P11).

A query document like ``{"manufacturer": "Porsche", "dimensions.width":
{"$gt": 2.5}}`` compiles to a single Column predicate, so the filter reaches
the parquet scan via normal Catalyst pushdown.

Semantics decisions (documented in SURVEY.md §7 "hard parts"):

- ``$exists: True`` → ``isNotNull`` (fixed schemas render Mongo's missing
  fields as nulls); for MapType columns → ``map_contains_key``.
- Equality / ``$in`` against an *array* column matches scalar-or-member,
  like Mongo (04/find_cars.py:16 with the array-valued ``assembly``).
- The NEGATION operators ``$ne`` / ``$nin`` / ``$not`` / ``$nor`` MATCH
  documents whose field is null/missing — Mongo's documented behavior
  ("including documents that do not contain the field"), which diverges
  from SQL's null-propagating comparisons: ``$ne`` compiles to a
  null-safe inequality and the others coalesce their (possibly-null)
  inner predicate to false before negating.  The positive operators keep
  SQL behavior (null comparisons never match), which coincides with
  Mongo's.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T

from data_wrangling_with_openstreetmap_and_mongodb_spark.docstore.expressions import (
    ExpressionCompiler,
)

_CMP = {"$gt", "$gte", "$lt", "$lte", "$ne", "$eq"}


def _eq_null_safe_factory(value: Any):
    # HOF lambdas take their arity from the parameter count, so a factory
    # (not a default-arg closure) is required for exists()
    def _pred(e: Column) -> Column:
        return e.eqNullSafe(F.lit(value))

    return _pred


def _is_null_elem(e: Column) -> Column:
    return e.isNull()


class FindCompiler:
    def __init__(self, df: DataFrame):
        self.df = df
        self.exprs = ExpressionCompiler(df)

    # ------------------------------------------------------------------
    def _col(self, path: str) -> Column:
        return F.col(path)

    def _is_array_field(self, path: str) -> bool:
        return isinstance(self.exprs.field_type(path), T.ArrayType)

    def _is_map_parent(self, path: str) -> tuple[bool, str, str]:
        """True if `path` addresses a key inside a MapType column."""
        if "." in path:
            head, tail = path.split(".", 1)
            if isinstance(self.exprs.field_type(head), T.MapType):
                return True, head, tail
        return False, "", ""

    # ------------------------------------------------------------------
    def compile(self, query: dict[str, Any] | None) -> Column:
        if not query:
            return F.lit(True)
        preds = [self._field_pred(k, v) for k, v in query.items()]
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out

    def _field_pred(self, key: str, value: Any) -> Column:
        if key == "$and":
            return self._fold([self.compile(q) for q in value], "and")
        if key == "$or":
            return self._fold([self.compile(q) for q in value], "or")
        if key == "$nor":
            # Mongo: a doc matches $nor when every clause FAILS — including
            # clauses that are null on it (missing fields)
            return ~F.coalesce(
                self._fold([self.compile(q) for q in value], "or"), F.lit(False)
            )
        if key == "$expr":
            return self.exprs.compile_bool(value)
        if key == "$text":
            return self._text_pred(value)

        col = self._col(key)
        if isinstance(value, dict) and value and all(
            isinstance(k, str) and k.startswith("$") for k in value
        ):
            if "$near" in value or "$nearSphere" in value:
                # $minDistance/$maxDistance are SIBLING keys of $near, not
                # nested — compile the trio as one distance predicate
                return self._near_pred(key, col, dict(value))
            if "$options" in value:
                # $options is a SIBLING modifier of $regex (Mongo), not an
                # operator: fold it into the pattern as Java inline flags
                # (i/m/s/x are valid in both engines' regex dialects)
                value = dict(value)
                opts = value.pop("$options")
                if "$regex" not in value:
                    raise ValueError("$options requires a sibling $regex")
                bad = set(opts) - set("imsx")
                if bad:
                    raise ValueError(f"unsupported $regex options: {sorted(bad)}")
                if opts:
                    value["$regex"] = f"(?{opts})" + value["$regex"]
            preds = [self._op_pred(key, col, op, arg) for op, arg in value.items()]
            return self._fold(preds, "and")
        # bare value: equality (scalar-or-member for array fields, like Mongo)
        if self._is_array_field(key):
            return F.array_contains(col, F.lit(value))
        return col == F.lit(value)

    def _op_pred(self, path: str, col: Column, op: str, arg: Any) -> Column:
        if op == "$eq":
            if self._is_array_field(path):
                return F.array_contains(col, F.lit(arg))
            return col == F.lit(arg)
        if op == "$ne":
            # Mongo $ne matches docs where the field is null/missing too
            if self._is_array_field(path):
                return F.coalesce(~F.array_contains(col, F.lit(arg)), F.lit(True))
            return ~col.eqNullSafe(F.lit(arg))
        if op == "$gt":
            return col > F.lit(arg)
        if op == "$gte":
            return col >= F.lit(arg)
        if op == "$lt":
            return col < F.lit(arg)
        if op == "$lte":
            return col <= F.lit(arg)
        if op == "$in":
            return self._in_membership(path, col, list(arg))
        if op == "$nin":
            # Mongo $nin is the exact complement of $in: null/missing fields
            # MATCH $nin — UNLESS null is among the listed values, in which
            # case missing fields count as "in the list" and are excluded.
            # _in_membership is total (never SQL-null), so plain ~ suffices.
            return ~self._in_membership(path, col, list(arg))
        if op == "$exists":
            is_map, head, tail = self._is_map_parent(path)
            if is_map:
                present = F.map_contains_key(F.col(head), F.lit(tail))
            else:
                present = col.isNotNull()
            return present if arg else ~present
        if op == "$regex":
            return col.rlike(arg)
        if op == "$not":
            inner = (
                self._fold(
                    [self._op_pred(path, col, o, a) for o, a in arg.items()], "and"
                )
                if isinstance(arg, dict)
                else (col == F.lit(arg))
            )
            # Mongo $not matches docs where the inner predicate FAILS,
            # "including documents that do not contain the field"
            return ~F.coalesce(inner, F.lit(False))
        if op == "$size":
            return F.size(col) == int(arg)
        if op == "$elemMatch":
            # exists() with a lambda over the array elements
            return F.exists(col, lambda e: self._elem_match(e, arg))
        if op == "$all":
            # every listed value present in the array field
            preds = [F.array_contains(col, F.lit(a)) for a in arg]
            return self._fold(preds, "and")
        if op == "$mod":
            divisor, remainder = arg
            return col % F.lit(divisor) == F.lit(remainder)
        if op == "$geoWithin":
            return self._geo_within(col, arg)
        if op == "$geoIntersects":
            return self._geo_intersects(col, arg)
        if op in ("$bitsAllSet", "$bitsAnySet", "$bitsAllClear", "$bitsAnyClear"):
            # Mongo bitwise query operators: the mask is an int bitmask or a
            # list of bit POSITIONS.  Integer fields only (Mongo also skips
            # fractional doubles); null/missing never matches, so wrap in
            # coalesce-false to stay total under ~/$nor composition.
            if isinstance(arg, (list, tuple)):
                mask = 0
                for pos in arg:
                    mask |= 1 << int(pos)
            else:
                mask = int(arg)
            masked = col.cast("long").bitwiseAND(F.lit(mask))
            pred = {
                "$bitsAllSet": masked == F.lit(mask),
                "$bitsAnySet": masked != F.lit(0),
                "$bitsAllClear": masked == F.lit(0),
                "$bitsAnyClear": masked != F.lit(mask),
            }[op]
            return F.coalesce(pred, F.lit(False))
        if op == "$type":
            # practical subset over the STATIC schema: a Spark column has one
            # type, so the predicate is all-rows or no-rows (plus a null check
            # for 'null'), which is what $type degenerates to on typed storage
            dt = self.exprs.field_type(path)
            import pyspark.sql.types as _T

            matches = {
                "string": isinstance(dt, _T.StringType),
                "int": isinstance(dt, (_T.IntegerType, _T.LongType)),
                "long": isinstance(dt, (_T.IntegerType, _T.LongType)),
                "double": isinstance(dt, (_T.DoubleType, _T.FloatType)),
                "bool": isinstance(dt, _T.BooleanType),
                "date": isinstance(dt, (_T.TimestampType, _T.TimestampNTZType, _T.DateType)),
                "array": isinstance(dt, _T.ArrayType),
                "object": isinstance(dt, (_T.StructType, _T.MapType)),
            }
            if arg == "null":
                return col.isNull()
            if arg not in matches:
                raise ValueError(f"unsupported $type alias: {arg!r}")
            return F.lit(matches[arg]) & col.isNotNull()
        raise ValueError(f"unsupported find operator: {op}")

    def _text_pred(self, spec: dict) -> Column:
        """``$text`` keyword search (mongod's text-index query) as a typed
        predicate: ``{"$search": str, "$path": field, "$caseSensitive"?}``.

        mongod resolves the searched field from the collection's text INDEX;
        typed storage names it with ``$path`` (the $geoNear ``key``
        treatment).  Semantics follow mongod's documented matcher minus
        stemming (a linguistic model, not a query shape): unquoted terms OR
        together on whole-token membership; ``"quoted phrases"`` are ALL
        required as substrings and, when present, alone decide the match
        ("text search will only match documents that include the phrase");
        ``-term`` negations always exclude.  Scoring lives in the $search
        aggregation facade (BM25), not here."""
        search = spec.get("$search")
        path = spec.get("$path")
        if not isinstance(search, str) or not isinstance(path, str):
            raise ValueError(
                '$text needs {"$search": str, "$path": field} (typed storage '
                "names the indexed field explicitly)"
            )
        case_sensitive = bool(spec.get("$caseSensitive", False))
        extra = set(spec) - {"$search", "$path", "$caseSensitive"}
        if extra:
            raise ValueError(f"unsupported $text options: {sorted(extra)}")
        col = self._col(path)
        if not case_sensitive:
            col = F.lower(col)

        def norm(s: str) -> str:
            return s if case_sensitive else s.lower()

        # lex: "quoted phrase" | -negated | term
        phrases: list[str] = []
        terms: list[str] = []
        negated: list[str] = []
        rest = search
        while '"' in rest:
            pre, _, tail = rest.partition('"')
            phrase, _, rest = tail.partition('"')
            rest = pre + " " + rest
            if phrase.strip():
                phrases.append(phrase)
        for tok in rest.split():
            if tok.startswith("-") and len(tok) > 1:
                negated.append(tok[1:])
            else:
                terms.append(tok)
        toks = F.split(col, r"\s+")
        if phrases:
            pred = self._fold(
                [F.contains(col, F.lit(norm(p))) for p in phrases], "and"
            )
        elif terms:
            pred = self._fold(
                [F.array_contains(toks, F.lit(norm(t))) for t in terms], "or"
            )
        else:
            raise ValueError("$text $search needs at least one positive term")
        for t in negated:
            pred = pred & ~F.array_contains(toks, F.lit(norm(t)))
        return pred

    # -- geo predicates (legacy [x, y] coordinate-pair fields) --------------
    @staticmethod
    def _pair(col: Column) -> tuple[Column, Column]:
        return F.element_at(col, 1), F.element_at(col, 2)

    def _geo_within(self, col: Column, arg: dict) -> Column:
        """``$geoWithin`` over a legacy coordinate-pair field (``array<double>
        [x, y]``, the OSM ``pos`` shape — reference ``data.py:105-108``).
        Planar shapes ($box/$center/$polygon) read the pair as stored;
        $centerSphere reads it as Mongo's legacy ``[lon, lat]`` with the
        radius in RADIANS of central angle."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.geo import (
            central_angle_rad,
            point_in_polygon,
        )

        if not isinstance(arg, dict) or len(arg) != 1:
            raise ValueError(f"$geoWithin takes exactly one shape: {arg!r}")
        shape, sarg = next(iter(arg.items()))
        px, py = self._pair(col)
        if shape == "$box":
            (x1, y1), (x2, y2) = sarg
            lo_x, hi_x = min(x1, x2), max(x1, x2)
            lo_y, hi_y = min(y1, y2), max(y1, y2)
            return (
                (px >= F.lit(float(lo_x))) & (px <= F.lit(float(hi_x)))
                & (py >= F.lit(float(lo_y))) & (py <= F.lit(float(hi_y)))
            )
        if shape == "$center":
            (cx, cy), r = sarg
            dx, dy = px - F.lit(float(cx)), py - F.lit(float(cy))
            return dx * dx + dy * dy <= F.lit(float(r) * float(r))
        if shape == "$centerSphere":
            (clon, clat), r = sarg
            ang = central_angle_rad(py, px, F.lit(float(clat)), F.lit(float(clon)))
            return ang <= F.lit(float(r))
        if shape == "$polygon":
            return point_in_polygon(px, py, [tuple(v) for v in sarg])
        if shape == "$geometry":
            return self._geometry_polygon_pred(px, py, sarg)
        raise ValueError(f"unsupported $geoWithin shape: {shape!r}")

    def _geo_intersects(self, col: Column, arg: dict) -> Column:
        """``$geoIntersects`` with a ``$geometry`` Polygon against a point
        field: for a POINT query target, intersecting a polygon is
        containment, so this shares the polygon predicate with
        ``$geoWithin $geometry``.  (Intersecting line/polygon FIELDS needs
        geometry-valued storage the legacy-pair shape doesn't carry.)"""
        if not isinstance(arg, dict) or set(arg) != {"$geometry"}:
            raise ValueError(
                f'$geoIntersects takes {{"$geometry": {{...}}}}: {arg!r}'
            )
        px, py = self._pair(col)
        return self._geometry_polygon_pred(px, py, arg["$geometry"])

    @staticmethod
    def _geometry_polygon_pred(px: Column, py: Column, geom: dict) -> Column:
        """GeoJSON Polygon containment for a point — even-odd ray casting
        summed across ALL rings, so holes fall out naturally (a point
        inside the outer ring AND inside a hole crosses an even total and
        is excluded, exactly GeoJSON's ring semantics).

        GeoJSON rings are closed (first == last vertex); the closing edge
        degenerates to a point and contributes nothing, so closed and open
        rings both work.  Coordinates are [x, y] in the stored pair's own
        axis order (GeoJSON [lon, lat] against the legacy [lon, lat]
        pairs).  Documented divergence from mongod: edges are PLANAR
        segments (the ray-cast treatment every planar shape here uses),
        not spherical geodesics — for the small polygons these queries use
        the difference is below the coordinate grid; $centerSphere covers
        the spherical-cap case exactly."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.geo import (
            point_in_polygon,
        )

        if not isinstance(geom, dict) or geom.get("type") != "Polygon":
            raise ValueError(
                f"only $geometry type 'Polygon' is supported: {geom!r}"
            )
        rings = geom.get("coordinates")
        if not rings or not isinstance(rings, (list, tuple)):
            raise ValueError("$geometry Polygon needs a coordinates ring list")
        pred: Column | None = None
        for ring in rings:
            inside = point_in_polygon(px, py, [tuple(v) for v in ring])
            # even-odd across rings == XOR of per-ring parities
            pred = inside if pred is None else pred != inside
        return pred

    def _near_pred(self, path: str, col: Column, spec: dict) -> Column:
        """``$near``/``$nearSphere`` as a pure distance-band FILTER.  Mongo
        also sorts by distance (an index behavior a predicate can't carry):
        here $maxDistance and/or $minDistance are REQUIRED, and distance
        ORDERING lives in the $geoNear aggregation stage."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.geo import (
            central_angle_rad,
        )

        spherical = "$nearSphere" in spec
        point = spec.pop("$nearSphere", None) or spec.pop("$near", None)
        max_d = spec.pop("$maxDistance", None)
        min_d = spec.pop("$minDistance", None)
        if spec:
            raise ValueError(f"unsupported $near siblings: {sorted(spec)}")
        if max_d is None and min_d is None:
            raise ValueError(
                "$near/$nearSphere need $maxDistance and/or $minDistance here "
                "(pure filter); for distance ORDERING use the $geoNear "
                "aggregation stage"
            )
        px, py = self._pair(col)
        cx, cy = float(point[0]), float(point[1])
        if spherical:
            # legacy [lon, lat], central-angle radians (Mongo spherical unit)
            d = central_angle_rad(py, px, F.lit(cy), F.lit(cx))
        else:
            dx, dy = px - F.lit(cx), py - F.lit(cy)
            d = F.sqrt(dx * dx + dy * dy)
        pred = F.lit(True)
        if max_d is not None:
            pred = pred & (d <= F.lit(float(max_d)))
        if min_d is not None:
            pred = pred & (d >= F.lit(float(min_d)))
        return pred

    def _in_membership(self, path: str, col: Column, values: list) -> Column:
        """TOTAL (never SQL-null) membership test with Mongo null semantics:
        a null/missing field is "in the list" iff the list contains null;
        an array field matches if any element null-safe-equals a listed
        value — including a NULL element when null is listed (Mongo matches
        null array elements; ADVICE r6) — or the array itself is
        null/missing and null is listed.  Totality lets ``$nin`` be the
        plain complement (ADVICE r5: the old ``coalesce(~isin, True)``
        wrongly matched null fields for ``{$nin: [null]}``)."""
        null_listed = any(v is None for v in values)
        if not values:
            return F.lit(False)  # {$in: []} matches nothing
        if self._is_array_field(path):
            preds = [
                F.exists(col, _eq_null_safe_factory(v)) for v in values if v is not None
            ]
            if null_listed:
                preds.append(F.exists(col, _is_null_elem))
            hit = self._fold(preds, "or") if preds else F.lit(False)
            # exists() is null on a null array; missing array counts as
            # null-listed membership, like a missing scalar
            return F.coalesce(hit, F.lit(False)) | (
                F.lit(null_listed) & col.isNull()
            )
        preds = [col.eqNullSafe(F.lit(v)) for v in values]
        return self._fold(preds, "or")

    def _elem_match(self, e: Column, spec: dict[str, Any]) -> Column:
        """$elemMatch condition over one array element: scalar operator
        docs ({"$gte": 5}), and (r8) sub-document FIELD conditions for
        struct elements ({"k": {"$gt": 5}} / bare {"k": "v"} equality,
        dotted paths walking nested structs)."""
        preds = []
        for op, arg in spec.items():
            if op.startswith("$"):
                preds.append(self._elem_scalar_pred(e, op, arg))
                continue
            sub = e
            for part in op.split("."):
                sub = sub[part]
            if isinstance(arg, dict) and arg and all(
                k.startswith("$") for k in arg
            ):
                for o2, a2 in arg.items():
                    preds.append(self._elem_scalar_pred(sub, o2, a2))
            else:
                preds.append(sub == F.lit(arg))
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out

    def _elem_scalar_pred(self, e: Column, op: str, arg: Any) -> Column:
        if op == "$gt":
            return e > F.lit(arg)
        if op == "$gte":
            return e >= F.lit(arg)
        if op == "$lt":
            return e < F.lit(arg)
        if op == "$lte":
            return e <= F.lit(arg)
        if op == "$eq":
            return e == F.lit(arg)
        if op == "$ne":
            return e != F.lit(arg)
        if op == "$in":
            return self._fold([e == F.lit(v) for v in arg], "or")
        raise ValueError(f"unsupported $elemMatch operator: {op}")

    @staticmethod
    def _fold(preds: list[Column], how: str) -> Column:
        out = preds[0]
        for p in preds[1:]:
            out = (out & p) if how == "and" else (out | p)
        return out


def compile_projection(df: DataFrame, projection: dict[str, Any] | None) -> DataFrame:
    """Mongo projection doc → select list.

    ``{"name": 1, "manufacturer": 1, "_id": 0}`` (04/find_cars.py:34) →
    include-mode select; ``{"x": 0}`` → exclude-mode drop.  Dotted include
    paths surface the leaf field under its dotted name.  Include-mode keeps
    ``_id`` by default when an ``_id`` column exists (Mongo; r7 — exclude
    with ``{"_id": 0}``); base tables without an ``_id`` column are
    unaffected.
    """
    if not projection:
        return df
    includes = [k for k, v in projection.items() if v in (1, True)]
    excludes = [k for k, v in projection.items() if v in (0, False)]
    computed = {
        k: v for k, v in projection.items() if not isinstance(v, (int, bool))
    }
    # Mongo's projection-form $slice shorthands: {"xs": {"$slice": n}}
    # (first n, last n when negative) and {"$slice": [skip, n]} (0-based
    # skip then n elements; negative skip counts from the end) — rewritten
    # to the expression-form $slice the compiler already implements.
    elem_match_cols: dict[str, Column] = {}
    for k, v in list(computed.items()):
        if isinstance(v, dict) and len(v) == 1 and "$slice" in v:
            arg = v["$slice"]
            if isinstance(arg, int):
                computed[k] = {"$slice": [f"${k}", arg]}
            else:
                skip, n = arg
                if n <= 0:
                    raise ValueError("projection $slice count must be positive")
                computed[k] = {"$slice": [f"${k}", int(skip), int(n)]}
        elif isinstance(v, dict) and len(v) == 1 and "$elemMatch" in v:
            # projection-form $elemMatch: the array narrows to its FIRST
            # element matching the condition (find()'s $elemMatch matcher,
            # so operator docs and bare equality both work); no match or a
            # missing array → null, Mongo's omitted-field on typed storage
            fc = FindCompiler(df)

            def _matcher(compiler, condition):  # factory: loop-var capture
                return lambda e: F.coalesce(
                    compiler._elem_match(e, condition), F.lit(False)
                )

            filtered = F.filter(F.col(k), _matcher(fc, v["$elemMatch"]))
            elem_match_cols[k] = F.when(
                F.size(filtered) > 0, F.slice(filtered, 1, 1)
            )
            del computed[k]
    if includes or computed or elem_match_cols:
        # Mongo include-mode keeps _id unless excluded ({"_id": 0}); on
        # typed storage that applies when an _id COLUMN exists (post-$group
        # frames, user collections) — base tables without one are unchanged.
        # A COMPUTED {"_id": expr} takes precedence over the passthrough.
        cols = []
        ec = ExpressionCompiler(df)
        if "_id" in computed:
            cols.append(ec.compile(computed["_id"]).alias("_id"))
        elif "_id" in df.columns and "_id" not in excludes:
            cols.append(F.col("_id"))
        cols += [F.col(k).alias(k) for k in includes if k != "_id"]
        cols += [ec.compile(v).alias(k) for k, v in computed.items() if k != "_id"]
        cols += [c.alias(k) for k, c in elem_match_cols.items()]
        return df.select(*cols)
    return df.drop(*[e for e in excludes if e != "_id"])
