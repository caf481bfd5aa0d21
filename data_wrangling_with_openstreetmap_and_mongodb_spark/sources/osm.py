"""OSM XML source + document shaper (SURVEY.md §1.2, §2.1 S8, §3.1).

The reference streams OSM XML with ``ET.iterparse`` and shapes each element
into a JSON document (``/root/reference/data.py:96-151``, ``README.md:572-706``).
Here the same pipeline is Spark-native and two-phase:

1. **Parse** (:func:`read_osm_elements`): files load via the ``binaryFile``
   source — one task per file, distributed by Spark's file listing — and each
   task runs a constant-memory ``iterparse`` over its file, emitting one raw
   row per element: ``(element_type, attrs map, tags map, node_refs array)``.
   Python is unavoidable here (there is no JVM OSM parser in-box), so the
   boundary is Arrow-batched ``mapInPandas``, never row-at-a-time.

   Scale note: parallelism = number of files.  OSM planet dumps ship as one
   huge file; at the 100 TB design point you pre-split by element boundary
   (``<node``/``<way``/``<relation`` are self-contained subtrees, so any
   byte-range split that is re-aligned to the next element-open tag parses
   independently — the same contract osmosis/osmium use).  The shaping phase
   below is pure Column algebra and is indifferent to how parsing was
   parallelized.

2. **Shape** (:func:`shape_elements`): the reference's ``shape_element`` rules
   (``data.py:96-135``) as native expressions — no Python per row:

   - keep only ``node``/``way`` elements (``data.py:98``)
   - attrs in CREATED nest into a ``created`` struct; ``timestamp`` parses to
     a real timestamp (``data.py:93,99-102``; ``README.md:657-658``)
   - ``lat``/``lon`` become ``pos: array<double>`` (``data.py:105-108``)
   - tag keys with problem characters are dropped (``data.py:91,120``)
   - ``addr:X`` keys nest into the ``address`` map; ``addr:X:Y`` keys are
     ignored (``data.py:121-125``)
   - remaining tags stay in an open ``tags`` map (SURVEY.md §1.4's MapType
     rendering of Mongo's dynamic keys)
   - way ``<nd ref>`` children are the ordered ``node_refs`` array
     (``data.py:128-131``)
   - street values in ``address.street`` are cleaned inline, like the
     notebook variant (``README.md:683-687``)
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.cleaning import (
    PROBLEMCHARS_RE,
    classify_key,
    clean_street_name,
)

# data.py:93
CREATED_ATTRS = ("version", "changeset", "timestamp", "user", "uid")

RAW_ELEMENT_SCHEMA = (
    "element_type string, attrs map<string,string>, "
    "tags map<string,string>, node_refs array<string>"
)


def _iterparse_rows(content: bytes) -> Iterator[dict[str, Any]]:
    import io
    import xml.etree.ElementTree as ET

    # iterparse + immediate clear: constant memory per task regardless of
    # file size, exactly like the reference's streaming pass (data.py:143).
    for _event, elem in ET.iterparse(io.BytesIO(content), events=("end",)):
        tag = elem.tag
        if tag in ("node", "way", "relation"):
            yield {
                "element_type": tag,
                "attrs": dict(elem.attrib),
                "tags": {
                    t.attrib["k"]: t.attrib.get("v", "")
                    for t in elem.findall("tag")
                    if "k" in t.attrib
                },
                "node_refs": [
                    nd.attrib["ref"] for nd in elem.findall("nd") if "ref" in nd.attrib
                ],
            }
            elem.clear()


def read_osm_elements(spark: SparkSession, path: str) -> DataFrame:
    """Parse OSM XML file(s) at ``path`` (glob ok) into raw element rows."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                rows = list(_iterparse_rows(bytes(content)))
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(parse, schema=RAW_ELEMENT_SCHEMA)


# Top-level OSM element-open tags.  `<nd` (way child) shares a prefix with
# `<node`, so the match requires a following delimiter; XML escapes `<` in
# text/attributes, so a raw byte match cannot false-positive inside content.
_ELEMENT_OPEN_RE = rb"<(node|way|relation)[ \t\r\n/>]"


def _read_fragment(path: str, start: int, end: int, size: int) -> bytes:
    """Read the byte-range [start, end) of an OSM file, re-aligned to element
    boundaries: the fragment contains exactly the top-level elements whose
    opening ``<`` lies in [start, end).  An element straddling ``end`` is
    completed by reading past the range; one straddling ``start`` is skipped
    (the previous split owns it).  Constant memory: range + one element."""
    import re

    with open(path, "rb") as f:
        f.seek(start)
        buf = f.read(end - start)
        # Extend until the first element-open at/after `end` (the crop point);
        # everything before it — including an element that STARTED before
        # `end` — belongs to this split.
        crop = None
        search_from = len(buf)
        while crop is None:
            m = re.search(_ELEMENT_OPEN_RE, buf[search_from:])
            if m:
                crop = search_from + m.start()
                break
            chunk = f.read(1 << 20)
            if not chunk:
                crop = len(buf)
                break
            # re-scan a small overlap so a tag straddling the chunk edge
            # still matches ("<nod" + "e id=...")
            search_from = max(len(buf) - 16, end - start)
            buf += chunk
    frag = buf[:crop]
    # Crop the head to the first element-open in-range (skips the xml
    # declaration + <osm> header on split 0, and any partial element owned
    # by the previous split otherwise).
    m = re.search(_ELEMENT_OPEN_RE, frag)
    if not m:
        return b""
    frag = frag[m.start() :]
    if end >= size:
        tail = frag.rfind(b"</osm>")
        if tail != -1:
            frag = frag[:tail]
    return frag


def read_osm_elements_split(
    spark: SparkSession, path: str, split_bytes: int = 64 << 20
) -> DataFrame:
    """Byte-range-parallel parse of ONE large OSM file (the planet-dump
    shape: a single 100 GB+ XML file that ``binaryFile`` would hand to a
    single task).

    The file splits into ⌈size/split_bytes⌉ ranges; each task range-reads its
    slice directly (shared filesystem / object-store range GET — the same
    access pattern as a parquet split), re-aligns to element-open boundaries
    (:func:`_read_fragment` — the contract osmosis/osmium use), and streams
    the fragment through the same ``iterparse`` as the whole-file path.
    Output is row-identical to :func:`read_osm_elements` (asserted in
    tests/test_sources.py).
    """
    import math
    import os

    import pandas as pd

    size = os.path.getsize(path)
    nsplits = max(1, math.ceil(size / split_bytes))
    ranges = spark.range(nsplits).repartition(nsplits)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in pdf["id"]:
                start = int(i) * split_bytes
                end = min(start + split_bytes, size)
                frag = _read_fragment(path, start, end, size)
                if not frag:
                    continue
                rows = list(_iterparse_rows(b"<osm>" + frag + b"</osm>"))
                if rows:
                    yield pd.DataFrame(rows)

    return ranges.mapInPandas(parse, schema=RAW_ELEMENT_SCHEMA)


def element_tag_counts(raw: DataFrame) -> DataFrame:
    """Frequency of element tags (mapparser.py:16-21; SURVEY.md A12)."""
    return raw.groupBy("element_type").agg(F.count(F.lit(1)).alias("cnt"))


def tag_key_class_counts(raw: DataFrame) -> DataFrame:
    """Count tag keys per class (tags.py:25-38; golden counts README.md:153),
    the ``key_type`` audit, via the C3 ``classify_key`` expression."""
    keys = raw.select(F.explode(F.map_keys("tags")).alias("k"))
    return keys.groupBy(classify_key(F.col("k")).alias("key_class")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def shape_elements(raw: DataFrame, clean_streets: bool = True) -> DataFrame:
    """Shape raw OSM elements into the reference's document form (§1.2).

    Output schema::

        id string, type string, visible string,
        created struct<version,changeset,timestamp:timestamp,user,uid>,
        pos array<double>, address map<string,string>,
        tags map<string,string>, node_refs array<string>
    """
    a = F.col("attrs")
    tags = F.col("tags")

    created = F.struct(
        a["version"].alias("version"),
        a["changeset"].alias("changeset"),
        F.to_timestamp(a["timestamp"], "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
        a["user"].alias("user"),
        a["uid"].alias("uid"),
    )
    pos = F.when(
        a["lat"].isNotNull() & a["lon"].isNotNull(),
        F.array(a["lat"].cast("double"), a["lon"].cast("double")),
    )

    # keep only entries whose key survives shaping: problemchars dropped
    # (data.py:120), addr:X:Y dropped (data.py:124), addr:X routed to address
    clean_tags = F.map_filter(
        tags,
        lambda k, v: ~k.rlike(PROBLEMCHARS_RE) & ~k.startswith("addr:"),
    )
    addr_entries = F.map_filter(
        tags,
        lambda k, v: k.startswith("addr:")
        & ~k.rlike(PROBLEMCHARS_RE)
        & (F.size(F.split(k, ":")) == 2),
    )
    address = F.transform_keys(addr_entries, lambda k, v: F.substring(k, 6, 2147483647))
    if clean_streets:
        address = F.transform_values(
            address,
            lambda k, v: F.when(k == "street", clean_street_name(v)).otherwise(v),
        )
    address = F.when(F.size(F.map_keys(address)) > 0, address)

    node_refs = F.when(F.col("element_type") == "way", F.col("node_refs"))

    return raw.filter(F.col("element_type").isin("node", "way")).select(
        a["id"].alias("id"),
        F.col("element_type").alias("type"),
        a["visible"].alias("visible"),
        created.alias("created"),
        pos.alias("pos"),
        address.alias("address"),
        clean_tags.alias("tags"),
        node_refs.alias("node_refs"),
    )


def process_map(spark: SparkSession, path_in: str, path_out: str) -> DataFrame:
    """The full reference pipeline: parse → shape → JSON-lines sink
    (data.py:138-151; README.md:714-729).  Overwrite = idempotent reload
    (README.md:832-839 drop-if-exists)."""
    shaped = shape_elements(read_osm_elements(spark, path_in))
    shaped.write.mode("overwrite").json(path_out)
    return shaped
