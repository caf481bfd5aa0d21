"""Tests for the stdlib Avro object-container source/sink (``sources/avrox.py``).

Mirrors the S13/S14 JSON round-trip family (reference ``data.py:138-151``) at
the binary-container level: write→read identity over every supported type
family, codec coverage (null + deflate), multi-block / multi-split reads that
prove each block decodes exactly once, and header-parse goldens including a
metadata block larger than the initial 64 KiB read buffer.
"""

from __future__ import annotations

import datetime as dt
import decimal
import io
import json
import os
import zlib

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from data_wrangling_with_openstreetmap_and_mongodb_spark.sources.avrox import (
    _MAGIC,
    _parse_header,
    _read_long,
    _write_long,
    read_avro,
    write_avro,
)


def _sorted_dicts(df, key):
    rows = [r.asDict(recursive=True) for r in df.collect()]
    return sorted(rows, key=lambda r: (r[key] is None, r[key] or 0))


ALL_TYPES_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("l", T.LongType()),
        T.StructField("f", T.FloatType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("s", T.StringType()),
        T.StructField("bin", T.BinaryType()),
        T.StructField("dt", T.DateType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("dec", T.DecimalType(12, 3)),
        T.StructField("arr", T.ArrayType(T.LongType())),
        T.StructField("mp", T.MapType(T.StringType(), T.LongType())),
        T.StructField(
            "st",
            T.StructType(
                [T.StructField("x", T.LongType()), T.StructField("y", T.StringType())]
            ),
        ),
    ]
)

ALL_TYPES_ROWS = [
    Row(
        i=1,
        l=10**12,
        f=1.5,
        d=2.25,
        b=True,
        s="héllo",
        bin=b"\x00\x01",
        dt=dt.date(2020, 2, 29),
        ts=dt.datetime(2021, 6, 1, 12, 34, 56, 789012),
        dec=decimal.Decimal("12345.678"),
        arr=[1, 2, None],
        mp={"a": 1, "b": None},
        st=Row(x=7, y="z"),
    ),
    Row(
        i=None,
        l=None,
        f=None,
        d=None,
        b=None,
        s=None,
        bin=None,
        dt=None,
        ts=None,
        dec=None,
        arr=None,
        mp=None,
        st=None,
    ),
    Row(
        i=-5,
        l=-7,
        f=-0.25,
        d=3.0,
        b=False,
        s="",
        bin=b"",
        dt=dt.date(1969, 12, 31),  # negative days-since-epoch
        ts=dt.datetime(1969, 12, 31, 23, 59, 59),
        dec=decimal.Decimal("-0.001"),
        arr=[],
        mp={},
        st=Row(x=None, y=None),
    ),
]


class TestAvroRoundTrip:
    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_all_type_families(self, spark, tmp_path, codec):
        """Write→read identity over every supported Spark type: primitives,
        binary, date (incl. pre-epoch), timestamp-micros, decimal, array,
        map, nested struct — with null at every level."""
        df = spark.createDataFrame(ALL_TYPES_ROWS, ALL_TYPES_SCHEMA)
        path = str(tmp_path / f"avro_{codec}")
        n = write_avro(df, path, codec=codec, block_rows=2)
        assert n == 3
        back = read_avro(spark, path)
        assert back.schema == df.schema
        assert _sorted_dicts(back, "i") == _sorted_dicts(df, "i")

    @pytest.mark.slow  # 31 s many-split sweep; the 2-block roundtrip above
    # keeps block/split identity covered at default budget
    def test_multiblock_multisplit_identity(self, spark, tmp_path):
        """A multi-block file read through many tiny byte-range splits yields
        exactly the rows of a whole-file read: every block is decoded exactly
        once regardless of where split boundaries land (the sources/osm.py:153
        split-identity pattern, on sync markers instead of XML elements)."""
        df = spark.createDataFrame(
            [(i, f"name-{i}" * 3, float(i) * 0.5) for i in range(5000)],
            "id long, name string, score double",
        ).coalesce(1)
        path = str(tmp_path / "avro_blocks")
        write_avro(df, path, codec="null", block_rows=128)
        files = [f for f in os.listdir(path) if f.endswith(".avro")]
        assert len(files) == 1
        size = os.path.getsize(os.path.join(path, files[0]))
        whole = read_avro(spark, path, split_bytes=size + 1)
        split = read_avro(spark, path, split_bytes=1 << 10)
        assert size // (1 << 10) > 4  # genuinely many splits
        assert split.count() == 5000
        assert _sorted_dicts(split, "id") == _sorted_dicts(whole, "id")

    def test_deflate_shrinks_and_roundtrips(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, "repetitive payload " * 20) for i in range(2000)],
            "id long, text string",
        ).coalesce(1)
        p_null = str(tmp_path / "plain")
        p_defl = str(tmp_path / "defl")
        write_avro(df, p_null, codec="null")
        write_avro(df, p_defl, codec="deflate")

        def total(p):
            return sum(
                os.path.getsize(os.path.join(p, f))
                for f in os.listdir(p)
                if f.endswith(".avro")
            )

        assert total(p_defl) < total(p_null) / 5
        assert _sorted_dicts(read_avro(spark, p_defl), "id") == _sorted_dicts(
            df, "id"
        )

    def test_overwrite_and_error_modes(self, spark, tmp_path):
        """S19 drop-if-exists reload semantics on the sink."""
        df = spark.createDataFrame([(i,) for i in range(10)], "id long")
        path = str(tmp_path / "modes")
        assert write_avro(df, path) == 10
        assert write_avro(df.limit(3), path, mode="overwrite") == 3
        assert read_avro(spark, path).count() == 3
        with pytest.raises(ValueError, match="exists"):
            write_avro(df, path, mode="error")

    def test_partitioned_write_one_file_per_partition(self, spark, tmp_path):
        df = spark.createDataFrame([(i,) for i in range(100)], "id long").repartition(
            4
        )
        path = str(tmp_path / "parts")
        write_avro(df, path)
        files = [f for f in os.listdir(path) if f.endswith(".avro")]
        assert len(files) == 4
        assert read_avro(spark, path).count() == 100

    def test_empty_dataframe(self, spark, tmp_path):
        df = spark.createDataFrame([], "id long, name string")
        path = str(tmp_path / "empty")
        assert write_avro(df, path) == 0
        # empty partitions emit no files; reading the dir raises cleanly
        with pytest.raises(ValueError, match="no .avro files"):
            read_avro(spark, path)


# --------------------------------------------------------------- header golden


def _build_container(
    schema_json: str,
    blocks: list[bytes],
    counts: list[int],
    sync: bytes = b"S" * 16,
    extra_meta: dict[str, bytes] | None = None,
    codec: str = "null",
) -> bytes:
    """Hand-assemble an Avro object container per the public 1.11 spec."""
    buf = io.BytesIO()
    buf.write(_MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    meta.update(extra_meta or {})
    head = bytearray()
    _write_long(head, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(head, len(kb))
        head.extend(kb)
        _write_long(head, len(v))
        head.extend(v)
    _write_long(head, 0)
    buf.write(bytes(head))
    buf.write(sync)
    for count, data in zip(counts, blocks):
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        blk = bytearray()
        _write_long(blk, count)
        _write_long(blk, len(data))
        buf.write(bytes(blk))
        buf.write(data)
        buf.write(sync)
    return buf.getvalue()


ONE_LONG_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "r1",
        "fields": [{"name": "v", "type": "long"}],
    }
)


def _encode_longs(values):
    out = bytearray()
    for v in values:
        _write_long(out, v)
    return bytes(out)


class TestAvroHeader:
    def test_header_parse_golden(self, tmp_path):
        """Exact (meta, sync, header_len) from a hand-assembled container."""
        sync = bytes(range(16))
        raw = _build_container(ONE_LONG_SCHEMA, [], [], sync=sync)
        p = tmp_path / "g.avro"
        p.write_bytes(raw)
        with open(p, "rb") as f:
            meta, got_sync, hlen = _parse_header(f)
        assert meta["avro.schema"].decode() == ONE_LONG_SCHEMA
        assert meta["avro.codec"] == b"null"
        assert got_sync == sync
        assert hlen == len(raw)  # header-only file: header is the whole file

    def test_header_larger_than_64k(self, spark, tmp_path):
        """A metadata block beyond the historical 64 KiB read cap parses
        correctly (regression: fixed-size header read truncated the sync
        slice silently)."""
        big = ("x" * (1 << 7)).encode()
        extra = {f"app.pad{i}": big for i in range(1200)}  # ~160 KiB of meta
        raw = _build_container(
            ONE_LONG_SCHEMA,
            [_encode_longs([1, 2, 3])],
            [3],
            extra_meta=extra,
        )
        assert len(raw) > (1 << 16) + 1000
        p = tmp_path / "big_header.avro"
        p.write_bytes(raw)
        with open(p, "rb") as f:
            meta, sync, hlen = _parse_header(f)
        assert meta["app.pad0"] == big and meta["app.pad1199"] == big
        assert sync == b"S" * 16
        df = read_avro(spark, str(p))
        assert sorted(r["v"] for r in df.collect()) == [1, 2, 3]

    def test_truncated_header_raises(self, tmp_path):
        raw = _build_container(ONE_LONG_SCHEMA, [], [])
        p = tmp_path / "trunc.avro"
        p.write_bytes(raw[: len(raw) - 10])  # cut into the sync marker
        with pytest.raises(ValueError, match="truncated Avro header"):
            with open(p, "rb") as f:
                _parse_header(f)

    def test_bad_magic_raises(self, tmp_path):
        p = tmp_path / "bad.avro"
        p.write_bytes(b"PAR1" + b"\x00" * 64)
        with pytest.raises(ValueError, match="bad magic"):
            with open(p, "rb") as f:
                _parse_header(f)

    def test_hand_built_file_reads_with_deflate(self, spark, tmp_path):
        """Decode a container this test serialized independently of
        write_avro — locks the reader to the public spec rather than to the
        sibling writer."""
        raw = _build_container(
            ONE_LONG_SCHEMA,
            [_encode_longs(range(10)), _encode_longs(range(10, 25))],
            [10, 15],
            codec="deflate",
        )
        p = tmp_path / "hand.avro"
        p.write_bytes(raw)
        df = read_avro(spark, str(p))
        assert sorted(r["v"] for r in df.collect()) == list(range(25))

    def test_corrupt_block_sync_raises(self, spark, tmp_path):
        raw = bytearray(
            _build_container(ONE_LONG_SCHEMA, [_encode_longs([1, 2])], [2])
        )
        raw[-1] ^= 0xFF  # flip a byte of the trailing sync marker
        p = tmp_path / "corrupt.avro"
        p.write_bytes(bytes(raw))
        with pytest.raises(Exception, match="corrupt Avro block"):
            read_avro(spark, str(p)).collect()


class TestAvroSchemaMapping:
    def test_general_union_error_names_field_path(self, spark, tmp_path):
        sch = json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "ok", "type": "long"},
                    {
                        "name": "nested",
                        "type": {
                            "type": "record",
                            "name": "inner",
                            "fields": [{"name": "u", "type": ["int", "string"]}],
                        },
                    },
                ],
            }
        )
        p = tmp_path / "union.avro"
        p.write_bytes(_build_container(sch, [], []))
        with pytest.raises(ValueError, match=r"\$\.nested\.u"):
            read_avro(spark, str(p))

    def test_general_union_struct_of_nullables(self, spark, tmp_path):
        """general_unions='struct': a multi-branch union reads as a struct
        with one nullable field per branch — exactly the taken branch is
        set, and the null branch makes the whole struct null."""
        sch = json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "tag", "type": "long"},
                    {"name": "u", "type": ["null", "long", "string"]},
                ],
            }
        )
        body = bytearray()
        # (tag=0, u=long 7), (tag=1, u=string "x"), (tag=2, u=null)
        _write_long(body, 0); _write_long(body, 1); _write_long(body, 7)
        _write_long(body, 1); _write_long(body, 2)
        xb = b"x"; _write_long(body, len(xb)); body.extend(xb)
        _write_long(body, 2); _write_long(body, 0)
        p = tmp_path / "gu.avro"
        p.write_bytes(_build_container(sch, [bytes(body)], [3]))
        df = read_avro(spark, str(p), general_unions="struct")
        assert [f.name for f in df.schema["u"].dataType.fields] == ["long", "string"]
        rows = {r["tag"]: r["u"] for r in df.collect()}
        assert rows[0].asDict() == {"long": 7, "string": None}
        assert rows[1].asDict() == {"long": None, "string": "x"}
        assert rows[2] is None
        # default mode still raises, and invalid modes are rejected
        with pytest.raises(ValueError, match=r"\$\.u"):
            read_avro(spark, str(p))
        with pytest.raises(ValueError, match="error/struct"):
            read_avro(spark, str(p), general_unions="flatten")

    def test_unsupported_codec_raises(self, spark, tmp_path):
        raw = _build_container(ONE_LONG_SCHEMA, [], [], codec="snappy")
        p = tmp_path / "snappy.avro"
        p.write_bytes(raw)
        with pytest.raises(ValueError, match="unsupported Avro codec"):
            read_avro(spark, str(p))
        with pytest.raises(ValueError, match="unsupported Avro codec"):
            write_avro(None, str(tmp_path / "x"), codec="snappy")

    def test_schema_mismatch_across_files_raises(self, spark, tmp_path):
        d = tmp_path / "mix"
        d.mkdir()
        (d / "a.avro").write_bytes(_build_container(ONE_LONG_SCHEMA, [], []))
        other = json.dumps(
            {
                "type": "record",
                "name": "r2",
                "fields": [{"name": "w", "type": "string"}],
            }
        )
        (d / "b.avro").write_bytes(_build_container(other, [], []))
        with pytest.raises(ValueError, match="schema mismatch"):
            read_avro(spark, str(d))

    def test_enum_and_fixed_decode(self, spark, tmp_path):
        """Reader-side coverage for Avro types Spark can only consume
        (enum→string, fixed→binary)."""
        sch = json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {
                        "name": "color",
                        "type": {
                            "type": "enum",
                            "name": "Color",
                            "symbols": ["RED", "GREEN", "BLUE"],
                        },
                    },
                    {
                        "name": "tag",
                        "type": {"type": "fixed", "name": "Tag4", "size": 4},
                    },
                ],
            }
        )
        body = bytearray()
        for idx, tag in [(0, b"aaaa"), (2, b"zzzz")]:
            _write_long(body, idx)
            body.extend(tag)
        p = tmp_path / "enumfixed.avro"
        p.write_bytes(_build_container(sch, [bytes(body)], [2]))
        rows = sorted(
            read_avro(spark, str(p)).collect(), key=lambda r: r["color"]
        )
        assert [(r["color"], bytes(r["tag"])) for r in rows] == [
            ("BLUE", b"zzzz"),
            ("RED", b"aaaa"),
        ]


class TestVarint:
    @pytest.mark.parametrize(
        "v",
        [0, 1, -1, 2, -2, 63, 64, -64, -65, 10**18, -(10**18), 2**62, -(2**63)],
    )
    def test_zigzag_roundtrip(self, v):
        out = bytearray()
        _write_long(out, v)
        got, pos = _read_long(bytes(out), 0)
        assert got == v and pos == len(out)
