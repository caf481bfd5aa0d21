"""Sources-layer tests (SURVEY.md §2.1), golden-assert style per §5.

Fixtures are self-authored minimal inputs mirroring the reference's fixture
*shapes* (06-openstreetmap-data/example.osm, DBpedia prologue CSVs,
02/split_data concatenated XML, 02/process.py HTML tables) — not copies.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.sources import (
    element_tag_counts,
    file_key_columns,
    find_one,
    first_line_meta,
    read_csv_positional,
    read_csv_with_prologue,
    read_json,
    read_osm_elements,
    read_osm_elements_split,
    read_xml_rows,
    scrape_options,
    scrape_tables,
    shape_elements,
    split_concatenated_xml,
    split_good_bad,
    tag_key_class_counts,
    write_jsonl,
    write_pipe_csv,
)

OSM_XML = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="1001" visible="true" lat="37.3229" lon="-122.0322" version="2"
        changeset="11129782" timestamp="2012-03-28T18:31:23Z" user="alice" uid="451048"/>
  <node id="1002" lat="37.3230" lon="-122.0411" version="1"
        changeset="8581395" timestamp="2011-06-29T14:14:14Z" user="bob" uid="567034">
    <tag k="amenity" v="restaurant"/>
    <tag k="cuisine" v="mexican"/>
    <tag k="name" v="La Taqueria"/>
    <tag k="addr:street" v="N Blaney Ave"/>
    <tag k="addr:postcode" v="95014"/>
    <tag k="addr:street:name" v="should-be-ignored"/>
  </node>
  <node id="1003" lat="37.3240" lon="-122.0500" version="3"
        changeset="100" timestamp="2012-01-02T03:04:05Z" user="alice" uid="451048">
    <tag k="amenity" v="bank"/>
    <tag k="addr:street" v="Stevens Creek Blvd"/>
    <tag k="bad key" v="dropped"/>
  </node>
  <node id="1004" lat="37.3300" lon="-122.0600" version="1"
        changeset="101" timestamp="2012-02-03T04:05:06Z" user="carol" uid="99">
    <tag k="shop" v="supermarket"/>
    <tag k="addr:city" v="Cupertino"/>
    <tag k="addr:street" v="Bollinger Rd"/>
  </node>
  <way id="2001" version="1" changeset="102"
       timestamp="2012-03-04T05:06:07Z" user="bob" uid="567034">
    <nd ref="1001"/>
    <nd ref="1002"/>
    <nd ref="1003"/>
    <tag k="highway" v="residential"/>
    <tag k="name" v="Rainbow Dr"/>
    <tag k="tiger:county" v="Santa Clara, CA"/>
  </way>
  <way id="2002" version="2" changeset="103"
       timestamp="2012-04-05T06:07:08Z" user="alice" uid="451048">
    <nd ref="1003"/>
    <nd ref="1004"/>
    <tag k="highway" v="service"/>
  </way>
  <relation id="3001" version="1" changeset="104"
            timestamp="2012-05-06T07:08:09Z" user="dave" uid="7">
    <tag k="type" v="route"/>
  </relation>
</osm>
"""


@pytest.fixture(scope="module")
def osm_raw(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("osm") / "example.osm"
    p.write_text(OSM_XML)
    return read_osm_elements(spark, str(p)).cache()


@pytest.fixture(scope="module")
def osm_shaped(osm_raw):
    return shape_elements(osm_raw).cache()


class TestOsmSource:
    def test_byte_split_parse_identical(self, spark, tmp_path):
        # One big file parsed whole (binaryFile, 1 task) vs byte-range-split
        # (element-aligned fragments) must produce identical element rows —
        # including split sizes that land mid-tag and mid-element.
        inner = OSM_XML.split(">", 2)[2].rsplit("</osm>", 1)[0]
        big = (
            '<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">'
            + inner * 120
            + "</osm>"
        )
        p = tmp_path / "big.osm"
        p.write_text(big)

        def key(r):
            return (
                r["element_type"],
                tuple(sorted(r["attrs"].items())),
                tuple(sorted(r["tags"].items())),
                tuple(r["node_refs"] or []),
            )

        whole = sorted(key(r) for r in read_osm_elements(spark, str(p)).collect())
        assert len(whole) == 7 * 120
        for split_bytes in (257, 4096):
            split = sorted(
                key(r)
                for r in read_osm_elements_split(
                    spark, str(p), split_bytes=split_bytes
                ).collect()
            )
            assert split == whole

    def test_element_tag_counts(self, osm_raw):
        # mapparser.py:29-36 golden-dict style
        counts = {r["element_type"]: r["cnt"] for r in element_tag_counts(osm_raw).collect()}
        assert counts == {"node": 4, "way": 2, "relation": 1}

    def test_tag_key_classes(self, osm_raw):
        # tags.py:56 golden {'lower':…, 'lower_colon':…, 'problemchars':…}
        counts = {r["key_class"]: r["cnt"] for r in tag_key_class_counts(osm_raw).collect()}
        # lower: amenity(2) cuisine name(2) shop highway(2) type = 9
        # lower_colon: addr:street(3) addr:postcode addr:city tiger:county = 6
        # problemchars: 'bad key' = 1; other: addr:street:name = 1
        assert counts == {"lower": 9, "lower_colon": 6, "problemchars": 1, "other": 1}

    def test_shaping_drops_relations(self, osm_shaped):
        assert osm_shaped.count() == 6  # README.md:868-874: nodes + ways only
        types = {r["type"] for r in osm_shaped.select("type").distinct().collect()}
        assert types == {"node", "way"}

    def test_created_struct_and_pos(self, osm_shaped):
        row = osm_shaped.filter(F.col("id") == "1001").first()
        assert row["created"]["user"] == "alice"
        assert row["created"]["changeset"] == "11129782"
        assert str(row["created"]["timestamp"]).startswith("2012-03-28 18:31:23")
        assert row["pos"] == [37.3229, -122.0322]  # floats, data.py:105-108
        assert row["visible"] == "true"

    def test_address_shaping_and_cleaning(self, osm_shaped):
        row = osm_shaped.filter(F.col("id") == "1002").first()
        # addr:X → address.X; street cleaned (README.md:683-687, 565-567)
        assert row["address"]["street"] == "North Blaney Avenue"
        assert row["address"]["postcode"] == "95014"
        assert "street:name" not in row["address"]  # addr:X:Y ignored data.py:124
        assert row["tags"]["amenity"] == "restaurant"
        assert "addr:street" not in row["tags"]

        row3 = osm_shaped.filter(F.col("id") == "1003").first()
        assert row3["address"]["street"] == "Stevens Creek Boulevard"
        assert "bad key" not in row3["tags"]  # problemchars dropped data.py:120

        row4 = osm_shaped.filter(F.col("id") == "1004").first()
        assert row4["address"]["street"] == "Bollinger Road"
        assert row4["address"]["city"] == "Cupertino"

    def test_node_refs_ordered(self, osm_shaped):
        row = osm_shaped.filter(F.col("id") == "2001").first()
        assert row["node_refs"] == ["1001", "1002", "1003"]  # order data.py:128-131
        node = osm_shaped.filter(F.col("id") == "1002").first()
        assert node["node_refs"] is None  # nodes have no refs

    def test_distinct_users(self, osm_shaped):
        # users.py:34-style golden: alice, bob, carol (dave only on relation)
        n = osm_shaped.select("created.user").distinct().count()
        assert n == 3

    def test_degree_count_unwind(self, osm_shaped):
        # README.md:976-986 three-most-referenced-nodes shape
        top = (
            osm_shaped.filter(F.col("type") == "way")
            .select(F.explode("node_refs").alias("ref"))
            .groupBy("ref")
            .count()
            .orderBy(F.desc("count"), F.asc("ref"))
            .first()
        )
        assert (top["ref"], top["count"]) == ("1003", 2)

    def test_jsonl_roundtrip(self, spark, osm_shaped, tmp_path):
        out = str(tmp_path / "shaped_json")
        write_jsonl(osm_shaped, out)
        back = read_json(spark, out)
        assert back.count() == 6
        doc = find_one(back.filter(F.col("id") == "1002"))
        assert doc["address"]["street"] == "North Blaney Avenue"


CITIES_CSV = """URI,name,country,areaLand
http://www.w3.org/2002/07/owl#Thing,label,label,label
http://www.w3.org/2001/XMLSchema#string,meta,meta,meta
http://example.org/ontology,meta2,meta2,meta2
http://dbpedia.org/resource/Kud,Kud,India,NULL
http://dbpedia.org/resource/Kuju,Kuju,India,{5.5e+07|5.58e+07}
http://dbpedia.org/resource/Nightmute,{Negtemiut|Nightmute},United States,3.23e+07
"""


class TestCsvSources:
    def test_prologue_skip_by_uri(self, spark, tmp_path):
        p = tmp_path / "cities.csv"
        p.write_text(CITIES_CSV)
        df = read_csv_with_prologue(spark, str(p), uri_column="URI")
        assert df.count() == 3
        names = {r["name"] for r in df.select("name").collect()}
        assert names == {"Kud", "Kuju", "{Negtemiut|Nightmute}"}

    def test_prologue_skip_by_position(self, spark, tmp_path):
        p = tmp_path / "cities.csv"
        p.write_text(CITIES_CSV)
        df = read_csv_with_prologue(spark, str(p), skip_rows=3)
        assert df.count() == 3
        assert {r["country"] for r in df.collect()} == {"India", "United States"}

    def test_positional_and_first_line_meta(self, spark, tmp_path):
        p = tmp_path / "solar.csv"
        p.write_text("MOUNTAIN VIEW CA,USA\nts,irradiance\n1,400\n2,500\n")
        meta = first_line_meta(spark, str(p))
        assert meta[0] == "MOUNTAIN VIEW CA"
        df = read_csv_positional(spark, str(p))
        assert df.columns[0] == "_c0"
        assert df.count() == 4

    def test_good_bad_split(self, spark, tmp_path):
        # 03/validity.py good/bad fork on year validity
        df = spark.createDataFrame(
            [("1995",), ("2020-old",), ("NULL",), ("1886",)], ["productionStartYear"]
        )
        from data_wrangling_with_openstreetmap_and_mongodb_spark.functions import is_valid_year

        good, bad = split_good_bad(df, is_valid_year(F.col("productionStartYear")))
        assert good.count() == 2 and bad.count() == 2

    def test_pipe_csv_sink(self, spark, tmp_path):
        df = spark.createDataFrame([("COAST", 18500.5)], ["Station", "MaxLoad"])
        out = str(tmp_path / "loads")
        write_pipe_csv(df, out)
        txt = spark.read.text(out).collect()
        lines = {r["value"] for r in txt}
        assert "Station|MaxLoad" in lines and "COAST|18500.5" in lines


SPLIT_XML = (
    '<?xml version="1.0"?>\n<doc><v>1</v></doc>\n'
    '<?xml version="1.0"?>\n<doc><v>2</v></doc>\n'
    '<?xml version="1.0"?>\n<doc><v>3</v><v>4</v></doc>\n'
)


class TestXmlSources:
    def test_split_concatenated(self, spark, tmp_path):
        p = tmp_path / "multi.xml"
        p.write_text(SPLIT_XML)
        docs = split_concatenated_xml(spark, str(p))
        assert docs.count() == 3  # 02/split_data.py:46-56 boundary check
        assert [r["doc_index"] for r in docs.orderBy("doc_index").collect()] == [0, 1, 2]

    def test_xpath_extraction(self, spark, tmp_path):
        p = tmp_path / "multi.xml"
        p.write_text(SPLIT_XML)
        docs = split_concatenated_xml(spark, str(p))

        def extract(root):
            return [{"v": int(e.text)} for e in root.findall("./v")]

        rows = read_xml_rows(docs, "xml", extract, "v int")
        assert sorted(r["v"] for r in rows.collect()) == [1, 2, 3, 4]


FLIGHTS_HTML = """<html><body>
<select id="CarrierList">
  <option value="All">AllCarriers</option>
  <option value="FL">AirTran</option>
  <option value="DL">Delta</option>
</select>
<table class="dataTDRight">
  <tr><th>Year</th><th>Month</th><th>Domestic</th><th>International</th></tr>
  <tr><td>2002</td><td>10</td><td>815,489</td><td>92,565</td></tr>
  <tr><td>2002</td><td>TOTAL</td><td>915,000</td><td>99,000</td></tr>
  <tr><td>2002</td><td>11</td><td>766,775</td><td>91,342</td></tr>
</table>
</body></html>"""


class TestHtmlSources:
    def test_scrape_table_typed(self, spark, tmp_path):
        p = tmp_path / "FL-ATL.html"
        p.write_text(FLIGHTS_HTML)
        rows = scrape_tables(spark, str(p), table_class="dataTDRight")
        rows = file_key_columns(rows, r"([A-Z]{2})-([A-Z]{3})\.html$", ["courier", "airport"])
        # 02/process.py:41-76: skip header + TOTAL rows, comma-int parse
        data = (
            rows.filter(F.col("cells")[1].rlike("^[0-9]+$"))
            .select(
                "courier",
                "airport",
                F.col("cells")[0].cast("int").alias("year"),
                F.col("cells")[1].cast("int").alias("month"),
                F.regexp_replace(F.col("cells")[2], ",", "").cast("int").alias("domestic"),
                F.regexp_replace(F.col("cells")[3], ",", "").cast("int").alias("international"),
            )
            .orderBy("month")
            .collect()
        )
        assert len(data) == 2
        first = data[0].asDict()
        assert first == {
            "courier": "FL",
            "airport": "ATL",
            "year": 2002,
            "month": 10,
            "domestic": 815489,
            "international": 92565,
        }

    def test_scrape_options_with_prefix_filter(self, spark, tmp_path):
        p = tmp_path / "FL-ATL.html"
        p.write_text(FLIGHTS_HTML)
        opts = scrape_options(spark, str(p), "CarrierList")
        vals = {r["value"] for r in opts.filter(~F.col("value").startswith("All")).collect()}
        assert vals == {"FL", "DL"}  # 02/carriers.py:47-51 membership style


class TestXlsxMinimalReader:
    @staticmethod
    def _write_xlsx(path, header, rows):
        """Minimal valid .xlsx written with stdlib zipfile: shared strings
        for the header, numeric cells for the data (the fixture shape of
        01/2013_Max_Loads / ercot_coast_stats)."""
        import zipfile

        ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        shared = "".join(f"<si><t>{h}</t></si>" for h in header)
        sheet_rows = [
            "<row r=\"1\">"
            + "".join(
                f'<c r="{chr(65 + i)}1" t="s"><v>{i}</v></c>'
                for i in range(len(header))
            )
            + "</row>"
        ]
        for rn, row in enumerate(rows, start=2):
            cells = "".join(
                f'<c r="{chr(65 + i)}{rn}"><v>{v}</v></c>'
                for i, v in enumerate(row)
                if v is not None
            )
            sheet_rows.append(f'<row r="{rn}">{cells}</row>')
        with zipfile.ZipFile(path, "w") as z:
            z.writestr(
                "[Content_Types].xml",
                '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
                '<Default Extension="xml" ContentType="application/xml"/></Types>',
            )
            z.writestr(
                "xl/sharedStrings.xml",
                f'<?xml version="1.0"?><sst xmlns="{ns}">{shared}</sst>',
            )
            z.writestr(
                "xl/worksheets/sheet1.xml",
                f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
                f"<sheetData>{''.join(sheet_rows)}</sheetData></worksheet>",
            )

    def test_xlsx_ercot_shape_end_to_end(self, spark, tmp_path):
        # serial-date column + two region load columns; a sparse cell (None)
        # exercises A1-ref-based placement
        from data_wrangling_with_openstreetmap_and_mongodb_spark.sources.excelx import (
            decode_serial_date_columns,
            read_xlsx,
        )

        p = tmp_path / "loads.xlsx"
        self._write_xlsx(
            p,
            ["Hour_End", "COAST", "NORTH"],
            [
                [41275.0, 10.5, 7.25],
                [41275.5, 12.75, None],
                [41276.0, 11.0, 9.5],
            ],
        )
        df = read_xlsx(spark, str(p))
        assert df.columns == ["Hour_End", "COAST", "NORTH"]
        typed = decode_serial_date_columns(df, ["Hour_End"]).select(
            "Hour_End",
            F.col("COAST").cast("double"),
            F.col("NORTH").cast("double"),
        )
        rows = typed.collect()
        assert rows[0]["Hour_End"].year == 2013  # serial 41275 = 2013-01-01
        assert rows[1]["NORTH"] is None  # sparse cell survives as null
        # the ERCOT question: max load and when (A10 argmax composition)
        got = typed.agg(
            F.max("COAST").alias("max_coast"),
            F.max_by("Hour_End", "COAST").alias("when"),
        ).first()
        assert got["max_coast"] == 12.75
        assert (got["when"].day, got["when"].hour) == (1, 12)
