"""REST source tests with an injected fetcher (no network in this env)."""

from __future__ import annotations

from data_wrangling_with_openstreetmap_and_mongodb_spark.sources.restx import (
    fetch_paged,
    fetch_pages_distributed,
)

TOTAL = 55
PAGE = 20


def _make_fetcher(total: int):
    # closure, not a module-level function: cloudpickle ships it by value to
    # executors (test modules aren't importable there)
    def fetch(offset: int, limit: int) -> list[dict]:
        end = min(offset + limit, total)
        return [{"rec_id": i, "title": f"t{i}"} for i in range(offset, end)]

    return fetch


def test_driver_side_pagination_stops_on_empty(spark):
    df = fetch_paged(spark, _make_fetcher(TOTAL), page_size=PAGE, max_pages=100)
    assert df.count() == TOTAL
    # 01/nytimes.py:99-104-style golden: exact first title
    assert df.filter("rec_id = 0").first()["title"] == "t0"


def test_distributed_pages_cover_all(spark):
    df = fetch_pages_distributed(
        spark,
        _make_fetcher(TOTAL),
        n_pages=3,
        page_size=PAGE,
        schema="rec_id long, title string",
    )
    got = sorted(r["rec_id"] for r in df.collect())
    assert got == list(range(TOTAL))


def test_download_to_file_streams_chunks(tmp_path):
    """S16 chunk-loop contract via injected transport: chunked writes
    reassemble exactly, chunk size is honored, byte count returned."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.sources.restx import (
        download_to_file,
    )

    payload = bytes(range(256)) * 10
    seen_sizes = []

    def fake_transport(url, chunk_size):
        assert url == "http://example.invalid/data.bin"
        for i in range(0, len(payload), chunk_size):
            chunk = payload[i : i + chunk_size]
            seen_sizes.append(len(chunk))
            yield chunk

    out = tmp_path / "data.bin"
    n = download_to_file(
        "http://example.invalid/data.bin", str(out), chunk_size=100, transport=fake_transport
    )
    assert n == len(payload)
    assert out.read_bytes() == payload
    assert set(seen_sizes[:-1]) == {100}  # all full chunks except the tail
