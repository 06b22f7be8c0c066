"""Sitemap source: urlset/index parsing, gzip, malformed tails,
canonicalization, and frontier-coverage join against a crawl."""

import gzip

import pyarrow as pa
import pytest

from ocr_ray.sources.sitemap import (frontier_coverage,
                                     parse_sitemap_bytes,
                                     read_sitemap_urls)

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://Example.COM:80/a?utm_source=x</loc>
       <lastmod>2025-11-01</lastmod></url>
  <url><loc>http://example.com/b</loc></url>
  <url><priority>0.5</priority></url>
</urlset>
"""

INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://example.com/child.xml</loc></sitemap>
  <sitemap><loc>http://example.com/missing.xml</loc></sitemap>
</sitemapindex>
"""

CHILD = b"""<urlset>
  <url><loc>http://example.com/c1</loc></url>
  <url><loc>http://news.site.co.uk/c2</loc></url>
</urlset>
"""


class TestParser:
    def test_urlset(self):
        entries, children = parse_sitemap_bytes(URLSET)
        assert children == []
        assert entries == [
            {"url": "http://Example.COM:80/a?utm_source=x",
             "lastmod": "2025-11-01"},
            {"url": "http://example.com/b", "lastmod": ""},
        ]

    def test_index_children(self):
        entries, children = parse_sitemap_bytes(INDEX)
        assert entries == []
        assert children == ["http://example.com/child.xml",
                            "http://example.com/missing.xml"]

    def test_gzip(self):
        entries, _ = parse_sitemap_bytes(gzip.compress(URLSET))
        assert len(entries) == 2

    def test_malformed_tail_keeps_parsed(self):
        cut = URLSET[:URLSET.find(b"<url><loc>http://example.com/b")]
        entries, _ = parse_sitemap_bytes(cut)
        assert [e["url"] for e in entries] == \
            ["http://Example.COM:80/a?utm_source=x"]

    def test_garbage(self):
        for junk in [b"", b"not xml", b"\x1f\x8bbad"]:
            assert parse_sitemap_bytes(junk) == ([], [])


class TestDistributed:
    def test_read_with_local_index_resolution(self, ray_session,
                                              tmp_path):
        d = tmp_path / "maps"
        d.mkdir()
        (d / "sitemap_index.xml").write_bytes(INDEX)
        (d / "child.xml").write_bytes(CHILD)
        # DIRECTORY input: every local sitemap is its own read task, so
        # the index must NOT re-resolve children (review finding: that
        # emitted every child URL twice)
        df = (read_sitemap_urls(str(d)).to_pandas()
              .sort_values("canonical_url").reset_index(drop=True))
        assert df["canonical_url"].tolist() == [
            "http://example.com/c1", "http://news.site.co.uk/c2"]
        assert set(df["domain"]) == {"example.com", "site.co.uk"}
        # FILE input (just the index): children resolve locally
        df2 = (read_sitemap_urls(str(d / "sitemap_index.xml"))
               .to_pandas().sort_values("canonical_url")
               .reset_index(drop=True))
        assert df2["canonical_url"].tolist() == [
            "http://example.com/c1", "http://news.site.co.uk/c2"]

    def test_canonicalization(self, ray_session, tmp_path):
        d = tmp_path / "maps"
        d.mkdir()
        (d / "sitemap.xml").write_bytes(URLSET)
        df = read_sitemap_urls(str(d)).to_pandas()
        assert sorted(df["canonical_url"]) == [
            "http://example.com/a", "http://example.com/b"]
        assert df["lastmod"].tolist().count("2025-11-01") == 1

    def test_frontier_coverage(self, ray_session, tmp_path):
        import ray.data as rd

        d = tmp_path / "maps"
        d.mkdir()
        (d / "sitemap.xml").write_bytes(URLSET)
        # duplicate fetches of the same canonical URL must not
        # multiply frontier rows (review finding)
        crawled = rd.from_arrow(pa.table({
            "url": pa.array(["http://example.com/a",
                             "http://example.com/a"])}))
        cov_df = frontier_coverage(str(d), crawled).to_pandas()
        assert len(cov_df) == 2           # one row per frontier URL
        cov = cov_df.set_index("canonical_url")
        assert bool(cov.loc["http://example.com/a", "crawled"]) is True
        assert bool(cov.loc["http://example.com/b", "crawled"]) is False
