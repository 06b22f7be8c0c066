"""Link extraction + web link graph: kernel cases, relative
resolution, per-page dedup, the WARC->edges->pagerank composition, and
anchor-text rollups."""

import pyarrow as pa
import pytest

from ocr_ray.functions.weblinks import (anchor_text_counts,
                                        extract_links, url_id,
                                        warc_link_edges)


class TestKernel:
    def test_absolute_relative_and_protocol_relative(self):
        html = ('<a href="http://other.com/x">abs</a>'
                '<a href="/about">rel-root</a>'
                '<a href="sub/page.html">rel</a>'
                '<a href="//cdn.example.net/y">proto-rel</a>')
        got = extract_links(html, "http://example.com/dir/index.html")
        assert got == [
            ("http://other.com/x", "abs"),
            ("http://example.com/about", "rel-root"),
            ("http://example.com/dir/sub/page.html", "rel"),
            ("http://cdn.example.net/y", "proto-rel"),
        ]

    def test_skipped_schemes_and_fragments(self):
        html = ('<a href="javascript:void(0)">js</a>'
                '<a href="mailto:a@b.c">mail</a>'
                '<a href="tel:+40123">tel</a>'
                '<a href="#section">frag</a>'
                '<a href="">empty</a>'
                '<a href="http://ok.com/p#frag">keep</a>')
        got = extract_links(html, "http://example.com/")
        assert got == [("http://ok.com/p", "keep")]

    def test_per_page_dedup_first_anchor_wins(self):
        html = ('<a href="/x">first</a> text '
                '<a href="/x?utm_source=nav">second</a>')
        got = extract_links(html, "http://example.com/")
        assert got == [("http://example.com/x", "first")]

    def test_nested_markup_anchor_text(self):
        html = '<a href="/x"><b>bold</b> and <i>italic</i> words</a>'
        got = extract_links(html, "http://example.com/")
        assert got[0][1] == "bold and italic words"

    def test_malformed_html_never_raises(self):
        for junk in ["<a href='x", "<a href=>", "<<<>>>", "", None,
                     "<a href='/ok'>fine</a><a "]:
            out = extract_links(junk or "", "http://e.com/")
            assert isinstance(out, list)

    def test_url_id_stable_int63(self):
        a = url_id("http://example.com/")
        assert a == url_id("http://example.com/")
        assert 0 <= a < 2 ** 63
        assert a != url_id("http://example.com/x")


class TestComposition:
    @pytest.fixture()
    def crawl_dir(self, tmp_path):
        from ocr_ray.sources.warc import write_warc

        # hub page linked by everyone; spoke pages link hub + next
        def page(i, n):
            links = '<a href="/hub">Hub</a>'
            links += f'<a href="/page{(i + 1) % n}">next</a>'
            return f"<html><body><p>page {i}</p>{links}</body></html>"

        n = 5
        recs = [{"url": f"http://site.test/page{i}",
                 "text": page(i, n)} for i in range(n)]
        # the hub fans back out to every page: it keeps its 5 inbound
        # half-shares while each page gets only 1/2 + hub/5, so the
        # hub is the unambiguous top (a single hub outlink would
        # funnel ALL hub mass into one page and tie it)
        hub_links = "".join(f'<a href="/page{i}">p{i}</a>'
                            for i in range(n))
        recs.append({"url": "http://site.test/hub",
                     "text": f"<html><body>hub {hub_links}"
                             "</body></html>"})
        d = tmp_path / "crawl"
        d.mkdir()
        write_warc(recs, str(d / "crawl.warc"))
        return str(d)

    def test_warc_edges_and_pagerank(self, ray_session, crawl_dir):
        from ocr_ray.functions.graph import pagerank

        edges = warc_link_edges(crawl_dir).materialize()
        df = edges.to_pandas()
        # every spoke page emits exactly 2 edges, the hub 5
        assert len(df) == 5 * 2 + 5
        assert (df["src"] != df["dst"]).all()
        hub_id = url_id("http://site.test/hub")
        assert (df["dst"] == hub_id).sum() == 5

        ranks = pagerank(edges.select_columns(["src", "dst"]),
                         n_iter=8).to_pandas()
        # column access keeps int64 (a row Series would coerce the id
        # to float64 and mangle it)
        top_node = int(ranks["node"][ranks["rank"].idxmax()])
        assert top_node == hub_id           # the hub ranks highest

    def test_anchor_counts(self, ray_session, crawl_dir):
        edges = warc_link_edges(crawl_dir)
        t = (anchor_text_counts(edges).to_pandas()
             .set_index(["dst_url", "anchor"]))
        assert t.loc[("http://site.test/hub", "Hub"), "n_inlinks"] == 5


class TestRobotsMeta:
    def test_flags(self):
        from ocr_ray.functions.weblinks import page_robots_flags

        assert page_robots_flags(
            '<meta name="robots" content="noindex, nofollow">') == \
            (True, True)
        assert page_robots_flags(
            '<meta name="ROBOTS" content="NOINDEX">') == (True, False)
        assert page_robots_flags(
            '<meta name="robots" content="none">') == (True, True)
        assert page_robots_flags(
            '<meta name="robots" content="index,follow">') == \
            (False, False)
        assert page_robots_flags("<p>no meta</p>") == (False, False)
        assert page_robots_flags(
            '<meta name="description" content="noindex">') == \
            (False, False)
        assert page_robots_flags("<meta name='robots' content='noindex") \
            == (False, False)  # malformed: conservative keep

    def test_filter_noindex(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.weblinks import filter_noindex

        rows = pa.table({
            "doc": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([
                '<meta name="robots" content="noindex"><p>hidden</p>',
                "<p>public page</p>",
                '<meta name="robots" content="nofollow"><p>links</p>',
            ])})
        kept = sorted(filter_noindex(rd.from_arrow(rows))
                      .to_pandas()["doc"])
        assert kept == [1, 2]


class TestUriLessPagesSkipped:
    def test_no_phantom_empty_source_node(self, ray_session, tmp_path):
        """Review finding: URI-less pages poured their outlinks into
        one phantom url_id('') node."""
        from ocr_ray.sources.warc import write_warc

        recs = [
            {"url": "", "text": '<a href="http://x.test/a">a</a>'},
            {"url": "http://ok.test/p",
             "text": '<a href="http://x.test/b">b</a>'},
        ]
        d = tmp_path / "crawl"
        d.mkdir()
        write_warc(recs, str(d / "a.warc"))
        df = warc_link_edges(str(d)).to_pandas()
        assert len(df) == 1
        assert df["src_url"].tolist() == ["http://ok.test/p"]
