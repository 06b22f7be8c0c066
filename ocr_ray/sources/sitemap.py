"""Sitemap ingestion — ``sitemap.xml`` / sitemap-index files as a URL
table, the crawl-frontier complement to the WARC source (what SHOULD
exist per the publisher vs. what the crawl captured).

Format (sitemaps.org): a ``<urlset>`` of ``<url><loc>…</loc>
<lastmod>…</lastmod>…</url>`` entries, or a ``<sitemapindex>`` whose
``<sitemap><loc>`` entries point at child sitemaps.  This sandbox has
no network, so index ``loc``s resolve only against the LOCAL
directory (the basename is looked up next to the index file) and
children with no local file are skipped.  Gzipped sitemaps
(``.xml.gz``) decompress transparently.

Ray shape: one task per sitemap file via ``read_binary_files`` —
files are independently parseable.  Output: (url, canonical_url,
domain, lastmod, source_file); URLs canonicalize through
``urlnorm`` so frontier/crawl joins need no re-normalization.

Parser is tolerant: malformed XML yields the entries parsed before
the error via incremental parsing; unknown tags and namespaces are
ignored (sitemaps in the wild mix default and explicit namespaces).

Reference analog: S-family sources (SURVEY.md §2.1 extension).
"""
from __future__ import annotations

import gzip
import io

import pyarrow as pa

from ..functions.urlnorm import canonicalize_url, registrable_domain


def _local_name(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_bytes(data: bytes) -> tuple[list[dict], list[str]]:
    """(url entries, child sitemap locs) of one sitemap document.
    Entries: {url, lastmod}.  Malformed tails keep what parsed."""
    import xml.etree.ElementTree as ET

    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError):
            return [], []
    entries: list[dict] = []
    children: list[str] = []
    cur: dict | None = None
    in_sitemap = False
    try:
        for event, el in ET.iterparse(io.BytesIO(data),
                                      events=("start", "end")):
            name = _local_name(el.tag)
            if event == "start":
                if name == "url":
                    cur = {"url": "", "lastmod": ""}
                elif name == "sitemap":
                    in_sitemap = True
            else:
                if name == "loc":
                    text = (el.text or "").strip()
                    if cur is not None:
                        cur["url"] = text
                    elif in_sitemap:
                        children.append(text)
                elif name == "lastmod" and cur is not None:
                    cur["lastmod"] = (el.text or "").strip()
                elif name == "url":
                    if cur and cur["url"]:
                        entries.append(cur)
                    cur = None
                elif name == "sitemap":
                    in_sitemap = False
                el.clear()
    except ET.ParseError:
        pass  # tolerant: keep entries parsed before the damage
    return entries, children


def read_sitemap_urls(path: str):
    """Sitemap file/folder -> Dataset[url, canonical_url, domain,
    lastmod, source_file].  When ``path`` is a single index FILE, its
    child ``loc``s resolve against the file's directory by basename
    (no network) and unresolvable children are skipped; when ``path``
    is a DIRECTORY every local sitemap is already its own read task,
    so indexes contribute nothing extra — resolving children there
    would emit every child URL twice.  One parse task per file."""
    import os

    import ray.data as rd

    resolve_children = os.path.isfile(path)

    def to_rows(batch: dict) -> pa.Table:
        rows = {"url": [], "canonical_url": [], "domain": [],
                "lastmod": [], "source_file": []}

        def emit(entries, src):
            for e in entries:
                canon = canonicalize_url(e["url"])
                rows["url"].append(e["url"])
                rows["canonical_url"].append(canon)
                rows["domain"].append(registrable_domain(canon))
                rows["lastmod"].append(e["lastmod"])
                rows["source_file"].append(src)

        for data, fp in zip(batch["bytes"], batch["path"]):
            fp = str(fp)
            entries, children = parse_sitemap_bytes(bytes(data))
            emit(entries, fp)
            if not resolve_children:
                continue
            base = os.path.dirname(fp)
            for child in children:
                local = os.path.join(base, os.path.basename(child))
                if os.path.exists(local) and local != fp:
                    sub_entries, _ = parse_sitemap_bytes(
                        open(local, "rb").read())
                    emit(sub_entries, local)
        return pa.table({k: pa.array(v, pa.string())
                         for k, v in rows.items()})

    return rd.read_binary_files(path, include_paths=True).map_batches(
        to_rows, batch_format="numpy")


def frontier_coverage(sitemap_path: str, crawled_urls,
                      url_col: str = "url"):
    """Which sitemap URLs the crawl has/hasn't captured:
    Dataset[canonical_url, domain, crawled:bool], one row per distinct
    frontier URL — a hash left join of the frontier against the
    crawled canonical-URL set.

    ``crawled_urls``: Dataset or pa.Table whose ``url_col`` holds
    CANONICAL urls — ``curate_crawl``'s pages output fits as-is (its
    ``url`` column is canonical).  Both sides dedupe before the join
    so repeated fetches / repeated frontier entries never multiply
    rows."""
    from ray.data.aggregate import Count, Max

    import ray.data as rd

    from ..functions._part import nparts_for

    from ..functions._part import compact_parts
    from ..functions.dedup import _with_schema

    if isinstance(crawled_urls, pa.Table):
        crawled_urls = rd.from_arrow(crawled_urls)
    have_schema = pa.schema([("canonical_url", pa.string()),
                             ("crawled", pa.bool_())])
    have = (crawled_urls.select_columns([url_col])
            .rename_columns({url_col: "canonical_url"})
            .groupby("canonical_url").aggregate(Count())
            .select_columns(["canonical_url"])
            .map_batches(lambda b: _with_schema(have_schema)(
                b.append_column("crawled",
                                pa.array([True] * b.num_rows))),
                batch_format="pyarrow")).materialize()
    have = have.repartition(compact_parts(max(1, have.count()))) \
        .materialize()
    front_schema = pa.schema([("canonical_url", pa.string()),
                              ("domain", pa.string())])
    frontier = (read_sitemap_urls(sitemap_path)
                .select_columns(["canonical_url", "domain"])
                .groupby("canonical_url")
                .aggregate(Max("domain", alias_name="domain"))
                .map_batches(_with_schema(front_schema),
                             batch_format="pyarrow")
                .materialize())
    n = max(frontier.count(), 1)
    # groupby/aggregate emit schema-less empty blocks that break
    # Acero's key resolution — the repo-standard enforce + compact
    # hygiene above keeps both join inputs cleanly typed
    frontier = frontier.repartition(compact_parts(n)).materialize()
    joined = frontier.join(have, "left_outer",
                           num_partitions=nparts_for(n),
                           on=("canonical_url",))

    def fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.schema.get_field_index("crawled"), "crawled",
            pc.fill_null(batch["crawled"], False))

    return joined.map_batches(fill, batch_format="pyarrow")
