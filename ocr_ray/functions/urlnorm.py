"""URL canonicalization + registrable-domain rollups — the dedup key
and grouping axis every web-crawl pipeline needs before any per-source
statistics (two crawls of ``HTTP://Example.COM:80/a/../b?utm_source=x``
and ``http://example.com/b`` are the same page).

Canonical form (applied in order, all deterministic):

1. scheme + host lowercased; a missing scheme is treated as ``http``;
2. default ports stripped (``:80`` http, ``:443`` https);
3. userinfo (``user:pass@``) dropped — never a page identity;
4. path dot-segments resolved (RFC 3986 §5.2.4), empty path -> ``/``;
5. fragment dropped;
6. tracking query params removed (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``mc_eid``, ``ref``, ``ref_src``), remaining params
   sorted by (key, value) — order never identifies a resource;
7. trailing ``?`` dropped when the query emptied.

Registrable domain ("example.co.uk" from "a.b.example.co.uk") uses a
built-in table of the COMMON multi-label public suffixes (co/com/org/
net/ac/gov/edu + cc, blogspot-style hosting suffixes), not the full
Mozilla PSL — documented approximation; the suffix table is pluggable
for deployments that ship the real list.

Everything here is a per-batch map (no shuffle); ``domain_doc_stats``
adds the standard per-domain rollup (docs, pages, dup URLs) as one
partial-aggregated groupby.

Not cleanly SQL-expressible (dot-segment resolution + param sorting
need loops) — pytest-gated on table-driven cases + idempotence fuzz.

Reference analog: none — beyond-reference web-pipeline operator
(SURVEY.md §2.8 extension).
"""
from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pyarrow as pa

_TRACKING_EXACT = {"fbclid", "gclid", "msclkid", "mc_eid", "ref",
                   "ref_src", "igshid", "spm"}
_TRACKING_PREFIX = ("utm_",)

# common multi-label public suffixes; single-label TLDs need no table
_MULTI_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "ac.in", "gov.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "ac.kr", "go.kr",
    "com.mx", "org.mx", "gob.mx",
    "co.za", "org.za", "ac.za", "gov.za",
    "com.tr", "org.tr", "gov.tr", "edu.tr",
    "com.ar", "com.sg", "com.hk", "com.tw", "com.my", "co.id",
    "co.il", "org.il", "ac.il", "gov.il",
    "co.nz", "org.nz", "govt.nz", "ac.nz",
    "com.ua", "gov.ua", "com.pl", "edu.pl", "org.pl",
    "com.ro", "org.ro",
}
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _resolve_dots(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
        elif seg != ".":
            out.append(seg)
    res = "/".join(out)
    if path.endswith(("/.", "/..")) and not res.endswith("/"):
        res += "/"
    if not res.startswith("/"):
        res = "/" + res
    return res


def canonicalize_url(url: str) -> str:
    """Canonical form of one URL; garbage in -> stripped input back
    (never raises)."""
    u = url.strip()
    if not u:
        return u
    if u.startswith("//"):
        u = "http:" + u          # protocol-relative hrefs are common
    elif "://" not in u:
        u = "http://" + u        # schemeless ("example.com/x", "x:8080")
    try:
        parts = urlsplit(u)
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        return url.strip()
    try:
        port = parts.port  # raises lazily on non-numeric ports ("x:A")
    except ValueError:
        return url.strip()
    netloc = f"[{host}]" if ":" in host else host  # IPv6 brackets back
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{netloc}:{port}"
    path = _resolve_dots(parts.path) if parts.path else "/"
    q = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
         if k.lower() not in _TRACKING_EXACT
         and not k.lower().startswith(_TRACKING_PREFIX)]
    query = urlencode(sorted(q)) if q else ""
    return urlunsplit((scheme, netloc, path, query, ""))


def registrable_domain(host_or_url: str) -> str:
    """eTLD+1 under the built-in suffix table; bare hosts, full URLs,
    and schemeless host/path or host:port forms all accepted — the
    host is always extracted by urlsplit, never by string guessing
    (a schemeless "spam.example.com/landing" must not smuggle its path
    into the domain and bypass ``filter_by_domains``)."""
    h = host_or_url.strip()
    if not h:
        return ""
    if "://" not in h:
        h = "http:" + h if h.startswith("//") else "http://" + h
    try:
        h = (urlsplit(h).hostname or "").lower()
    except ValueError:
        return ""
    h = h.rstrip(".")
    if not h or h.replace(".", "").isdigit():  # IPv4: no domain
        return h
    labels = h.split(".")
    if len(labels) < 2:
        return h
    tail2 = ".".join(labels[-2:])
    if tail2 in _MULTI_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return tail2


def canonicalize_url_batch(batch: pa.Table,
                           url_col: str = "url") -> pa.Table:
    """Adds ``canonical_url`` and ``domain`` columns."""
    urls = batch[url_col].to_pylist()
    canon = [canonicalize_url(u) if u is not None else None for u in urls]
    dom = [registrable_domain(c) if c else None for c in canon]
    return (batch
            .append_column("canonical_url", pa.array(canon, pa.string()))
            .append_column("domain", pa.array(dom, pa.string())))


def domain_doc_stats(ds, url_col: str = "url"):
    """Per-domain rollup over a Dataset with a URL column:
    (domain, n_urls, n_unique_pages).  Partial-aggregated per block
    (<= distinct-domains rows leave each block), one compact groupby."""
    from ray.data.aggregate import Count, Sum

    # exact: one groupby over (domain, canonical_url) counts dup URLs,
    # then a per-domain rollup (output-bounded: one row per page, then
    # one per domain) — canonical_url is high-cardinality so the first
    # shuffle is skew-free; the second is tiny
    canon = ds.map_batches(canonicalize_url_batch, batch_format="pyarrow",
                           fn_kwargs={"url_col": url_col})
    pages = (canon.groupby(["domain", "canonical_url"])
             .aggregate(Count(alias_name="n_dups")))
    return (pages.groupby("domain")
            .aggregate(Count(alias_name="n_unique_pages"),
                       Sum("n_dups", alias_name="n_urls")))


def filter_by_domains(ds, blocked: set[str] | list[str],
                      url_col: str = "url", invert: bool = False):
    """Drop (or with ``invert=True`` keep only) rows whose REGISTRABLE
    domain is in ``blocked`` — the provenance complement to the
    content blocklist (``functions.blocklist``).  The domain set is a
    deployment-sized list (thousands), captured once per task closure;
    matching is per-batch set membership, map-only."""
    blocked_set = frozenset(d.strip().lower() for d in blocked)

    def keep_mask(batch: pa.Table) -> pa.Table:
        doms = [registrable_domain(u) if u is not None else ""
                for u in batch[url_col].to_pylist()]
        mask = pa.array([(d in blocked_set) == invert for d in doms])
        return batch.filter(mask)

    return ds.map_batches(keep_mask, batch_format="pyarrow")
