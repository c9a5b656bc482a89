"""URL normalization for crawl joins (beyond-reference scope): the
syntax-based normalization of RFC 3986 §6.2.2 as pure native
expressions, so URL ALIASES of the same resource — scheme/host case,
default ports, ``/./`` and ``/../`` dot segments, empty-vs-``/``
paths, fragments — collapse to one join key at scan speed.

Why this matters at 100 TB: image-text pairing joins page-side
resolved references against fetch-side WARC-Target-URIs. Crawlers
record the *fetched* form; pages reference the *authored* form
(``HTTP://Host/a/../b``, ``:80``, ``#frag``). Without normalization
those rows miss the equi-join and the pair is silently lost —
downstream near-dup dedup collapses duplicate CONTENT, but it cannot
recover a pair that never joined. One regexp/HOF projection per side
fixes the miss rate for free.

Scope (documented, deliberate):
* scheme + host lowercased (userinfo preserved verbatim — it is
  case-sensitive);
* default ports stripped (``:80`` http, ``:443`` https);
* fragment removed (never sent to the server);
* dot segments resolved per the RFC 3986 remove_dot_segments
  algorithm (a native ``aggregate`` over the split path — the same
  stack walk, one pass, no Python);
* empty path with an authority becomes ``/``;
* query strings pass through VERBATIM (param reordering changes
  semantics for many servers), and percent-encoding is not touched
  (decoding unreserved chars is safe per the RFC but crawl URLs
  rarely differ there; keeping bytes verbatim keeps the operator an
  injection-free projection).

Non-http(s) and scheme-relative inputs pass through unchanged — the
pairing layer drops non-http(s) schemes before joining anyway.
Differential-tested against an independent Python implementation of
the RFC pseudocode (tests/test_urlnorm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ABS = r"(?i)^https?://"


def _resolve_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 remove_dot_segments over an ABSOLUTE path,
    as one native aggregate: split on '/', walk segments with a
    stack ('.': skip, '..': pop, else push), re-join. The RFC keeps
    a trailing slash when the final segment is '.' or '..' — tracked
    up front and re-appended. Excess '..' above the root are
    dropped (never escapes the authority)."""
    segs = F.split(path, "/")
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when(
            s == "..",
            # pop, but never the leading '' that anchors the root
            F.when(
                F.size(acc) > 1,
                F.slice(acc, 1, F.size(acc) - 1),
            ).otherwise(acc),
        )
        .otherwise(F.array_append(acc, s)),
    )
    # a FINAL '.' or '..' leaves a pending slash in the RFC walk
    # ("/a/b/.." -> "/a/", "/a//." -> "/a//"): append an empty
    # segment, never a conditional "add slash unless one is there" —
    # that conditional collapsed "/a//." to "/a/" where the RFC
    # keeps both slashes (round-15 second review, found by
    # enumerating divergences against the spec pseudocode)
    trailing = path.rlike(r"/\.{1,2}\z")
    stack = F.when(
        trailing, F.array_append(stack, F.lit(""))
    ).otherwise(stack)
    joined = F.array_join(stack, "/")
    # a path reduced to nothing (or just the root anchor) is '/'
    return F.when(joined == "", F.lit("/")).otherwise(joined)


def normalize_url(url: Column) -> Column:
    """Syntax-normalize an absolute http(s) URL (see module doc);
    anything else — relative references, other schemes, NULL —
    passes through unchanged."""
    scheme = F.lower(F.regexp_extract(url, r"(?i)^(https?)://", 1))
    # authority = [userinfo@]host[:port]; host is case-insensitive,
    # userinfo is NOT. Splitting uses substring arithmetic, not
    # '.*'/'$'-anchored regexes: Java '.' excludes newlines (no
    # DOTALL here) while the negated classes that FEED these values
    # pass newlines through, so a stray newline in an attribute
    # value would silently drop the query or mangle userinfo
    # (round-15 second review).
    auth = F.regexp_extract(url, r"(?i)^https?://([^/?#]*)", 1)
    # userinfo runs through the LAST '@' (the host cannot contain
    # one); substring_index(-1) is the newline-safe split
    hostport_raw = F.substring_index(auth, "@", -1)
    userinfo = auth.substr(
        F.lit(1), F.length(auth) - F.length(hostport_raw)
    )  # '' when no '@' (zero-length slice), incl. the trailing '@'
    hostport = F.lower(hostport_raw)
    # a single trailing '.' on the host (fully-qualified DNS form,
    # 'example.com.') names the same origin host for fetching —
    # without the strip, blocklist entries and normalized pairing
    # joins miss the dot form and host_suffixes emits a leading ''
    # label (round-16 advisor). Stripped BEFORE the default-port
    # check so 'example.com.:80' collapses fully; bracketed IPv6
    # literals end in ']' and never match.
    hostport = F.regexp_replace(hostport, r"\.((?::\d+)?)\z", "$1")
    hostport = F.when(
        (scheme == "http") & hostport.rlike(r":80\z"),
        F.regexp_replace(hostport, r":80\z", ""),
    ).when(
        (scheme == "https") & hostport.rlike(r":443\z"),
        F.regexp_replace(hostport, r":443\z", ""),
    ).otherwise(hostport)
    # everything after the authority, fragment stripped
    tail = F.regexp_extract(url, r"(?i)^https?://[^/?#]*([^#]*)", 1)
    qpos = F.instr(tail, "?")
    path = F.when(qpos > 0, tail.substr(F.lit(1), qpos - 1)).otherwise(
        tail
    )
    query = F.when(
        qpos > 0, tail.substr(qpos, F.length(tail))
    ).otherwise(F.lit(""))  # incl. '?'
    path = F.when(path == "", F.lit("/")).otherwise(
        _resolve_dot_segments(path)
    )
    normalized = F.concat(
        scheme, F.lit("://"), userinfo, hostport, path, query
    )
    return F.when(url.rlike(_ABS), normalized).otherwise(url)


def _canon_host(host: Column) -> Column:
    """THE host canonicalization — lowercase + single trailing-dot
    (FQDN) strip — shared by url_host (probe side) and
    filter_by_host (policy side) so the two sides of the equi-join
    can never drift apart (round-16 review: an inline second copy is
    the same bug class the trailing-dot fix closed)."""
    return F.regexp_replace(F.lower(host), r"\.\z", "")


def url_host(url: Column) -> Column:
    """Lowercased registrable host of an absolute http(s) URL ('' for
    anything else) — the key for domain-level policy joins
    (blocklists, per-domain caps, robots buckets): a tiny broadcast
    join against a policy table instead of per-row Python."""
    auth = F.regexp_extract(url, r"(?i)^https?://([^/?#]*)", 1)
    host = F.substring_index(auth, "@", -1)  # newline-safe userinfo cut
    return _canon_host(F.regexp_replace(host, r":\d+\z", ""))


def host_suffixes(host: Column) -> Column:
    """The dot-suffix chain of a host — ``a.b.example`` ->
    ``[a.b.example, b.example, example]`` — bounded by the label
    count (hostnames cap at 127 labels; real ones have < 10), so
    exploding it is a constant-factor fan-out, never a blow-up.
    Empty hosts yield an empty array (nothing to match)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(host == "", F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
        )
    )


def filter_by_host(
    df: DataFrame,
    url_col: str,
    blocklist: DataFrame,
    host_col: str = "host",
    keep: bool = False,
    match_subdomains: bool = False,
) -> DataFrame:
    """Drop (or with ``keep=True`` retain only) rows whose URL host
    appears in ``blocklist`` — the UT1-blocklist shape of a crawl
    pipeline. The policy table is small by construction (domains,
    not URLs): broadcast left-anti / left-semi join, zero shuffle of
    the corpus side.

    ``match_subdomains=True`` matches the way real blocklists are
    meant to (an entry ``ads.example`` also blocks
    ``x.ads.example``): the DISTINCT host set explodes into its
    bounded dot-suffix chain (:func:`host_suffixes`) and the chain
    EQUI-joins the broadcast list — never a per-row endswith theta
    join (a nested-loop over the whole list), and never a surrogate
    row id (monotonically_increasing_id is recomputation-fragile).
    The verdict depends only on the host, so the blocked-host table
    is tiny (crawls repeat hosts massively) and joins back broadcast;
    the only added exchange is the distinct over hosts — (host)-only
    rows, not the corpus."""
    # blocklist entries get THE SAME canonicalization as url_host
    # (shared _canon_host: lowercase + single trailing-dot strip;
    # plus trim for hand-edited list files) so an 'Example.COM.' or
    # ' ads.example ' line still matches; empty lines are dropped —
    # an '' entry would otherwise match every non-http(s) row
    # (url_host yields '' for those).
    bl_host = _canon_host(F.trim(F.col(host_col)))
    hosts = F.broadcast(
        blocklist.select(bl_host.alias("__bl_host"))
        .filter(F.col("__bl_host") != "")
        .distinct()
    )
    probe = df.withColumn("__host", url_host(F.col(url_col)))
    if not match_subdomains:
        joined = probe.join(
            hosts,
            probe["__host"] == hosts["__bl_host"],
            "left_semi" if keep else "left_anti",
        )
        return joined.drop("__host")
    exploded = (
        probe.select("__host")
        .distinct()
        .select(
            "__host",
            F.explode(host_suffixes(F.col("__host"))).alias("__sfx"),
        )
    )
    blocked_hosts = (
        exploded.join(
            hosts, exploded["__sfx"] == hosts["__bl_host"], "left_semi"
        )
        .select("__host")
        .distinct()
    )
    joined = probe.join(
        F.broadcast(blocked_hosts),
        on="__host",
        how="left_semi" if keep else "left_anti",
    )
    return joined.drop("__host")


__all__ = ["normalize_url", "url_host", "host_suffixes", "filter_by_host"]
