"""Image-text pair construction from crawl HTML — the stage that
turns a web crawl into multimodal (CLIP/LAION-style) training data:
every ``<img>`` tag's ``src`` resolves against its page URL and joins
to the crawled image blob, with the ``alt`` text (plus optional
``title``) as the caption candidate.

Spark-first shape: tag extraction is a native
``regexp_extract_all`` + ``explode`` projection (scan-speed JVM
expressions — the HTML column is read once and only (page_url,
resolved_url, alt) rows leave the scan), and pairing is a plain
equi-join on the resolved URL — broadcastable when the image side is
the smaller relation, AQE-planned otherwise. No Python in the path.

URL resolution covers the four layouts crawl HTML actually carries
(absolute, protocol-relative, root-relative, path-relative) with the
page URL as base; ``data:`` URIs and empty srcs are dropped. This is
deliberately RFC-3986-lite: no ``..`` normalization (a segment-wise
normalizer needs per-row recursion; near-dup dedup downstream
collapses the aliases this creates), stated here.

The reference system (ykursadkaya/Clustering) has no multimodal
surface; this module belongs to the LLM-pipeline extension
(SURVEY.md "beyond the reference" set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one <img ...> tag, case-insensitive; [^>]* keeps the scan linear
_IMG_TAG = r"(?i)<img\b[^>]*>"
# src/alt/title attribute values, quoted either way; src additionally
# in the unquoted form old/generated HTML carries (value runs to the
# next whitespace or tag close). Attribute names anchor with
# (?<![-\w]) — NOT \b — because \b matches after a hyphen, so a bare
# \bsrc= would also hit the `src=` inside `data-src=` and make the
# documented precedence (src first, data-src only as fallback) depend
# on attribute ORDER (round-13 advisor finding, medium).
_SRC = r"""(?i)(?<![-\w])src\s*=\s*["']([^"']+)["']"""
_SRC_UNQ = r"""(?i)(?<![-\w])src\s*=\s*([^\s>"']+)"""
# lazy-loading idioms: the real URL rides data-src, and srcset-only
# tags carry candidates as "url descriptor, url descriptor, ..."
_DATA_SRC = r"""(?i)(?<![-\w])data-src\s*=\s*["']([^"']+)["']"""
# caption attributes are quote-AWARE (round 15): a ["']...["']
# class would truncate a double-quoted value at its first apostrophe
# (alt="World's best" -> "World"), and apostrophes are common in
# natural-language captions. Each attribute gets a double-quoted and
# a single-quoted pattern; extraction tries the double-quoted form
# first (the quote char right after = decides which one can match,
# so the order only breaks ties on malformed duplicate attributes).
def _attr_dq(name: str) -> str:
    return rf"""(?i)(?<![-\w]){name}\s*=\s*"([^"]*)\""""


def _attr_sq(name: str) -> str:
    return rf"""(?i)(?<![-\w]){name}\s*=\s*'([^']*)'"""


def _attr_val(tag: Column, name: str) -> Column:
    """Quote-aware attribute value: the double-quoted match wins when
    present (even if empty — rlike, not the extract, gates it), else
    the single-quoted extraction ('' when absent, matching the old
    single-pattern contract)."""
    dq = _attr_dq(name)
    return F.when(
        tag.rlike(dq), F.regexp_extract(tag, dq, 1)
    ).otherwise(F.regexp_extract(tag, _attr_sq(name), 1))


def _attr_or_null(tag: Column, name: str) -> Column:
    """Value when the attribute is PRESENT (even empty string), NULL
    when absent — the caption-precedence primitive: coalesce over
    these stops at a present-but-empty attribute instead of falling
    through. One rlike per quote form + one extract on the matching
    form (round-15 review: the earlier has-check + value pairing ran
    the double-quote rlike twice per attribute)."""
    dq, sq = _attr_dq(name), _attr_sq(name)
    return (
        F.when(tag.rlike(dq), F.regexp_extract(tag, dq, 1))
        .when(tag.rlike(sq), F.regexp_extract(tag, sq, 1))
        .otherwise(F.lit(None).cast("string"))
    )


def _descriptor_tier(desc: Column) -> Column:
    """tier 2 = valid width descriptor (``<int>w``, HTML spec), 1 =
    density (``<float>x``), 0 = anything else (bare candidate, ``h``
    descriptor, spec-invalid forms like ``480.0w``). Width always
    outranks density: the spec forbids mixing, real pages do it
    anyway, and width is the honest size signal."""
    return (
        F.when(desc.rlike(r"^\d+w$"), F.lit(2.0))
        .when(desc.rlike(r"^\d+(?:\.\d+)?x$"), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )


def _descriptor_score(desc: Column) -> Column:
    # score branches MIRROR the tier branches: an invalid descriptor
    # is tier 0 and must carry score 0 too, or it would beat an
    # earlier descriptorless candidate that first-wins owes the pick
    return (
        F.when(
            desc.rlike(r"^\d+w$"),
            F.regexp_extract(desc, r"^(\d+)w$", 1).cast("double"),
        )
        .when(
            desc.rlike(r"^\d+(?:\.\d+)?x$"),
            F.regexp_extract(desc, r"^(\d+(?:\.\d+)?)x$", 1).cast(
                "double"
            ),
        )
        .otherwise(F.lit(0.0))
    )


_CAND_T = "array<struct<u:string,d:string>>"


def _srcset_candidates(srcset: Column) -> Column:
    """Parse a srcset value into (url, first-descriptor) candidate
    structs with the WHATWG image-candidate state machine over
    whitespace tokens — NOT a naive split on ',' (round-15 review:
    CDN transform URLs like Cloudinary's ``.../c_fill,w_800/x.jpg``
    carry commas INSIDE the URL, and a comma-split turned their tail
    into a bogus descriptor-bearing candidate that outranked valid
    ones). Per the spec: a candidate's URL is a maximal
    non-whitespace run (embedded commas allowed); a TRAILING comma
    on the URL ends a descriptorless candidate; in the descriptor
    region the first comma ends the candidate and what follows it in
    the same token is the next URL. Only the FIRST descriptor is
    kept (w and x never legally co-occur). One ``aggregate`` over
    one ``split`` — native expressions, no Python, no extra scan;
    kept deliberately two-phase (parse, then score) so the scoring
    regexes run once per CANDIDATE, not once per state branch."""
    toks = F.filter(
        F.split(srcset, r"[ \t\n\x0b\f\r]+"),
        lambda t: t != "",
    )

    def close(cs, u, d):
        return F.when(
            u != "",
            F.array_append(cs, F.struct(u.alias("u"), d.alias("d"))),
        ).otherwise(cs)

    def mk(cs, cu, cd):
        return F.struct(cs.alias("cs"), cu.alias("cu"), cd.alias("cd"))

    def merge(acc, t):
        # ---- URL state (no candidate open) --------------------------
        t_url = F.regexp_replace(t, "^,+", "")  # spec: skip commas
        u_done = t_url.rlike(",$")              # trailing comma ends a
        u_bare = F.regexp_replace(t_url, ",+$", "")  # bare candidate
        url_state = (
            F.when(t_url == "", acc)            # pure separator token
            .when(
                u_done,
                mk(close(acc["cs"], u_bare, F.lit("")),
                   F.lit(""), F.lit("")),
            )
            .otherwise(mk(acc["cs"], t_url, F.lit("")))
        )
        # ---- descriptor state (candidate URL open) ------------------
        dpart = F.substring_index(t, ",", 1)    # before first comma
        rest = F.regexp_extract(t, "^[^,]*,(.*)", 1)
        fin_desc = F.when(acc["cd"] != "", acc["cd"]).otherwise(dpart)
        cs1 = close(acc["cs"], acc["cu"], fin_desc)
        # after the closing comma the SAME token re-enters URL state
        # (embedded commas in that url stay; its own trailing comma
        # would close it as a bare candidate)
        r_url = F.regexp_replace(rest, "^,+", "")
        r_done = r_url.rlike(",$")
        r_bare = F.regexp_replace(r_url, ",+$", "")
        desc_state = (
            F.when(
                t.contains(","),
                F.when(r_url == "", mk(cs1, F.lit(""), F.lit("")))
                .when(
                    r_done,
                    mk(close(cs1, r_bare, F.lit("")),
                       F.lit(""), F.lit("")),
                )
                .otherwise(mk(cs1, r_url, F.lit(""))),
            ).otherwise(
                # plain descriptor token: keep only the FIRST
                mk(acc["cs"], acc["cu"],
                   F.when(acc["cd"] == "", t).otherwise(acc["cd"])),
            )
        )
        return F.when(acc["cu"] == "", url_state).otherwise(desc_state)

    return F.aggregate(
        toks,
        mk(F.array().cast(_CAND_T), F.lit(""), F.lit("")),
        merge,
        lambda acc: close(acc["cs"], acc["cu"], acc["cd"]),
    )


def _srcset_best(srcset: Column) -> Column:
    """Highest-resolution candidate of a srcset value: largest width
    descriptor wins, else largest density, else the first candidate;
    strictly-greater comparison keeps the EARLIEST on ties
    (deterministic, matches browser first-wins-on-equal). Candidates
    come from the spec-shaped parse (_srcset_candidates). Returns ''
    when the attribute is absent."""
    scored = F.transform(
        _srcset_candidates(srcset),
        lambda c: F.struct(
            c["u"].alias("url"),
            _descriptor_tier(c["d"]).alias("tier"),
            _descriptor_score(c["d"]).alias("score"),
        ),
    )
    return F.aggregate(
        scored,
        F.struct(
            F.lit("").alias("url"),
            F.lit(-1.0).alias("tier"),
            F.lit(-1.0).alias("score"),
        ),
        lambda acc, c: F.when(
            (c["tier"] > acc["tier"])
            | ((c["tier"] == acc["tier"]) & (c["score"] > acc["score"])),
            c,
        ).otherwise(acc),
    )["url"]


# <picture> is the modern responsive idiom: the real candidates ride
# <source srcset>, the inner <img> is the fallback (and is ALSO
# caught by the global _IMG_TAG scan). Browsers pick the first
# matching <source>; the highest-resolution candidate of that
# source's srcset is the training-data analog (_srcset_best).
_PICTURE = r"(?is)<picture\b[^>]*>.*?</picture>"
# first <source> tag that actually CARRIES a srcset (browsers skip
# srcset-less sources); candidate choice within it is _srcset_best
_SOURCE_WITH_SRCSET = (
    r"""(?is)<source\b[^>]*?(?<![-\w])srcset\s*=\s*["'][^>]*>"""
)
# social-card metadata: og:image (+ :url/:secure_url variants) and
# twitter:image(:src) carry the page's canonical image; captions
# come from the page-level og:/twitter:description metas. Attribute
# order varies in the wild (content before property and vice versa),
# so the tag is matched whole and content extracted from it. The
# property/name attribute names anchor with (?<![-\w]) like every
# other attribute here — without it, data-property="og:image" (a
# framework template's stash, not a social card) would be
# misclassified (round-14 advisor finding).
_META_IMG_TAG = (
    r"""(?i)<meta\b[^>]*?(?<![-\w])(?:property|name)\s*=\s*["']"""
    r"""(?:og:image(?::(?:secure_)?url)?|twitter:image(?::src)?)["']"""
    r"""[^>]*>"""
)
_OG_DESC_TAG = (
    r"""(?i)<meta\b[^>]*?(?<![-\w])property\s*=\s*["']"""
    r"""og:description["'][^>]*>"""
)
_TW_DESC_TAG = (
    r"""(?i)<meta\b[^>]*?(?<![-\w])name\s*=\s*["']"""
    r"""twitter:description["'][^>]*>"""
)


def _resolve_url(base: Column, src: Column) -> Column:
    """Resolve ``src`` against page URL ``base`` — the four layouts
    of crawl HTML: absolute (case-insensitive scheme, as HTML
    carries it), scheme-relative (//host/..), root-relative (/path),
    path-relative. No case normalization of absolute URLs (the lite
    posture): a page shouting HTTP://HOST passes through verbatim
    and simply won't join a lowercase-normalized fetch URL."""
    scheme = F.regexp_extract(base, r"^(https?):", 1)
    origin = F.regexp_extract(base, r"^(https?://[^/]+)", 1)
    # base directory: page URL through the last '/' PAST the origin;
    # a bare http://host has no path slash, so fall back to origin/
    base_dir = F.regexp_extract(base, r"^(https?://[^/]+(?:/[^?#]*)?/)", 1)
    base_dir = F.when(base_dir == "", F.concat(origin, F.lit("/"))).otherwise(
        base_dir
    )
    return (
        F.when(src.rlike(r"(?i)^https?://"), src)
        .when(src.startswith("//"), F.concat(scheme, F.lit(":"), src))
        .when(src.startswith("/"), F.concat(origin, src))
        .otherwise(F.concat(base_dir, src))
    )


# a src that opens with a URI scheme (RFC 3986: ALPHA then
# alnum/+/-/.) is NOT a relative reference — anything non-http(s)
# (data:, javascript:, mailto:, ftp:, blob:, cid:...) can never join
# a crawled blob and must be dropped, not glued onto base_dir
_NON_HTTP_SCHEME = r"^[A-Za-z][A-Za-z0-9+.\-]*:"
_HTTP_ABS = r"(?i)^https?://"


def _keep_src(src: Column) -> Column:
    return (src != "") & (
        ~src.rlike(_NON_HTTP_SCHEME) | src.rlike(_HTTP_ABS)
    )


def extract_image_refs(
    df: DataFrame, html_col: str, url_col: str
) -> DataFrame:
    """One row per image REFERENCE across every page: (page_url,
    img_src, resolved_url, alt_text) — ``<img>`` tags, the
    highest-resolution ``<source srcset>`` candidate of each
    ``<picture>`` block (the fallback ``<img>`` inside is also
    caught by the global img scan), and og:image / twitter:image
    social-card metas captioned by the page-level
    og:/twitter:description. srcset candidates pick by largest
    width descriptor, else largest density, else first
    (_srcset_best).

    ``alt_text`` coalesces aria-label (the WAI-ARIA accessible name
    outranks alt), then alt, then title, and is NULL when none
    exists (an honest no-caption row, not an empty string); data:
    and other non-http(s)-scheme URIs and srcless tags are dropped.

    Pure native expressions, and the three tag families ride ONE
    scan + ONE generate: their match arrays concat before a single
    explode, then per-row whens branch on the tag shape — at 100 TB
    of HTML the alternative (union of three extractions) re-reads
    the corpus three times."""
    tag = F.col("__tag")
    is_pic = tag.rlike(r"(?i)^<picture")
    is_meta = tag.rlike(r"(?i)^<meta")
    pages = df.select(
        F.col(url_col).alias("page_url"),
        # page-level caption for social-card rows: og:description,
        # else twitter:description, extracted from the whole page
        # BEFORE the explode so every meta row can see it
        _attr_val(
            F.regexp_extract(F.col(html_col), _OG_DESC_TAG, 0),
            "content",
        ).alias("__og_desc"),
        _attr_val(
            F.regexp_extract(F.col(html_col), _TW_DESC_TAG, 0),
            "content",
        ).alias("__tw_desc"),
        # lit-pattern form, NOT an F.expr SQL string: SQL literals eat
        # the \b escape before the regex engine sees it
        F.explode(
            F.concat(
                F.regexp_extract_all(
                    F.col(html_col), F.lit(_IMG_TAG), F.lit(0)
                ),
                F.regexp_extract_all(
                    F.col(html_col), F.lit(_PICTURE), F.lit(0)
                ),
                F.regexp_extract_all(
                    F.col(html_col), F.lit(_META_IMG_TAG), F.lit(0)
                ),
            )
        ).alias("__tag"),
    )
    src_q = F.regexp_extract(tag, _SRC, 1)
    src_u = F.regexp_extract(tag, _SRC_UNQ, 1)
    data_src = F.regexp_extract(tag, _DATA_SRC, 1)
    srcset1 = _srcset_best(_attr_val(tag, "srcset"))
    source1 = _srcset_best(
        _attr_val(
            F.regexp_extract(tag, _SOURCE_WITH_SRCSET, 0), "srcset"
        )
    )
    content = _attr_val(tag, "content")
    # <img> precedence: quoted src, unquoted src, the lazy-load
    # data-src, then the first srcset candidate (lazy-loading pages
    # often ship a 1x1 placeholder in src and the real image
    # elsewhere — preferring data-src over a placeholder src would
    # be guesswork; taking src first is the deterministic,
    # documented choice). &amp; un-escapes because the join key is
    # the FETCHED URL (WARC-Target-URI carries the decoded
    # ampersand). trim: browsers strip surrounding whitespace from
    # URL attribute values, and a stray space would poison the key.
    src = F.trim(
        F.replace(
            F.when(is_meta, content)
            .when(is_pic, source1)
            .when(src_q != "", src_q)
            .when(src_u != "", src_u)
            .when(data_src != "", data_src)
            .otherwise(srcset1),
            F.lit("&amp;"),
            F.lit("&"),
        )
    )
    caption = (
        F.when(
            is_meta,
            F.when(F.col("__og_desc") != "", F.col("__og_desc"))
            .when(F.col("__tw_desc") != "", F.col("__tw_desc"))
            .otherwise(F.lit(None).cast("string")),
        )
        .otherwise(
            F.coalesce(
                _attr_or_null(tag, "aria-label"),
                _attr_or_null(tag, "alt"),
                _attr_or_null(tag, "title"),
            )
        )
    )
    return (
        pages.select(
            "page_url",
            src.alias("img_src"),
            caption.alias("alt_text"),
        )
        .filter(_keep_src(F.col("img_src")))
        .withColumn(
            "resolved_url",
            _resolve_url(F.col("page_url"), F.col("img_src")),
        )
    )


_FIGURE = r"(?is)<figure\b[^>]*>.*?</figure>"
_FIGCAPTION = r"(?is)<figcaption\b[^>]*>(.*?)</figcaption>"


def extract_figure_captions(
    df: DataFrame, html_col: str, url_col: str
) -> DataFrame:
    """(page_url, resolved_url, figcaption) for every ``<figure>``
    that wraps an ``<img>`` and a ``<figcaption>`` — the
    author-written caption, a far stronger text signal than alt
    attributes. Figure blocks extract with a non-greedy dotall
    regexp (bounded per block), the img src resolves with the same
    rules as extract_image_refs, and the caption body passes through
    strip_html so nested markup becomes plain text. Still a single
    projected scan + generate, no Python."""
    from clustering_spark.operators.textnorm import strip_html

    figs = df.select(
        F.col(url_col).alias("page_url"),
        F.explode(
            F.regexp_extract_all(
                F.col(html_col), F.lit(_FIGURE), F.lit(0)
            )
        ).alias("__fig"),
    )
    src_q = F.regexp_extract(F.col("__fig"), _SRC, 1)
    src_u = F.regexp_extract(F.col("__fig"), _SRC_UNQ, 1)
    data_src = F.regexp_extract(F.col("__fig"), _DATA_SRC, 1)
    srcset1 = _srcset_best(_attr_val(F.col("__fig"), "srcset"))
    src = F.trim(
        F.replace(
            F.when(src_q != "", src_q)
            .when(src_u != "", src_u)
            .when(data_src != "", data_src)
            .otherwise(srcset1),
            F.lit("&amp;"),
            F.lit("&"),
        )
    )
    cap_raw = F.regexp_extract(F.col("__fig"), _FIGCAPTION, 1)
    return (
        figs.select(
            "page_url",
            src.alias("__src"),
            strip_html(cap_raw).alias("figcaption"),
        )
        .filter(
            _keep_src(F.col("__src"))
            & (F.trim(F.col("figcaption")) != "")
        )
        .select(
            "page_url",
            _resolve_url(F.col("page_url"), F.col("__src")).alias(
                "resolved_url"
            ),
            "figcaption",
        )
    )


def image_text_pairs(
    pages: DataFrame,
    media: DataFrame,
    html_col: str = "text",
    page_url_col: str = "url",
    media_url_col: str = "url",
    media_bin_col: str = "body",
    require_caption: bool = True,
    use_figcaptions: bool = True,
    normalize_urls: bool = False,
) -> DataFrame:
    """The pairing join: ``pages`` (page_url + raw HTML) x ``media``
    (fetched blobs keyed by URL) -> one row per matched reference:
    (page_url, resolved_url, alt_text, blob). ``require_caption``
    drops NULL/whitespace captions — a CLIP-style corpus wants text;
    set False for image-harvest inventories.

    ``normalize_urls=True`` (round 15) applies RFC 3986 syntax
    normalization (operators/urlnorm.py: scheme/host case, default
    ports, dot segments, fragments) to BOTH join sides, recovering
    pairs whose authored reference aliases the crawler's fetch URL
    (``HTTP://Host:80/a/../img.png`` vs ``http://host/img.png``) —
    misses an equi-join on raw strings silently drops. Off by
    default: the emitted resolved_url then differs from the raw
    reference, which existing consumers may key on.

    Scale note: only (page_url, resolved_url, alt) rides the join
    from the HTML side; the blob column comes from the media side's
    scan and is never duplicated per page (a URL referenced by many
    pages joins to many caption rows — near-dup/exact dedup
    downstream collapses them, same doctrine as text)."""
    from clustering_spark.operators.urlnorm import normalize_url

    refs = extract_image_refs(pages, html_col, page_url_col)
    if normalize_urls:
        refs = refs.withColumn(
            "resolved_url", normalize_url(F.col("resolved_url"))
        )
    if use_figcaptions:
        # author-written figcaptions upgrade alt text where present;
        # min() makes a multiply-captioned URL deterministic. The
        # caption side normalizes with the refs side (or the upgrade
        # join would miss aliased figure srcs).
        figs = extract_figure_captions(pages, html_col, page_url_col)
        if normalize_urls:
            figs = figs.withColumn(
                "resolved_url", normalize_url(F.col("resolved_url"))
            )
        caps = figs.groupBy("page_url", "resolved_url").agg(
            F.min("figcaption").alias("__figcap")
        )
        refs = (
            refs.join(caps, on=["page_url", "resolved_url"], how="left")
            .withColumn(
                "alt_text",
                F.coalesce(F.col("__figcap"), F.col("alt_text")),
            )
            .drop("__figcap")
        )
    if require_caption:
        refs = refs.filter(
            F.col("alt_text").isNotNull()
            & (F.trim(F.col("alt_text")) != "")
        )
    media_key = F.col(media_url_col)
    if normalize_urls:
        media_key = normalize_url(media_key)
    # ONE blob per join key: distinct media rows that share a key —
    # re-fetches of the same URL, or (under normalize_urls) aliases
    # like 'http://h/a' and 'HTTP://h:80/a' both fetched — would
    # each join every matching reference and duplicate pairs with
    # identical blobs (round-16 advisor). min() is a deterministic
    # pick and a partial-aggregatable single shuffle of the slim
    # (key, blob) projection.
    m = (
        media.select(
            media_key.alias("resolved_url"),
            F.col(media_bin_col).alias("blob"),
        )
        .groupBy("resolved_url")
        .agg(F.min("blob").alias("blob"))
    )
    return refs.join(m, on="resolved_url").select(
        "page_url", "resolved_url", "alt_text", "blob"
    )


__all__ = [
    "extract_image_refs",
    "extract_figure_captions",
    "image_text_pairs",
]
