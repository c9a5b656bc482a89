"""Image-text pair construction (operators/pairing.py): tag
extraction, URL resolution layouts, caption fallback, the pairing
join, and the crawl capstone composition with media near-dup
survivors.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clustering_spark.operators.pairing import (
    extract_image_refs,
    image_text_pairs,
)


class TestExtractRefs:
    def test_attribute_orders_and_quotes(self, spark):
        html = (
            '<p>x</p><img src="a.png" alt="first cat">'
            "<IMG ALT='second dog' SRC='/imgs/b.jpg'>"
            '<img class="x" src="//cdn.example/c.gif" title="third">'
            '<img src="https://other.example/d.png">'
            '<img src="data:image/png;base64,AAAA" alt="inline">'
            "<img alt='no src at all'>"
        )
        df = spark.createDataFrame(
            [("http://site.example/dir/page.html", html)], "url string, text string"
        )
        out = (
            extract_image_refs(df, "text", "url")
            .toPandas()
            .set_index("img_src")
        )
        assert len(out) == 4  # data: and srcless dropped
        assert out.loc["a.png", "resolved_url"] == (
            "http://site.example/dir/a.png"
        )
        assert out.loc["a.png", "alt_text"] == "first cat"
        assert out.loc["/imgs/b.jpg", "resolved_url"] == (
            "http://site.example/imgs/b.jpg"
        )
        assert out.loc["/imgs/b.jpg", "alt_text"] == "second dog"
        # protocol-relative inherits the page scheme; title is the
        # caption fallback
        assert out.loc["//cdn.example/c.gif", "resolved_url"] == (
            "http://cdn.example/c.gif"
        )
        assert out.loc["//cdn.example/c.gif", "alt_text"] == "third"
        assert out.loc["https://other.example/d.png", "resolved_url"] == (
            "https://other.example/d.png"
        )
        # no alt, no title -> NULL caption, never empty string
        assert out.loc["https://other.example/d.png", "alt_text"] is None

    def test_bare_host_page_resolves_relative(self, spark):
        df = spark.createDataFrame(
            [("https://host.example", '<img src="x.png" alt="a">')],
            "url string, text string",
        )
        row = extract_image_refs(df, "text", "url").collect()[0]
        assert row.resolved_url == "https://host.example/x.png"

    def test_query_string_not_part_of_base_dir(self, spark):
        df = spark.createDataFrame(
            [(
                "http://h.example/a/b.html?q=/evil/",
                '<img src="r.png" alt="a">',
            )],
            "url string, text string",
        )
        row = extract_image_refs(df, "text", "url").collect()[0]
        assert row.resolved_url == "http://h.example/a/r.png"

    def test_plan_is_single_scan_no_shuffle(self, spark):
        from clustering_spark.plans import count_shuffles

        df = spark.createDataFrame(
            [("http://x/", "<img src='a' alt='b'>")],
            "url string, text string",
        )
        assert count_shuffles(extract_image_refs(df, "text", "url")) == 0


class TestPairing:
    def test_join_matches_blobs_and_caption_gate(self, spark):
        pages = spark.createDataFrame(
            [
                (
                    "http://s.example/p1",
                    '<img src="/i/cat.png" alt="a cat photo">'
                    '<img src="/i/missing.png" alt="gone">'
                    '<img src="/i/dog.png">',
                ),
            ],
            "url string, text string",
        )
        media = spark.createDataFrame(
            [
                ("http://s.example/i/cat.png", b"CATBYTES"),
                ("http://s.example/i/dog.png", b"DOGBYTES"),
            ],
            "url string, body binary",
        )
        pairs = image_text_pairs(pages, media).toPandas()
        # dog has no caption (require_caption=True), missing has no blob
        assert len(pairs) == 1
        assert pairs.alt_text[0] == "a cat photo"
        assert bytes(pairs.blob[0]) == b"CATBYTES"

        inv = image_text_pairs(pages, media, require_caption=False)
        assert inv.count() == 2  # dog joins with NULL caption


def test_crawl_to_image_text_pairs_capstone(spark, tmp_path):
    """End-to-end: ONE WARC carries HTML pages and the images they
    reference; the chain yields deduplicated (caption, blob) training
    pairs — extract refs from the HTML leg, join blobs by resolved
    URL, collapse perceptual dups via media_survivors."""
    from clustering_spark.operators.png import encode_png
    from clustering_spark.sources.warc_source import (
        make_http_response,
        make_warc,
        read_warc,
        warc_responses,
    )
    from clustering_spark.trainprep import media_survivors

    rng = np.random.default_rng(23)
    pixels = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    img_a = encode_png(pixels, filter_type=0)
    img_a2 = encode_png(pixels, filter_type=2)  # same pixels, new bytes
    pixels_p = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    img_pic = encode_png(pixels_p, filter_type=0)
    page = (
        "<html><body>"
        '<img src="/i/a.png" alt="mountain lake at dawn">'
        '<img src="/i/a2.png" alt="the same lake again">'
        # round 14: a <picture>-only image — the candidate rides
        # <source srcset>, no fallback <img> src at all
        '<picture><source srcset="/i/pic.png 1x" type="image/png">'
        '<img alt="alpine ridge in fog"></picture>'
        "</body></html>"
    ).encode()
    records = [
        ("response", "http://s.example/page", make_http_response(page)),
        ("response", "http://s.example/i/a.png",
         make_http_response(img_a, content_type="image/png")),
        ("response", "http://s.example/i/a2.png",
         make_http_response(img_a2, content_type="image/png")),
        ("response", "http://s.example/i/pic.png",
         make_http_response(img_pic, content_type="image/png")),
    ]
    (tmp_path / "pairs-0.warc").write_bytes(make_warc(records))
    resp = warc_responses(read_warc(spark, str(tmp_path)))

    pages = resp.filter(
        F.col("http_content_type").startswith("text/html")
    ).select("url", "text")
    media = resp.filter(
        F.col("http_content_type").startswith("image/")
    ).select("url", "record_idx", "body")

    # perceptual dedup FIRST: a2 collapses into a (same dHash), so
    # only one blob survives into pairing
    kept = media_survivors(media, "body", "record_idx")
    pairs = (
        image_text_pairs(pages, kept)
        .toPandas()
        .set_index("resolved_url")
    )
    assert len(pairs) == 2
    assert (
        pairs.loc["http://s.example/i/a.png", "alt_text"]
        == "mountain lake at dawn"
    )
    assert bytes(pairs.loc["http://s.example/i/a.png", "blob"]) == img_a
    # the <picture>-only image pairs via its <source srcset>
    # candidate, captioned by the fallback img's alt
    assert (
        pairs.loc["http://s.example/i/pic.png", "alt_text"]
        == "alpine ridge in fog"
    )
    assert (
        bytes(pairs.loc["http://s.example/i/pic.png", "blob"])
        == img_pic
    )


def test_unquoted_src_and_entity_unescape(spark):
    """Old/generated HTML: unquoted src attributes and &amp;-escaped
    query strings — both must land on the FETCHED URL form."""
    html = (
        "<img src=imgs/u.png alt='plain'>"
        '<img src="/q.png?a=1&amp;b=2" alt="ent">'
    )
    df = spark.createDataFrame(
        [("http://h.example/d/p.html", html)], "url string, text string"
    )
    out = extract_image_refs(df, "text", "url").toPandas().set_index(
        "alt_text"
    )
    assert out.loc["plain", "resolved_url"] == (
        "http://h.example/d/imgs/u.png"
    )
    assert out.loc["ent", "resolved_url"] == (
        "http://h.example/q.png?a=1&b=2"
    )


def test_lazyload_data_src_and_srcset_fallbacks(spark):
    """Modern lazy-loading markup: the real URL rides data-src or
    srcset while src is absent (or absent entirely)."""
    html = (
        '<img data-src="/lazy/a.png" alt="lazy one">'
        '<img srcset="/set/b-480.png 480w, /set/b-800.png 800w"'
        ' alt="from srcset">'
        '<img src="/plain/c.png" data-src="/lazy/ignored.png"'
        ' alt="src wins">'
    )
    df = spark.createDataFrame(
        [("http://h.example/p", html)], "url string, text string"
    )
    out = extract_image_refs(df, "text", "url").toPandas().set_index(
        "alt_text"
    )
    assert out.loc["lazy one", "resolved_url"] == (
        "http://h.example/lazy/a.png"
    )
    # round 15: srcset picks the LARGEST width descriptor, not the
    # first candidate — a training corpus wants the big image
    assert out.loc["from srcset", "resolved_url"] == (
        "http://h.example/set/b-800.png"
    )
    assert out.loc["src wins", "resolved_url"] == (
        "http://h.example/plain/c.png"
    )


def test_data_src_before_src_does_not_shadow(spark):
    """Round-13 advisor (medium): \\b matches after a hyphen, so an
    unanchored src pattern also hit the `src=` inside `data-src=`,
    making precedence depend on ATTRIBUTE ORDER. With data-src
    FIRST in the tag, src must still win; data-alt/data-title must
    not pollute captions either."""
    html = (
        '<img data-src="/lazy/real.jpg" src="/placeholder.gif"'
        ' data-alt="machine caption" alt="human caption">'
        '<img data-title="not a title" data-src="/lazy/only.png">'
        '<img data-srcset="/d/x.png 1x" srcset="/s/y.png 1x"'
        ' alt="srcset order">'
    )
    df = spark.createDataFrame(
        [("http://o.example/p", html)], "url string, text string"
    )
    out = extract_image_refs(df, "text", "url").toPandas()
    by_url = out.set_index("resolved_url")
    # src wins regardless of data-src coming first in the tag
    assert "http://o.example/placeholder.gif" in by_url.index
    assert "http://o.example/lazy/real.jpg" not in by_url.index
    assert (
        by_url.loc["http://o.example/placeholder.gif", "alt_text"]
        == "human caption"
    )
    # srcless tag still falls back to data-src; data-title is NOT a
    # caption, so the row is an honest NULL-caption row
    assert "http://o.example/lazy/only.png" in by_url.index
    assert by_url.loc[
        "http://o.example/lazy/only.png", "alt_text"
    ] is None
    # real srcset beats data-srcset regardless of order
    assert (
        by_url.loc["http://o.example/s/y.png", "alt_text"]
        == "srcset order"
    )
    assert "http://o.example/d/x.png" not in by_url.index


def test_picture_source_srcset_extracted(spark):
    """Round 14: <picture><source srcset> is the modern responsive
    idiom — the candidate rides the FIRST source's first srcset
    entry, captioned by the block's img alt; the fallback <img>
    inside still yields its own row via the global img scan."""
    html = (
        '<picture><source srcset="/p/big.webp 2x, /p/small.webp 1x"'
        ' type="image/webp">'
        '<source srcset="/p/big.jpg 2x" type="image/jpeg">'
        '<img src="/p/fallback.jpg" alt="harbor at night"></picture>'
    )
    df = spark.createDataFrame(
        [("http://p.example/x", html)], "url string, text string"
    )
    out = extract_image_refs(df, "text", "url").toPandas()
    got = dict(zip(out.resolved_url, out.alt_text))
    assert got == {
        "http://p.example/p/big.webp": "harbor at night",
        "http://p.example/p/fallback.jpg": "harbor at night",
    }


def test_og_and_twitter_meta_pairs(spark):
    """og:image / twitter:image social-card metas pair with the
    page-level og:/twitter:description — attribute order varies in
    the wild (content-first and property-first both occur)."""
    html = (
        "<head>"
        '<meta property="og:image"'
        ' content="https://cdn.example/og.jpg">'
        '<meta content="/tw.png" name="twitter:image">'
        '<meta property="og:description" content="A quiet cove">'
        "</head><body>no imgs</body>"
    )
    df = spark.createDataFrame(
        [("http://m.example/a/page", html)],
        "url string, text string",
    )
    out = extract_image_refs(df, "text", "url").toPandas()
    got = dict(zip(out.resolved_url, out.alt_text))
    assert got == {
        "https://cdn.example/og.jpg": "A quiet cove",
        "http://m.example/tw.png": "A quiet cove",
    }

    # twitter:description is the fallback when og:description absent;
    # no description at all -> honest NULL caption
    html2 = (
        '<meta name="twitter:image" content="/only.png">'
        '<meta name="twitter:description" content="tw cap">'
    )
    df2 = spark.createDataFrame(
        [("http://m.example/b", html2)], "url string, text string"
    )
    out2 = extract_image_refs(df2, "text", "url").toPandas()
    assert out2.alt_text[0] == "tw cap"
    html3 = '<meta property="og:image" content="/bare.png">'
    df3 = spark.createDataFrame(
        [("http://m.example/c", html3)], "url string, text string"
    )
    out3 = extract_image_refs(df3, "text", "url").toPandas()
    assert out3.alt_text[0] is None


def test_aria_label_outranks_alt(spark):
    """WAI-ARIA accessible-name order: aria-label > alt > title."""
    html = (
        '<img src="/a.png" alt="alt text" aria-label="aria text">'
        '<img src="/b.png" title="title text">'
    )
    df = spark.createDataFrame(
        [("http://a.example/", html)], "url string, text string"
    )
    out = extract_image_refs(df, "text", "url").toPandas()
    got = dict(zip(out.resolved_url, out.alt_text))
    assert got == {
        "http://a.example/a.png": "aria text",
        "http://a.example/b.png": "title text",
    }


def test_adversarial_srcs_dropped_or_passed_verbatim(spark):
    """Round-14 review batch 2: non-http(s) scheme srcs (javascript:,
    mailto:, ftp:, blob:, data:) can never join a crawled blob and
    must be DROPPED, not glued onto base_dir; uppercase-scheme
    absolutes pass through verbatim instead of being mangled into
    path-relative junk; surrounding whitespace is trimmed off the
    join key."""
    html = (
        '<img src="javascript:alert(1)" alt="xss">'
        '<img src="mailto:a@b.c" alt="mail">'
        '<img src="ftp://host/f.png" alt="ftp">'
        '<img src="blob:http://h/x" alt="blob">'
        '<img src="data:image/png;base64,AAAA" alt="data">'
        '<img src="HTTP://UPPER.example/IMG.png" alt="upper">'
        '<img src="  /padded/ok.png  " alt="padded">'
        '<img src="a:b/weird.png" alt="colonseg">'
        '<img src="./dot/rel.png" alt="dotrel">'
    )
    df = spark.createDataFrame(
        [("http://h.example/dir/page", html)],
        "url string, text string",
    )
    out = extract_image_refs(df, "text", "url").toPandas()
    by_alt = out.set_index("alt_text")
    # every non-http scheme dropped (colon-first-segment too: RFC
    # 3986 says a relative ref cannot open with scheme-shaped text)
    for gone in ("xss", "mail", "ftp", "blob", "data", "colonseg"):
        assert gone not in by_alt.index
    # uppercase absolute passes verbatim
    assert (
        by_alt.loc["upper", "resolved_url"]
        == "HTTP://UPPER.example/IMG.png"
    )
    # whitespace trimmed before resolution
    assert (
        by_alt.loc["padded", "resolved_url"]
        == "http://h.example/padded/ok.png"
    )
    # ./ dot-segment rides through un-normalized (documented lite
    # posture) but stays a working relative resolution
    assert (
        by_alt.loc["dotrel", "resolved_url"]
        == "http://h.example/dir/./dot/rel.png"
    )


def test_figcaption_upgrades_alt(spark):
    """Author-written figcaptions beat alt text; pages without
    figures keep the alt path untouched."""
    from clustering_spark.operators.pairing import (
        extract_figure_captions,
    )

    html = (
        "<figure><img src='/i/fig.png' alt='thumb'>"
        "<figcaption>A <b>tall</b> ship leaving harbor at dusk"
        "</figcaption></figure>"
        '<img src="/i/plain.png" alt="just alt">'
    )
    pages = spark.createDataFrame(
        [("http://f.example/p", html)], "url string, text string"
    )
    caps = extract_figure_captions(pages, "text", "url").toPandas()
    assert len(caps) == 1
    assert caps.figcaption[0] == "A tall ship leaving harbor at dusk"
    assert caps.resolved_url[0] == "http://f.example/i/fig.png"

    media = spark.createDataFrame(
        [
            ("http://f.example/i/fig.png", b"FIG"),
            ("http://f.example/i/plain.png", b"PLAIN"),
        ],
        "url string, body binary",
    )
    pairs = image_text_pairs(pages, media).toPandas().set_index(
        "resolved_url"
    )
    assert pairs.loc["http://f.example/i/fig.png", "alt_text"] == (
        "A tall ship leaving harbor at dusk"
    )
    assert pairs.loc["http://f.example/i/plain.png", "alt_text"] == (
        "just alt"
    )


def test_quote_aware_caption_values(spark):
    """Round 15 (advisor): attribute values match quote-AWARE — a
    double-quoted value keeps its apostrophes (the old ["']...["']
    class truncated alt="World's best" at the apostrophe), and a
    single-quoted value keeps embedded double quotes."""
    html = (
        '<img src="/q/a.png" alt="World\'s best harbor">'
        "<img src='/q/b.png' alt='He said \"ahoy\" twice'>"
        '<img src="/q/c.png" aria-label="the ship\'s wheel">'
        '<meta property="og:image" content="/q/og.png">'
        '<meta property="og:description"'
        ' content="Chef\'s special: po\'boys">'
    )
    df = spark.createDataFrame(
        [("http://q.example/p", html)], "url string, text string"
    )
    out = extract_image_refs(df, "text", "url").toPandas()
    got = dict(zip(out.resolved_url, out.alt_text))
    assert got == {
        "http://q.example/q/a.png": "World's best harbor",
        "http://q.example/q/b.png": 'He said "ahoy" twice',
        "http://q.example/q/c.png": "the ship's wheel",
        "http://q.example/q/og.png": "Chef's special: po'boys",
    }


def test_meta_attr_names_anchored(spark):
    """Round 15 (advisor): data-property="og:image" /
    data-name="twitter:image" are framework stashes, not social
    cards — the (?<![-\\w]) anchor keeps them out; and a
    data-property="og:description" must not become the page caption."""
    html = (
        '<meta data-property="og:image" content="/not-a-card.png">'
        '<meta data-name="twitter:image" content="/also-not.png">'
        '<meta data-property="og:description" content="stash text">'
        '<meta property="og:image" content="/real-card.png">'
    )
    df = spark.createDataFrame(
        [("http://n.example/p", html)], "url string, text string"
    )
    out = extract_image_refs(df, "text", "url").toPandas()
    got = dict(zip(out.resolved_url, out.alt_text))
    # only the real og:image survives, and with NO caption (the
    # data-property description is not a page description)
    assert got == {"http://n.example/real-card.png": None}


def test_srcset_best_resolution_selection(spark):
    """Round 15: srcset picks largest width descriptor, else largest
    density, else the first candidate; ties keep the earliest.
    Width always outranks density when pages mix them."""
    html = (
        # widths, listed small-first: largest w wins
        '<img srcset="/w/a-320.png 320w, /w/a-1280.png 1280w,'
        ' /w/a-640.png 640w" alt="widths">'
        # densities incl. float: 2.5x beats 2x and 1x
        '<img srcset="/d/b-1.png 1x, /d/b-25.png 2.5x,'
        ' /d/b-2.png 2x" alt="densities">'
        # mixed (spec-invalid, real-world): width outranks density
        '<img srcset="/m/c-3x.png 3x, /m/c-100.png 100w"'
        ' alt="mixed">'
        # no descriptors: first candidate (old behavior preserved)
        '<img srcset="/f/first.png, /f/second.png" alt="bare">'
        # tie on width: earliest wins (deterministic)
        '<img srcset="/t/e1.png 400w, /t/e2.png 400w" alt="tie">'
        # picture: best candidate WITHIN the first srcset source
        '<picture><source media="(min-width:600px)">'
        '<source srcset="/p/s-200.webp 200w, /p/s-900.webp 900w">'
        '<img src="/p/fb.jpg" alt="pic"></picture>'
    )
    df = spark.createDataFrame(
        [("http://s.example/p", html)], "url string, text string"
    )
    out = extract_image_refs(df, "text", "url").toPandas()
    got = dict(zip(out.alt_text, out.resolved_url))
    assert got["widths"] == "http://s.example/w/a-1280.png"
    assert got["densities"] == "http://s.example/d/b-25.png"
    assert got["mixed"] == "http://s.example/m/c-100.png"
    assert got["bare"] == "http://s.example/f/first.png"
    assert got["tie"] == "http://s.example/t/e1.png"
    # picture rows: best source candidate + the fallback img
    pic_urls = set(
        out[out.alt_text == "pic"].resolved_url
    )
    assert pic_urls == {
        "http://s.example/p/s-900.webp",
        "http://s.example/p/fb.jpg",
    }


def test_meta_variants_and_conflicts(spark):
    """Round-15 review batch 1: og:image:width/height are DIMENSION
    metas, not image refs; multiple og:image tags each yield a row;
    with conflicting descriptions the FIRST og:description wins
    (deterministic-browser analog)."""
    html = (
        '<meta property="og:image" content="/m/one.png">'
        '<meta property="og:image:width" content="1200">'
        '<meta property="og:image:height" content="630">'
        '<meta property="og:image" content="/m/two.png">'
        '<meta property="og:image:secure_url"'
        ' content="https://s.example/m/sec.png">'
        '<meta property="og:description" content="first desc">'
        '<meta property="og:description" content="second desc">'
    )
    df = spark.createDataFrame(
        [("http://c.example/p", html)], "url string, text string"
    )
    out = extract_image_refs(df, "text", "url").toPandas()
    got = dict(zip(out.resolved_url, out.alt_text))
    # width/height values (1200 / 630) must NOT appear as refs
    assert got == {
        "http://c.example/m/one.png": "first desc",
        "http://c.example/m/two.png": "first desc",
        "https://s.example/m/sec.png": "first desc",
    }


def test_srcset_invalid_descriptor_does_not_outrank_first(spark):
    """Round-15 self-review: a spec-invalid width like "480.0w" is
    NOT a descriptor (tier 0, score 0) — the earlier bare candidate
    keeps the first-wins pick."""
    html = (
        '<img srcset="/v/first.png, /v/bogus.png 480.0w"'
        ' alt="invalid desc">'
        '<img srcset="/v/a.png 480.0w, /v/b.png 2x" alt="mixed bad">'
    )
    df = spark.createDataFrame(
        [("http://v.example/p", html)], "url string, text string"
    )
    out = extract_image_refs(df, "text", "url").toPandas()
    got = dict(zip(out.alt_text, out.resolved_url))
    assert got["invalid desc"] == "http://v.example/v/first.png"
    # a real density descriptor still beats the invalid-width one
    assert got["mixed bad"] == "http://v.example/v/b.png"


def test_srcset_commas_inside_cdn_urls(spark):
    """Round-15 review: CDN transform URLs carry commas INSIDE the
    URL (Cloudinary /c_fill,w_800/); the WHATWG-shaped parse keeps
    them whole — a naive comma-split turned the tail into a bogus
    descriptor candidate that outranked valid ones."""
    html = (
        '<img srcset="/good.png,'
        ' https://cdn.example/c_fill,w_800/x.jpg 800w"'
        ' alt="cdn commas">'
        '<img srcset="https://cdn.example/w_100,h_50/y.jpg 1x"'
        ' alt="single cdn">'
        # descriptor glued to the next URL by a comma still splits
        '<img srcset="/g/a.png 1x,/g/b.png 2x" alt="glued">'
    )
    df = spark.createDataFrame(
        [("http://k.example/p", html)], "url string, text string"
    )
    out = extract_image_refs(df, "text", "url").toPandas()
    got = dict(zip(out.alt_text, out.resolved_url))
    assert got["cdn commas"] == (
        "https://cdn.example/c_fill,w_800/x.jpg"
    )
    assert got["single cdn"] == "https://cdn.example/w_100,h_50/y.jpg"
    assert got["glued"] == "http://k.example/g/b.png"
