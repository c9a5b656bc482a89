"""Property-based differential test for the srcset state machine
(round 15): operators/pairing._srcset_candidates must agree with an
independent pure-Python implementation of the WHATWG image-candidate
parse on randomized srcset strings — tokens drawn to stress every
state transition (embedded commas, trailing commas, glued
descriptors, pure separators, multi-descriptor runs).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _reference_parse(srcset: str) -> list[tuple[str, str]]:
    """Independent WHATWG-shaped parse (url, first-descriptor),
    written against the spec prose, NOT the Spark implementation:
    skip whitespace/commas; URL = maximal non-whitespace run; a URL
    with trailing commas is a bare candidate; otherwise descriptors
    follow until a comma, and what follows that comma in the same
    token starts the next URL."""
    out: list[tuple[str, str]] = []
    toks = [t for t in srcset.split() if t != ""]
    cur_url = ""
    cur_desc = ""
    i = 0
    while i < len(toks):
        t = toks[i]
        i += 1
        if cur_url == "":
            t = t.lstrip(",")
            if t == "":
                continue
            if t.endswith(","):
                out.append((t.rstrip(","), ""))
            else:
                cur_url, cur_desc = t, ""
        else:
            if "," in t:
                dpart, _, rest = t.partition(",")
                out.append((cur_url, cur_desc or dpart))
                cur_url, cur_desc = "", ""
                rest = rest.lstrip(",")
                if rest:
                    if rest.endswith(","):
                        out.append((rest.rstrip(","), ""))
                    else:
                        cur_url = rest
            else:
                if cur_desc == "":
                    cur_desc = t
    if cur_url:
        out.append((cur_url, cur_desc))
    return out


def _reference_best(srcset: str) -> str:
    def rank(d: str) -> tuple[float, float]:
        import re

        if re.fullmatch(r"\d+w", d):
            return (2.0, float(d[:-1]))
        if re.fullmatch(r"\d+(\.\d+)?x", d):
            return (1.0, float(d[:-1]))
        return (0.0, 0.0)

    best_url, best_key = "", (-1.0, -1.0)
    for url, desc in _reference_parse(srcset):
        if url == "":
            continue
        k = rank(desc)
        if k > best_key:  # strictly greater: earliest wins ties
            best_url, best_key = url, k
    return best_url


_URLS = [
    "/a.png", "b.jpg", "https://cdn.example/c_fill,w_800/x.jpg",
    "//h.example/i.gif", "../up.png", "img,with,commas.webp",
]
_DESCS = ["1x", "2x", "2.5x", "320w", "800w", "480.0w", "100h", "zz"]


def _random_srcset(rng: random.Random) -> str:
    parts: list[str] = []
    for _ in range(rng.randrange(0, 5)):
        u = rng.choice(_URLS)
        shape = rng.randrange(5)
        if shape == 0:
            parts.append(u + ",")  # bare candidate, trailing comma
        elif shape == 1:
            parts.append(u)
            parts.append(rng.choice(_DESCS) + ",")
        elif shape == 2:  # descriptor glued to the NEXT url
            parts.append(u)
            parts.append(rng.choice(_DESCS) + "," + rng.choice(_URLS))
        elif shape == 3:  # multiple descriptors then comma
            parts.append(u)
            parts.append(rng.choice(_DESCS))
            parts.append(rng.choice(_DESCS) + ",")
        else:
            parts.append(u + " " + rng.choice(_DESCS) + ",")
        if rng.random() < 0.2:
            parts.append(",")  # stray separator token
    joiner = rng.choice([" ", "  ", " \t "])
    return joiner.join(parts)


def test_srcset_best_matches_reference(spark):
    from clustering_spark.operators.pairing import _srcset_best

    rng = random.Random(1500)
    cases = [_random_srcset(rng) for _ in range(300)]
    # hand-picked adversarial shapes on top of the random ones
    cases += [
        "", "   ", ",", ",,,", "a.png", "a.png,", ",a.png",
        "a.png 1x,b.png 2x", "/good.png, u/c_fill,w_800/x.jpg 800w",
        "x.png 100w 2x, y.png", "x.png zz 800w, y.png 700w",
        "only,commas,inside.png", "trail.png,,,", "1x 2x 3x",
        # round-16 review: descriptor-like tails and descriptor-like
        # URLS. 'x.jpg,2x' is ONE url token (embedded comma, per
        # spec) while 'x.jpg 2x,y.jpg' is (x.jpg,2x)+(y.jpg,'');
        # '2x.jpg'/'800w.png' are URLs that merely LOOK like
        # descriptors and must stay in URL position
        "x.jpg,2x", "x.jpg 2x,y.jpg", "2x.jpg 1x, 800w.png 2x",
        "a.png 2x,2x", "2x, 2x", "a.png 100w,200w",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [
        r[0] if r[0] is not None else ""
        for r in df.select(_srcset_best(F.col("s"))).collect()
    ]
    for c, g in zip(cases, got):
        assert g == _reference_best(c), (c, g, _reference_best(c))
