"""PNG scatter sink (SURVEY S10; reference cluster.py:138-143).

The reference collects the ENTIRE clustered segment to the driver
(``toPandas()``) and renders a matplotlib scatter per (macro, micro)
cell — driver memory scales with segment row count, and matplotlib is
a native dependency the engine shouldn't require.

Spark-first redesign: rasterize DISTRIBUTEDLY. Points are binned into
a bounded ``width x height`` pixel grid with native expressions (per-
segment min/max scan + integer binning + groupBy count), so the data
that reaches the driver is at most ``width*height`` rows PER SEGMENT
regardless of segment size — a 10-billion-row segment and a 10-row
segment produce the same bounded raster. The tiny binned grid is then
encoded as a real grayscale PNG with the stdlib encoder
(multimodal.make_png) — no matplotlib, no native codec.

Pixel color = the modal (max-count) cluster of the points in that
pixel, mapped onto evenly-spaced intensities; empty pixels are 0
(black). Axis orientation matches a scatter plot: y grows upward, so
the raster row 0 (PNG top) is the MAX-y bin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clustering_spark.operators.multimodal import make_png


def scatter_bins(
    df: DataFrame,
    seg_cols: list[str],
    x_col: str,
    y_col: str,
    cluster_col: str,
    width: int = 64,
    height: int = 64,
) -> DataFrame:
    """Bin points into a per-segment ``width x height`` grid.

    One stats aggregation (per-segment min/max of x and y, broadcast
    back — same shape as the min-max scaler) + one groupBy over
    (segment, px, py, cluster). Output rows <= segments * width *
    height * k; the per-pixel modal cluster is resolved here so the
    sink collects <= width*height rows per segment.

    Degenerate ranges (min == max) land every point in bin 0, like the
    scaler's degenerate-range rule.
    """
    # rows with a NULL coordinate carry no position: F.least skips
    # NULLs, so they would all paint into the max-edge pixel as a
    # phantom bright line — drop them instead (the reference's
    # matplotlib scatter does the same). Filter BEFORE the stats
    # aggregation: a dropped row must not stretch the binning range
    # either (one (x=1e9, y=NULL) outlier would otherwise collapse
    # every real point into pixel column 0 — matplotlib likewise
    # excludes NaN points from autoscale limits)
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    stats = df.groupBy(*seg_cols).agg(
        F.min(x_col).alias("__xmin"),
        F.max(x_col).alias("__xmax"),
        F.min(y_col).alias("__ymin"),
        F.max(y_col).alias("__ymax"),
    )

    def _bin(v, lo, hi, n):
        rng = F.col(hi) - F.col(lo)
        scaled = F.when(rng > 0, (F.col(v) - F.col(lo)) / rng).otherwise(
            F.lit(0.0)
        )
        return F.least(
            F.floor(scaled * n).cast("int"), F.lit(n - 1)
        )

    from clustering_spark.operators.metrics import nullsafe_equi_join

    # nullsafe: a NULL-keyed segment is a real group (stats keeps it,
    # and write_cluster_pngs renders it under 'None' by design) — a
    # name-based join would drop its points here and the promised PNG
    # would silently never exist
    binned = (
        nullsafe_equi_join(df, F.broadcast(stats), list(seg_cols), "inner")
        .select(
            *seg_cols,
            _bin(x_col, "__xmin", "__xmax", width).alias("px"),
            _bin(y_col, "__ymin", "__ymax", height).alias("py"),
            F.col(cluster_col).alias("__cl"),
        )
        .groupBy(*seg_cols, "px", "py", "__cl")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # modal cluster per pixel (deterministic tiebreak on cluster id)
    w = Window.partitionBy(*seg_cols, "px", "py").orderBy(
        F.col("n").desc(), F.col("__cl")
    )
    return (
        binned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*seg_cols, "px", "py", F.col("__cl").alias("cluster"), "n")
    )


def _render_png(
    rows, width: int, height: int, clusters: list
) -> bytes:
    """Grayscale raster from (px, py, cluster) pixel rows: cluster i of
    k gets intensity round((i+1) * 255 / k); background stays 0.

    Cluster labels are normalized through ``_norm_label`` on BOTH the
    legend and the pixel rows: pandas renders NULL labels as NaN, and
    a float64 Series boxes a fresh NaN object per access — NaN != NaN,
    so a raw dict keyed on the unique() objects raised KeyError for
    every NULL-cluster pixel. Bounds are validated: a px/py outside
    the raster means the caller's width/height disagree with the
    scatter_bins call that produced the rows, and Python's negative
    indexing would otherwise silently paint the wrong row."""
    norm = {_norm_label(c) for c in clusters}
    ordered = sorted(norm, key=lambda c: (c is not None, c if c is not None else 0))
    shade = {c: round((i + 1) * 255 / len(ordered)) for i, c in enumerate(ordered)}
    img = bytearray(width * height)
    for px, py, cl in rows:
        if not (0 <= px < width and 0 <= py < height):
            raise ValueError(
                f"pixel ({px}, {py}) outside {width}x{height} raster — "
                "width/height must match the scatter_bins call"
            )
        img[(height - 1 - py) * width + px] = shade[_norm_label(cl)]  # y grows upward
    return make_png(width, height, bytes(img), color_type=0)


def _norm_label(c):
    """One canonical None for missing cluster labels (None or any NaN
    float object), so dict lookups and sort keys behave."""
    if c is None:
        return None
    try:
        if c != c:  # NaN
            return None
    except Exception:
        pass
    return c


def _safe_component(v) -> str:
    """Filesystem-safe rendering of one segment value: anything
    outside [A-Za-z0-9._-] becomes '_', and a leading dot is escaped
    (no hidden files, no '..'). Missing keys (None, or the NaN pandas
    substitutes for a NULL group key) render as 'None' — one
    documented name for the NULL-keyed segment, not float repr
    drift ('nan').

    INJECTIVE under sanitization: when characters were replaced, an
    8-hex digest of the original value is appended — otherwise two
    DISTINCT segments ('a/b' vs 'a_b', 'x y' vs 'x_y') would sanitize
    to the same filename and the second PNG would silently overwrite
    the first."""
    import hashlib as _hashlib
    import re as _re

    if _norm_label(v) is None:
        return "None"
    raw = str(v)
    s = _re.sub(r"[^A-Za-z0-9._\-]", "_", raw)
    s = ("_" + s[1:]) if s.startswith(".") else (s or "_")
    if s != raw:
        # sha256 (not md5): md5 construction raises on FIPS-enabled
        # Python builds; 8 hex chars of either is plenty for injectivity
        s += "-" + _hashlib.sha256(raw.encode("utf-8")).hexdigest()[:8]
    return s


def write_cluster_pngs(
    results: DataFrame,
    seg_cols: list[str],
    out_dir: str,
    x_col: str = "px",
    y_col: str = "py",
    width: int = 64,
    height: int = 64,
) -> list[str]:
    """Encode one PNG per segment from a ``scatter_bins`` output and
    write ``{out_dir}/{seg values joined by '/'}.png`` (the reference's
    ClusterPNGs/{...}/{macroID}/{microID} layout, cluster.py:139).

    The collect here is BOUNDED: <= width*height rows per segment (the
    binned raster), never the point set. Returns written paths.
    """
    pdf = results.toPandas()
    paths = []
    # dropna=False: a NULL-keyed segment still gets its PNG (rendered
    # under the sanitized name 'None') instead of silently vanishing
    for seg_vals, part in pdf.groupby(seg_cols, sort=True, dropna=False):
        if not isinstance(seg_vals, tuple):
            seg_vals = (seg_vals,)
        png = _render_png(
            list(zip(part[x_col], part[y_col], part["cluster"])),
            width,
            height,
            # NOT pre-sorted: _render_png normalizes labels and sorts
            # with a None-safe key itself; sorted() here raised
            # TypeError on object-dtype labels mixing None with values
            list(part["cluster"].unique()),
        )
        # segment VALUES are data, not trusted path components: strip
        # separators/specials so 'a/b' or '../escape' cannot nest,
        # collide, or write outside out_dir
        safe = [_safe_component(v) for v in seg_vals]
        path = os.path.join(out_dir, *safe[:-1])
        os.makedirs(path, exist_ok=True)
        fpath = os.path.join(path, f"{safe[-1]}.png")
        with open(fpath, "wb") as f:
            f.write(png)
        paths.append(fpath)
    return paths
