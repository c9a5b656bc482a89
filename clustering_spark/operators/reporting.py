"""Corpus data-card reporting (beyond-reference scope; the reference's
only reporting surface is the GUI dropdown query, views.py — there is
no corpus-level summary anywhere in it).

Every dataset release ships a data card: how many documents and
tokens, from which sources/languages in what proportion, how much
duplication, how clean. ``corpus_report`` derives all of it from ONE
per-document feature projection (quality features + fingerprint + PII
counts — the same operators the prep pipeline gates on, so the card
and the gate can never disagree about definitions) and aggregates it
three ways. Everything is lazy; a caller producing all three frames
over a large corpus should ``.persist()`` the ``features`` frame
first — the known multi-consumer cost policy (PERFORMANCE.md), left
to the caller so a single-frame use doesn't pay a cache write.

Scale shape: the feature projection is scan-speed native expressions;
``overall`` is a single 1-row aggregate (HLL for distinct
fingerprints — no exact-distinct shuffle of md5s); the per-stratum
frames are one narrow groupBy each over a bounded key space
(languages / sources, not documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustering_spark.operators import textnorm, textops


def corpus_features(df: DataFrame, text_col: str) -> DataFrame:
    """The shared per-document feature frame: quality signals,
    normalized-content fingerprint, PII counts. Row-identity is the
    document (``n_docs`` downstream counts ROWS — dedup upstream if
    the frame can carry duplicated ids)."""
    out = textops.quality_features(df, text_col)
    out = textops.fingerprint(out, text_col)
    # NULL-safe dedup identity (the dedup_exact convention): md5(NULL)
    # is NULL and approx_count_distinct IGNORES NULLs while n_docs
    # counts the rows — a corpus of unique docs with NULL texts would
    # report est_dup_frac = NULL-fraction. The sentinel groups all
    # NULL docs as ONE distinct class instead.
    out = out.withColumn(
        "fingerprint", F.coalesce(F.col("fingerprint"), F.lit("\x00null"))
    )
    return textnorm.pii_counts(out, text_col)


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    strata_cols: tuple[str, ...] = (),
    rsd: float = 0.05,
) -> dict[str, DataFrame]:
    """Data-card frames for a document corpus.

    Returns ``{"features": per-doc frame, "overall": 1-row summary,
    "by_<stratum>": one frame per requested stratum column}``.

    ``overall`` columns: n_docs, total_tokens, total_chars,
    approx_distinct_fingerprints (HLL at ``rsd``), est_dup_frac
    (1 − distinct/total — duplication AFTER whitespace/case
    normalization), docs_with_pii, pii_doc_frac, and quality-score
    quantiles (p10/p50/p90, approx_percentile at 1e-4 accuracy).
    Per-stratum frames carry doc/token counts and corpus share.
    """
    feats = corpus_features(df, text_col)
    n = F.count(F.lit(1))
    overall = feats.agg(
        n.alias("n_docs"),
        # coalesce: sum over zero rows is NULL — an empty corpus must
        # report 0 everywhere, not a NULL/0 mix that trips int() in a
        # card renderer
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total_tokens"),
        F.coalesce(F.sum(F.length(F.col(text_col))), F.lit(0)).alias(
            "total_chars"
        ),
        F.approx_count_distinct("fingerprint", rsd).alias(
            "approx_distinct_fingerprints"
        ),
        # greatest(0, ...): HLL at rsd=0.05 can OVERestimate distincts
        # on a fully-unique corpus, which read as negative duplication
        F.round(
            F.greatest(
                F.lit(0.0),
                F.when(
                    n > 0,
                    1.0
                    - F.approx_count_distinct("fingerprint", rsd)
                    / n.cast("double"),
                ).otherwise(0.0),
            ),
            6,
        ).alias("est_dup_frac"),
        F.coalesce(
            F.sum((F.col("n_pii_total") > 0).cast("long")), F.lit(0)
        ).alias("docs_with_pii"),
        F.round(
            F.when(
                n > 0,
                F.sum((F.col("n_pii_total") > 0).cast("long")) / n.cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("pii_doc_frac"),
        # ONE quantile sketch for all three points (three separate
        # percentile_approx calls each build their own summaries)
        F.percentile_approx(
            "quality_score",
            F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9)),
            F.lit(10_000),
        ).alias("__qs"),
    )
    overall = overall.select(
        "*",
        # coalesce: the percentile sketch over zero rows is NULL —
        # without it an empty corpus reported quality_p* = NULL next
        # to the coalesced-to-0 counts, exactly the NULL/0 mix the
        # count aggregates above document as forbidden
        F.round(F.coalesce(F.col("__qs")[0], F.lit(0.0)), 6).alias("quality_p10"),
        F.round(F.coalesce(F.col("__qs")[1], F.lit(0.0)), 6).alias("quality_p50"),
        F.round(F.coalesce(F.col("__qs")[2], F.lit(0.0)), 6).alias("quality_p90"),
    ).drop("__qs")
    report: dict[str, DataFrame] = {"features": feats, "overall": overall}
    for col in strata_cols:
        per = feats.groupBy(col).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
        )
        total = per.agg(F.sum("total_tokens").alias("__t"))
        report[f"by_{col}"] = (
            per.crossJoin(F.broadcast(total))
            .withColumn(
                "token_share",
                F.round(
                    F.when(
                        F.col("__t") > 0, F.col("total_tokens") / F.col("__t")
                    ).otherwise(0.0),
                    6,
                ),
            )
            .drop("__t")
        )
    return report
