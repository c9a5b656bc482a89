"""Character-trigram language-model scoring — the CCNet-style quality
signal: score each document by how probable its character sequence is
under a reference corpus's trigram distribution. Gibberish, wrong-
language, and boilerplate-ish text score low; fluent text like the
reference scores high. (CCNet uses a KenLM 5-gram; a char-trigram LM
is the dependency-free relational analog with the same filtering
behavior at corpus scale.)

Everything is relational and SQL-expressible:
- fit: explode normalized char trigrams -> groupBy count. The model
  is VOCABULARY-sized (charset³, bounded), so it broadcasts.
- score: explode doc trigrams -> broadcast-join the model -> per-doc
  mean log-prob with add-one smoothing (unseen trigrams get
  log(1/(total + V))).

At 100 TB: fit is one map-side-combined shuffle over a bounded key
space; scoring is scan + broadcast join + one keyed aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _char_trigrams(text: Column | str) -> Column:
    """Lower-cased, whitespace-collapsed character trigrams. Docs
    shorter than 3 normalized chars produce an empty array.

    Built by zip_with over three shifted char-array slices (the
    dedup._zip_ngrams pattern): each slice evaluates the normalize
    expression once as an ARGUMENT — the previous index-transform form
    re-normalized the whole document per trigram (O(len²); HOF lambdas
    are opaque to subexpression elimination)."""
    from clustering_spark.operators.dedup import _zip_ngrams

    t = F.col(text) if isinstance(text, str) else text
    # collapse THEN trim (the fingerprint_expr rule): trim strips
    # spaces only, so the old trim-first order left a boundary space
    # for '\n'-terminated text and emitted phantom space-padded grams
    norm = F.trim(F.regexp_replace(F.lower(t), r"\s+", " "))
    chars = F.split(norm, "")
    n = F.length(norm)
    return F.when(n < 3, F.array().cast("array<string>")).otherwise(
        _zip_ngrams([F.slice(chars, j + 1, n - 2) for j in range(3)], "")
    )


def fit_trigram_lm(corpus: DataFrame, text_col: str) -> DataFrame:
    """(gram, n) counts over the reference corpus — the model table.
    Persist/broadcast it; refit when the reference corpus changes."""
    return (
        corpus.select(F.explode(_char_trigrams(text_col)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
    )


def score_lm(
    docs: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str = "lm_logp",
) -> DataFrame:
    """Append per-doc mean trigram log-prob (add-one smoothed; empty
    docs score NULL). Higher = more like the reference corpus; gate
    with a percentile threshold, not an absolute one — the scale
    shifts with the charset.

    NULL-id docs also score NULL: the id is the join-back identity,
    so distinct NULL-id docs would merge into one aggregation group
    AND the merged score could never join back anyway (NULL != NULL) —
    they are excluded before the explode instead of paying for an
    unusable aggregate. Assign surrogate ids upstream if those docs
    need scores."""
    from pyspark.sql.functions import broadcast

    totals = model.agg(
        F.sum("n").alias("__total"), F.count("*").alias("__v")
    )
    grams = docs.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col), F.explode(_char_trigrams(text_col)).alias("gram")
    )
    scored = (
        grams.join(broadcast(model), on="gram", how="left")
        .crossJoin(broadcast(totals))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)) + 1.0)
                / (F.col("__total") + F.col("__v"))
            ).alias("__lp"),
        )
        .groupBy(id_col)
        .agg(F.round(F.avg("__lp"), 6).alias(out_col))
    )
    return docs.join(scored, on=id_col, how="left")
