"""Sequence-packing invariants: exactly-once assignment, budget
respected, oversize flagging, determinism under repartitioning, and
FFD fill quality on real testdata token counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clustering_spark.operators import packing, textops

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def doc_tokens(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return d.select(
        "doc_id", textops.token_count("text").alias("n_tok")
    ).cache()


def test_exactly_once_and_budget(spark, doc_tokens):
    a = packing.pack_sequences(doc_tokens, "doc_id", "n_tok", max_tokens=256)
    n_docs = doc_tokens.count()
    assert a.count() == n_docs
    assert a.select("doc_id").distinct().count() == n_docs

    stats = packing.pack_stats(a, 256)
    bad = stats.filter((F.col("total_tokens") > 256) & (~F.col("oversize")))
    assert bad.count() == 0
    # oversize packs are single-doc by construction
    over = a.filter("oversize").groupBy("pack_id").count()
    assert over.filter("count > 1").count() == 0


def test_oversize_flagged(spark):
    rows = [("big", 1000), ("a", 100), ("b", 100)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok long")
    a = packing.pack_sequences(df, "doc_id", "n_tok", max_tokens=256, num_buckets=1)
    got = {r.doc_id: r for r in a.collect()}
    assert got["big"].oversize
    assert not got["a"].oversize and not got["b"].oversize
    # a and b fit one shared pack
    assert got["a"].pack_id == got["b"].pack_id
    assert got["big"].pack_id != got["a"].pack_id


def test_deterministic_under_repartition(spark, doc_tokens):
    a1 = packing.pack_sequences(doc_tokens, "doc_id", "n_tok", 512).orderBy("doc_id")
    a2 = packing.pack_sequences(
        doc_tokens.repartition(13), "doc_id", "n_tok", 512
    ).orderBy("doc_id")
    assert [tuple(r) for r in a1.collect()] == [tuple(r) for r in a2.collect()]


def test_fill_quality(spark, doc_tokens):
    """FFD should fill packs well: mean fill of non-tail packs >= 0.7
    on real token-count distributions (loose bound; regression guard
    against e.g. an accidental one-doc-per-pack assignment)."""
    max_tokens = 512
    buckets = 4
    a = packing.pack_sequences(
        doc_tokens, "doc_id", "n_tok", max_tokens, num_buckets=buckets
    )
    stats = packing.pack_stats(a, max_tokens).filter("NOT oversize")
    n_packs = stats.count()
    total = stats.agg(F.sum("total_tokens")).collect()[0][0]
    # lower bound on possible packs = ceil(total/max); FFD within 1.3x
    # plus at most one partial tail pack per bucket
    import math

    assert n_packs <= math.ceil(total / max_tokens) * 1.3 + buckets


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id string, n_tok long")
    a = packing.pack_sequences(df, "doc_id", "n_tok", 128)
    assert a.count() == 0
    assert a.columns == ["doc_id", "n_tokens", "pack_id", "oversize"]


def test_packing_properties_random_inputs(spark):
    """Property sweep: random token multisets through the real
    operator (one single-bucket Spark job per example — example count
    kept small to bound suite time), checking exactly-once
    assignment, budget, and the FFD bin-count guarantee."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from clustering_spark.operators import packing as pk

    @settings(max_examples=40, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=1, max_value=300), max_size=60),
        max_tokens=st.integers(min_value=50, max_value=400),
    )
    def check(toks, max_tokens):
        pdf = pd.DataFrame(
            {
                "doc_id": range(len(toks)),
                "n_tokens": toks,
                "__bucket": [7] * len(toks),
            }
        )
        if len(pdf) == 0:
            return
        slim = spark.createDataFrame(
            pdf, "doc_id long, n_tokens long, __bucket int"
        )
        # reuse the real operator on a single bucket, via the public API
        out = pk.pack_sequences(
            slim.withColumnRenamed("n_tokens", "t"), "doc_id", "t",
            max_tokens, num_buckets=1,
        ).toPandas()
        assert sorted(out.doc_id) == sorted(range(len(toks)))
        g = out.groupby("pack_id").agg(
            tot=("n_tokens", "sum"), over=("oversize", "max"),
            n=("doc_id", "count"),
        )
        ok = g[~g.over]
        assert (ok.tot <= max_tokens).all()
        assert (g[g.over].n == 1).all()
        # FFD guarantee: bins <= ceil(11/9 * OPT) + 1 where
        # OPT >= ceil(total/max) over the fitting docs
        import math

        fitting = [t for t in toks if t <= max_tokens]
        if fitting:
            lower = math.ceil(sum(fitting) / max_tokens)
            assert len(ok) <= math.ceil(11 / 9 * lower) + 1

    check()


def test_materialize_packs(spark):
    docs = spark.createDataFrame(
        [(1, "alpha text"), (2, "bee"), (3, "ceee")],
        "doc_id long, text string",
    )
    toks = spark.createDataFrame(
        [(1, 10), (2, 3), (3, 4)], "doc_id long, n_tok long"
    )
    a = packing.pack_sequences(toks, "doc_id", "n_tok", 20, num_buckets=1)
    out = packing.materialize_packs(docs, a, "doc_id", "text", separator="|")
    rows = out.collect()
    # all three fit one pack (10+4+3 <= 20); FFD order: 1 (10), 3 (4), 2 (3)
    assert len(rows) == 1
    r = rows[0]
    assert r.sequence == "alpha text|ceee|bee"
    assert r.n_docs == 3 and r.total_tokens == 17 and not r.oversize


def test_materialize_packs_deterministic_order_on_ties(spark):
    docs = spark.createDataFrame(
        [(5, "five"), (2, "two"), (9, "nine")], "doc_id long, text string"
    )
    toks = spark.createDataFrame(
        [(5, 4), (2, 4), (9, 4)], "doc_id long, n_tok long"
    )
    a = packing.pack_sequences(toks, "doc_id", "n_tok", 100, num_buckets=1)
    out = packing.materialize_packs(docs, a, "doc_id", "text", separator="|")
    assert out.collect()[0].sequence == "two|five|nine"  # id-ordered ties


def test_zero_and_null_tokens_never_join_oversize_packs(spark):
    from clustering_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [("a", 5000), ("b", 0), ("c", None), ("d", 100)],
        "doc_id string, n_tok long",
    )
    out = {r.doc_id: r for r in pack_sequences(df, "doc_id", "n_tok", 4096).collect()}
    assert out["a"].oversize
    # the oversize pack stays single-doc; 0/NULL-token docs pack elsewhere
    assert out["b"].pack_id != out["a"].pack_id
    assert out["c"].pack_id != out["a"].pack_id
    assert out["c"].n_tokens == 0 and not out["c"].oversize


def test_dirty_token_counts_survive_ansi_and_negatives(spark):
    # ANSI mode: a plain cast throws on 'oops' and NaN — the documented
    # become-0 fallback needs try_cast; negative counts must clamp to 0
    # or they join (and grow) an oversize pack via the -1 sentinel
    df = spark.createDataFrame(
        [
            (1, "oops"),      # uncastable string
            (2, "5"),         # castable string
            (3, None),        # NULL
            (4, "-3"),        # negative
            (5, "50"),        # oversize vs max_tokens=10
        ],
        "id long, tok string",
    )
    out = packing.pack_sequences(df, "id", "tok", max_tokens=10, num_buckets=1)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].n_tokens == 0 and rows[3].n_tokens == 0 and rows[4].n_tokens == 0
    assert rows[2].n_tokens == 5
    assert rows[5].oversize
    # nothing shares the oversize doc's pack
    assert sum(1 for r in rows.values() if r.pack_id == rows[5].pack_id) == 1


def test_nan_double_token_counts_become_zero(spark):
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 4.0)], "id long, tok double"
    )
    out = packing.pack_sequences(df, "id", "tok", max_tokens=10, num_buckets=1)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].n_tokens == 0 and rows[2].n_tokens == 4


def test_null_text_member_keeps_separator_count(spark):
    # array_join silently skips NULL elements without a replacement —
    # n_docs and the separator count must stay consistent
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, None), (3, "bb")], "id long, text string"
    )
    counted = docs.withColumn(
        "tok", F.coalesce(F.length("text"), F.lit(1))
    )
    assign = packing.pack_sequences(counted, "id", "tok", max_tokens=100, num_buckets=1)
    seqs = packing.materialize_packs(docs, assign, "id", "text", separator="|").collect()
    assert len(seqs) == 1
    s = seqs[0]
    assert s.n_docs == 3
    assert s.sequence.count("|") == s.n_docs - 1


class TestMaterializeIdRows:
    def _mk(self, spark):
        from clustering_spark.operators.packing import (
            materialize_id_rows,
            pack_sequences,
        )

        # EOS-inclusive budgets: n_tokens = len(ids) + 1, seq_len = 8
        docs = spark.createDataFrame(
            [
                (1, [10, 11, 12]),   # 4 with EOS
                (2, [20]),           # 2
                (3, [30, 31]),       # 3
                (4, None),           # NULL ids -> EOS-only doc (1)
            ],
            "doc_id long, bpe_ids array<int>",
        )
        budgets = docs.selectExpr(
            "doc_id", "coalesce(size(bpe_ids), 0) + 1 AS n_tok"
        )
        asg = pack_sequences(
            budgets, "doc_id", "n_tok", max_tokens=8, num_buckets=1
        )
        rows = materialize_id_rows(
            docs, asg, "doc_id", "bpe_ids", seq_len=8, eos_id=99, pad_id=0
        ).toPandas()
        return rows.sort_values("pack_id").reset_index(drop=True)

    def test_rows_are_exact_length_eos_separated_padded(self, spark):
        rows = self._mk(spark)
        assert (rows.input_ids.map(len) == 8).all()
        assert (rows.doc_map.map(len) == 8).all()
        assert not rows.overflow.any()  # EOS-inclusive budgets fit
        # total real tokens across packs = sum(len(ids)+1) = 4+2+3+1
        assert rows.n_real_tokens.sum() == 10
        for _, r in rows.iterrows():
            ids, dm = list(r.input_ids), list(r.doc_map)
            real = r.n_real_tokens
            # padding tail
            assert ids[real:] == [0] * (8 - real)
            assert dm[real:] == [-1] * (8 - real)
            # every document's span ends with EOS and owns its EOS
            for d in range(r.n_docs):
                span = [i for i, o in enumerate(dm) if o == d]
                assert span, "every member owns at least its EOS slot"
                assert ids[span[-1]] == 99
            # placement order: doc_map ordinals are non-decreasing
            reals = [o for o in dm if o >= 0]
            assert reals == sorted(reals)

    def test_overflow_is_flagged_not_silent(self, spark):
        from clustering_spark.operators.packing import (
            materialize_id_rows,
            pack_sequences,
        )

        docs = spark.createDataFrame(
            [(1, list(range(10)))], "doc_id long, bpe_ids array<int>"
        )
        # budget LIES (counts without EOS): 10 tokens fit max_tokens=10
        # but ids+EOS = 11 > seq_len=10 -> overflow must be flagged
        asg = pack_sequences(
            docs.selectExpr("doc_id", "size(bpe_ids) AS n_tok"),
            "doc_id",
            "n_tok",
            max_tokens=10,
            num_buckets=1,
        )
        rows = materialize_id_rows(
            docs, asg, "doc_id", "bpe_ids", seq_len=10, eos_id=99, pad_id=0
        ).toPandas()
        assert rows.overflow.all()
        assert (rows.input_ids.map(len) == 10).all()

    def test_composes_with_bpe_ids_end_to_end(self, spark):
        """bpe_encode_ids -> EOS-inclusive budgets -> pack -> id rows:
        the full learn-tokenize-pack final mile, token-exact."""
        from clustering_spark.operators.bpe import (
            bpe_encode_ids,
            train_bpe,
        )
        from clustering_spark.operators.packing import (
            materialize_id_rows,
            pack_sequences,
        )

        docs = spark.createDataFrame(
            [(i, "pack the packs " * (1 + i % 3)) for i in range(12)],
            "doc_id long, text string",
        )
        model = train_bpe(docs, "text", n_merges=20, max_words=100)
        with_ids = bpe_encode_ids(docs, "text", model)
        budgets = with_ids.selectExpr(
            "doc_id", "bpe_ids", "size(bpe_ids) + 1 AS n_tok"
        )
        asg = pack_sequences(
            budgets, "doc_id", "n_tok", max_tokens=64, num_buckets=4
        )
        rows = materialize_id_rows(
            budgets, asg, "doc_id", "bpe_ids", seq_len=64, eos_id=1, pad_id=0
        ).toPandas()
        assert not rows.overflow.any()
        assert (rows.input_ids.map(len) == 64).all()
        total_ids = sum(
            len(r) + 1 for r in with_ids.toPandas().bpe_ids
        )
        assert rows.n_real_tokens.sum() == total_ids
