"""The REGISTERED q_stream_* queries against BOTH ts encodings the
test-data generator has shipped (ns-since-epoch as int64, and
timestamp[us]).

This closes the blind spot that cost rounds 3-4: the operator-level
streaming tests built their own pre-normalized fixtures, so a suite
could be fully green while every driver streaming check failed on the
real file encoding. Here the ground truth is computed in pandas from
the raw microsecond values — independent of the Spark normalization
under test — and the queries are invoked exactly as the driver invokes
them: ``QUERIES[name](spark, sf_dir)`` on a directory holding an
``events.parquet`` in the encoding under test.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

US_PER_HOUR = 3_600_000_000


def _events_us(path: str) -> tuple[pa.Table, pa.Array]:
    """Read the source events table + its ts as epoch-µs int64,
    whichever encoding it's in."""
    t = pq.read_table(path)
    ts = t.column("ts").combine_chunks()
    if pa.types.is_timestamp(ts.type):
        us = ts.cast(pa.timestamp("us")).cast(pa.int64())
    else:  # int64 nanos
        us = pc.divide(ts.cast(pa.int64()), 1000)
    return t, us


@pytest.fixture(scope="module", params=["timestamp_us", "nanos_long"])
def enc_sf_dir(request, tmp_path_factory):
    """A tiny sf-dir whose events.parquet uses the requested encoding,
    derived from the real sf0.001 file (500 events keeps the streaming
    runs fast while spanning many hour windows)."""
    src, us = _events_us(f"{SF_DIR}/events.parquet")
    n = min(500, len(src))
    src, us = src.slice(0, n), us.slice(0, n)
    if request.param == "timestamp_us":
        new_ts = us.cast(pa.timestamp("us"))
    else:
        new_ts = pc.multiply(us, 1000)  # plain int64, ns since epoch
    cols = {name: src.column(name) for name in src.column_names}
    cols["ts"] = new_ts
    out = tmp_path_factory.mktemp(f"enc_{request.param}")
    pq.write_table(
        pa.table(cols, schema=pa.schema(
            [(name, cols[name].type) for name in src.column_names]
        )),
        str(out / "events.parquet"),
    )
    return str(out)


def _expected_windows(sf_dir: str) -> pd.DataFrame:
    """Ground-truth tumbling 1h windows from the raw µs values."""
    t, us = _events_us(f"{sf_dir}/events.parquet")
    pdf = pd.DataFrame(
        {
            "us": us.to_pandas(),
            "event_type": t.column("event_type").to_pandas(),
            "value": t.column("value").to_pandas(),
        }
    )
    pdf["hour_epoch"] = (pdf.us // US_PER_HOUR) * 3600
    exp = (
        pdf.groupby(["hour_epoch", "event_type"], as_index=False)
        .agg(n_events=("value", "size"), total_value=("value", "sum"))
    )
    exp["total_value"] = exp.total_value.round(2)
    return exp.sort_values(["hour_epoch", "event_type"]).reset_index(drop=True)


def _check_windows(got: pd.DataFrame, exp: pd.DataFrame) -> None:
    got = got.sort_values(["hour_epoch", "event_type"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    # the round-3/4 bug collapsed a month of data into a ~3h span —
    # assert genuine window spread, not just batch/stream agreement
    assert got.hour_epoch.nunique() > 20
    assert (got.hour_epoch.values == exp.hour_epoch.values).all()
    assert (got.event_type.values == exp.event_type.values).all()
    assert (got.n_events.values == exp.n_events.values).all()
    assert (abs(got.total_value.values - exp.total_value.values) < 1e-6).all()


def test_registered_stream_window_events_both_encodings(spark, enc_sf_dir):
    """The folded multi-mode entry: EVERY drain mode (memory sink,
    durable parquet sink with the encoding-aware watermark sentinel,
    incremental multi-batch) must match ground truth under both ts
    encodings — one mode-tagged result, checked per mode."""
    from clustering_spark.queries import QUERIES

    got = QUERIES["stream_window_events"](spark, enc_sf_dir).toPandas()
    assert set(got["mode"]) == {"memory", "parquet", "incremental"}
    exp = _expected_windows(enc_sf_dir)
    for mode, grp in got.groupby("mode"):
        _check_windows(grp.drop(columns=["mode"]), exp)


def test_registered_batch_window_events_both_encodings(spark, enc_sf_dir):
    from clustering_spark.queries import QUERIES

    both = QUERIES["windowed_events"](spark, enc_sf_dir).toPandas()
    # the tumbling branch of the merged batch windowing query must
    # still match ground truth under both ts encodings
    got = (
        both[both.window_kind == "tumbling"]
        .drop(columns=["window_kind"])
        .rename(columns={"win_start_epoch": "hour_epoch"})
    )
    _check_windows(got, _expected_windows(enc_sf_dir))
    # sliding branch: every event lands in exactly window/slide = 4
    # overlapping windows, so its event total is 4x the tumbling total
    slide = both[both.window_kind == "sliding"]
    assert slide.n_events.sum() == 4 * got.n_events.sum()
    assert abs(slide.total_value.sum() - 4 * got.total_value.sum()) < 1e-4


def test_registered_latest_event_both_encodings(spark, enc_sf_dir):
    """T3 latest-wins on both encodings: full-precision ordering (ts_ord)
    must match a pandas argmax over the raw values."""
    from clustering_spark.queries import QUERIES

    t, us = _events_us(f"{enc_sf_dir}/events.parquet")
    raw = t.column("ts").combine_chunks()
    ord_vals = (
        raw.cast(pa.int64()) if pa.types.is_integer(raw.type) else us
    ).to_pandas()
    pdf = pd.DataFrame(
        {
            "user_id": t.column("user_id").to_pandas(),
            "event_id": t.column("event_id").to_pandas(),
            "ord": ord_vals,
        }
    )
    exp = (
        pdf.sort_values(["user_id", "ord", "event_id"])
        .groupby("user_id", as_index=False)
        .last()
    )
    got = (
        QUERIES["latest_event_per_user"](spark, enc_sf_dir)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert (got.user_id.values == exp.user_id.values).all()
    assert (got.event_id.values == exp.event_id.values).all()


def test_registered_stream_against_real_testdata(spark):
    """Smoke directly on the driver's own file — whatever encoding the
    current generator shipped — so a future encoding flip fails HERE,
    not first in CORRECTNESS_r{N}.json."""
    from clustering_spark.queries import QUERIES

    got = QUERIES["stream_window_events"](spark, SF_DIR).toPandas()
    exp = _expected_windows(SF_DIR)
    assert set(got["mode"]) == {"memory", "parquet", "incremental"}
    for _, grp in got.groupby("mode"):
        _check_windows(grp.drop(columns=["mode"]), exp)


def test_registered_stream_dedup_replay_both_encodings(spark, enc_sf_dir):
    """The duplicated replay must collapse to single-copy totals under
    either ts encoding (dedup state keys on event_id, but the watermark
    column comes from the normalizer)."""
    from clustering_spark.queries import QUERIES

    t, _ = _events_us(f"{enc_sf_dir}/events.parquet")
    pdf = pd.DataFrame(
        {
            "event_type": t.column("event_type").to_pandas(),
            "value": t.column("value").to_pandas(),
        }
    )
    exp = (
        pdf.groupby("event_type", as_index=False)
        .agg(n_events=("value", "size"), total_value=("value", "sum"))
    )
    exp["total_value"] = exp.total_value.round(2)
    exp = exp.sort_values("event_type").reset_index(drop=True)
    got = (
        QUERIES["stream_dedup_replay"](spark, enc_sf_dir)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert (got.event_type.values == exp.event_type.values).all()
    assert (got.n_events.values == exp.n_events.values).all()
    assert (abs(got.total_value.values - exp.total_value.values) < 1e-6).all()


def test_stream_query_after_unrelated_query_fresh_conf(spark, enc_sf_dir):
    """Ordering independence (round-5 advice): a streaming query must
    work when an UNRELATED query ran first and nobody pre-set the
    legacy nanos flag — the reader must (re)assert its own conf, not
    rely on ambient session state left by a previous caller."""
    from clustering_spark.queries import QUERIES

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        # unrelated lineitem-only query first (never touches events;
        # runs against the real sf dir — the enc fixture holds only
        # events.parquet)
        assert QUERIES["pricing_summary"](spark, SF_DIR).count() > 0
        out = QUERIES["stream_window_events"](spark, enc_sf_dir)
        assert out.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
