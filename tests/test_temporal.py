"""As-of join and sessionization (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime

from pdf_parser_spark.operators.temporal import (
    asof_join, session_stats, sessionize,
)


def _ts(s):
    return datetime.fromisoformat(s)


class TestAsofJoin:
    def _run(self, spark, tolerance=None):
        left = spark.createDataFrame(
            [
                (1, 10, _ts("2024-01-01 10:00:00")),   # before any right row
                (2, 10, _ts("2024-01-01 12:00:00")),   # exact tie -> inclusive
                (3, 10, _ts("2024-01-01 13:30:00")),   # after r1, before r2
                (4, 10, _ts("2024-01-02 09:00:00")),   # after r2
                (5, 20, _ts("2024-01-01 15:00:00")),   # other key
                (6, 30, _ts("2024-01-01 15:00:00")),   # key with no right rows
            ],
            "event_id bigint, user_id bigint, ts timestamp",
        )
        right = spark.createDataFrame(
            [
                (10, _ts("2024-01-01 12:00:00"), 100),
                (10, _ts("2024-01-01 14:00:00"), 101),
                (20, _ts("2024-01-01 01:00:00"), 200),
            ],
            "user_id bigint, odate timestamp, okey bigint",
        )
        out = asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="odate",
            payload_cols=["okey"], tolerance_seconds=tolerance,
        )
        return {r.event_id: r.okey for r in out.collect()}

    def test_latest_at_or_before_semantics(self, spark):
        got = self._run(spark)
        assert got == {1: None, 2: 100, 3: 100, 4: 101, 5: 200, 6: None}

    def test_tolerance_nulls_stale_matches(self, spark):
        got = self._run(spark, tolerance=4 * 3600)
        # event 4 is 19h after its match -> stale; event 5 is 14h after -> stale
        assert got == {1: None, 2: 100, 3: 100, 4: None, 5: None, 6: None}

    def test_left_row_count_preserved(self, spark):
        left = spark.createDataFrame(
            [(i, i % 3, _ts("2024-01-01 00:00:00")) for i in range(30)],
            "event_id bigint, user_id bigint, ts timestamp",
        )
        right = spark.createDataFrame(
            [(0, _ts("2023-12-31 00:00:00"), 7)],
            "user_id bigint, odate timestamp, okey bigint",
        )
        out = asof_join(left, right, "user_id", "ts", "odate", ["okey"])
        assert out.count() == 30


class TestSessionize:
    def _events(self, spark):
        rows = [
            # user 1: two events 10 min apart, then a 31-min gap
            (1, 1, _ts("2024-01-01 10:00:00"), 1.0),
            (2, 1, _ts("2024-01-01 10:10:00"), 2.0),
            (3, 1, _ts("2024-01-01 10:41:00"), 4.0),
            # user 2: exactly 30-min gap is NOT a new session (strict >)
            (4, 2, _ts("2024-01-01 09:00:00"), 1.5),
            (5, 2, _ts("2024-01-01 09:30:00"), 2.5),
        ]
        return spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, ts timestamp, value double"
        )

    def test_gap_splits_sessions_strictly_greater(self, spark):
        out = sessionize(self._events(spark), gap_seconds=1800).collect()
        sess = {r.event_id: r.session_idx for r in out}
        assert sess == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}

    def test_session_stats_rollup(self, spark):
        out = session_stats(self._events(spark), gap_seconds=1800).collect()
        by_key = {(r.user_id, r.session_idx): r for r in out}
        s11 = by_key[(1, 1)]
        assert s11.n_events == 2 and s11.total_value_cents == 300
        assert s11.session_start == _ts("2024-01-01 10:00:00")
        assert s11.session_end == _ts("2024-01-01 10:10:00")
        assert by_key[(1, 2)].n_events == 1
        assert by_key[(2, 1)].n_events == 2


class TestIntervalJoin:
    def test_binned_join_equals_naive_theta_join(self, spark):
        from pyspark.sql import functions as F

        from pdf_parser_spark.operators.temporal import interval_join

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        left = ev.where(F.col("event_type") == "error").select(
            "event_id", "user_id", F.col("ts").alias("lts")
        )
        right = ev.where(F.col("event_type") == "view").select(
            "user_id", F.col("ts").alias("rts")
        )
        got = {
            (r.event_id, r.rts)
            for r in interval_join(
                left, right, "user_id", "lts", "rts", -86400, 0
            ).collect()
        }
        naive = {
            (r.event_id, r.rts)
            for r in left.join(right, "user_id")
            .where(
                (F.unix_micros(F.col("rts").cast("timestamp"))
                 >= F.unix_micros(F.col("lts").cast("timestamp")) - 86400 * 1_000_000)
                & (F.col("rts") <= F.col("lts"))
            )
            .collect()
        }
        assert got == naive and len(got) > 0

    def test_window_boundaries_inclusive(self, spark):
        from pdf_parser_spark.operators.temporal import interval_join

        left = spark.createDataFrame(
            [(1, 5, _ts("2024-01-01 12:00:00"))],
            "event_id bigint, user_id bigint, lts timestamp",
        )
        right = spark.createDataFrame(
            [
                (5, _ts("2024-01-01 11:00:00"), "at-lower"),
                (5, _ts("2024-01-01 12:00:00"), "at-upper"),
                (5, _ts("2024-01-01 10:59:59"), "below"),
                (5, _ts("2024-01-01 12:00:01"), "above"),
                (6, _ts("2024-01-01 11:30:00"), "wrong-key"),
            ],
            "user_id bigint, rts timestamp, tag string",
        )
        got = {
            r.tag
            for r in interval_join(
                left, right, "user_id", "lts", "rts", -3600, 0
            ).collect()
        }
        assert got == {"at-lower", "at-upper"}
