"""Semantic invariants for the CUSUM / interpolation / TWAP trend trio
(queries/trends.py round-6 additions); value parity vs DuckDB is the
driver gate's job."""

from __future__ import annotations

from pasardassist_spark.queries import trends


def test_cusum_matches_sequential_recursion(spark, sf_dir):
    """The window closed form must equal the textbook per-series
    recursion S_t = max(0, S_{t-1} + z_t - k) run sequentially."""
    rows = trends.ts_cusum(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type
    k_u = int(float(trends._CUSUM_K) * 1_000_000)
    for series in by_type.values():
        series.sort(key=lambda r: r.day)
        sp = sn = 0
        for r in series:
            z_u = round(r.zscore * 1_000_000)
            sp = max(0, sp + z_u - k_u)
            sn = max(0, sn - z_u - k_u)
            assert r.cusum_pos_u == sp, (r.event_type, r.day, r.cusum_pos_u, sp)
            assert r.cusum_neg_u == sn, (r.event_type, r.day, r.cusum_neg_u, sn)
            assert r.alarm_pos == (sp > trends._CUSUM_H_U)
            assert r.alarm_neg == (sn > trends._CUSUM_H_U)


def test_interpolate_is_exact_on_observed_days_and_linear_between(spark, sf_dir):
    rows = trends.ts_interpolate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.day_value is not None:
            assert not r.is_interpolated
            assert abs(r.interp_value - round(r.day_value, 6)) < 1e-9
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.day)
        for i, r in enumerate(series):
            if not r.is_interpolated:
                continue
            prev = next(
                s for s in reversed(series[:i]) if s.day_value is not None
            )
            nxt = next(s for s in series[i + 1 :] if s.day_value is not None)
            frac = (r.day - prev.day).days / (nxt.day - prev.day).days
            want = prev.day_value + (nxt.day_value - prev.day_value) * frac
            assert abs(r.interp_value - want) < 1e-5


def test_twap_bounded_by_value_range_and_days_covered(spark, sf_dir):
    from pyspark.sql import functions as F

    from pasardassist_spark.tables import load

    out = trends.ts_twap(spark, sf_dir)
    rows = out.collect()
    assert rows
    ev = load(spark, sf_dir, "events")
    grain = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    bounds = {
        (r.event_type, r.day): (r.lo, r.hi, r.n) for r in grain.collect()
    }
    assert len(rows) == len(bounds), "every (type, day) grain row present"
    for r in rows:
        lo, hi, n = bounds[(r.event_type, r.day)]
        # dec2 rounds values to 2 dp before weighting
        assert round(lo, 2) - 1e-9 <= r.twap <= round(hi, 2) + 1e-9
        assert r.n_events == n


def test_sess_concurrency_matches_python_sweep(spark, sf_dir):
    """The distributed sweep line must equal an in-driver brute force
    over the same session intervals."""
    from pasardassist_spark.queries.timeseries import sess_concurrency
    from pasardassist_spark.streaming.sessions import sessionize_batch
    from pasardassist_spark.tables import load

    got = {
        r.day: (r.max_concurrency, r.n_session_starts)
        for r in sess_concurrency(spark, sf_dir).collect()
    }
    sess = [
        (r.session_start, r.session_end)
        for r in sessionize_batch(load(spark, sf_dir, "events")).collect()
    ]
    deltas: dict[int, list[int]] = {}
    for s, e in sess:
        deltas.setdefault(s, [0, 0])[0] += 1
        deltas.setdefault(e + 1, [0, 0])[1] += 1
    import datetime

    want: dict = {}
    end_level: dict = {}
    conc = 0
    for t in sorted(deltas):
        starts, ends = deltas[t]
        before = conc
        conc += starts - ends
        day = datetime.datetime.utcfromtimestamp(t // 1_000_000).replace(
            hour=0, minute=0, second=0, microsecond=0
        )
        mx, st = want.get(day, (0, 0))
        want[day] = (max(mx, before, conc), st + starts)
        end_level[day] = conc
    assert conc == 0, "sweep must return to zero"
    # densify: a day with no delta points carries the last active day's
    # end-of-day level (the concurrency is flat across it)
    days = sorted(want)
    d = days[0]
    carry = end_level[d]
    while d < days[-1]:
        d = d + datetime.timedelta(days=1)
        if d in want:
            carry = end_level[d]
        else:
            want[d] = (carry, 0)
    got_naive = {d.replace(tzinfo=None): v for d, v in got.items()}
    assert got_naive == want
