"""Unit tests for stages/temporal.py: as-of join and running aggregate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_tbl():
    # user 1: clicks at t=10, 15; purchases at 10, 12, 20
    # user 2: no clicks; purchase at 5
    # user 3: click at 100 only (no purchases)
    return pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array([10, 15, 10, 12, 20, 5, 100], pa.int64()),
        "kind": pa.array(["c", "c", "p", "p", "p", "p", "c"]),
    })


def test_asof_join_basic(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import asof_join_broadcast

    t = _events_tbl()
    clicks = t.filter(pa.compute.equal(t["kind"], "c")).select(
        ["user_id", "ts", "event_id"]).rename_columns(
        ["user_id", "ts", "click_id"])
    left = rd.from_arrow(t.filter(pa.compute.equal(t["kind"], "p")))
    out = asof_join_broadcast(left, clicks, by="user_id", on="ts",
                              attach={"click_id": "click_id"}).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    # purchase@10 matches click@10 (ts >= semantics); @12 → click@10;
    # @20 → click@15; user 2 → null; user 3 has no purchases
    assert out["click_id"].tolist()[:3] == [1, 1, 2]
    assert pd.isna(out["click_id"].iloc[3])


def test_asof_rejects_duplicate_key_ts(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import prepare_asof_side

    dup = pa.table({"user_id": pa.array([1, 1], pa.int64()),
                    "ts": pa.array([10, 10], pa.int64()),
                    "x": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError, match="duplicate"):
        prepare_asof_side(dup, by="user_id", on="ts")


def test_asof_timestamp_column(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import asof_join_broadcast

    ts = pa.array(pd.to_datetime(["2024-01-01", "2024-01-03"]),
                  pa.timestamp("us"))
    right = pa.table({"k": pa.array([7, 7], pa.int64()), "ts": ts,
                      "v": pa.array([100, 200], pa.int64())})
    lts = pa.array(pd.to_datetime(["2024-01-02", "2024-01-04",
                                   "2023-12-31"]), pa.timestamp("us"))
    left = rd.from_arrow(pa.table({
        "k": pa.array([7, 7, 7], pa.int64()), "ts": lts,
        "id": pa.array([1, 2, 3], pa.int64())}))
    out = asof_join_broadcast(left, right, by="k", on="ts",
                              attach={"v": "v"}).to_pandas()
    out = out.sort_values("id")
    assert out["v"].tolist()[:2] == [100, 200]
    assert pd.isna(out["v"].iloc[2])


def test_running_sum_matches_pandas(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import running_sum_partitioned

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 37, n).astype(np.int64),
        "ts": rng.integers(0, 1000, n).astype(np.int64),
        "value": rng.normal(size=n).round(3),
    })
    ds = rd.from_pandas(df)
    # nparts > 1 forces the partition-task path with keys split across tasks
    out = running_sum_partitioned(ds, key="user_id", ts="ts",
                                  idc="event_id", val="value",
                                  nparts=5).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)

    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["run_sum"] = ref.groupby("user_id")["value"].cumsum().round(6)
    ref["rn"] = ref.groupby("user_id").cumcount() + 1
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert (out["rn"].values == ref["rn"].values).all()
    np.testing.assert_allclose(out["run_sum"].values,
                               ref["run_sum"].values, atol=1e-6)
    assert len(out) == n


def test_interval_join_overlapping(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import interval_join_broadcast

    left = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([5, 10, 15, 25, 40], pa.int64()),
    }))
    # overlapping windows: [0,12), [10,30); point 10 matches BOTH;
    # half-open: ts=30 would not match w2; ts=40 matches nothing
    windows = pa.table({
        "ws": pa.array([0, 10], pa.int64()),
        "we": pa.array([12, 30], pa.int64()),
        "wid": pa.array([100, 200], pa.int64()),
    })
    out = interval_join_broadcast(left, windows, on="ts", start="ws",
                                  end="we", attach={"wid": "wid"}).to_pandas()
    pairs = sorted(zip(out["id"], out["wid"]))
    assert pairs == [(1, 100), (2, 100), (2, 200), (3, 200), (4, 200)]


def test_interval_join_boundary_and_empty(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import interval_join_broadcast

    left = rd.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([10, 20], pa.int64()),
    }))
    # start inclusive, end exclusive: ts=10 in [10,20), ts=20 not
    w = pa.table({"ws": pa.array([10], pa.int64()),
                  "we": pa.array([20], pa.int64()),
                  "wid": pa.array([1], pa.int64())})
    out = interval_join_broadcast(left, w, on="ts", start="ws", end="we",
                                  attach={"wid": "wid"}).to_pandas()
    assert out["id"].tolist() == [1]

    # empty interval table → empty result; the probe's per-batch output
    # keeps the schema, but Ray's to_pandas over all-empty blocks drops
    # columns (known trap, CLAUDE.md) — assert emptiness via the batch UDF
    w0 = w.slice(0, 0)
    ds0 = interval_join_broadcast(left, w0, on="ts", start="ws", end="we",
                                  attach={"wid": "wid"})
    batches = [b for b in ds0.iter_batches(batch_format="pyarrow")]
    assert sum(b.num_rows for b in batches) == 0
    for b in batches:
        assert b.column_names == ["id", "ts", "wid"]


def test_interval_join_matches_pandas_crosscheck(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import interval_join_broadcast

    rng = np.random.default_rng(7)
    ts = rng.integers(0, 1000, 500)
    left_tbl = pa.table({"id": pa.array(np.arange(500), pa.int64()),
                         "ts": pa.array(ts, pa.int64())})
    ws = rng.integers(0, 900, 20)
    we = ws + rng.integers(1, 200, 20)
    w = pa.table({"ws": pa.array(ws, pa.int64()),
                  "we": pa.array(we, pa.int64()),
                  "wid": pa.array(np.arange(20), pa.int64())})
    left = rd.from_arrow(left_tbl).repartition(4)
    out = interval_join_broadcast(left, w, on="ts", start="ws", end="we",
                                  attach={"wid": "wid"}).to_pandas()
    got = sorted(zip(out["id"], out["wid"]))
    want = sorted((int(i), int(j))
                  for i in range(500) for j in range(20)
                  if ws[j] <= ts[i] < we[j])
    assert got == want


def test_sliding_window_count_matches_pandas(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import sliding_window_count

    rng = np.random.default_rng(11)
    n = 2000
    us = rng.integers(0, 50_000, n).astype("int64")
    keys = rng.choice(["a", "b", "c"], n)
    ds = rd.from_arrow(pa.table({"ts": pa.array(us, pa.int64()),
                                 "k": pa.array(keys)})).repartition(4)
    out = sliding_window_count(ds, on="ts", key="k", slide_us=1000,
                               nwin=4).to_pandas()
    # brute force: event at t belongs to windows (t//S - j)*S, j=0..3
    rows = {}
    for t, k in zip(us, keys):
        for j in range(4):
            ws = (t // 1000 - j) * 1000
            rows[(ws, k)] = rows.get((ws, k), 0) + 1
    want = sorted(rows.items())
    got = sorted(((int(r.window_start), r.k), int(r.n))
                 for r in out.itertuples())
    assert got == want
    # every event in exactly nwin windows
    assert out["n"].sum() == n * 4


def test_asof_partitioned_matches_broadcast(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import (asof_join_broadcast,
                                                    asof_join_partitioned)

    rng = np.random.default_rng(13)
    nl, nr = 3000, 800
    left_tbl = pa.table({
        "id": pa.array(np.arange(nl), pa.int64()),
        "k": pa.array(rng.integers(0, 50, nl), pa.int64()),
        "ts": pa.array(rng.integers(0, 10_000, nl), pa.int64()),
    })
    # unique (k, ts) pairs on the right (as-of precondition)
    rk = rng.integers(0, 60, nr)          # keys 50-59 never match a left row
    rts = np.arange(nr) * 13 % 10_000     # unique per key via dedup below
    rdf = pd.DataFrame({"k": rk, "ts": rts}).drop_duplicates(["k", "ts"])
    right_tbl = pa.table({
        "k": pa.array(rdf["k"].to_numpy(), pa.int64()),
        "ts": pa.array(rdf["ts"].to_numpy(), pa.int64()),
        "v": pa.array(np.arange(len(rdf)), pa.int64()),
    })
    left = rd.from_arrow(left_tbl).repartition(5)
    right = rd.from_arrow(right_tbl).repartition(3)

    got = asof_join_partitioned(left, right, by="k", on="ts",
                                attach={"v": "v"}, nparts=7).to_pandas()
    want = asof_join_broadcast(rd.from_arrow(left_tbl), right_tbl, by="k",
                               on="ts", attach={"v": "v"}).to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    want = want.sort_values("id").reset_index(drop=True)
    assert len(got) == nl
    pd.testing.assert_series_equal(got["v"], want["v"], check_names=False)


def test_asof_partitioned_string_keys_and_empty_parts(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import asof_join_partitioned

    left = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "zz"]),
        "ts": pa.array([5, 50, 1], pa.int64()),
        "id": pa.array([1, 2, 3], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a"]),
        "ts": pa.array([4, 40], pa.int64()),
        "v": pa.array([100, 200], pa.int64()),
    }))
    out = asof_join_partitioned(left, right, by="k", on="ts",
                                attach={"v": "v"}, nparts=9).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert out["v"].tolist()[:2] == [100, 200]
    assert pd.isna(out["v"].iloc[2])  # key with no right rows → null


def test_sessionize_matches_pandas(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import sessionize_partitioned

    rng = np.random.default_rng(21)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 60, n).astype(np.int64),
        "ts": rng.integers(0, 100_000, n).astype(np.int64),
    })
    GAP = 500
    out = sessionize_partitioned(rd.from_pandas(df), key="user_id",
                                 ts="ts", idc="event_id", gap_us=GAP,
                                 nparts=7).to_pandas()
    # pandas reference: per-user sort by (ts, event_id), split on gap>GAP
    ref_rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        t = g["ts"].to_numpy()
        boundary = np.r_[True, (t[1:] - t[:-1]) > GAP]
        sid = np.cumsum(boundary)
        for s in np.unique(sid):
            seg = t[sid == s]
            ref_rows.append((uid, int(seg[0]), int(seg[-1]), len(seg)))
    got = sorted(map(tuple, out[["user_id", "session_start", "session_end",
                                 "n_events"]].itertuples(index=False)))
    assert got == sorted(ref_rows)
    assert out["n_events"].sum() == n


def test_interarrival_matches_pandas(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import interarrival_partitioned

    rng = np.random.default_rng(33)
    n = 3000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 80, n).astype(np.int64),
        "ts": rng.integers(0, 50_000, n).astype(np.int64),
    })
    # one singleton user (no gaps → must emit nothing)
    df.loc[0, "user_id"] = 999
    out = interarrival_partitioned(rd.from_pandas(df), key="user_id",
                                   ts="ts", idc="event_id",
                                   nparts=7).to_pandas()
    ref_rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        gaps = np.diff(g["ts"].to_numpy())
        if len(gaps):
            ref_rows.append((uid, len(gaps), int(gaps.sum()),
                             int(gaps.max())))
    got = sorted(map(tuple, out[["user_id", "n_gaps", "sum_gap_us",
                                 "max_gap_us"]].itertuples(index=False)))
    assert got == sorted(ref_rows)
    assert 999 not in set(out["user_id"])


def test_interarrival_null_ts_dropped(ray_session):
    """VERDICT r4 item 8: null timestamps (rendered int64-min by
    _col_np) must be DROPPED before gap computation — SQL LAG yields
    NULL there and the oracle's WHERE drops it, so a surviving
    int64-min row would sort first and fabricate a huge max gap.
    Adversarial layout: nulls sprinkled through real users, one
    user with nothing BUT nulls (must vanish like a singleton), one
    user reduced to a single real event by nulls (no gap → no row)."""
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import interarrival_partitioned

    rng = np.random.default_rng(7)
    n = 800
    ts = rng.integers(1_000, 9_000_000, n).astype("int64")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "ts": pd.to_datetime(ts, unit="us"),
    })
    # ~15% nulls across everyone
    null_at = rng.choice(n, size=n // 7, replace=False)
    df.loc[null_at, "ts"] = pd.NaT
    # user 777: only null timestamps
    extra = pd.DataFrame({"event_id": [9001, 9002, 9003],
                          "user_id": [777] * 3,
                          "ts": [pd.NaT] * 3})
    # user 888: two events, one nulled → single real event → no gap row
    extra2 = pd.DataFrame({"event_id": [9101, 9102],
                           "user_id": [888] * 2,
                           "ts": [pd.Timestamp("2024-01-01"), pd.NaT]})
    df = pd.concat([df, extra, extra2], ignore_index=True)

    out = interarrival_partitioned(rd.from_pandas(df), key="user_id",
                                   ts="ts", idc="event_id",
                                   nparts=5).to_pandas()
    assert 777 not in set(out["user_id"])
    assert 888 not in set(out["user_id"])

    # LAG reference over the null-dropped rows only (ns → us)
    live = df.dropna(subset=["ts"]).copy()
    ref_rows = []
    for uid, g in live.sort_values(["ts", "event_id"]).groupby("user_id"):
        gaps = np.diff(g["ts"].astype("int64").to_numpy() // 1000)
        if len(gaps):
            ref_rows.append((uid, len(gaps), int(gaps.sum()),
                             int(gaps.max())))
    got = sorted(map(tuple, out[["user_id", "n_gaps", "sum_gap_us",
                                 "max_gap_us"]].itertuples(index=False)))
    assert got == sorted(ref_rows) and len(got) > 0


def test_sessionize_boundary_exact_gap(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import sessionize_partitioned

    # gap strictly greater than gap_us splits; equal does NOT
    df = pd.DataFrame({"event_id": [1, 2, 3], "user_id": [9, 9, 9],
                       "ts": [0, 100, 201]})
    out = sessionize_partitioned(rd.from_pandas(df), key="user_id",
                                 ts="ts", idc="event_id", gap_us=100,
                                 nparts=4).to_pandas()
    out = out.sort_values("session_start").reset_index(drop=True)
    assert out["n_events"].tolist() == [2, 1]
    assert out["session_start"].tolist() == [0, 201]


@pytest.mark.parametrize("bucket_us", [7, 50, 1000])
def test_interval_join_partitioned_matches_broadcast(ray_session, bucket_us):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import (
        interval_join_broadcast, interval_join_partitioned)

    rng = np.random.default_rng(bucket_us)
    ts = rng.integers(0, 2000, 800)
    left_tbl = pa.table({"id": pa.array(np.arange(800), pa.int64()),
                         "ts": pa.array(ts, pa.int64())})
    ws = rng.integers(0, 1900, 30)
    we = ws + rng.integers(1, 400, 30)   # spans many buckets at small W
    w = pa.table({"ws": pa.array(ws, pa.int64()),
                  "we": pa.array(we, pa.int64()),
                  "wid": pa.array(np.arange(30), pa.int64())})
    got = interval_join_partitioned(
        rd.from_arrow(left_tbl).repartition(4), rd.from_arrow(w),
        on="ts", start="ws", end="we", attach={"wid": "wid"},
        bucket_us=bucket_us, nparts=6).to_pandas()
    want = interval_join_broadcast(
        rd.from_arrow(left_tbl), w, on="ts", start="ws", end="we",
        attach={"wid": "wid"}).to_pandas()
    assert sorted(zip(got["id"], got["wid"])) \
        == sorted(zip(want["id"], want["wid"]))


def test_interval_join_partitioned_empty_and_degenerate(ray_session):
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import interval_join_partitioned

    left = rd.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([10, 20], pa.int64())}))
    # one degenerate (end <= start) interval and one real one
    w = pa.table({"ws": pa.array([5, 30], pa.int64()),
                  "we": pa.array([15, 30], pa.int64()),
                  "wid": pa.array([1, 2], pa.int64())})
    out = interval_join_partitioned(left, rd.from_arrow(w), on="ts",
                                    start="ws", end="we",
                                    attach={"wid": "wid"}, bucket_us=8,
                                    nparts=4).to_pandas()
    assert sorted(zip(out["id"], out["wid"])) == [(1, 1)]


def test_partition_tasks_survive_zero_row_blocks(ray_session):
    """Ray passes zero-row input blocks through map_batches WITHOUT
    calling the tagging UDF, so partition tasks see blocks with the
    ORIGINAL schema (no "part" column).  Every partitioned temporal op
    must skip those instead of raising KeyError (ADVICE r2, medium)."""
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import (
        asof_join_partitioned, interval_join_partitioned,
        running_sum_partitioned, sessionize_partitioned)

    lt = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "k": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([10, 20, 5], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    empty = lt.slice(0, 0)
    left = rd.from_arrow([lt, empty, empty])          # 2 zero-row blocks
    rt = pa.table({"k": pa.array([1], pa.int64()),
                   "ts": pa.array([8], pa.int64()),
                   "rv": pa.array([99], pa.int64())})
    right = rd.from_arrow([rt, rt.slice(0, 0)])

    out = asof_join_partitioned(left, right, by="k", on="ts",
                                attach={"rv": "rv"}, nparts=4).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert out["rv"].tolist()[:2] == [99, 99] and pd.isna(out["rv"].iloc[2])

    w = pa.table({"ws": pa.array([0], pa.int64()),
                  "we": pa.array([15], pa.int64()),
                  "wid": pa.array([7], pa.int64())})
    ij = interval_join_partitioned(
        left, rd.from_arrow([w, w.slice(0, 0)]), on="ts", start="ws",
        end="we", attach={"wid": "wid"}, bucket_us=8, nparts=4).to_pandas()
    assert sorted(zip(ij["id"], ij["wid"])) == [(1, 7), (3, 7)]

    rs = running_sum_partitioned(left, key="k", ts="ts", idc="id",
                                 val="v", nparts=4).to_pandas()
    assert rs.sort_values(["k", "rn"])["run_sum"].tolist() == \
        [1.0, 3.0, 3.0]

    ses = sessionize_partitioned(left, key="k", ts="ts", idc="id",
                                 gap_us=100, nparts=4).to_pandas()
    assert len(ses) == 2 and ses["n_events"].sum() == 3


def test_partition_tasks_fully_empty_input(ray_session):
    """All-zero-row input: no block ever gets tagged; the partition tasks
    must still return consistent (empty) schemas."""
    import ray.data as rd

    from ict_log_parser_ray.stages.temporal import (
        asof_join_partitioned, interval_join_partitioned)

    lt = pa.table({
        "id": pa.array([], pa.int64()),
        "k": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
    })
    rt = pa.table({"k": pa.array([], pa.int64()),
                   "ts": pa.array([], pa.int64()),
                   "rv": pa.array([], pa.int64())})
    left, right = rd.from_arrow(lt), rd.from_arrow(rt)
    out = asof_join_partitioned(left, right, by="k", on="ts",
                                attach={"rv": "rv"}, nparts=3)
    # empty Datasets drop columns through to_pandas (documented Ray
    # quirk) — assert on the block schema, which is what downstream
    # from_arrow_refs consumers see
    assert out.count() == 0 and "rv" in out.schema().names

    w = pa.table({"ws": pa.array([], pa.int64()),
                  "we": pa.array([], pa.int64()),
                  "wid": pa.array([], pa.int64())})
    ij = interval_join_partitioned(left, rd.from_arrow(w), on="ts",
                                   start="ws", end="we",
                                   attach={"wid": "wid"}, bucket_us=8,
                                   nparts=3)
    assert ij.count() == 0 and "wid" in ij.schema().names
