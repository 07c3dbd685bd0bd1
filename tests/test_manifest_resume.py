"""Kill-and-resume from the checkpoint manifest (FIXTURES.md invariant 5):
a crashed run resumed from the manifest produces row-identical sink outputs
to an uninterrupted run, and completed shards are not reprocessed."""

import os
import shutil

import pyarrow.parquet as pq
import pytest


def _split_fixture(fixture, tmpdir, n_shards=3):
    """Write the fixture transcripts as conv-disjoint shard files.

    Sharding by conv_id hash mirrors the natural transcript layout (one
    conversation = one logfile lives in one shard) that run_resumable's
    per-shard dedup contract requires.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    tbl = fixture["table"]
    bucket = pc.bit_wise_and(pc.cast(pc.multiply(
        pc.index_in(tbl["conv_id"], value_set=pc.unique(tbl["conv_id"])), 2654435761),
        pa.int64()), 0x7FFFFFFF)
    shard = pc.cast(pc.subtract(bucket, pc.multiply(
        pc.divide(bucket, n_shards), n_shards)), pa.int32())
    paths = []
    for i in range(n_shards):
        part = tbl.filter(pc.equal(shard, i))
        p = os.path.join(tmpdir, f"shard_{i}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


def _read_sorted(root):
    import duckdb

    con = duckdb.connect()
    df = con.sql(
        f"SELECT * FROM parquet_scan('{root}/**/*.parquet', hive_partitioning=1) "
        "ORDER BY conv_id, turn_idx, sink"
    ).df()
    con.close()
    return df


@pytest.fixture(scope="module")
def shard_paths(fixture_sf0001, tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    return _split_fixture(fixture_sf0001, str(d))


def test_resume_after_crash_matches_uninterrupted(ray_session, fixture_sf0001,
                                                  shard_paths, tmp_path_factory):
    from ict_log_parser_ray.state.manifest import Manifest, run_resumable

    meta = fixture_sf0001["tool_meta"]
    out_a = str(tmp_path_factory.mktemp("run_uninterrupted"))
    out_b = str(tmp_path_factory.mktemp("run_crashed"))

    res_a = run_resumable(shard_paths, out_a, meta)

    with pytest.raises(RuntimeError, match="simulated crash"):
        run_resumable(shard_paths, out_b, meta, fail_after_shards=2)
    # resume: must not reprocess the 2 completed parse shards
    entries_before = Manifest(out_b).entries()
    done_parse = [k for k in entries_before if k[0] == "parse"]
    assert len(done_parse) == 2
    t_before = {k: entries_before[k]["recorded_at"] for k in done_parse}

    res_b = run_resumable(shard_paths, out_b, meta)
    entries_after = Manifest(out_b).entries()
    for k in done_parse:
        assert entries_after[k]["recorded_at"] == t_before[k], \
            "completed parse shard was reprocessed on resume"

    df_a = _read_sorted(res_a["sinks"])
    df_b = _read_sorted(res_b["sinks"])
    assert df_a.shape == df_b.shape
    assert (df_a.reset_index(drop=True) == df_b.reset_index(drop=True)).all().all() or \
        df_a.reset_index(drop=True).equals(df_b.reset_index(drop=True))


def test_manifest_metrics(ray_session, fixture_sf0001, shard_paths,
                          tmp_path_factory):
    from ict_log_parser_ray.state.manifest import Manifest, run_resumable

    out = str(tmp_path_factory.mktemp("run_metrics"))
    run_resumable(shard_paths, out, fixture_sf0001["tool_meta"])
    entries = Manifest(out).entries()
    golden = fixture_sf0001["golden"]

    # per-partition lineage + row-count metrics exist (A11 / north_rule)
    parse_entries = [e for (ph, _), e in entries.items() if ph == "parse"]
    assert all("lineage" in e and "wall_time_s" in e for e in parse_entries)
    assert sum(e["rows_in"] for e in parse_entries) == golden["n_rows"]
    # dedup happens during parse phase: rows_out sums to deduped count
    assert sum(e["rows_out"] for e in parse_entries) == golden["n_deduped"]

    route_entries = [e for (ph, _), e in entries.items() if ph == "route"]
    sink_totals = {}
    for e in route_entries:
        for s, n in e["sink_rows"].items():
            sink_totals[s] = sink_totals.get(s, 0) + n
    assert sink_totals == golden["sink_counts"]


def test_watch_mode_picks_up_only_new_shards(ray_session, fixture_sf0001,
                                             tmp_path_factory):
    """AutoUpdate analog: a shard added between cycles is the ONLY new work
    the next cycle performs; completed entries keep their timestamps even
    though the new file sorts before the old ones (name-stable ids)."""
    from ict_log_parser_ray.state.manifest import Manifest, run_watch

    d = str(tmp_path_factory.mktemp("watch_shards"))
    out = str(tmp_path_factory.mktemp("watch_out"))
    paths = _split_fixture(fixture_sf0001, d, n_shards=3)
    live = [paths[0], paths[1]]
    ts_after_c0 = {}

    def between(stat):
        if stat["cycle"] == 0:
            ts_after_c0.update(
                {k: e["recorded_at"] for k, e in Manifest(out).entries().items()
                 if k[0] == "parse"})
            # new file whose name sorts FIRST — ids must not shift
            newp = os.path.join(d, "aaa_late_arrival.parquet")
            shutil.copyfile(paths[2], newp)
            live.append(newp)

    cycles = run_watch(lambda: list(live), out,
                       fixture_sf0001["tool_meta"], interval_s=0,
                       max_cycles=2, sleep_fn=lambda s: None,
                       on_cycle=between)
    assert len(cycles) == 2
    assert cycles[0]["n_shards"] == 2
    assert cycles[1]["n_shards"] == 3
    assert len(cycles[1]["new_shards"]) == 1
    assert cycles[1]["new_shards"][0].startswith("aaa_late_arrival.parquet-")

    entries = Manifest(out).entries()
    # cycle-2 run did not touch cycle-1's completed parse shards
    for k, t0 in ts_after_c0.items():
        assert entries[k]["recorded_at"] == t0, \
            f"completed shard {k} was reprocessed by the watch cycle"
    assert len(ts_after_c0) == 2


def test_shard_ids_unique_for_same_basename(tmp_path):
    """Two inputs sharing a basename must get distinct shard ids (a
    collision would make their commit loops overwrite each other)."""
    from ict_log_parser_ray.state.manifest import shard_id_for

    a = tmp_path / "d1" / "part-0.parquet"
    b = tmp_path / "d2" / "part-0.parquet"
    assert shard_id_for(str(a)) != shard_id_for(str(b))
    assert shard_id_for(str(a)) == shard_id_for(str(a))  # stable


def test_route_fingerprint_tracks_attempt_content(ray_session, fixture_sf0001,
                                                  tmp_path_factory):
    """Rewriting a shard IN PLACE with same row count but different attempt
    content must invalidate the route fingerprint (round-1 count-only
    fingerprint skipped stale shards)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ict_log_parser_ray.state.manifest import Manifest, run_resumable

    d = str(tmp_path_factory.mktemp("fp_shards"))
    out = str(tmp_path_factory.mktemp("fp_out"))
    paths = _split_fixture(fixture_sf0001, d, n_shards=2)
    run_resumable(paths, out, fixture_sf0001["tool_meta"])
    fp1 = Manifest(out).entries()[("attempts", "GLOBAL")]["fingerprint"]

    # flip one header's status code in place: same rows, different content
    tbl = pq.read_table(paths[0])
    texts = tbl["text"].to_pylist()
    for i, t in enumerate(texts):
        if t.startswith("{@BTEST-END|00|"):
            texts[i] = t.replace("{@BTEST-END|00|", "{@BTEST-END|01|", 1)
            break
    else:
        pytest.skip("no passing END row in shard 0")
    tbl = tbl.set_column(tbl.schema.get_field_index("text"), "text",
                         pa.array(texts, pa.string()))
    pq.write_table(tbl, paths[0])

    # S5 freshness: the rewritten file's (size, mtime) fingerprint no
    # longer validates its parse entry, so the rerun reprocesses it
    # automatically — no manual manifest surgery
    run_resumable(paths, out, fixture_sf0001["tool_meta"])
    fp2 = Manifest(out).entries()[("attempts", "GLOBAL")]["fingerprint"]
    assert fp1 != fp2, "content change must change the attempts fingerprint"
    n1 = int(fp1.split(":")[1])
    n2 = int(fp2.split(":")[1])
    assert n1 == n2, "row count unchanged — only content differs"
    # every route entry was re-recorded under the new fingerprint
    for (ph, sid), e in Manifest(out).entries().items():
        if ph == "route":
            assert e["fingerprint"] == fp2


@pytest.mark.skipif(not os.environ.get("ICT_RUN_SLOW"),
                    reason="bench-scale resume (minutes, ~GBs in /dev/shm) "
                           "— set ICT_RUN_SLOW=1")
def test_resume_at_bench_scale(ray_session):
    """VERDICT r4 item 7: the kill/resume invariant at BENCH scale — one
    sf2.0 run crashed mid-ROUTE (sink-write) phase, resumed, must yield
    sink outputs row-identical to an uninterrupted run, without
    reprocessing any completed parse shard or pre-crash route shard.
    Output goes to /dev/shm (this node's disk runs ~30 MB/s shared; the
    documented scaling-sink convention) and is removed afterwards."""
    import glob

    import duckdb

    from ict_log_parser_ray import fixtures as fx
    from ict_log_parser_ray.state.manifest import Manifest, run_resumable

    d = fx.ensure_fixture(2.0)
    shards = sorted(glob.glob(os.path.join(d, "transcripts", "*.parquet")))
    assert len(shards) >= 6, "sf2.0 fixture must be multi-shard"
    meta = __import__("pyarrow.parquet", fromlist=["pq"]).read_table(
        os.path.join(d, "tool_meta.parquet"))

    def _sink_digest(root):
        con = duckdb.connect()
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM parquet_scan('{root}/**/*.parquet', "
            "hive_partitioning=1)").fetchall()]
        hcols = ", ".join(c for c in cols)
        rows = con.sql(
            f"SELECT sink, count(*) AS n, sum(hash({hcols})) AS h "
            f"FROM parquet_scan('{root}/**/*.parquet', hive_partitioning=1) "
            "GROUP BY sink ORDER BY sink").fetchall()
        con.close()
        return rows

    out_a = "/dev/shm/ict_resume_bench_a"
    out_b = "/dev/shm/ict_resume_bench_b"
    for o in (out_a, out_b):
        shutil.rmtree(o, ignore_errors=True)
    try:
        res_a = run_resumable(shards, out_a, meta)

        with pytest.raises(RuntimeError, match="route shards"):
            run_resumable(shards, out_b, meta, fail_after_route_shards=2)
        man = Manifest(out_b).entries()
        parse_done = {k: e["recorded_at"] for k, e in man.items()
                      if k[0] == "parse"}
        route_done = {k: e["recorded_at"] for k, e in man.items()
                      if k[0] == "route"}
        assert len(parse_done) == len(shards)   # phase 1 fully committed
        assert len(route_done) == 2             # crashed after 2

        res_b = run_resumable(shards, out_b, meta)
        man2 = Manifest(out_b).entries()
        for k, t in {**parse_done, **route_done}.items():
            assert man2[k]["recorded_at"] == t, f"{k} was reprocessed"

        assert _sink_digest(res_a["sinks"]) == _sink_digest(res_b["sinks"])
    finally:
        for o in (out_a, out_b):
            shutil.rmtree(o, ignore_errors=True)
