"""S2 date-partitioned layout: write by day, read with directory pruning."""

from datetime import datetime

import pytest


@pytest.fixture(scope="module")
def partitioned(fixture_sf0001, tmp_path_factory, ray_session):
    import ray.data as rd

    from ict_log_parser_ray.sources.transcripts import write_date_partitioned

    root = str(tmp_path_factory.mktemp("by_date"))
    ds = rd.from_arrow(fixture_sf0001["table"])
    write_date_partitioned(ds, root)
    return root


def test_partition_layout(partitioned):
    import os

    dirs = sorted(os.listdir(partitioned))
    assert all(d.startswith("dt=") for d in dirs)
    # fixture spans 2026-01-05 06:00 + 30h → two day partitions
    assert "dt=2026_01_05" in dirs and "dt=2026_01_06" in dirs


def test_date_pruned_read(partitioned, fixture_sf0001):
    import pyarrow.compute as pc

    from ict_log_parser_ray.sources.transcripts import read_transcripts_dates

    tbl = fixture_sf0001["table"]
    start, end = datetime(2026, 1, 5), datetime(2026, 1, 6)
    ds = read_transcripts_dates(partitioned, start, end)
    got = ds.count()
    want = tbl.filter(pc.and_(
        pc.greater_equal(tbl["ts"], start), pc.less(tbl["ts"], end))).num_rows
    assert got == want
    assert got > 0


def test_date_pruned_read_empty_window(partitioned):
    from ict_log_parser_ray.sources.transcripts import read_transcripts_dates

    ds = read_transcripts_dates(partitioned, datetime(2030, 1, 1),
                                datetime(2030, 1, 2))
    assert ds.count() == 0


def test_window_filter_on_flat_read(fixture_sf0001):
    import pyarrow.compute as pc

    from ict_log_parser_ray.sources.transcripts import read_transcripts

    tbl = fixture_sf0001["table"]
    start, end = datetime(2026, 1, 5, 12), datetime(2026, 1, 5, 18)
    ds = read_transcripts(f"{fixture_sf0001['dir']}/transcripts",
                          window=(start, end))
    want = tbl.filter(pc.and_(
        pc.greater_equal(tbl["ts"], start), pc.less(tbl["ts"], end))).num_rows
    assert ds.count() == want


def test_date_pruned_read_non_midnight_end(partitioned, fixture_sf0001):
    """Regression: a window ending at 06:00 must include rows from the
    end-date partition (found by code review: the partition for the end
    day was pruned while the row filter admitted its early-morning rows)."""
    import pyarrow.compute as pc

    from ict_log_parser_ray.sources.transcripts import read_transcripts_dates

    tbl = fixture_sf0001["table"]
    start, end = datetime(2026, 1, 5, 6), datetime(2026, 1, 6, 6)
    got = read_transcripts_dates(partitioned, start, end).count()
    want = tbl.filter(pc.and_(
        pc.greater_equal(tbl["ts"], start), pc.less(tbl["ts"], end))).num_rows
    assert got == want
    # the fixture has rows in [Jan 6 00:00, Jan 6 06:00) — they must count
    jan6_early = tbl.filter(pc.and_(
        pc.greater_equal(tbl["ts"], datetime(2026, 1, 6)),
        pc.less(tbl["ts"], end))).num_rows
    assert jan6_early > 0


def test_empty_window_keeps_schema_types(partitioned):
    import pyarrow as pa

    from ict_log_parser_ray.sources.transcripts import read_transcripts_dates

    ds = read_transcripts_dates(partitioned, datetime(2030, 1, 1),
                                datetime(2030, 1, 2))
    schema = ds.schema()
    idx = schema.names.index("ts")
    assert pa.types.is_timestamp(schema.types[idx])


def test_read_table_sharded_directory_layout(ray_session, tmp_path):
    """read_table resolves a sharded ``name/`` directory (the probe
    fixtures' layout — a single >GB parquet file reads as ONE serial
    task) with one read task per file, same rows."""
    import os

    from ict_log_parser_ray import fixtures as fx
    from ict_log_parser_ray.sources.transcripts import read_table

    d = fx.ensure_events_fixture(5_000, root=str(tmp_path))
    assert not os.path.exists(os.path.join(d, "events.parquet"))
    ds = read_table(d, "events", columns=["event_id", "user_id"])
    assert ds.count() == 5_000

    de = fx.ensure_emb_fixture(3_000, root=str(tmp_path))
    dse = read_table(de, "embeddings", columns=["vec_id"])
    assert dse.count() == 3_000
