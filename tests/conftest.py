import logging
import warnings

import pytest

warnings.filterwarnings("ignore")


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level=logging.ERROR)
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_sf0001(ray_session):
    """Materialized seeded transcripts fixture at sf0.001 (+ parity goldens)."""
    from ict_log_parser_ray import fixtures as fx
    from ict_log_parser_ray import parity

    d = fx.ensure_fixture(0.001)
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{d}/transcripts")
    meta = pq.read_table(f"{d}/tool_meta.parquet")
    golden = parity.run_reference(tbl)
    return {"dir": d, "table": tbl, "tool_meta": meta, "golden": golden}
