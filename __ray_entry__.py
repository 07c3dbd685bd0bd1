"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Never calls ``ray.init()``/``ray.shutdown()`` — the driver owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at sf0.001: parse → enrich → rank → route over the
    deterministic transcript fixture; returns the per-sink routed-row counts
    joined with the single-board yield summary (small, stable schema)."""
    from ict_log_parser_ray.pipelines.flagship import flagship_for_sf
    from ict_log_parser_ray.stages.route import sink_counts

    pipe = flagship_for_sf(0.001)
    return sink_counts(pipe["routed"]).to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (plus
    the training-data operators).  ``t_*`` run the flagship transcript
    pipeline on the deterministic fixture generated for the sf matching
    ``sf_dir``; the rest run over the driver's own parquet tables."""
    from ict_log_parser_ray import fixtures
    from ict_log_parser_ray.pipelines.driver_queries import build_queries

    # make sure the sf0.01 fixture parquet exists for the oracle side too
    fixtures.ensure_fixture(0.01)
    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins.  ``t_*`` oracles read the SAME
    deterministic fixture parquet by absolute path and re-derive the
    pipeline semantics with RE2 regexes + window functions; the rest use the
    pre-registered driver views.  Rows-only operators (near-dup sketches,
    IVF ANN, heuristics, media) intentionally have no entry."""
    from ict_log_parser_ray import fixtures
    from ict_log_parser_ray.pipelines.driver_queries import build_oracles

    fixtures.ensure_fixture(0.01)
    return build_oracles()
