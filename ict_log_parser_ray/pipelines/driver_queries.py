"""Driver-facing query registry: every implemented operator as a
``queries()`` entry, with a DuckDB ``oracle_sql()`` twin where the semantics
are SQL-expressible (SURVEY.md §5.3).

Two input families:

- ``t_*`` — the flagship transcript pipeline over the deterministic seeded
  fixture (FIXTURES.md §1); the oracle SQL reads the SAME parquet file
  (absolute path) and re-derives the semantics with DuckDB's RE2 regexes and
  window functions, so parse/rank/route/aggregate all get value-hash checks.
- ``e_* / q1 / d_* / emb_*`` — the driver's own TPC-H-ish tables (events,
  lineitem, documents, embeddings) via the pre-registered DuckDB views.

Column names and integer widths match between Ray and SQL (all ints cast to
int64; floats only where the computation is order-independent or rounded).
"""

from __future__ import annotations
from ..blocks import ncpus as _ncpus

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import fixtures as fx
from ..sources.transcripts import read_table

# --------------------------------------------------------------------------
# shared transcript-pipeline cache (one materialized pipeline per sf)
# --------------------------------------------------------------------------

_PIPE_CACHE: dict = {}


def _pipe(sf_dir: str):
    sf = fx.sf_from_dir(sf_dir)
    if sf not in _PIPE_CACHE:
        from .flagship import build

        import pyarrow.parquet as pq
        d = fx.ensure_fixture(sf)
        meta = pq.read_table(f"{d}/tool_meta.parquet")
        _PIPE_CACHE[sf] = build(f"{d}/transcripts", tool_meta=meta,
                                materialize_intermediates=True)
    return _PIPE_CACHE[sf]


def _agg_nparts() -> int:
    """Partition count for pair-partitioned exact aggregates: CPU-
    proportional with a floor — each partition task's shard must stay
    memory-bounded at scale, and more partitions than CPUs is fine (they
    queue), so err upward on a big cluster."""
    ncpu = _ncpus()
    return max(16, min(2 * ncpu, 256))


def _i64(df: pd.DataFrame, cols) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].astype("int64")
    return df


# --------------------------------------------------------------------------
# SQL fragments for the transcript oracle (DuckDB is RE2 like pyarrow)
# --------------------------------------------------------------------------

_H = r"^\{@BTEST\|([^|}]+)\|(\d{2})\|(\d{12})\|(\d+)\|([^|}]+)\}"
_A = (r"^\{@A-([A-Z]+)\|(\d{2})\|([^|}]+)\|([^|}]+)\}"
      r"(?:\{@LIM2\|([^|}]+)\|([^|}]+)\}"
      r"|\{@LIM3\|([^|}]+)\|([^|}]+)\|([^|}]+)\})?$")
_D = r"^\{@D-T\|(\d{2})\|([^|}]+)\}$"
_E = r"^\{@BTEST-END\|(\d{2})\|(\d{12})\}$"


def _dec(expr: str) -> str:
    return (f"CASE {expr} WHEN '00' THEN 'pass' WHEN '01' THEN 'fail' "
            f"ELSE 'unknown' END")


def _tx_cte(sf: float = 0.01) -> str:
    path = f"{fx.fixture_dir(sf)}/transcripts/*.parquet"
    return f"""
WITH tx AS (
  SELECT conv_id, turn_idx, role, text, tool, ts FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY conv_id) AS _rn
    FROM read_parquet('{path}')
  ) WHERE _rn = 1
),
hdr AS (
  SELECT conv_id, turn_idx,
         regexp_extract(text, '{_H}', 1) AS serial,
         regexp_extract(text, '{_H}', 5) AS panel_serial,
         CAST(regexp_extract(text, '{_H}', 4) AS BIGINT) AS board_index,
         strptime(regexp_extract(text, '{_H}', 3), '%y%m%d%H%M%S') AS start_ts,
         tool
  FROM tx WHERE regexp_matches(text, '{_H}')
),
endr AS (
  SELECT conv_id, turn_idx, tool,
         {_dec(f"regexp_extract(text, '{_E}', 1)")} AS att_status
  FROM tx WHERE regexp_matches(text, '{_E}')
),
-- last-record-wins (parity.py / reference sequential overwrite): header
-- fields from the LAST header row, att_status from the LAST END row,
-- start_ts = min over headers; attempts = UNION of header & END convs
-- (a conv with an END but no header is still an attempt)
hdr_last AS (
  SELECT conv_id, serial, panel_serial, board_index FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id
                                 ORDER BY turn_idx DESC) AS _hrn FROM hdr
  ) WHERE _hrn = 1
),
hdr_min AS (
  SELECT conv_id, min(start_ts) AS start_ts FROM hdr GROUP BY conv_id
),
end_last AS (
  SELECT conv_id, att_status FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id
                                 ORDER BY turn_idx DESC) AS _ern FROM endr
  ) WHERE _ern = 1
),
conv_ids AS (
  SELECT conv_id, max(tool) AS tool FROM (
    SELECT conv_id, tool FROM hdr UNION ALL SELECT conv_id, tool FROM endr
  ) GROUP BY conv_id
),
attempts AS (
  SELECT c.conv_id, m.start_ts, hl.serial, hl.panel_serial, hl.board_index,
         c.tool, el.att_status
  FROM conv_ids c
  LEFT JOIN hdr_last hl USING (conv_id)
  LEFT JOIN hdr_min m USING (conv_id)
  LEFT JOIN end_last el USING (conv_id)
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY serial
                            ORDER BY start_ts ASC NULLS FIRST,
                                     conv_id) - 1 AS att_rank,
         count(*) OVER (PARTITION BY serial) AS n_attempts
  FROM attempts
),
tests AS (
  SELECT conv_id, turn_idx,
         CASE WHEN regexp_matches(text, '{_A}')
              THEN regexp_extract(text, '{_A}', 4)
              ELSE regexp_extract(text, '{_D}', 2) END AS test_name,
         CASE WHEN regexp_matches(text, '{_A}')
              THEN {_dec(f"regexp_extract(text, '{_A}', 2)")}
              ELSE {_dec(f"regexp_extract(text, '{_D}', 1)")} END AS status,
         CASE WHEN regexp_matches(text, '{_A}')
              THEN regexp_extract(text, '{_A}', 1) ELSE 'DIG' END AS ttype
  FROM tx WHERE regexp_matches(text, '{_A}') OR regexp_matches(text, '{_D}')
),
analog AS (
  SELECT conv_id, turn_idx,
         regexp_extract(text, '{_A}', 4) AS test_name,
         CAST(regexp_extract(text, '{_A}', 3) AS DOUBLE) AS measurement,
         NULLIF(regexp_extract(text, '{_A}', 7), '') AS nom_s,
         coalesce(NULLIF(regexp_extract(text, '{_A}', 5), ''),
                  NULLIF(regexp_extract(text, '{_A}', 8), '')) AS ul_s,
         coalesce(NULLIF(regexp_extract(text, '{_A}', 6), ''),
                  NULLIF(regexp_extract(text, '{_A}', 9), '')) AS ll_s
  FROM tx WHERE regexp_matches(text, '{_A}')
),
analog_lims AS (
  SELECT test_name,
         coalesce(nom_s, '') || '|' || coalesce(ul_s, '') || '|' ||
         coalesce(ll_s, '') AS lim_sig
  FROM analog WHERE ul_s IS NOT NULL OR nom_s IS NOT NULL
)
"""


_YIELD_SQL_TMPL = """
SELECT phase, ok, nok FROM (
  SELECT 'first' AS phase,
         count(*) FILTER (WHERE {rank} = 0 AND {ok}) AS ok,
         count(*) FILTER (WHERE {rank} = 0 AND NOT {ok}) AS nok FROM {src}
  UNION ALL
  SELECT 'final',
         count(*) FILTER (WHERE {rank} = {last} AND {ok}),
         count(*) FILTER (WHERE {rank} = {last} AND NOT {ok}) FROM {src}
  UNION ALL
  SELECT 'all', count(*) FILTER (WHERE {ok}),
         count(*) FILTER (WHERE NOT {ok}) FROM {src}
)
"""


def _pareto_where(mode: str) -> str:
    if mode == "first_pass":
        return "AND r.att_rank = 0"
    if mode == "after_retest":
        return "AND r.att_rank = r.n_attempts - 1"
    return ""


def transcript_oracle_sql() -> dict[str, str]:
    tx = _tx_cte(0.01)
    ok = "coalesce(att_status, 'unknown') = 'pass'"
    sql = {}

    sql["t_yields_sb"] = tx + _YIELD_SQL_TMPL.format(
        src="ranked", rank="att_rank", last="n_attempts - 1", ok=f"({ok})")

    sql["t_yields_mb"] = tx + """
, runs AS (
  SELECT panel_serial, att_rank,
         count(*) FILTER (WHERE coalesce(att_status,'unknown') <> 'pass')
           AS nok_boards,
         max(n_attempts) AS n_runs
  FROM ranked GROUP BY 1, 2
)
""" + _YIELD_SQL_TMPL.format(src="runs", rank="att_rank", last="n_runs - 1",
                             ok="(nok_boards = 0)")

    for mode in ("all", "first_pass", "after_retest"):
        sql[f"t_pareto_{mode}"] = tx + f"""
SELECT t.test_name, count(*) AS total,
       count(DISTINCT r.serial) AS n_boards
FROM tests t JOIN ranked r ON t.conv_id = r.conv_id
WHERE t.status = 'fail' {_pareto_where(mode)}
GROUP BY 1
"""

    sql["t_hourly"] = tx + """
SELECT CAST(strftime(start_ts, '%y%m%d%H') AS BIGINT) AS hour_key,
       count(*) FILTER (WHERE att_status = 'pass') AS ok,
       count(*) FILTER (WHERE coalesce(att_status,'unknown') <> 'pass') AS nok
FROM ranked GROUP BY 1
"""

    sql["t_hourly_chain"] = tx + """
SELECT CAST(strftime(start_ts, '%y%m%d%H') AS BIGINT) AS hour_key,
       count(*) FILTER (WHERE att_status = 'pass') AS ok,
       count(*) FILTER (WHERE coalesce(att_status,'unknown') <> 'pass') AS nok,
       string_agg(coalesce(att_status,'unknown') || ',' ||
                  strftime(start_ts, '%M:%S') || ',' || serial, ';'
                  ORDER BY start_ts, serial) AS chain
FROM ranked GROUP BY 1
"""

    sql["t_limit_changes"] = tx + """
SELECT test_name, count(DISTINCT lim_sig) AS n_limits
FROM analog_lims GROUP BY 1 HAVING count(DISTINCT lim_sig) > 1
"""

    sql["t_testlist"] = tx + """
SELECT test_name, count(*) AS n, max(ttype) AS ttype FROM tests GROUP BY 1
"""

    sql["t_attempts"] = tx + """
SELECT conv_id, serial, panel_serial, board_index,
       CAST(att_rank AS BIGINT) AS att_rank,
       CAST(n_attempts AS BIGINT) AS n_attempts,
       coalesce(att_status, 'unknown') AS att_status,
       strftime(start_ts, '%y%m%d%H%M%S') AS start_s
FROM ranked
"""

    sql["t_mb_results"] = tx + """
SELECT panel_serial, CAST(att_rank AS BIGINT) AS att_rank,
       strftime(CAST(min(start_ts) AS TIMESTAMP), '%y%m%d%H%M%S') AS start_s,
       CASE WHEN count(*) FILTER (
              WHERE coalesce(att_status,'unknown') <> 'pass') = 0
            THEN 'pass' ELSE 'fail' END AS panel_result,
       string_agg(coalesce(att_status,'unknown'), ','
                  ORDER BY board_index, conv_id) AS boards
FROM ranked GROUP BY 1, 2
"""

    sql["t_measurements"] = tx + """
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, test_name, measurement,
       CAST(nom_s AS DOUBLE) AS lim_nom,
       CAST(ul_s AS DOUBLE) AS lim_ul,
       CAST(ll_s AS DOUBLE) AS lim_ll
FROM analog
"""

    sql["t_sink_counts"] = tx + f"""
, statused AS (
  SELECT t.conv_id, t.text,
    CASE WHEN regexp_matches(text, '{_H}') THEN {_dec(f"regexp_extract(text, '{_H}', 2)")}
         WHEN regexp_matches(text, '{_A}') THEN {_dec(f"regexp_extract(text, '{_A}', 2)")}
         WHEN regexp_matches(text, '{_D}') THEN {_dec(f"regexp_extract(text, '{_D}', 1)")}
         WHEN regexp_matches(text, '{_E}') THEN {_dec(f"regexp_extract(text, '{_E}', 1)")}
         ELSE NULL END AS status,
    (NOT (regexp_matches(text, '{_H}') OR regexp_matches(text, '{_A}')
          OR regexp_matches(text, '{_D}') OR regexp_matches(text, '{_E}')))
      AS is_err,
    regexp_matches(text, '{_A}') AS is_analog
  FROM tx t
)
SELECT sink, count(*) AS n FROM (
  SELECT CASE
    WHEN s.is_err THEN 'parse_error'
    WHEN r.att_rank > 0 THEN 'retest'
    WHEN s.status = 'fail' THEN 'fail'
    WHEN s.is_analog THEN 'measurement'
    ELSE 'pass' END AS sink
  FROM statused s LEFT JOIN ranked r ON s.conv_id = r.conv_id
) GROUP BY 1
"""

    sql["t_text_identity"] = tx + """
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, text FROM tx
"""

    sql["t_failed_boards"] = tx + """
, final_fail AS (
  SELECT conv_id, serial FROM ranked
  WHERE att_rank = n_attempts - 1 AND att_status = 'fail'
),
names AS (
  SELECT DISTINCT t.conv_id, t.test_name
  FROM tests t JOIN final_fail f ON t.conv_id = f.conv_id
  WHERE t.status = 'fail'
)
SELECT f.conv_id, f.serial,
       coalesce((SELECT string_agg(n.test_name, ',' ORDER BY n.test_name)
                 FROM names n WHERE n.conv_id = f.conv_id), '') AS failed_tests
FROM final_fail f
"""

    sql["t_export_long"] = tx + """
SELECT t.conv_id, r.serial, CAST(r.att_rank AS BIGINT) AS att_rank,
       r.att_status, t.test_name, t.status, a.measurement
FROM tests t JOIN ranked r ON t.conv_id = r.conv_id
LEFT JOIN analog a ON t.conv_id = a.conv_id AND t.turn_idx = a.turn_idx
"""

    sql["t_test_series"] = tx + """
SELECT a.conv_id, CAST(a.turn_idx AS BIGINT) AS turn_idx, a.test_name,
       a.measurement, CAST(a.nom_s AS DOUBLE) AS lim_nom,
       CAST(a.ul_s AS DOUBLE) AS lim_ul, CAST(a.ll_s AS DOUBLE) AS lim_ll
FROM analog a
JOIN (SELECT test_name FROM tests GROUP BY 1 ORDER BY count(*) DESC, test_name
      LIMIT 1) top ON a.test_name = top.test_name
"""

    sql["t_product_hourly"] = tx + f"""
SELECT coalesce(m.product, r.tool) AS product,
       CAST(strftime(r.start_ts, '%y%m%d%H') AS BIGINT) AS hour_key,
       count(*) FILTER (WHERE r.att_status = 'pass') AS ok,
       count(*) FILTER (WHERE coalesce(r.att_status,'unknown') <> 'pass') AS nok
FROM ranked r
LEFT JOIN read_parquet('{fx.fixture_dir(0.01)}/tool_meta.parquet') m
  ON r.tool = m.tool
GROUP BY 1, 2
"""
    return sql


# --------------------------------------------------------------------------
# Ray implementations — transcript queries
# --------------------------------------------------------------------------

def t_yields_sb(sf_dir):
    from .reports import yields_sb
    return yields_sb(_pipe(sf_dir)["attempts"]).select(["phase", "ok", "nok"])


def t_yields_mb(sf_dir):
    from .reports import yields_mb
    return yields_mb(_pipe(sf_dir)["attempts"]).select(["phase", "ok", "nok"])


def _t_pareto(sf_dir, mode):
    from .reports import failure_pareto
    df = failure_pareto(_pipe(sf_dir)["flagged"], mode).to_pandas()
    return _i64(df, ["total", "n_boards"])


def t_hourly(sf_dir):
    from .reports import hourly_stats
    return _i64(hourly_stats(_pipe(sf_dir)["attempts"]).to_pandas(),
                ["hour_key", "ok", "nok"])


def t_hourly_chain(sf_dir):
    from .reports import hourly_chain
    df = hourly_chain(_pipe(sf_dir)["attempts"]).to_pandas()
    return _i64(df, ["hour_key", "ok", "nok"])


def t_limit_changes(sf_dir):
    from .reports import limit_changes
    return _i64(limit_changes(_pipe(sf_dir)["parsed"]).to_pandas(),
                ["n_limits"])


def t_testlist(sf_dir):
    from .reports import testlist
    return _i64(testlist(_pipe(sf_dir)["parsed"]).to_pandas(), ["n"])


def t_attempts(sf_dir):
    att = _pipe(sf_dir)["attempts"]

    def fmt(b: pa.Table) -> pa.Table:
        status = b["att_status"]
        if isinstance(status, pa.ChunkedArray):
            status = status.combine_chunks()
        if pa.types.is_null(status.type):
            status = pc.cast(status, pa.string())
        return pa.table({
            "conv_id": b["conv_id"],
            "serial": b["serial"],
            "panel_serial": b["panel_serial"],
            "board_index": pc.cast(b["board_index"], pa.int64()),
            "att_rank": pc.cast(b["att_rank"], pa.int64()),
            "n_attempts": pc.cast(b["n_attempts"], pa.int64()),
            "att_status": pc.fill_null(status, "unknown"),
            # second precision: arrow strftime %S appends ".ffffff" for
            # sub-second timestamp units, duckdb's does not
            "start_s": pc.strftime(
                pc.cast(pc.cast(b["start_ts"], pa.timestamp("us")),
                        pa.timestamp("s")),
                format="%y%m%d%H%M%S"),
        })

    return att.map_batches(fmt, batch_format="pyarrow")


def t_mb_results(sf_dir):
    """A5 mb_results with oracle-comparable formatting."""
    import pandas as pd

    from .reports import mb_results

    df = mb_results(_pipe(sf_dir)["attempts"]).to_pandas()
    df["start_s"] = (pd.to_datetime(df["start_ts"], unit="us")
                     .dt.strftime("%y%m%d%H%M%S"))
    df["att_rank"] = df["att_rank"].astype("int64")
    return df[["panel_serial", "att_rank", "start_s", "panel_result",
               "boards"]]


def t_measurements(sf_dir):
    parsed = _pipe(sf_dir)["parsed"]

    def sel(b: pa.Table) -> pa.Table:
        m = pc.equal(b["record_type"], "analog")
        t = b.filter(m)
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "test_name": t["test_name"],
            "measurement": t["measurement"],
            "lim_nom": t["lim_nom"],
            "lim_ul": t["lim_ul"],
            "lim_ll": t["lim_ll"],
        })

    return parsed.map_batches(sel, batch_format="pyarrow", zero_copy_batch=True)


def t_sink_counts(sf_dir):
    from ..stages.route import sink_counts
    return _i64(sink_counts(_pipe(sf_dir)["routed"]).to_pandas(), ["n"])


def t_text_identity(sf_dir):
    parsed = _pipe(sf_dir)["parsed"]

    def sel(b: pa.Table) -> pa.Table:
        return pa.table({"conv_id": b["conv_id"],
                         "turn_idx": pc.cast(b["turn_idx"], pa.int64()),
                         "text": b["text"]})

    return parsed.map_batches(sel, batch_format="pyarrow", zero_copy_batch=True)


def t_failed_boards(sf_dir):
    from .reports import failed_boards
    p = _pipe(sf_dir)
    df = failed_boards(p["attempts"], p["flagged"]).to_pandas()
    return df[["conv_id", "serial", "failed_tests"]]


# --------------------------------------------------------------------------
# Ray implementations — driver-table queries (events/lineitem/documents/emb)
# --------------------------------------------------------------------------

def e_hourly(sf_dir):
    """A4 analog over events: hourly ok (non-error) / nok (error) counts.

    Per-batch arrow partial combine (≤ hours-per-batch groups) + a tiny
    driver finish — a Ray groupby here shuffles every event row into ~720
    groups (CLAUDE.md partial-combine rule)."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        hour = pc.strftime(b["ts"], format="%Y-%m-%d %H:00:00")
        err = pc.equal(b["event_type"], "error")
        t = pa.table({"hour": hour,
                      "nok": pc.cast(err, pa.int64()),
                      "ok": pc.cast(pc.invert(err), pa.int64())})
        return pa.TableGroupBy(t, "hour").aggregate(
            [("ok", "sum"), ("nok", "sum")])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize().to_arrow_refs()
    import ray as _ray
    df = (pa.concat_tables(_ray.get(parts)).to_pandas()
          .groupby("hour", as_index=False)
          .agg(ok=("ok_sum", "sum"), nok=("nok_sum", "sum")))
    return _i64(df, ["ok", "nok"])


def e_pareto(sf_dir):
    """A3/O3 analog: event counts per type, most-frequent-first.

    Per-batch value_counts partial + driver finish (few distinct types)."""
    ds = read_table(sf_dir, "events", columns=["event_type"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["event_type"]
        vc = pc.value_counts(col.combine_chunks()
                             if isinstance(col, pa.ChunkedArray) else col)
        return pa.table({"event_type": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize().to_arrow_refs()
    import ray as _ray
    df = (pa.concat_tables(_ray.get(parts)).to_pandas()
          .groupby("event_type", as_index=False).agg(n=("n", "sum")))
    return _i64(df, ["n"])


def e_user_first_last(sf_dir):
    """D2 analog: per user first/last event_type by (ts, event_id).

    Per-batch arrow partial combine (min/max over an order-packed key —
    associative, so any combine tree works) + one driver finish; round 1's
    1-row-per-user Ray map_groups paid ~100µs/group of pure scheduling.
    Driver finish bounded by #users (events is a driver-table query)."""
    import numpy as np
    import ray

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "event_type", "ts"])

    def _partial(b: pa.Table) -> pa.Table:
        # FIXED-WIDTH pack (no delimiter): a '|' inside event_type cannot
        # corrupt the decode, and every component is null-wrapped so a null
        # ts/event_type cannot null the whole pack (min/max would silently
        # skip the row while n counts it).  Null ts packs as all-9s =
        # sorts last, matching the oracle's ORDER BY ts NULLS LAST.
        ts_us = pc.utf8_lpad(
            pc.fill_null(pc.cast(pc.cast(b["ts"], pa.int64()), pa.string()),
                         "9" * 20), 20, padding="0")
        # width guard: an event_id outside [0, 10^12) would silently
        # corrupt the packed ordering (VERDICT r2 item 7)
        if b.num_rows:
            mx = pc.max(b["event_id"]).as_py()
            mn = pc.min(b["event_id"]).as_py()
            if mx is not None and (mx >= 10 ** 12 or mn < 0):
                raise ValueError(
                    f"event_id out of packable range [0, 1e12): min={mn} "
                    f"max={mx} — widen the pack in e_user_first_last")
        eid = pc.utf8_lpad(
            pc.fill_null(pc.cast(b["event_id"], pa.string()), ""), 12,
            padding="0")
        pack = pc.binary_join_element_wise(
            ts_us, eid, pc.fill_null(b["event_type"], ""), "")
        t = pa.table({"user_id": b["user_id"], "first_pack": pack,
                      "last_pack": pack,
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = pa.TableGroupBy(t, "user_id").aggregate(
            [("first_pack", "min"), ("last_pack", "max"), ("n", "sum")])
        return g.rename_columns(["user_id", "first_pack", "last_pack", "n"])

    part = ds.map_batches(_partial, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    tbl = pa.concat_tables(ray.get(part.to_arrow_refs())).combine_chunks()
    g = pa.TableGroupBy(tbl, "user_id").aggregate(
        [("first_pack", "min"), ("last_pack", "max"), ("n", "sum")])
    g = g.rename_columns(["user_id", "first_pack", "last_pack", "n_events"])

    def _typ(col):
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        typ = pc.utf8_slice_codeunits(c, 32)  # strip the 20+12 digit prefix
        return pc.if_else(pc.equal(typ, ""), pa.scalar(None, pa.string()),
                          typ)

    out = pa.table({
        "user_id": g["user_id"],
        "first_type": _typ(g["first_pack"]),
        "last_type": _typ(g["last_pack"]),
        "n_events": g["n_events"],
    }).to_pandas().sort_values("user_id").reset_index(drop=True)
    return _i64(out, ["user_id", "n_events"])


def e_topk(sf_dir):
    """O3 top-k: 10 highest-value events.

    Per-batch arrow ``select_k_unstable`` partial + a ≤10×blocks driver
    merge — a distributed ``sort().limit(10)`` is an all-to-all shuffle of
    every row to keep ten of them."""
    ds = read_table(sf_dir, "events", columns=["event_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            b, k=10, sort_keys=[("value", "descending"),
                                ("event_id", "ascending")])
        return b.take(idx)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize().to_arrow_refs()
    import ray as _ray
    df = (pa.concat_tables(_ray.get(parts)).to_pandas()
          .sort_values(["value", "event_id"], ascending=[False, True])
          .head(10).reset_index(drop=True))
    return _i64(df[["event_id", "value"]], ["event_id"])


def e_top_per_user(sf_dir):
    """Per-group top-N (N=3 by value): the partial cut IS sound here —
    the global per-user top-3 is a subset of the union of per-batch
    per-user top-3s — so each batch ships ≤ 3×users rows and the driver
    finish re-cuts the concatenated candidates.  Ties broken by event_id
    ascending on both sides.  At scale the finish becomes a hash
    partition by user + per-partition cut (the vocab.top_tokens shape)."""
    import ray

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "value"])

    def partial(df):
        return (df.sort_values(["value", "event_id"],
                               ascending=[False, True], kind="stable")
                .groupby("user_id", sort=False).head(3))

    parts = [t for t in
             ray.get(ds.map_batches(partial, batch_format="pandas")
                     .materialize().to_arrow_refs())
             if isinstance(t, pa.Table) and t.num_rows > 0]
    if not parts:
        return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "event_id": pd.Series(dtype="int64"),
                             "value": pd.Series(dtype=float),
                             "rk": pd.Series(dtype="int64")})
    cand = pa.concat_tables(parts).to_pandas()
    cand = (cand.sort_values(["value", "event_id"],
                             ascending=[False, True], kind="stable")
            .groupby("user_id", sort=False).head(3))
    cand["rk"] = cand.groupby("user_id", sort=False).cumcount() + 1
    out = (cand.sort_values(["user_id", "rk"])
           .reset_index(drop=True)[["user_id", "event_id", "value", "rk"]])
    return _i64(out, ["user_id", "event_id", "rk"])


def _strat_hash(ids: np.ndarray) -> np.ndarray:
    """uint64 multiplicative hash, matching e_hash_sample: signed int64
    would WRAP for event_id ≳ 3.5e9 and diverge from the oracle's exact
    arithmetic (ADVICE r2)."""
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint64) * np.uint64(2654435761)
    return (h % np.uint64(1 << 32)).astype(np.int64)


def e_stratified_sample(sf_dir):
    """Deterministic stratified sample (the per-group eval-set carve-out of
    a training-data pipeline): for each event_type keep the N=20 events
    with the SMALLEST multiplicative hash of their id — pure integer
    arithmetic, so any engine reproduces the exact row set (the weighted/
    seeded variants are rows-only by nature; this is the value-checkable
    family member).  The per-batch partial cut is sound — the global
    per-group bottom-20 is a subset of the union of per-batch per-group
    bottom-20s — so each batch ships ≤ 20×groups rows and the driver
    finish re-cuts; at scale the finish hash-partitions by group (the
    vocab.top_tokens shape)."""
    import ray

    ds = read_table(sf_dir, "events",
                    columns=["event_type", "event_id", "value"])

    def partial(df):
        df = df.assign(hkey=_strat_hash(df["event_id"].to_numpy()))
        return (df.sort_values(["hkey", "event_id"], kind="stable")
                .groupby("event_type", sort=False).head(20))

    parts = [t for t in
             ray.get(ds.map_batches(partial, batch_format="pandas")
                     .materialize().to_arrow_refs())
             if isinstance(t, pa.Table) and t.num_rows > 0]
    if not parts:
        return pd.DataFrame({"event_type": pd.Series(dtype=str),
                             "event_id": pd.Series(dtype="int64"),
                             "value": pd.Series(dtype=float),
                             "rn": pd.Series(dtype="int64")})
    cand = pa.concat_tables(parts).to_pandas()
    cand = (cand.sort_values(["hkey", "event_id"], kind="stable")
            .groupby("event_type", sort=False).head(20))
    cand["rn"] = cand.groupby("event_type", sort=False).cumcount() + 1
    out = (cand.sort_values(["event_type", "rn"])
           .reset_index(drop=True)[["event_type", "event_id", "value", "rn"]])
    return _i64(out, ["event_id", "rn"])


def d_weighted_sample(sf_dir):
    """Length-weighted document sample (training-data mixing): the 30
    docs with the smallest sequential-Poisson priority
    ``(hash32(doc_id) << 32) // n_chars`` — weight-proportional in
    expectation, and EXACT integer arithmetic end-to-end so the SQL
    oracle reproduces the row set bit-for-bit (the float-pow
    Efraimidis–Spirakis variant is the documented tfidf oracle trap).
    Per-batch bottom-k partial + driver re-cut (proven-subset
    property); see functions/sampling.py."""
    from ..functions.sampling import weighted_bottom_k

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    df = weighted_bottom_k(ds, "doc_id", "n_chars", k=30)
    return _i64(df, ["doc_id", "n_chars", "rn"])


def e_reservoir_sample(sf_dir):
    """Fixed-SIZE deterministic uniform sample (the reservoir-sampling
    use case, hash-derandomized so it is value-checkable): the 100
    events with the smallest multiplicative id hash — the fixed-size
    counterpart of e_hash_sample's fixed-RATE predicate.
    ``weighted_bottom_k`` with unit weights; same per-batch bottom-k
    partial + driver re-cut."""
    from ..functions.sampling import weighted_bottom_k

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])
    df = weighted_bottom_k(ds, "event_id", None, k=100,
                           keep_cols=["event_type"])
    return _i64(df, ["event_id", "rn"])


def e_window(sf_dir):
    """M7 time-window filter: purchases in a fixed 2-day window."""
    import datetime as dt

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "event_type",
                                               "value"])
    lo = dt.datetime(2024, 1, 2)
    hi = dt.datetime(2024, 1, 4)

    def filt(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.greater_equal(b["ts"], pa.scalar(lo)),
                            pc.less(b["ts"], pa.scalar(hi))),
                    pc.equal(b["event_type"], "purchase"))
        t = b.filter(m)
        return pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                         "value": t["value"]})

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def e_point_lookup(sf_dir):
    """J3 point lookup: all events of user_id=5."""
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "event_type", "value"])

    def filt(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["user_id"], 5))
        return pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                         "event_type": t["event_type"],
                         "value": t["value"]})

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def q1_lineitem(sf_dir):
    """TPC-H Q1-flavored grouped aggregate (exact-arithmetic columns only)."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_shipdate"])
    import datetime as dt

    # per-batch partial combine (6 groups/batch) → tiny driver finish —
    # a Ray groupby here shuffles every filtered row to aggregate into 6
    # groups (CLAUDE.md partial-combine rule); measured 1.5 s → ~0.4 s
    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.less_equal(b["l_shipdate"],
                                   pa.scalar(dt.datetime(1998, 9, 2))))
        g = pa.TableGroupBy(f.select(
            ["l_returnflag", "l_linestatus", "l_quantity"]),
            ["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ([], "count_all")])
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize().to_arrow_refs()
    import ray as _ray
    tbl = pa.concat_tables(_ray.get(parts))
    df = (tbl.to_pandas()
          .groupby(["l_returnflag", "l_linestatus"], as_index=False)
          .agg(sum_qty=("l_quantity_sum", "sum"), n=("count_all", "sum")))
    df["avg_qty"] = (df["sum_qty"] / df["n"]).round(6)
    return _i64(df, ["n"])


def d_token_counts(sf_dir):
    """Token counting (BPE-ish regex + whitespace) over documents.

    Lean stateless map computing ONLY the two token counts — the full
    TextAnalyzer actor pool (lang-ID, fingerprint, quality, …) costs ~4×
    for features this query then throws away; d_analysis runs the full
    analyzer."""
    from ..functions.text import TOKEN_RE

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def toks(df):
        import pandas as pd

        t = df["text"].fillna("")
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tok": t.str.count(TOKEN_RE).astype("int64"),
            "n_ws_tok": t.str.split().str.len().fillna(0).astype("int64"),
        })

    return _i64(ds.map_batches(toks, batch_format="pandas").to_pandas(),
                ["doc_id", "n_tok", "n_ws_tok"])


def d_char_stats(sf_dir):
    """Simple vectorized projection/derivation over documents."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def sel(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "text_len": pc.cast(pc.utf8_length(b["text"]), pa.int64()),
            "n_chars": pc.cast(b["n_chars"], pa.int64()),
        })

    return ds.map_batches(sel, batch_format="pyarrow", zero_copy_batch=True)


def d_exact_dups(sf_dir):
    """D1 exact dedup groups over documents (may legitimately be empty)."""
    from ..functions.dedup_docs import exact_duplicate_groups

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = exact_duplicate_groups(ds).to_pandas()
    if df.empty or "n" not in df.columns:
        # empty Datasets lose their schema after filter; rebuild it
        df = pd.DataFrame({"text": pd.Series(dtype=str),
                           "n": pd.Series(dtype="int64"),
                           "keep_doc_id": pd.Series(dtype="int64")})
    return _i64(df, ["n", "keep_doc_id"])


def _load_query_vec(sf_dir):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    row0 = tbl.slice(0, 1).to_pylist()[0]
    assert row0["vec_id"] == 0 or True
    return np.array(row0["embedding"], dtype=np.float32), row0["vec_id"]


def _knn_rank(ds, q32: np.ndarray, k: int = 10) -> pa.Table:
    """Float64 cosine top-k of one query over a (vec_id, embedding) Dataset
    → (vec_id, rank); double math matches the DuckDB oracle's ordering."""
    import ray

    q = q32.astype(np.float64)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def topk_batch(b: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        emb = b["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = emb.flatten().to_numpy(zero_copy_only=False).reshape(len(emb), -1)
        m = m.astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qv) / norms
        kk = min(k, len(sims))
        idx = np.argpartition(-sims, kk - 1)[:kk] if kk else np.array([], int)
        ids = np.asarray(b["vec_id"].to_pylist())[idx]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cosine": pa.array(sims[idx], pa.float64())})

    cand = ds.map_batches(topk_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
    tbl = pa.concat_tables(ray.get(cand.materialize().to_arrow_refs()))
    order = pc.sort_indices(tbl, sort_keys=[("cosine", "descending"),
                                            ("vec_id", "ascending")])
    top = tbl.take(order[:k])
    return pa.table({"vec_id": top["vec_id"],
                     "rank": pa.array(range(1, top.num_rows + 1), pa.int64())})


def emb_knn(sf_dir):
    """Brute-force cosine top-10 to vec 0's embedding (float64 math to match
    the DuckDB oracle's double-precision list_cosine_similarity)."""
    q32, _ = _load_query_vec(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return _knn_rank(ds, q32, k=10)


def emb_knn_batch(sf_dir):
    """Batched brute-force kNN — the QUERY-MATRIX shape: top-10 per query
    for the 4 smallest vec_ids, all queries served by ONE distributed
    pass (similarity.knn_batch broadcasts the (4, d) matrix once; the
    single-vector twin emb_knn would cost 4 executor launches).
    Value-checked on RANK per query (float-free columns; float64 cosine
    math matches the oracle's list_cosine_similarity ordering — the
    emb_knn convention).  Self-matches (cosine 1.0, rank 1) included on
    both sides."""
    import pyarrow.parquet as pq

    from ..functions.similarity import knn_batch

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    qt = qt.take(pc.sort_indices(qt["vec_id"])[:4])
    qm = np.stack([np.asarray(v, dtype=np.float32)
                   for v in qt["embedding"].to_pylist()])
    qids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    tbl = knn_batch(ds, qm, k=10, query_ids=qids)
    df = tbl.to_pandas()
    df["rank"] = df.groupby("q_id").cumcount() + 1  # already rank-sorted
    df = _i64(df[["q_id", "vec_id", "rank"]], ["q_id", "vec_id", "rank"])
    return df.sort_values(["q_id", "rank"]).reset_index(drop=True)


_IVF_INDEX_CACHE: dict = {}


def _ivf_index_dir(sf_dir: str, nlist: int = 8) -> str:
    """Build (once per sf_dir) and reuse the persisted cluster-partitioned
    IVF index — queries read only probed partitions."""
    import hashlib
    import os

    from ..functions.similarity import ivf_index_complete, write_ivf_index

    key = (os.path.abspath(sf_dir), nlist)
    if key not in _IVF_INDEX_CACHE:
        tag = hashlib.blake2b(str(key).encode(), digest_size=8).hexdigest()
        idx = f"/tmp/ict_ray_ivf/{tag}"
        if not ivf_index_complete(idx):  # absent OR crashed partial write
            ds = read_table(sf_dir, "embeddings",
                            columns=["vec_id", "embedding"])
            write_ivf_index(ds, idx, nlist=nlist)
        _IVF_INDEX_CACHE[key] = idx
    return _IVF_INDEX_CACHE[key]


def emb_knn_ivf(sf_dir):
    """IVF-bucketed approximate top-10 over the persisted
    cluster-partitioned index (rows-only check — approximate)."""
    from ..functions.similarity import knn_ivf_indexed

    q, _ = _load_query_vec(sf_dir)
    idx = _ivf_index_dir(sf_dir, nlist=8)
    top = knn_ivf_indexed(idx, q, k=10, nprobe=4)
    return pa.table({"vec_id": pc.cast(top["vec_id"], pa.int64()),
                     "rank": pa.array(range(1, top.num_rows + 1), pa.int64())})


def emb_knn_lsh(sf_dir):
    """Random-hyperplane LSH-bucketed approximate top-10 (rows-only —
    approximate by design; the similarity family's second scale path
    next to IVF: data-independent buckets, no training pass, incremental
    corpora append without re-clustering).  radius=nbits in the pytest
    proves parity with the exact scan."""
    from ..functions.similarity import knn_lsh

    q, _ = _load_query_vec(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    top = knn_lsh(ds, q, k=10, nbits=12, radius=2)
    return pa.table({"vec_id": pc.cast(top["vec_id"], pa.int64()),
                     "rank": pa.array(range(1, top.num_rows + 1), pa.int64())})


def emb_near_dups(sf_dir):
    """Embedding-cosine near-dup pairs over embeddings (rows-only by
    design — IVF candidate generation is approximate; the exact twin is
    emb_near_dups_exact).  nassign=3 multi-assignment recovers
    boundary-straddling pairs (measured recall 1.0 at this threshold on
    sf0.1 vs 0.43 single-assign)."""
    from ..functions.similarity import embedding_near_dup_pairs

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = embedding_near_dup_pairs(ds, threshold=0.5, nlist=8,
                                  nassign=3).to_pandas()
    if df.empty or "id_a" not in df.columns:
        df = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                           "id_b": pd.Series(dtype="int64"),
                           "cosine": pd.Series(dtype="float64")})
    else:
        df["cosine"] = df["cosine"].round(6)
        df = _i64(df, ["id_a", "id_b"])
    return df


def emb_knn_ivf_full(sf_dir):
    """Full-probe (nprobe == nlist) query over the persisted
    cluster-partitioned IVF index: reads every partition, so the result is
    EXACT — value-checked against the same DuckDB top-10 oracle as emb_knn.
    This pins down index correctness (assignment + partitioned sink +
    probe-side read path); emb_knn_ivf keeps the approximate nprobe=4 path
    as a rows-only check."""
    import glob
    import os

    import ray.data as rd

    from ..functions.similarity import (probed_partition_dirs,
                                        sized_read_parquet)

    q, _ = _load_query_vec(sf_dir)
    idx = _ivf_index_dir(sf_dir, nlist=8)
    dirs = probed_partition_dirs(idx, q, nprobe=8)
    files = [f for d in dirs
             for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    ds = sized_read_parquet(files, columns=["vec_id", "embedding"])
    return _knn_rank(ds, q, k=10)


def emb_near_dups_exact(sf_dir):
    """Exact all-pairs cosine-threshold join (the O(n²) verification
    baseline for the IVF-bucketed emb_near_dups); float64 both sides,
    cosine rounded to 6 — at sf0.01 the nearest pair to the 0.5 threshold
    sits at 0.513 with the next at 0.493, so the boundary is safe."""
    from ..functions.similarity import exact_near_dup_pairs

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = exact_near_dup_pairs(ds, threshold=0.5).to_pandas()
    if df.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    df["cosine"] = df["cosine"].round(6)
    return _i64(df, ["id_a", "id_b"])


def d_quality(sf_dir):
    """SQL-expressible slice of the text analyzer (token count, punct /
    stopword / word-length ratios, quality score, language-ID) — the
    value-checked twin of the rows-only d_analysis (whose fingerprint hash
    has no SQL equivalent)."""
    from ..functions.text import quality_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return _i64(quality_table(ds).to_pandas(), ["doc_id", "n_tok"])


_MEDIA_ORACLE_PATH = "/tmp/ict_ray_media/media_n48_seed42_v1.parquet"


def media_digest_q(sf_dir):
    """Value-checked media stage: integer sha256-based digest per payload
    (media_features keeps the float feature vector as the rows-only demo)."""
    import ray.data as rd

    from ..functions.multimodal import (media_digest, persist_synth_media,
                                        synth_media_table)

    persist_synth_media(_MEDIA_ORACLE_PATH, n=48)
    ds = rd.from_arrow(synth_media_table(n=48))
    return media_digest(ds)


_MEDIA_REAL_ORACLE_PATH = \
    "/tmp/ict_ray_media/media_real_n96_seed42_v1.parquet"


def media_stats(sf_dir):
    """Value-checked slice of the ONE-PASS media kind dispatch
    (``multimodal.media_corpus_stats`` — the payload-scale benchmark
    workload): per-kind row / frame / input-byte totals, exactly the
    integer columns a SQL twin can re-derive from the typed metadata
    (octet_length + ceil(duration/step)); the resize/feature outputs
    stay in the rows-only media_features.  Images are REAL binary PPMs
    so the decode="real" netpbm path is externally exercised end-to-end
    (the pipeline crashes, not degrades, if decode breaks)."""
    import ray.data as rd

    from ..functions.multimodal import (media_corpus_stats,
                                        persist_synth_media,
                                        synth_media_table)

    persist_synth_media(_MEDIA_REAL_ORACLE_PATH, n=96, real_images=True)
    ds = rd.from_arrow(synth_media_table(n=96, real_images=True))
    df = media_corpus_stats(ds)
    return _i64(df[["kind", "n_rows", "n_frames", "in_bytes"]].copy(),
                ["n_rows", "n_frames", "in_bytes"])


def _media_stats_sql() -> str:
    """DuckDB twin of the media_stats dispatch slice over the persisted
    real-image synthetic media parquet: frames at t = 0, every_ms, …,
    < duration_ms ⇒ ceil(duration/1000) per video row."""
    from ..functions.multimodal import persist_synth_media

    persist_synth_media(_MEDIA_REAL_ORACLE_PATH, n=96, real_images=True)
    return f"""
SELECT kind,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CASE WHEN kind = 'video' AND duration_ms > 0
                          THEN CAST(CEIL(duration_ms / 1000.0) AS BIGINT)
                          ELSE 0 END), 0) AS BIGINT) AS n_frames,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS in_bytes
FROM read_parquet('{_MEDIA_REAL_ORACLE_PATH}')
WHERE payload IS NOT NULL  -- matches the engine's null-cell drop contract
GROUP BY kind
"""


def e_asof(sf_dir):
    """AS-OF join (task-brief custom operator): each purchase event gets
    the same user's latest click at-or-before its ts.  The click side is
    deduped to one row per (user, ts) keeping max event_id — without that
    the "latest ≤" row is nondeterministic in both engines."""
    from ..stages.temporal import asof_join_broadcast

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type"])

    # small-side build: per-batch partial groupby + driver finish (the
    # clicks table is tiny; a Ray groupby here would shuffle every row)
    def click_part(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["event_type"], "click"))
        return pa.TableGroupBy(f.select(["user_id", "ts", "event_id"]),
                               ["user_id", "ts"]).aggregate(
            [("event_id", "max")])

    from ..blocks import shaped_tables
    parts = pa.concat_tables(shaped_tables(
        ds.map_batches(click_part, batch_format="pyarrow",
                       zero_copy_batch=True).materialize(),
        "event_id_max"))
    cdf = (parts.to_pandas().groupby(["user_id", "ts"], as_index=False)
           ["event_id_max"].max())
    clicks = pa.table({
        "user_id": pa.array(cdf["user_id"], pa.int64()),
        "ts": pa.array(cdf["ts"]),
        "click_ts": pa.array(cdf["ts"].astype("datetime64[us]")
                             .astype("int64"), pa.int64()),
        "click_event_id": pa.array(cdf["event_id_max"], pa.int64()),
    })

    def only_purchases(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["event_type"], "purchase"))

    left = ds.map_batches(only_purchases, batch_format="pyarrow",
                          zero_copy_batch=True)
    joined = asof_join_broadcast(left, clicks, by="user_id", on="ts",
                                 attach={"click_ts": "click_ts",
                                         "click_event_id": "click_event_id"})

    def sel(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "user_id", "click_ts",
                         "click_event_id"])

    return joined.map_batches(sel, batch_format="pyarrow")


def e_asof_big(sf_dir):
    """Same join as e_asof but through the BIG-BIG hash-partitioned
    sort-merge path (asof_join_partitioned): both sides stream through a
    narrow tagging pass and nparts partition tasks sort-merge their slice
    — the cluster-scale variant, value-checked against the identical
    DuckDB ASOF oracle.  The click side is deduped per (user, ts) with a
    per-batch partial max + tiny driver finish (few distinct click keys),
    then re-wrapped as a Dataset so the join's right side exercises the
    Dataset→tag→partition machinery."""
    import ray
    import ray.data as rd

    from ..stages.temporal import asof_join_partitioned

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type"])

    def click_part(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["event_type"], "click"))
        return pa.TableGroupBy(f.select(["user_id", "ts", "event_id"]),
                               ["user_id", "ts"]).aggregate(
            [("event_id", "max")])

    from ..blocks import shaped_tables
    parts = pa.concat_tables(shaped_tables(
        ds.map_batches(click_part, batch_format="pyarrow",
                       zero_copy_batch=True).materialize(),
        "event_id_max"))
    cdf = (parts.to_pandas().groupby(["user_id", "ts"], as_index=False)
           ["event_id_max"].max())
    clicks = rd.from_arrow(pa.table({
        "user_id": pa.array(cdf["user_id"], pa.int64()),
        "ts": pa.array(cdf["ts"]),
        "click_ts": pa.array(cdf["ts"].astype("datetime64[us]")
                             .astype("int64"), pa.int64()),
        "click_event_id": pa.array(cdf["event_id_max"], pa.int64()),
    }))

    def only_purchases(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["event_type"], "purchase"))

    left = ds.map_batches(only_purchases, batch_format="pyarrow",
                          zero_copy_batch=True)
    joined = asof_join_partitioned(
        left, clicks, by="user_id", on="ts",
        attach={"click_ts": "click_ts", "click_event_id": "click_event_id"},
        left_cols=["event_id"])

    def sel(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "user_id", "click_ts",
                         "click_event_id"])

    return joined.map_batches(sel, batch_format="pyarrow")


def e_rolling(sf_dir):
    """Windowed running aggregate (task-brief custom operator): per-user
    running sum of value + row number ordered by (ts, event_id), via the
    hash-partitioned segment-cumsum stage."""
    from ..stages.temporal import running_sum_partitioned

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    return running_sum_partitioned(ds, key="user_id", ts="ts",
                                   idc="event_id", val="value")


def _top3_hour_windows(ds) -> pa.Table:
    """Top-3 busiest hours (per-batch partial hour counts + driver
    finish, ties broken by hour ascending — mirrored in the oracle CTE),
    each widened to an OVERLAPPING [hour-30min, hour+90min) window."""
    HOUR = 3_600_000_000  # µs

    def hour_part(b: pa.Table) -> pa.Table:
        ts = b["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64())
        hs = pc.multiply(pc.divide(us, HOUR), HOUR)
        return pa.TableGroupBy(pa.table({"hs": hs}),
                               "hs").aggregate([("hs", "count")])

    from ..blocks import shaped_tables
    parts = pa.concat_tables(shaped_tables(
        ds.map_batches(hour_part, batch_format="pyarrow",
                       zero_copy_batch=True).materialize(),
        "hs_count"))
    hdf = (parts.to_pandas().groupby("hs", as_index=False)["hs_count"]
           .sum().sort_values(["hs_count", "hs"], ascending=[False, True],
                              kind="stable").head(3))
    ws = (hdf["hs"] - HOUR // 2).to_numpy()
    return pa.table({
        "ws": pa.array(ws, pa.int64()),
        "we": pa.array(hdf["hs"].to_numpy() + HOUR * 3 // 2, pa.int64()),
        "window_start": pa.array(ws, pa.int64()),
    })


def e_window_join(sf_dir):
    """Range/interval join (task-brief custom operator): derive the top-3
    busiest hours from the event stream itself, widen each to an
    overlapping window, then interval-join every event falling inside a
    window.  A single event can match two windows when adjacent hours are
    both in the top 3."""
    from ..stages.temporal import interval_join_broadcast

    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])
    windows = _top3_hour_windows(ds)
    joined = interval_join_broadcast(ds, windows, on="ts", start="ws",
                                     end="we",
                                     attach={"window_start": "window_start"})

    def sel(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "window_start"])

    return joined.map_batches(sel, batch_format="pyarrow")


def e_window_join_big(sf_dir):
    """Same range join as e_window_join through the BIG-BIG time-bucket
    banding path (interval_join_partitioned, 1-hour buckets ≈ half the
    2-hour window width), value-checked against the identical oracle."""
    import ray.data as rd

    from ..stages.temporal import interval_join_partitioned

    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])
    windows = _top3_hour_windows(ds)
    joined = interval_join_partitioned(
        ds, rd.from_arrow(windows), on="ts", start="ws", end="we",
        attach={"window_start": "window_start"},
        bucket_us=3_600_000_000, left_cols=["event_id"])

    def sel(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "window_start"])

    return joined.map_batches(sel, batch_format="pyarrow")


def e_sliding(sf_dir):
    """Sliding-window count (task-brief "streaming window" custom op):
    events per (1-hour window sliding 15 min, event_type).  Width = 4 ×
    slide, so each event lands in exactly 4 windows — the SQL twin is a
    constant 4-way unnest, and all aggregates are exact-int counts."""
    from ..stages.temporal import sliding_window_count

    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])
    return sliding_window_count(ds, on="ts", key="event_type",
                                slide_us=900_000_000, nwin=4)


def e_sessions(sf_dir):
    """Gap-based sessionization (classic log-pipeline operator): split
    each user's event stream into sessions at >30-min gaps (ordering ties
    broken by event_id); one row per session with start/end/count."""
    from ..stages.temporal import sessionize_partitioned

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts"])
    return sessionize_partitioned(ds, key="user_id", ts="ts",
                                  idc="event_id",
                                  gap_us=1_800_000_000)


def e_gaps(sf_dir):
    """Per-user inter-arrival gap statistics (lead/lag delta family):
    count, sum and max of consecutive event gaps ordered by (ts,
    event_id).  Sum and count are mergeable from min/max/count partials;
    MAX gap is not — it forces the per-key ordered co-location that
    ``interarrival_partitioned`` provides (see its docstring)."""
    from ..stages.temporal import interarrival_partitioned

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts"])
    return interarrival_partitioned(ds, key="user_id", ts="ts",
                                    idc="event_id")


def e_hash_sample(sf_dir):
    """Deterministic hash-based 10% sample over events: a stateless per-row
    predicate ((id·2654435761) mod 2³² < 0.1·2³²) that any engine can
    reproduce — the SQL-checkable counterpart of the seeded e_sample."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def keep(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mask = (ids * np.uint64(2654435761)) % np.uint64(1 << 32) \
            < np.uint64(429496729)
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def d_token_percentiles(sf_dir):
    """Exact distributed percentiles (task-brief "sketch" family, the
    oracle-checkable baseline): median/p90/p99 of per-document whitespace
    token counts via per-batch value-count histogram partials + a driver
    histogram finish — partial size is bounded by DISTINCT counts, not
    rows.  Semantics = DuckDB quantile_disc."""
    from ..functions.quantiles import histogram_quantiles

    ds = read_table(sf_dir, "documents", columns=["text"])

    def tok(df):
        import pandas as pd

        t = df["text"].fillna("")
        return pd.DataFrame({
            "v": t.str.split().str.len().fillna(0).astype("int64")})

    counts = ds.map_batches(tok, batch_format="pandas")
    return histogram_quantiles(counts, "v",
                               {"q50": 0.5, "q90": 0.9, "q99": 0.99})


def d_percentile_filter(sf_dir):
    """Training-data curation: per-language length-percentile culling —
    keep documents whose ``n_chars`` is at/above their language's p75
    (task-brief quality-filter family; the transcript-engine analog is the
    sink route filter, stages/route.py).

    Scale shape: thresholds come from the hash-partitioned exact grouped-
    quantile tasks (output rows = #languages — tiny), then ONE broadcast
    of the lang→threshold arrays and a streaming per-batch filter; the
    corpus side is never shuffled and never materialized.  The threshold
    IS a data value (quantile_disc semantics), so the comparison is exact
    int64 — no IEEE boundary risk vs the SQL oracle (the tfidf.py lesson).
    Rows with null lang drop on both sides (inner-join semantics: the
    quantile stage excludes null keys, ``index_in`` yields null → filter
    drops)."""
    import ray

    from ..functions.quantiles import grouped_quantiles_partitioned

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "n_chars"])
    thr = grouped_quantiles_partitioned(docs, "lang", "n_chars",
                                        {"thr": 0.75})
    langs_arr = thr["lang"].combine_chunks()
    thr_arr = pa.array([int(v) for v in thr["thr"].to_pylist()], pa.int64())

    def keep(b: pa.Table) -> pa.Table:
        lang = b["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        idx = pc.index_in(lang, value_set=langs_arr)
        row_thr = pc.take(thr_arr, idx)  # null idx (null/unseen lang) → null
        # null mask entries DROP (arrow filter default) — inner-join match
        out = b.filter(pc.greater_equal(b["n_chars"], row_thr))
        return pa.table({"doc_id": pc.cast(out["doc_id"], pa.int64()),
                         "lang": out["lang"],
                         "n_chars": pc.cast(out["n_chars"], pa.int64())})

    return docs.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)


def d_contamination(sf_dir):
    """Benchmark-decontamination scan: flag documents containing any of a
    small probe set (here: the 40-char prefixes of every ``doc_id % 97
    == 0`` document, standing in for an external eval-benchmark snippet
    list), returning ``(doc_id, n_hits)`` for contaminated docs.

    Scale shape: the probe side is tiny by construction (a benchmark
    suite is KBs), collected once from a column-pruned scan and broadcast
    via ``ray.put``; the corpus streams through one vectorized
    ``pc.match_substring`` pass per probe — no shuffle, no join.  Past
    256 probes the scan switches to ONE Aho-Corasick pass per batch
    (polars ``extract_many``, overlapping=True + unique — measured
    658 s → ~7 s at 1M docs / 10.3k probes, value-identical; forced-path
    parity pytest); at benchmark-suite probe counts the arrow kernel
    wins.  Counts are exact int64 (a probe either is or isn't a
    substring), so the oracle comparison is hash-exact."""
    import ray

    from ..blocks import concat_shaped

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def probe_part(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = pc.fill_null(b["text"], "")
        m = pa.array((ids % 97 == 0)
                     & (pc.utf8_length(text).to_numpy(zero_copy_only=False)
                        >= 40))
        probe = pc.utf8_slice_codeunits(text.filter(m), 0, 40)
        return pa.table({"probe": pc.cast(probe, pa.string())})

    probe_tbl = concat_shaped(
        docs.map_batches(probe_part, batch_format="pyarrow",
                         zero_copy_batch=True).materialize(),
        "probe", empty_schema=pa.schema([("probe", pa.string())]))
    probes = sorted(set(probe_tbl["probe"].to_pylist()))
    pref = ray.put(probes)

    def scan(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ps = ray.get(pref)
        if len(ps) > 256:
            # big probe set: ONE Aho-Corasick pass (polars extract_many,
            # Rust AC) instead of a match_substring kernel pass PER
            # probe.  The per-probe loop is O(probes × corpus bytes) —
            # measured 658 s at 1M docs where the modulo-97 probe set
            # reaches ~10.3k strings, vs seconds for the automaton.
            # overlapping=True so a probe hidden inside another probe's
            # match is still found; unique() restores the per-probe 0/1
            # count the small path computes.
            import polars as pl

            hits = (pl.from_arrow(text.cast(pa.large_string()))
                    .str.extract_many(ps, overlapping=True)
                    .list.unique().list.len())
            n = hits.to_numpy().astype(np.int64)
        else:
            n = np.zeros(len(b), dtype=np.int64)
            for p in ps:
                n += pc.match_substring(text, p).to_numpy(
                    zero_copy_only=False).astype(np.int64)
        t = pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                      "n_hits": pa.array(n, pa.int64())})
        return t.filter(pc.greater(t["n_hits"], 0))

    out = docs.map_batches(scan, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    # output schema differs from the input's → guard zero-row
    # pass-through blocks (they surface with the upstream schema)
    return concat_shaped(out, "n_hits", empty_schema=pa.schema(
        [("doc_id", pa.int64()), ("n_hits", pa.int64())]))


def d_unit_dedup(sf_dir):
    """Intra-document unit dedup: drop repeated words within each doc,
    first occurrence kept in order (the within-page line-dedup pattern;
    the fixture is single-line word soup so the unit is the word).
    Purely per-batch vectorized polars — see
    ``functions.curation.dedup_units``."""
    from ..functions.curation import dedup_units

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_units(docs, sep=" ").to_pandas()
    return _i64(out, ["doc_id", "n_removed"])


def d_ngram_overlap(sf_dir):
    """Fuzzy benchmark decontamination (the n-gram variant of
    d_contamination's exact-substring scan): score every corpus doc by
    how many of its distinct word-trigrams appear in the benchmark set
    (docs with ``doc_id % 97 == 0`` stand in for the eval suite).  All
    counts exact int64; see ``functions.curation.ngram_overlap`` for the
    broadcast-probe scale shape."""
    from ..functions.curation import ngram_overlap

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _split(want_bench: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            m = (ids % 97 == 0) if want_bench else (ids % 97 != 0)
            return b.filter(pa.array(m))
        return f

    bench = docs.map_batches(_split(True), batch_format="pyarrow",
                             zero_copy_batch=True)
    corpus = docs.map_batches(_split(False), batch_format="pyarrow",
                              zero_copy_batch=True)
    return ngram_overlap(corpus, bench, n=3)


def d_lang_mix(sf_dir):
    """Language-balanced mixture sampling (the data-MIXING step of corpus
    prep): per-language quota ``min(c, max(1, 4·⌊√c⌋))`` — temperature-
    flattened so dominant languages are downsampled while tails survive —
    filled by each language's quota docs with the smallest multiplicative
    id hash (deterministic, so the SQL oracle reproduces the exact row
    set; ⌊√c⌋ is safe cross-engine because IEEE sqrt is correctly rounded
    and both sides floor the same double).

    Scale shape: pass 1 is a 2-column count partial (output = #languages);
    quotas are computed driver-side from that tiny table; pass 2 ships
    per-batch per-language bottom-max(quota) candidates (≤ quota×langs per
    batch, the proven-subset property of e_stratified_sample) and the
    driver re-cuts.  At 100 TB the re-cut hash-partitions by language
    (vocab.top_tokens shape) and pass 1 reuses cached corpus stats."""
    import ray

    from ..blocks import concat_shaped

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def count_part(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(b["lang"])).select(["lang"])
        return pa.TableGroupBy(t, "lang").aggregate([([], "count_all")])

    cnt = concat_shaped(
        ds.map_batches(count_part, batch_format="pyarrow",
                       zero_copy_batch=True).materialize(), "count_all",
        empty_schema=pa.schema([("lang", pa.string()),
                                ("count_all", pa.int64())]))
    cdf = cnt.to_pandas().groupby("lang", as_index=False)["count_all"].sum()
    c = cdf["count_all"].to_numpy()
    quota = np.minimum(c, np.maximum(
        1, 4 * np.floor(np.sqrt(c.astype(np.float64))).astype(np.int64)))
    quotas = dict(zip(cdf["lang"], (int(v) for v in quota)))
    kmax = int(quota.max()) if len(quota) else 0

    def cand(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["lang"].notna()]
        df = df.assign(hkey=_strat_hash(df["doc_id"].to_numpy()))
        return (df.sort_values(["hkey", "doc_id"], kind="stable")
                .groupby("lang", sort=False).head(kmax))

    # num_rows > 0: a zero-row PANDAS batch that does reach the UDF
    # yields an empty frame whose columns convert to arrow `null` type —
    # it passes the column-name guard but poisons the concat
    parts = [t for t in ray.get(
        ds.map_batches(cand, batch_format="pandas").materialize().to_arrow_refs())
        if isinstance(t, pa.Table) and "hkey" in t.schema.names
        and t.num_rows > 0]
    if not parts:          # all-null-lang / empty corpus
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "lang": pd.Series(dtype=str),
                             "rn": pd.Series(dtype="int64")})
    out = (pa.concat_tables(parts).to_pandas()
           .sort_values(["hkey", "doc_id"], kind="stable"))
    out["rn"] = out.groupby("lang", sort=False).cumcount() + 1
    out = out[out["rn"] <= out["lang"].map(quotas)]
    out = (out.sort_values(["lang", "rn"])
           .reset_index(drop=True)[["doc_id", "lang", "rn"]])
    return _i64(out, ["doc_id", "rn"])


def q_customer_order_counts(sf_dir):
    """LEFT-OUTER join semantics under external check: orders per
    customer INCLUDING zero-order customers (count from the fact side,
    zero-fill on dimension misses).

    Scale shape: per-batch arrow partial counts over the streaming
    orders scan (bounded by distinct custkeys per batch), driver finish
    under the documented small-result threshold (the hash-partitioned
    ``_gq_part``-style task finish is the >threshold fallback, see
    functions/quantiles.py), then one broadcast ``index_in`` probe per
    customer batch with ``fill_null(0)`` — the left-outer analog of the
    q_nation_revenue inner rollup; no shuffle join anywhere."""
    import ray

    orders = read_table(sf_dir, "orders", columns=["o_custkey"])

    def partial(b: pa.Table) -> pa.Table:
        return pa.TableGroupBy(b.select(["o_custkey"]),
                               "o_custkey").aggregate([([], "count_all")])

    from ..blocks import concat_shaped
    parts = concat_shaped(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize(),
        "count_all",
        empty_schema=pa.schema([("o_custkey", pa.int64()),
                                ("count_all", pa.int64())]))
    fin = (parts.to_pandas().groupby("o_custkey", as_index=False)
           .agg(n_orders=("count_all", "sum")))
    keys = pa.array(fin["o_custkey"].to_numpy(), pa.int64())
    cnts = pa.array(fin["n_orders"].to_numpy(), pa.int64())
    kref = ray.put((keys, cnts))

    from ..stages.join import _memo_key, lookup_indices
    token = _memo_key(kref)

    cust = read_table(sf_dir, "customer", columns=["c_custkey"])

    def attach(b: pa.Table) -> pa.Table:
        k, c = ray.get(kref)
        ck = b["c_custkey"]
        if isinstance(ck, pa.ChunkedArray):
            ck = ck.combine_chunks()
        # memoized khash probe — the distinct-custkey set is BIG at scale
        # and plain index_in rebuilds its hash table per batch (CLAUDE.md)
        idx = lookup_indices(pc.cast(ck, pa.int64()), k, memo_token=token)
        n = pc.fill_null(pc.take(c, idx), 0)  # miss → LEFT-join zero
        return pa.table({"c_custkey": pc.cast(ck, pa.int64()),
                         "n_orders": n})

    return cust.map_batches(attach, batch_format="pyarrow",
                            zero_copy_batch=True)


def d_tfidf_top_terms(sf_dir):
    """Distributed TF-IDF-style characteristic terms (top-3 per document
    by the integer rarity score — see functions/tfidf.py for why the
    score avoids IEEE log): tokenize once, DF partials over the pinned
    narrow tf blocks, broadcast DF map, per-doc top-k cut."""
    from ..functions.tfidf import tfidf_top_terms

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_top_terms(ds, text_col="text", id_col="doc_id", k=3)


def q_nation_revenue(sf_dir):
    """Multi-table broadcast-join rollup (orders ⋈ customer ⋈ nation →
    revenue per nation): the two small dimension tables are pre-joined
    driver-side into one custkey→nation map and broadcast ONCE; the fact
    table streams through a lookup + per-batch partial sum (25 groups) —
    no shuffle join anywhere.  Revenue is summed in integer CENTS
    (o_totalprice has 2 decimals, so round(x·100) is exact int64) to keep
    the sum association-free and hash-exact vs the oracle."""
    import ray

    from ..stages.join import _lookup_batch

    cust = _read_tbl(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nat = _read_tbl(sf_dir, "nation", ["n_nationkey", "n_name"])
    idx = pc.index_in(cust["c_nationkey"], nat["n_nationkey"])
    cmap = pa.table({"o_custkey": cust["c_custkey"],
                     "n_name": pc.take(nat["n_name"], idx)})
    cref = ray.put(cmap)

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        b = _lookup_batch(b, ray.get(cref), "o_custkey")
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                        pa.int64())
        t = pa.table({"n_name": b["n_name"], "revenue_cents": cents})
        return pa.TableGroupBy(t, "n_name").aggregate(
            [("revenue_cents", "sum"), ([], "count_all")])

    from ..blocks import shaped_tables
    parts = pa.concat_tables(shaped_tables(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).materialize(),
        "count_all"))
    df = (parts.to_pandas().groupby("n_name", as_index=False)
          .agg(revenue_cents=("revenue_cents_sum", "sum"),
               n_orders=("count_all", "sum")))
    return _i64(df, ["revenue_cents", "n_orders"])


def q_priority_revenue(sf_dir):
    """Big-big hash equi-join (lineitem ⋈ orders on orderkey) through Ray
    Data's native shuffle join — the join family every other q_/e_ query
    deliberately avoids by broadcasting its small side.  This one pins the
    all-to-all path itself: both sides are fact-scale, ``Dataset.join``
    hash-partitions each on the key (num_partitions ∝ CPUs), and the
    5-group priority rollup happens AFTER the join as per-batch arrow
    partial sums + a driver finish — no second shuffle.  Revenue is summed
    in integer 10⁻⁴ units (extendedprice and discount each carry ≤2
    decimals, so round(x·10⁴) is exact int64), keeping the sum
    order-independent and hash-exact vs the oracle."""
    import ray

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"])
    ncpu = _ncpus()
    # each shuffle partition is an aggregator actor: measured at sf0.1 /
    # 32 CPUs, 16 partitions = 7.0 s vs 64 partitions = 25.6 s (the actor
    # spawn + per-partition fixed cost dominates at single-node scale).
    # At cluster scale num_partitions must instead grow with DATA so a
    # partition fits a worker's heap — pass partition_size_hint there.
    joined = li.join(orders, "inner",
                     num_partitions=max(8, min(ncpu // 2, 32)),
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.cast(pc.round(pc.multiply(pc.multiply(
            b["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), b["l_discount"])), 10000.0)),
            pa.int64())
        t = pa.table({"o_orderpriority": b["o_orderpriority"],
                      "revenue_e4": rev})
        return pa.TableGroupBy(t, "o_orderpriority").aggregate(
            [("revenue_e4", "sum"), ([], "count_all")])

    from ..blocks import concat_shaped
    parts = concat_shaped(
        joined.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize(),
        "count_all",
        empty_schema=pa.schema([("o_orderpriority", pa.string()),
                                ("revenue_e4_sum", pa.int64()),
                                ("count_all", pa.int64())]))
    df = (parts.to_pandas().groupby("o_orderpriority", as_index=False)
          .agg(revenue_e4=("revenue_e4_sum", "sum"),
               n_items=("count_all", "sum")))
    return _i64(df, ["revenue_e4", "n_items"])


def q_semi_bloom(sf_dir):
    """Broadcast Bloom-filter semi-join (lineitems belonging to URGENT
    orders): the shuffle-avoiding pattern for "filter a 100-TB fact table
    by a large key set" — a tree-OR-merged bloom (fixed nbits/8 bytes
    regardless of key count) prefilters the fact stream, and only the
    bloom survivors hit the exact verify, so the result is EXACT while
    the broadcast stays constant-size.  Rolled up per l_returnflag as
    per-batch arrow partials (3 groups) + a driver finish."""
    import ray

    from ..stages.bloom import bloom_semi_join

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_quantity", "l_returnflag"])
    def urgent_keys(b: pa.Table) -> pa.Table:
        m = pc.equal(b["o_orderpriority"], "1-URGENT")
        return b.filter(m).select(["o_orderkey"])

    urgent = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(urgent_keys, batch_format="pyarrow",
                     zero_copy_batch=True)
    hit = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"l_returnflag": b["l_returnflag"],
                      "sum_qty": pc.cast(pc.round(b["l_quantity"]),
                                         pa.int64())})
        return pa.TableGroupBy(t, "l_returnflag").aggregate(
            [("sum_qty", "sum"), ([], "count_all")])

    from ..blocks import concat_shaped
    parts = concat_shaped(
        hit.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True).materialize(),
        "count_all",
        empty_schema=pa.schema([("l_returnflag", pa.string()),
                                ("sum_qty_sum", pa.int64()),
                                ("count_all", pa.int64())]))
    df = (parts.to_pandas().groupby("l_returnflag", as_index=False)
          .agg(sum_qty=("sum_qty_sum", "sum"),
               n_items=("count_all", "sum")))
    return _i64(df, ["sum_qty", "n_items"])


def q_anti_bloom(sf_dir):
    """Broadcast Bloom-filter ANTI-join (lineitems NOT belonging to
    URGENT orders).  The bloom's one-sided error flips in the anti-join's
    favor: a bloom MISS is a definite absence, so the bulk of the stream
    passes with zero exact-probe work and only bloom HITS (true members +
    the small fp set) touch the exact key probe.  Rolled up per
    l_returnflag as per-batch arrow partials + a driver finish."""
    import ray

    from ..stages.bloom import bloom_anti_join

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_quantity", "l_returnflag"])

    def urgent_keys(b: pa.Table) -> pa.Table:
        m = pc.equal(b["o_orderpriority"], "1-URGENT")
        return b.filter(m).select(["o_orderkey"])

    urgent = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(urgent_keys, batch_format="pyarrow",
                     zero_copy_batch=True)
    miss = bloom_anti_join(li, urgent, "l_orderkey", "o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"l_returnflag": b["l_returnflag"],
                      "sum_qty": pc.cast(pc.round(b["l_quantity"]),
                                         pa.int64())})
        return pa.TableGroupBy(t, "l_returnflag").aggregate(
            [("sum_qty", "sum"), ([], "count_all")])

    parts = pa.concat_tables(ray.get(
        miss.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).materialize().to_arrow_refs()))
    df = (parts.to_pandas().groupby("l_returnflag", as_index=False)
          .agg(sum_qty=("sum_qty_sum", "sum"),
               n_items=("count_all", "sum")))
    return _i64(df, ["sum_qty", "n_items"])


def q_anti_bloom_big(sf_dir):
    """The anti-join's big-right-side scale path (same result as
    q_anti_bloom, same oracle): fully streaming — bloom misses flow to
    the output inside the map task, bloom hits probe per-partition key
    shards fetched on demand (worker-memoized, FIFO-capped), so neither
    the key set nor the left side is ever broadcast or materialized."""
    import ray

    from ..stages.bloom import bloom_anti_join_partitioned

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_quantity", "l_returnflag"])

    def urgent_keys(b: pa.Table) -> pa.Table:
        m = pc.equal(b["o_orderpriority"], "1-URGENT")
        return b.filter(m).select(["o_orderkey"])

    urgent = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(urgent_keys, batch_format="pyarrow",
                     zero_copy_batch=True)
    miss = bloom_anti_join_partitioned(li, urgent, "l_orderkey",
                                       "o_orderkey", nparts=8)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"l_returnflag": b["l_returnflag"],
                      "sum_qty": pc.cast(pc.round(b["l_quantity"]),
                                         pa.int64())})
        return pa.TableGroupBy(t, "l_returnflag").aggregate(
            [("sum_qty", "sum"), ([], "count_all")])

    parts = pa.concat_tables([t for t in ray.get(
        miss.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).materialize().to_arrow_refs())
        if "count_all" in t.schema.names])
    df = (parts.to_pandas().groupby("l_returnflag", as_index=False)
          .agg(sum_qty=("sum_qty_sum", "sum"),
               n_items=("count_all", "sum")))
    return _i64(df, ["sum_qty", "n_items"])


def q_cube_revenue(sf_dir):
    """GROUP BY CUBE (l_returnflag, l_linestatus): per-batch arrow
    partials at the FINEST grouping only; every coarser grouping set
    derives from the finest int64 sums in the driver finish — one pass,
    no per-level shuffle (functions/rollup.py)."""
    from ..functions.rollup import cube_aggregate

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus",
                             "l_extendedprice", "l_discount"])

    def measures(b: pa.Table) -> pa.Table:
        rev = pc.cast(pc.round(pc.multiply(pc.multiply(
            b["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), b["l_discount"])), 10000.0)),
            pa.int64())
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "l_linestatus": b["l_linestatus"],
                         "revenue_e4": rev})

    ds = ds.map_batches(measures, batch_format="pyarrow",
                        zero_copy_batch=True)
    return cube_aggregate(ds, ["l_returnflag", "l_linestatus"],
                          ["revenue_e4"], mode="cube")


def e_value_corr(sf_dir):
    """Grouped Pearson correlation (value vs hour-of-day per event_type)
    from EXACT integer moment partials: per-batch int64 (n,Σx,Σy,Σxy,
    Σx²,Σy²) arrow-groupby partials, Python-big-int driver finish, corr
    computed from exact sums.  corr is scale-invariant and |r|≤1, so the
    round-6 presentation reconciles with DuckDB's streaming double corr
    (raw variance would NOT — ulp drift exceeds any decimal rounding at
    var's magnitude; functions/moments.py documents the rule)."""
    from ..functions.moments import grouped_corr

    ds = read_table(sf_dir, "events", columns=["event_type", "value", "ts"])

    def xy(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            # value has ≤2 decimals → ×1000 never lands on a .5 boundary,
            # and |x| ≤ ~5e5 keeps per-batch Σx² far inside int64
            "x": pc.cast(pc.round(pc.multiply(b["value"], 1000.0)),
                         pa.int64()),
            "y": pc.cast(pc.hour(b["ts"]), pa.int64()),
        })

    ds = ds.map_batches(xy, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_corr(ds, "event_type", "x", "y", digits=6)


def _read_tbl(sf_dir, name, columns):
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{name}.parquet", columns=columns)


def e_daily_active(sf_dir):
    """Exact distributed count-distinct (daily active users): per-batch
    distinct (day, user) partials — bounded by distinct pairs, not rows —
    then hash-partition by the pair so each pair lands in exactly one
    task, count unique pairs per day per partition, sum the tiny per-day
    results.  The scale-safe exact shape; HLL is the approximate path."""
    import ray

    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    nparts = _agg_nparts()

    def partial(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["ts"], format="%Y-%m-%d")
        t = pa.table({"day": day, "user_id": b["user_id"]})
        g = pa.TableGroupBy(t, ["day", "user_id"]).aggregate([])
        kh = pd.util.hash_pandas_object(
            g.to_pandas()[["day", "user_id"]], index=False).to_numpy()
        part = (kh % np.uint64(nparts)).astype("int64")
        return g.append_column("part", pa.array(part))

    narrow = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    refs = narrow.to_arrow_refs()

    @ray.remote
    def count_part(p, refs):
        # zero-row blocks bypass the tagging UDF (no "part" column) — skip
        tbls = [t.filter(pc.equal(t["part"], p)).drop_columns(["part"])
                for t in ray.get(refs)
                if isinstance(t, pa.Table) and "part" in t.schema.names]
        t = pa.concat_tables(tbls) if tbls else None
        if t is None or t.num_rows == 0:
            return pa.table({"day": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        u = t.to_pandas().drop_duplicates(["day", "user_id"])
        c = u.groupby("day", as_index=False).size()
        return pa.table({"day": pa.array(c["day"], pa.string()),
                         "n_users": pa.array(c["size"].to_numpy(),
                                             pa.int64())})

    parts = pa.concat_tables(ray.get(
        [count_part.remote(p, refs) for p in range(nparts)]))
    df = (parts.to_pandas().groupby("day", as_index=False)["n_users"]
          .sum())
    return _i64(df, ["n_users"])


def e_retention(sf_dir):
    """Retention cohort matrix — distinct users active on day d from the
    cohort whose FIRST active day is c.  Exact and partition-sound: the
    stream reduces to distinct (user, day) pairs per batch (bounded by
    pairs, not rows), pairs hash-partition by USER so each user's whole
    history co-locates in exactly one task (first-day and the cohort
    counts are per-user functions), and the per-partition (cohort, day)
    counts are additive — the driver sums tiny matrices."""
    import ray

    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    nparts = _agg_nparts()

    def partial(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["ts"], format="%Y-%m-%d")
        t = pa.table({"user_id": b["user_id"], "day": day})
        g = pa.TableGroupBy(t, ["user_id", "day"]).aggregate([])
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) \
            % np.uint64(nparts)
        return g.append_column("part", pa.array(part.astype("int64")))

    refs = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).materialize().to_arrow_refs()

    @ray.remote
    def part_task(p, refs):
        tbls = [t.filter(pc.equal(t["part"], p)).drop_columns(["part"])
                for t in ray.get(refs) if "part" in t.schema.names]
        t = pa.concat_tables(tbls)
        if t.num_rows == 0:
            return pa.table({"cohort_day": pa.array([], pa.string()),
                             "active_day": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        df = t.to_pandas().drop_duplicates(["user_id", "day"])
        fd = df.groupby("user_id")["day"].min().rename("cohort_day")
        df = df.join(fd, on="user_id")
        c = df.groupby(["cohort_day", "day"], as_index=False).size()
        return pa.table({"cohort_day": pa.array(c["cohort_day"], pa.string()),
                         "active_day": pa.array(c["day"], pa.string()),
                         "n_users": pa.array(c["size"].to_numpy(), pa.int64())})

    parts = pa.concat_tables(ray.get(
        [part_task.remote(p, refs) for p in range(nparts)]))
    df = (parts.to_pandas()
          .groupby(["cohort_day", "active_day"], as_index=False)["n_users"]
          .sum())
    return _i64(df, ["n_users"])


def e_share(sf_dir):
    """Percent-of-total window (per-day event-type share): exact int
    count partials at (day, type), driver finish divides by the day
    total.  Share is a scale-invariant ratio of exact ints, so round-6
    reconciles with the SQL window-function oracle."""
    import ray

    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"day": pc.strftime(b["ts"], format="%Y-%m-%d"),
                      "event_type": b["event_type"]})
        return pa.TableGroupBy(t, ["day", "event_type"]).aggregate(
            [([], "count_all")])

    refs = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).materialize().to_arrow_refs()
    parts = [t for t in ray.get(refs) if "count_all" in t.schema.names]
    df = (pa.concat_tables(parts).to_pandas()
          .groupby(["day", "event_type"], as_index=False)["count_all"]
          .sum().rename(columns={"count_all": "n"}))
    tot = df.groupby("day")["n"].transform("sum")
    # half-AWAY rounding to match SQL round() (pandas .round is half-even
    # — an exact x.5e-6 share would flip between the engines otherwise)
    df["share6"] = np.floor(df["n"] * 1.0 / tot * 1e6 + 0.5) / 1e6
    return _i64(df, ["n"])


def e_props_extract(sf_dir):
    """Semi-structured JSON field extraction + rollup: pull ``$.k`` out
    of the free-form props column with a VECTORIZED JSONPath evaluator
    (polars, Rust — no Python row loop; functions/json_ops.py), then the
    usual exact per-batch partials.  Null/malformed props yield null and
    drop from the sums, matching SQL json_extract semantics."""
    import ray

    from ..functions.json_ops import json_int_field

    ds = read_table(sf_dir, "events", columns=["event_type", "props"])

    def partial(b: pa.Table) -> pa.Table:
        k = json_int_field(b["props"], "$.k")
        hi = pc.cast(pc.fill_null(pc.greater_equal(k, 50), False),
                     pa.int64())
        t = pa.table({"event_type": b["event_type"],
                      "sum_k": pc.fill_null(k, 0), "n_hi": hi,
                      "n_k": pc.cast(pc.is_valid(k), pa.int64())})
        return pa.TableGroupBy(t, "event_type").aggregate(
            [("sum_k", "sum"), ("n_hi", "sum"), ("n_k", "sum")])

    refs = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).materialize().to_arrow_refs()
    parts = [t for t in ray.get(refs)
             if isinstance(t, pa.Table) and "sum_k_sum" in t.schema.names]
    df = (pa.concat_tables(parts).to_pandas()
          .groupby("event_type", as_index=False)
          .agg(sum_k=("sum_k_sum", "sum"), n_hi=("n_hi_sum", "sum"),
               n_k=("n_k_sum", "sum")))
    return _i64(df, ["sum_k", "n_hi", "n_k"])


def emb_kmeans(sf_dir):
    """Distributed full-data k-means over the embeddings table (rows-only
    by design — iterative + seeded, no SQL twin; functions/kmeans.py).
    Each Lloyd round is one streaming pass emitting O(k·d) sufficient
    statistics per batch.  Returns the deterministic cluster sizes."""
    from ..functions.kmeans import kmeans_cluster_sizes, kmeans_fit

    ds = read_table(sf_dir, "embeddings")
    cent = kmeans_fit(ds, k=8, iters=10)
    return kmeans_cluster_sizes(ds, cent)


def d_top_tokens_approx(sf_dir):
    """Approximate heavy hitters via mergeable Misra-Gries summaries
    (rows-only by design — approximate; the exact twin is d_top_tokens
    and the pytest asserts the n/m error bound + guaranteed-survivor
    property against it).  Fixed m-entry partials per batch — never a
    token-universe shuffle."""
    from ..functions.sketch import top_tokens_approx

    ds = read_table(sf_dir, "documents", columns=["text"])
    return top_tokens_approx(ds, "text", k=20, m=512)


def e_global_rank(sf_dir):
    """Global distributed sort (Ray's range-partitioned Dataset.sort) +
    global rank attachment: per-block row counts → driver offsets (tiny)
    → per-block rank = offset + arange, all other work stays in tasks.
    Returns a deterministic systematic sample (every 997th rank) of the
    fully sorted order, which VALUE-ENCODES the sort so the oracle check
    actually verifies ordering (the driver's row-order-insensitive hash
    can't see a sort otherwise)."""
    import ray

    ds = read_table(sf_dir, "events", columns=["event_id", "value"])
    s = ds.sort(["value", "event_id"]).materialize()
    refs = s.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)])

    @ray.remote
    def rank_block(t: pa.Table, off: int) -> pa.Table:
        rk = off + np.arange(t.num_rows, dtype=np.int64) + 1
        keep = (rk % 997) == 1
        sub = t.filter(pa.array(keep))
        return pa.table({
            "rk": pa.array(rk[keep]),
            "event_id": pc.cast(sub["event_id"], pa.int64()),
            "value_e6": pc.cast(pc.round(pc.multiply(
                sub["value"], 1e6)), pa.int64())})

    parts = ray.get([rank_block.remote(r, int(offsets[i]))
                     for i, r in enumerate(refs)])
    df = pa.concat_tables(parts).to_pandas().sort_values("rk") \
        .reset_index(drop=True)
    return _i64(df, ["rk", "event_id", "value_e6"])


def e_funnel(sf_dir):
    """Ordered conversion funnel (signup → click AFTER signup → purchase
    AFTER that click): count users reaching each stage.  The ordering
    constraint makes min-per-type partials unsound (a later click after
    the first signup can follow an earlier ignored click), so the funnel
    events — filtered to the 3 types and projected to (user, type, ts) —
    hash-partition by USER and each task walks its users' conditional
    min chain; per-stage counts are additive across user shards."""
    import ray

    stages = ["signup", "click", "purchase"]
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts"])
    nparts = _agg_nparts()

    def narrow(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"], value_set=pa.array(stages))
        t = b.filter(m)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) \
            % np.uint64(nparts)
        return pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "part": pa.array(part.astype("int64"))})

    refs = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True).materialize().to_arrow_refs()

    @ray.remote
    def funnel_part(p, refs):
        tbls = [t.filter(pc.equal(t["part"], p)).drop_columns(["part"])
                for t in ray.get(refs) if "part" in t.schema.names]
        t = pa.concat_tables(tbls)
        counts = dict.fromkeys(stages, 0)
        if t.num_rows:
            df = t.to_pandas()
            for _, g in df.groupby("user_id", sort=False):
                cutoff = -1
                for st in stages:
                    nxt = g.loc[(g["event_type"] == st) &
                                (g["ts_us"] > cutoff), "ts_us"]
                    if nxt.empty:
                        break
                    cutoff = int(nxt.min())
                    counts[st] += 1
        return counts

    parts = ray.get([funnel_part.remote(p, refs) for p in range(nparts)])
    totals = {st: sum(c[st] for c in parts) for st in stages}
    return pd.DataFrame({"stage": stages,
                         "n_users": pd.array([totals[s] for s in stages],
                                             dtype="int64")})


def q_region_brand_revenue(sf_dir):
    """Snowflake-dimension rollup covering every remaining driver table
    (supplier → nation → region chain + part brand): the three dimension
    hops pre-join driver-side into TWO broadcast maps (suppkey→region,
    partkey→brand — each dimension-sized), the lineitem fact streams
    through both lookups and per-batch partial sums in exact 10⁻⁴
    integer units.  No shuffle join for any of the 4 dimension tables —
    the canonical star/snowflake shape at 100 TB."""
    import ray

    from ..stages.join import _lookup_batch

    sup = _read_tbl(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _read_tbl(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    reg = _read_tbl(sf_dir, "region", ["r_regionkey", "r_name"])
    i1 = pc.index_in(sup["s_nationkey"], nat["n_nationkey"])
    rk = pc.take(nat["n_regionkey"], i1)
    i2 = pc.index_in(rk, reg["r_regionkey"])
    smap = pa.table({"l_suppkey": sup["s_suppkey"],
                     "r_name": pc.take(reg["r_name"], i2)})
    prt = _read_tbl(sf_dir, "part", ["p_partkey", "p_brand"])
    pmap = pa.table({"l_partkey": prt["p_partkey"],
                     "p_brand": prt["p_brand"]})
    sref, pref = ray.put(smap), ray.put(pmap)

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_partkey",
                             "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        b = _lookup_batch(b, ray.get(sref), "l_suppkey")
        b = _lookup_batch(b, ray.get(pref), "l_partkey")
        rev = pc.cast(pc.round(pc.multiply(pc.multiply(
            b["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), b["l_discount"])), 10000.0)),
            pa.int64())
        t = pa.table({"r_name": b["r_name"], "p_brand": b["p_brand"],
                      "revenue_e4": rev})
        return pa.TableGroupBy(t, ["r_name", "p_brand"]).aggregate(
            [("revenue_e4", "sum"), ([], "count_all")])

    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).materialize().to_arrow_refs())
        if isinstance(t, pa.Table) and "count_all" in t.schema.names]
    df = (pa.concat_tables(parts).to_pandas()
          .groupby(["r_name", "p_brand"], as_index=False)
          .agg(revenue_e4=("revenue_e4_sum", "sum"),
               n_items=("count_all", "sum")))
    return _i64(df, ["revenue_e4", "n_items"])


def d_lang_eval(sf_dir):
    """Language-ID evaluation against the fixture's GROUND-TRUTH ``lang``
    label: the confusion matrix (lang_true, lang_pred, n) of the n-gram
    heuristic.  Per-batch arrow count partials (≤ |langs|² groups);
    value-checked because the predictor has an exact SQL twin (the same
    generated profile CASE used by d_quality's oracle).

    Note: the fixture's documents are synthetic token soup, so accuracy
    vs its lang labels is near-chance (~0.25 at sf0.01) — the query
    demonstrates the EVALUATION pattern (prediction ⋈ ground truth →
    confusion counts), not the heuristic's quality on real text."""
    import ray

    from ..functions.text import quality_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    qt = quality_table(ds, keep_cols=["lang"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"lang_true": b["lang"], "lang_pred": b["lang_pred"]})
        return pa.TableGroupBy(t, ["lang_true", "lang_pred"]).aggregate(
            [([], "count_all")])

    parts = [t for t in ray.get(
        qt.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).materialize().to_arrow_refs())
        if isinstance(t, pa.Table) and "count_all" in t.schema.names]
    df = (pa.concat_tables(parts).to_pandas()
          .groupby(["lang_true", "lang_pred"], as_index=False)["count_all"]
          .sum().rename(columns={"count_all": "n"}))
    return _i64(df, ["n"])


def e_mode_hour(sf_dir):
    """Grouped MODE with a deterministic tie-break (most frequent
    hour-of-day per event_type; ties → smallest hour): per-batch arrow
    count partials at (type, hour) — ≤ |types|·24 groups — and a driver
    argmax finish.  The explicit tie-break makes mode value-checkable
    (bare SQL mode() leaves ties unspecified)."""
    import ray

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"event_type": b["event_type"],
                      "hour": pc.cast(pc.hour(b["ts"]), pa.int64())})
        return pa.TableGroupBy(t, ["event_type", "hour"]).aggregate(
            [([], "count_all")])

    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).materialize().to_arrow_refs())
        if isinstance(t, pa.Table) and "count_all" in t.schema.names]
    df = (pa.concat_tables(parts).to_pandas()
          .groupby(["event_type", "hour"], as_index=False)["count_all"]
          .sum().rename(columns={"count_all": "n"}))
    df = df.sort_values(["event_type", "n", "hour"],
                        ascending=[True, False, True], kind="stable")
    out = df.groupby("event_type", as_index=False).head(1) \
        .rename(columns={"hour": "mode_hour"}).reset_index(drop=True)
    return _i64(out, ["mode_hour", "n"])


def e_user_chain(sf_dir):
    """Generic ORDERED group-concat (per-user event-type chain, ordered
    by (ts, event_id) so ties are deterministic): the t_hourly_chain
    pattern generalized off the flagship.  Events hash-partition by user
    (each user's whole history in exactly one task), per-partition numpy
    lexsort + per-group join; output sampled to users ≡ 0 (mod 37) to
    stay result-sized."""
    import ray

    ds = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts", "event_id"])
    nparts = _agg_nparts()

    def narrow(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        keep = (u % 37) == 0
        t = b.filter(pa.array(keep))
        uu = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((uu * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) \
            % np.uint64(nparts)
        return pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "part": pa.array(part.astype("int64"))})

    refs = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True).materialize().to_arrow_refs()

    @ray.remote
    def chain_part(p, refs):
        tbls = [t.filter(pc.equal(t["part"], p)).drop_columns(["part"])
                for t in ray.get(refs) if "part" in t.schema.names]
        t = pa.concat_tables(tbls)
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "chain": pa.array([], pa.string())})
        df = t.to_pandas().sort_values(["user_id", "ts_us", "event_id"],
                                       kind="stable")
        c = df.groupby("user_id", sort=False)["event_type"] \
              .agg(",".join).reset_index(name="chain")
        return pa.table({"user_id": pa.array(c["user_id"], pa.int64()),
                         "chain": pa.array(c["chain"], pa.string())})

    parts = pa.concat_tables(ray.get(
        [chain_part.remote(p, refs) for p in range(nparts)]))
    return (parts.to_pandas().sort_values("user_id")
            .reset_index(drop=True))


def e_distinct_users_approx(sf_dir):
    """Approximate count-distinct via mergeable HyperLogLog (rows-only by
    design — approximate; the exact twin is e_daily_active and the pytest
    accuracy bound is <3% at p=14).  Each batch ships a fixed 16 KiB
    register array; the driver merges with elementwise max."""
    from ..functions.sketch import approx_distinct

    ds = read_table(sf_dir, "events", columns=["user_id"])
    n = approx_distinct(ds, "user_id")
    return pd.DataFrame({"n_users_approx": pd.array([n], dtype="int64")})


def e_value_quantiles_approx(sf_dir):
    """Approximate quantiles via a mergeable DDSketch-style log-bucket
    sketch (rows-only by design — approximate; the exact twin is
    e_value_quantiles and the pytest asserts the alpha=1% relative-error
    guarantee vs numpy).  Each batch ships a dict of occupied bucket
    counts (~log-range/alpha entries), merged by summation."""
    from ..functions.sketch import approx_quantiles

    ds = read_table(sf_dir, "events", columns=["value"])
    out = approx_quantiles(ds, "value", {"q50": 0.5, "q90": 0.9,
                                         "q99": 0.99})
    return pd.DataFrame({k: [float(v)] for k, v in out.items()})


def e_value_quantiles(sf_dir):
    """Exact per-group disc quantiles over a CONTINUOUS column (the
    grouped complement of d_token_percentiles' histogram path): median +
    p90 of event value per event_type via hash-partition-by-group +
    per-partition lexsort.  The quantile IS a data value — no float
    arithmetic — so the oracle match is exact."""
    from ..functions.quantiles import grouped_quantiles_partitioned

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    return grouped_quantiles_partitioned(
        ds, key="event_type", val="value", qs={"q50": 0.5, "q90": 0.9})


def d_top_tokens(sf_dir):
    """Top-20 whitespace tokens by global count (vocab-building pass):
    per-batch token-count partials hash-partitioned by token, exact
    per-partition top-k candidate cut, tiny driver merge.  Ties broken by
    token ascending on both sides."""
    from ..functions.vocab import top_tokens

    ds = read_table(sf_dir, "documents", columns=["text"])
    return top_tokens(ds, "text", k=20)


def d_analysis(sf_dir):
    """Language-ID / quality / fingerprint (heuristics; rows-only check)."""
    from ..functions.text import analyze_documents

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sel(df):
        out = df[["doc_id", "lang_pred", "fingerprint"]].copy()
        out["quality"] = df["quality"].round(6)
        return out

    return analyze_documents(ds).map_batches(sel, batch_format="pandas")


_MINHASH_PAIRS_CACHE: dict = {}


def _minhash_pairs_df(sf_dir, k: int = 5):
    """Verified near-dup pairs at threshold 0.6 — computed ONCE per
    (sf_dir, k) and shared by d_minhash_pairs / d_dup_clusters /
    d_dedup_keep (each previously re-ran the whole LSH chain; the pair
    table is match-bounded and tiny, the same memo pattern as
    _PIPE_CACHE).

    ``k`` is the shingle length (VERDICT r4 item 3): the sf0.01 oracle
    pins k=5 (its all-pairs SQL twin shingles at 5 chars), but k=5's
    LSH false-positive rate is the documented quadratic-candidate
    regime past ~100k docs — corpus callers should pass k=8 (87× fewer
    candidates at 1M docs, identical verified output on the planted-dup
    fixtures; see BASELINE.md '1M probes')."""
    key = (sf_dir, k)
    if key not in _MINHASH_PAIRS_CACHE:
        from ..functions.dedup_docs import minhash_duplicate_pairs

        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        if len(_MINHASH_PAIRS_CACHE) >= 4:   # bound across (sf_dir, k)s
            _MINHASH_PAIRS_CACHE.pop(next(iter(_MINHASH_PAIRS_CACHE)))
        _MINHASH_PAIRS_CACHE[key] = \
            minhash_duplicate_pairs(ds, threshold=0.6, k=k).to_pandas()
    return _MINHASH_PAIRS_CACHE[key].copy()


def _pairs_ds(df):
    """Pair DataFrame → multi-block ARROW Dataset (single-block would
    serialize downstream per-block work; pandas blocks break chained
    lazy Dataset.join — see blocks.split_arrow_ds)."""
    import ray.data as rd

    from ..blocks import split_arrow_ds

    return split_arrow_ds(df) if len(df) else \
        rd.from_arrow(pa.schema([("doc_a", pa.int64()),
                                 ("doc_b", pa.int64()),
                                 ("jaccard", pa.float64())]).empty_table())


def d_minhash_pairs(sf_dir, k: int = 5):
    """MinHash+LSH near-dup pairs over documents — value-checked.

    The final stage filters candidates by EXACT shingle Jaccard >= 0.6, so
    the output is the exact all-pairs threshold set whenever LSH recall is
    1.0.  The fixture's planted near-dups all sit at J >= 0.92 (verified
    empirically at sf0.01: the 25 pairs equal the exact set), where a
    16-band/4-row signature misses with probability ~4e-8 — and the data +
    seeded hash family are deterministic, so the oracle match is stable.
    Jaccard is rounded to 4 decimals on both sides (the repo's float-oracle
    convention)."""
    df = _minhash_pairs_df(sf_dir, k=k)
    if len(df):
        df["jaccard"] = df["jaccard"].round(4)
        df = _i64(df, ["doc_a", "doc_b"])
        df = df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return df


def d_dup_clusters(sf_dir, k: int = 5):
    """Duplicate CLUSTERS: connected components over the MinHash near-dup
    pairs (training-data dedup keeps one canonical doc per component, not
    per pair).  Distributed min-label propagation + driver pointer
    jumping (functions/components.py); value-checked because the pair set
    equals the exact all-pairs threshold set (see d_minhash_pairs) and
    the component labeling is deterministic (min doc_id)."""
    from ..functions.components import connected_components

    pairs = _pairs_ds(_minhash_pairs_df(sf_dir, k=k))
    out = connected_components(pairs, "doc_a", "doc_b")
    out = out.rename(columns={"node": "doc_id", "component": "cluster_id"})
    return out.sort_values("doc_id").reset_index(drop=True)


def d_dedup_keep(sf_dir, k: int = 5):
    """The end-to-end near-dup DEDUP deliverable: the keep-list.  Pairs →
    connected components → drop every non-canonical cluster member (keep
    the min doc_id per component) → stream the corpus through
    dedup_drop_filter, which broadcasts the drop set while it is small
    and auto-switches to the streaming partitioned bloom anti-join past
    ICT_DROPSET_MAX_BROADCAST (mirroring the components node budget) —
    the shape that holds at 100 TB even when dup density is high."""
    from ..functions.components import connected_components
    from ..functions.dedup_docs import dedup_drop_filter

    pairs = _pairs_ds(_minhash_pairs_df(sf_dir, k=k))
    comp = connected_components(pairs, "doc_a", "doc_b")
    ids = read_table(sf_dir, "documents", columns=["doc_id"])
    out = dedup_drop_filter(ids, comp).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def d_dedup_best(sf_dir, k: int = 5):
    """Dedup keep-policy #2: keep the LONGEST doc per near-dup cluster
    (tie → smallest doc_id) — the quality-aware keep rule curation
    pipelines actually use, vs d_dedup_keep's min-id canonicalisation.

    Same pairs → connected components → dedup_drop_filter shape as
    d_dedup_keep (broadcast below ICT_DROPSET_MAX_BROADCAST, streaming
    partitioned bloom anti-join above); the per-cluster argmax is a
    bounded driver step over the (tiny, dup-graph-sized) clustered-node
    set, whose n_chars come from one column-pruned broadcast-filtered
    scan — the corpus text never moves."""
    import ray

    from ..functions.components import connected_components
    from ..functions.dedup_docs import dedup_drop_filter

    pairs = _pairs_ds(_minhash_pairs_df(sf_dir, k=k))
    comp = connected_components(pairs, "doc_a", "doc_b")
    if not len(comp):
        ids = read_table(sf_dir, "documents", columns=["doc_id"])
        out = ids.to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        return out.sort_values("doc_id").reset_index(drop=True)
    nodes_ref = ray.put(pa.array(np.sort(comp["node"].to_numpy()),
                                 pa.int64()))

    def grab(b: pa.Table) -> pa.Table:
        sub = b.filter(pc.is_in(b["doc_id"],
                                value_set=ray.get(nodes_ref)))
        return pa.table({"doc_id": pc.cast(sub["doc_id"], pa.int64()),
                         "n_chars": pc.cast(sub["n_chars"], pa.int64())})

    meta = (read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
            .map_batches(grab, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas())
    j = comp.merge(meta, left_on="node", right_on="doc_id")
    j = j.sort_values(["component", "n_chars", "node"],
                      ascending=[True, False, True])
    keep_nodes = j.groupby("component", sort=False).head(1)["node"]
    drop = np.setdiff1d(comp["node"].to_numpy(), keep_nodes.to_numpy())
    ids = read_table(sf_dir, "documents", columns=["doc_id"])
    out = dedup_drop_filter(ids, drop).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def d_wordgram_pairs(sf_dir):
    """Word-3-gram Jaccard near-dup pairs over documents — value-checked.

    The dedup family's n-gram Jaccard member: EXACT all-pairs output by
    the prefix-filter recall guarantee (see word_ngram_duplicate_pairs),
    so unlike d_minhash_pairs the oracle match needs no planted-pair
    recall argument — it holds at ANY threshold on ANY data.  Jaccard
    rounded to 4 decimals (the repo's float-oracle convention)."""
    from ..functions.dedup_docs import word_ngram_duplicate_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = word_ngram_duplicate_pairs(ds, n=3, threshold=0.5).to_pandas()
    if len(df):
        df["jaccard"] = df["jaccard"].round(4)
        df = _i64(df, ["doc_a", "doc_b"])
        df = df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return df


def d_cross_dedup_lsh(sf_dir):
    """Cross-corpus near-dup join via MinHash+LSH — value-checked.

    The scale path of d_cross_dedup (probabilistic candidates instead of
    the exact prefix filter): new batch = doc_id % 7 == 0 vs the rest,
    char-5-shingle Jaccard >= 0.6.  The engine verifies candidates with
    EXACT shingle Jaccard, so the output equals the exact cross-pairs
    threshold set whenever LSH recall is 1.0 — the same argument as
    d_minhash_pairs (fixture near-dups sit at J >= 0.92, where a
    16-band/4-row signature misses with probability ~4e-8; data and
    seeded hash family deterministic).  Oracle: the d_minhash_pairs
    shingle CTE restricted to cross-side pairs.

    Similarity is reported as INTEGER floor(jac·10⁴) (jaccard_e4), not
    round(jac, 4): a fixture pair landed exactly on a .xxxx5 rounding
    tie (J = 157/160 = 0.98125), where numpy rounds half-to-even and
    DuckDB half-away — floor of the identical IEEE double is tie-free
    on both engines (the tfidf integer-score lesson)."""
    import numpy as _np

    from ..blocks import concat_shaped
    from ..functions.dedup_docs import minhash_cross_pairs

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text"]).materialize()

    def _side(want_new: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(_np.int64)
            m = (ids % 7 == 0) if want_new else (ids % 7 != 0)
            return t.filter(pa.array(m))
        return f

    new_ds = docs.map_batches(_side(True), batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    corpus_ds = docs.map_batches(_side(False), batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    pairs = minhash_cross_pairs(new_ds, corpus_ds, threshold=0.6)
    tbl = concat_shaped(pairs, "left_doc",
                        empty_schema=pa.schema(
                            [("left_doc", pa.int64()),
                             ("right_doc", pa.int64()),
                             ("jaccard", pa.float64())]))
    df = tbl.to_pandas().rename(columns={"left_doc": "new_doc",
                                         "right_doc": "corpus_doc"})
    if len(df):
        df["jaccard_e4"] = np.floor(df["jaccard"] * 10000.0)
        df = df.drop(columns=["jaccard"])
        df = _i64(df, ["new_doc", "corpus_doc", "jaccard_e4"])
        df = df.sort_values(["new_doc", "corpus_doc"]).reset_index(drop=True)
    else:
        df = df.rename(columns={"jaccard": "jaccard_e4"})
        df["jaccard_e4"] = df["jaccard_e4"].astype("int64")
    return df


def d_curation_pipeline(sf_dir):
    """END-TO-END composed curation flow — value-checked as one unit:
    redact → Gopher repetition filter → exact dedup keep-first →
    curated corpus (doc_id, text_curated).

    The point is COMPOSITION: each stage is the same library operator
    the standalone queries use (redact_documents, repetition_stats with
    text passthrough — no join back, exact_duplicate_groups), chained
    as one streaming Dataset lineage; the only driver-held state is the
    dup-group table (bounded by duplicate count) broadcast as a
    drop-set probe.  The SQL twin composes the d_redact and
    d_repetition oracle CTEs with a ROW_NUMBER dedup — one oracle for
    the whole flow, so a drift anywhere in the chain is caught."""
    import ray

    from ..blocks import concat_shaped
    from ..functions.curation import redact_documents, repetition_stats
    from ..functions.dedup_docs import exact_duplicate_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    red = redact_documents(docs, patterns=_REDACT_PATTERNS)

    def _as_text(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "text": t["text_redacted"]})

    rep = repetition_stats(
        red.map_batches(_as_text, batch_format="pyarrow",
                        zero_copy_batch=True),
        keep_cols=("text",))

    def _kept(df):
        df = df[df["keep"] == 1]
        return df[["doc_id", "text"]]

    kept = rep.map_batches(_kept, batch_format="pandas").materialize()

    groups = concat_shaped(
        exact_duplicate_groups(kept), "text",
        empty_schema=pa.schema([("text", pa.string()),
                                ("n", pa.int64()),
                                ("keep_doc_id", pa.int64())]))
    gtext = groups["text"].combine_chunks() if groups.num_rows else None
    gkeep = (groups["keep_doc_id"].to_numpy(zero_copy_only=False)
             .astype(np.int64) if groups.num_rows else None)
    gref = ray.put((gtext, gkeep))

    def _drop_dups(t: pa.Table) -> pa.Table:
        gt, gk = ray.get(gref)
        out = pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                        "text_curated": t["text"]})
        if gt is None or t.num_rows == 0:
            return out
        idx = pc.index_in(t["text"], value_set=gt)
        hit = idx.is_valid().to_numpy(zero_copy_only=False)
        iv = (pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
              .astype(np.int64))
        ids = out["doc_id"].to_numpy(zero_copy_only=False)
        drop = hit & (ids != gk[iv])
        return out.filter(pa.array(~drop))

    final = concat_shaped(
        kept.map_batches(_drop_dups, batch_format="pyarrow",
                         zero_copy_batch=True), "text_curated",
        empty_schema=pa.schema([("doc_id", pa.int64()),
                                ("text_curated", pa.string())]))
    df = final.to_pandas()
    df = _i64(df, ["doc_id"]).sort_values("doc_id").reset_index(drop=True)
    return df


def d_cross_dedup(sf_dir):
    """Incremental-corpus near-dup join (bipartite R×S) — value-checked.

    The training-data shape "dedup an incoming crawl batch against the
    existing corpus": the new batch is documents with ``doc_id % 7 ==
    0``, the corpus the rest; output = (new_doc, corpus_doc, jaccard)
    word-3-gram Jaccard >= 0.5 CROSS pairs only.  Unlike filtering the
    self-join, ``word_ngram_cross_pairs`` never generates corpus×corpus
    candidates (sign-encoded sides, masked at bucket emission before
    the shuffle).  Recall is exactly 1.0 (prefix filter), so the oracle
    is the literal all-cross-pairs SQL join."""
    import numpy as _np

    from ..blocks import concat_shaped
    from ..functions.dedup_docs import word_ngram_cross_pairs

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text"]).materialize()

    def _side(want_new: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(_np.int64)
            m = (ids % 7 == 0) if want_new else (ids % 7 != 0)
            return t.filter(pa.array(m))
        return f

    # materialize the filtered sides: cross_pairs sums their counts for
    # its pin gate, which would otherwise EXECUTE each lazy filter
    new_ds = docs.map_batches(_side(True), batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    corpus_ds = docs.map_batches(_side(False), batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    pairs = word_ngram_cross_pairs(new_ds, corpus_ds, n=3, threshold=0.5)
    tbl = concat_shaped(pairs, "left_doc",
                        empty_schema=pa.schema(
                            [("left_doc", pa.int64()),
                             ("right_doc", pa.int64()),
                             ("jaccard", pa.float64())]))
    df = tbl.to_pandas().rename(columns={"left_doc": "new_doc",
                                         "right_doc": "corpus_doc"})
    if len(df):
        df["jaccard"] = df["jaccard"].round(4)
        df = _i64(df, ["new_doc", "corpus_doc"])
        df = df.sort_values(["new_doc", "corpus_doc"]).reset_index(drop=True)
    return df


_REDACT_PATTERNS = (
    # the synthetic corpus is word-soup (no emails/digits), so the driver
    # query scrubs fixture-present TERMS; the library default is the real
    # PII set (curation.PII_PATTERNS), exercised in tests/test_curation.py
    ("tool", r"\bspark\b", "<TOOL>"),
    ("entity", r"\bcustomer\b", "<ENTITY>"),
)


def d_redact(sf_dir):
    """Regex scrubbing with per-pattern counts over documents —
    value-checked (pyarrow and DuckDB share RE2, so the same pattern
    strings run verbatim on both sides)."""
    from ..functions.curation import redact_documents

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = redact_documents(ds, patterns=_REDACT_PATTERNS).to_pandas()
    df = _i64(df, ["doc_id", "n_tool", "n_entity"])
    return df.sort_values("doc_id").reset_index(drop=True)


def d_boilerplate(sf_dir):
    """C4-style boilerplate-unit removal over documents — value-checked.

    Units are WORDS here (the fixture is single-line; real corpora use
    sep='\\n' for line-level dedup): any word present in >= 50% of
    documents is dropped, survivors reassembled in order.  On this
    fixture that removes the 30-word shared vocabulary and keeps the
    planted near-dup marker words — degenerate-looking but fully
    deterministic, and it exercises the df map, broadcast set and
    order-preserving reassembly end to end."""
    from ..functions.curation import remove_common_units

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = remove_common_units(ds, sep=" ", min_doc_frac=0.5).to_pandas()
    df = _i64(df, ["doc_id", "n_removed"])
    return df.sort_values("doc_id").reset_index(drop=True)


def d_chunks(sf_dir):
    """Fixed-width overlapping chunk explode (size=100, stride=80) —
    value-checked against substr arithmetic."""
    from ..functions.curation import chunk_documents

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = chunk_documents(ds, size=100, stride=80).to_pandas()
    df = _i64(df, ["doc_id", "chunk_idx"])
    return (df.sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True))


def d_pack(sf_dir):
    """Greedy sequence packing (docs → fixed-budget training sequences)
    — value-checked against a recursive-CTE twin.

    nparts=8 is a SEMANTIC parameter (sequences never span the
    doc_id%8 shards), so the result is cluster-size-independent; the
    engine's binary-lifting kernel must match the oracle's row-by-row
    greedy recursion exactly.  Only (doc_id, n_chars) is read — the
    text column never leaves storage."""
    from ..functions.curation import pack_sequences

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    df = pack_sequences(ds, budget=2000, nparts=8,
                        len_col="n_chars").to_pandas()
    df = _i64(df, ["doc_id", "part", "seq"])
    return df.sort_values("doc_id").reset_index(drop=True)


def d_repetition(sf_dir):
    """Gopher-style repetition quality metrics per document —
    value-checked (all-integer outputs; see repetition_stats for why
    no float ratio crosses the engine boundary)."""
    from ..functions.curation import repetition_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = repetition_stats(ds).to_pandas()
    df = _i64(df, ["doc_id", "n_words", "n_distinct", "n_2grams",
                   "top2_count", "keep"])
    return df.sort_values("doc_id").reset_index(drop=True)


def d_simhash(sf_dir):
    """SimHash fingerprints over documents (rows-only)."""
    from ..functions.dedup_docs import simhash_documents

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return _i64(simhash_documents(ds).to_pandas(), ["doc_id", "simhash"])


def d_simhash_pairs(sf_dir):
    """SimHash near-dup pairs — VALUE-CHECKED (VERDICT r3 item 6).

    4 bands x 16 bits with max_hamming=3: by pigeonhole, <=3 differing
    bits cannot touch all 4 bands, so LSH recall is exactly 1.0 and the
    inline Hamming verify makes the output equal the exact all-pairs
    hamming<=3 set on ANY data — unlike d_minhash_pairs, no planted-pair
    recall argument is needed.  word_hash="fnv" makes the word hash
    SQL-reproducible (the oracle folds the same FNV-1a over codepoints
    in a recursive CTE, bit-exactness pinned by a pytest); both sides
    compute hamming over the same 63 bits (the engine's int64 simhash
    masks bit 63; the oracle only assembles bits 0..62).  cap=1e9
    disables the star-pair overflow approximation (an exactness
    precondition)."""
    from ..functions.dedup_docs import simhash_candidate_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    df = simhash_candidate_pairs(ds, max_hamming=3, cap=1_000_000_000,
                                 word_hash="fnv").to_pandas()
    df = _i64(df, ["doc_a", "doc_b", "hamming"])
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def media_frames(sf_dir):
    """Multimodal resize → frame-sample chain (rows-only — fake-path pixel
    kernels; the geometry/timing math and the row-expanding Ray plumbing
    are real and pytest-pinned): videos resized to ≤256 px then sampled
    one frame per 5 s; returns (media_id, frame_idx, ts_ms, n_bytes)."""
    import ray.data as rd

    from ..functions.multimodal import (resize_media, sample_frames,
                                        synth_media_table)

    ds = rd.from_arrow(synth_media_table(n=48))
    fr = sample_frames(resize_media(ds, max_side=256), every_ms=5000)

    def slim(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table({
            "media_id": b["media_id"],
            "frame_idx": b["frame_idx"],
            "ts_ms": b["ts_ms"],
            "n_bytes": _pc.cast(_pc.binary_length(b["payload"]), pa.int64()),
        })

    return fr.map_batches(slim, batch_format="pyarrow", zero_copy_batch=True)


def media_features(sf_dir):
    """Multimodal plumbing demo: synthetic media → features (rows-only)."""
    import ray.data as rd

    from ..functions.multimodal import extract_media_features, synth_media_table

    ds = rd.from_arrow(synth_media_table(n=48))
    out = extract_media_features(ds)

    def sel(b: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": b["media_id"],
            "kind": b["kind"],
            "payload_bytes": b["payload_bytes"],
            "f0": pc.list_element(b["features"], 0),
        })

    return out.map_batches(sel, batch_format="pyarrow")




def t_export_long(sf_dir):
    from .export import ExportSettings, export_long

    ds = export_long(_pipe(sf_dir)["flagged"], ExportSettings())

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": b["conv_id"],
            "serial": b["serial"],
            "att_rank": pc.cast(b["att_rank"], pa.int64()),
            "att_status": b["att_status"],
            "test_name": b["test_name"],
            "status": b["status"],
            "measurement": b["measurement"],
        })

    return ds.map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)


def t_test_series(sf_dir):
    """A8: time-series of the most-frequent test, with measurements+limits.

    The "most frequent test" is derived from the data on both sides so the
    query needs no hardcoded name."""
    from .reports import testlist

    pipe = _pipe(sf_dir)
    tl = testlist(pipe["parsed"]).to_pandas()
    top = (tl.sort_values(["n", "test_name"], ascending=[False, True])
           ["test_name"].iloc[0])

    parsed = pipe["parsed"]

    def sel(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b["record_type"], "analog"),
                    pc.equal(pc.fill_null(b["test_name"], ""), top))
        t = b.filter(m)
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "test_name": t["test_name"],
            "measurement": t["measurement"],
            "lim_nom": t["lim_nom"],
            "lim_ul": t["lim_ul"],
            "lim_ll": t["lim_ll"],
        })

    return parsed.map_batches(sel, batch_format="pyarrow",
                              zero_copy_batch=True)


def t_product_hourly(sf_dir):
    import pyarrow.parquet as pq

    from .daily_report import product_hourly

    sf = fx.sf_from_dir(sf_dir)
    d = fx.ensure_fixture(sf)
    meta = pq.read_table(f"{d}/tool_meta.parquet")
    lut = dict(zip(meta["tool"].to_pylist(), meta["product"].to_pylist()))
    out = product_hourly(_pipe(sf_dir)["attempts"], lut)
    return _i64(out.to_pandas(), ["hour_key", "ok", "nok"])


def e_sample(sf_dir):
    """Seeded reproducible sample over events (rows-only: sampling is not
    SQL-deterministic across engines)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])
    return _i64(ds.random_sample(0.1, seed=42).to_pandas(), ["event_id"])


_BUDGET_SELECT_TOKENS = 20_000  # ~74% of the sf0.01 corpus — cut lands
                                # strictly inside the q_int=5 run


def d_budget_select(sf_dir):
    """Token-budget corpus selection — value-checked: keep documents in
    integer-quality order (q_int DESC, doc_id ASC) while the running
    token total stays within the budget.  The global ordered prefix-sum
    cut pattern (functions/sampling.py::select_to_token_budget); the SQL
    twin is one SUM() OVER window.  All-int64 output — the ordering key
    is the float-free q_int, so no IEEE boundary hazards."""
    from ..blocks import concat_shaped
    from ..functions.sampling import BUDGET_SCHEMA, select_to_token_budget

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # concat_shaped: an all-rows-cut result is a Dataset of empty blocks,
    # whose .to_pandas() loses the schema (the repo's documented trap)
    df = concat_shaped(select_to_token_budget(ds, _BUDGET_SELECT_TOKENS),
                       "cum_tok", empty_schema=BUDGET_SCHEMA).to_pandas()
    df = _i64(df, ["doc_id", "q_int", "n_tok", "cum_tok"])
    return df.sort_values("doc_id").reset_index(drop=True)


def _d_budget_select_sql() -> str:
    """DuckDB twin of d_budget_select: the d_quality feature CTE (same
    STOPWORDS constant, same int-over-int IEEE ratios — the indicator
    comparisons are the externally-validated d_quality ones) reduced to
    an INTEGER quality, then one cumulative-sum window over the total
    order (q_int DESC, doc_id) and the budget predicate.  The ORDER BY
    keys are unique per row, so DuckDB's default RANGE frame equals
    ROWS."""
    from ..functions.text import STOPWORDS

    stop_sql = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    return rf"""
WITH f AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tok,
         len(regexp_extract_all(text, '[^\w\s]')) * 1.0
           / greatest(length(text), 1) AS punct_ratio,
         regexp_extract_all(lower(text), '[a-z]+') AS lw,
         regexp_extract_all(text, '\w+') AS ww
  FROM documents
), g AS (
  SELECT doc_id, n_tok, punct_ratio,
         CASE WHEN len(lw) = 0 THEN 0.0
              ELSE len(list_filter(lw, w -> w in ({stop_sql}))) * 1.0
                   / len(lw) END AS stopword_ratio,
         coalesce(list_avg(list_transform(ww, w -> length(w))), 0.0)
           AS mean_word_len
  FROM f
), s AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(2 * (CASE WHEN n_tok >= 10 AND n_tok <= 100000
                        THEN 1 ELSE 0 END)
            + (CASE WHEN punct_ratio < 0.3 THEN 1 ELSE 0 END)
            + (CASE WHEN stopword_ratio > 0.01 THEN 1 ELSE 0 END)
            + (CASE WHEN mean_word_len > 2 AND mean_word_len < 12
                    THEN 1 ELSE 0 END) AS BIGINT) AS q_int
  FROM g
), c AS (
  SELECT doc_id, q_int, n_tok,
         SUM(n_tok) OVER (ORDER BY q_int DESC, doc_id) AS cum_tok
  FROM s
)
SELECT doc_id, q_int, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
FROM c WHERE cum_tok <= {_BUDGET_SELECT_TOKENS}
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def build_queries() -> dict:
    q = {
        # transcript flagship pipeline
        "t_yields_sb": t_yields_sb,
        "t_yields_mb": t_yields_mb,
        "t_pareto_all": lambda d: _t_pareto(d, "all"),
        "t_pareto_first_pass": lambda d: _t_pareto(d, "first_pass"),
        "t_pareto_after_retest": lambda d: _t_pareto(d, "after_retest"),
        "t_hourly": t_hourly,
        "t_hourly_chain": t_hourly_chain,
        "t_limit_changes": t_limit_changes,
        "t_testlist": t_testlist,
        "t_attempts": t_attempts,
        "t_mb_results": t_mb_results,
        "t_measurements": t_measurements,
        "t_sink_counts": t_sink_counts,
        "t_export_long": t_export_long,
        "t_product_hourly": t_product_hourly,
        "t_test_series": t_test_series,
        "t_text_identity": t_text_identity,
        "t_failed_boards": t_failed_boards,
        # ------------------------------------------------------------------
        # The driver value-checks the FIRST 50 insertion-order keys only
        # (CORRECTNESS_r{N}.json); slots 19-50 therefore rotate in the 20
        # oracle-backed queries that had no external green row through
        # round 2 (VERDICT r2 item 1).  Everything below stays covered by
        # tests/test_driver_oracle.py regardless of position.
        # ------------------------------------------------------------------
        # round-2's never-driver-checked oracle-backed set (d_char_stats /
        # d_exact_dups / emb_knn were ALREADY green in CORRECTNESS_r01, so
        # they rotate below the cap in favor of the three late-round-3
        # queries that have never had an external row: d_curation_pipeline,
        # d_cross_dedup, d_dedup_best.  d_minhash_pairs stays — its r01 row
        # was `no_oracle` (rows-only back then), so it has never been
        # VALUE-checked externally.
        "d_quality": d_quality,
        "d_minhash_pairs": d_minhash_pairs,
        "d_dup_clusters": d_dup_clusters,
        "d_dedup_keep": d_dedup_keep,
        "emb_knn_ivf_full": emb_knn_ivf_full,
        "emb_near_dups_exact": emb_near_dups_exact,
        "media_digest": media_digest_q,
        "e_hash_sample": e_hash_sample,
        "e_stratified_sample": e_stratified_sample,
        # emb_knn_batch rotated in mid-round (e_window_join demoted —
        # r02/r03 green, its value check stays in-repo)
        "emb_knn_batch": emb_knn_batch,
        # round-4 rotation (VERDICT r3 item 1): the only oracle-backed
        # queries with zero external green rows take the window; the
        # demoted r03-green rows (e_asof_big, e_window_join_big,
        # e_rolling, e_sliding, e_sessions — the session family stays
        # in-window via e_gaps; e_asof demoted mid-round for
        # d_budget_select, its big-big twin e_asof_big stays green
        # in-repo) stay value-checked in-repo below
        "e_gaps": e_gaps,
        "d_ngram_overlap": d_ngram_overlap,
        "d_unit_dedup": d_unit_dedup,
        "d_simhash_pairs": d_simhash_pairs,
        # new in round 4, rotated straight into the window (e_asof
        # demoted — r02/r03 green, its value-check stays in-repo)
        "d_budget_select": d_budget_select,
        # the last never-externally-checked oracle-backed query: the LSH
        # cross-dedup scale path (its exact twin d_cross_dedup is also
        # in-window — both families now externally evidenced)
        "d_cross_dedup_lsh": d_cross_dedup_lsh,
        # new in round 4, rotated straight into the window: the one-pass
        # media dispatch's integer slice (e_top_per_user demoted —
        # r02/r03 green, its value check stays in-repo)
        "media_stats": media_stats,
        # new this round — need their first external green row
        "d_weighted_sample": d_weighted_sample,
        "e_reservoir_sample": e_reservoir_sample,
        "d_percentile_filter": d_percentile_filter,
        "d_contamination": d_contamination,
        "q_customer_order_counts": q_customer_order_counts,
        "d_lang_mix": d_lang_mix,
        "d_wordgram_pairs": d_wordgram_pairs,
        # slots 44-50: the round-3 curation wave takes its first external
        # green rows; the previous occupants (q1_lineitem,
        # q_priority_revenue, q_anti_bloom_big, q_cube_revenue,
        # e_value_corr) were already driver-green in CORRECTNESS_r02 and
        # rotate below the cap, still value-checked in-repo
        "d_redact": d_redact,
        "d_boilerplate": d_boilerplate,
        "d_chunks": d_chunks,
        "d_pack": d_pack,
        "d_repetition": d_repetition,
        # late-round-3 never-externally-checked set (swapped in for the
        # r01-green d_char_stats / d_exact_dups / emb_knn)
        "d_curation_pipeline": d_curation_pipeline,
        "d_cross_dedup": d_cross_dedup,
        "d_dedup_best": d_dedup_best,
        # --------------------- past the driver's 50-cap -------------------
        # (all still value-checked in-repo by tests/test_driver_oracle.py;
        # d_tfidf_top_terms + the slot-44-50 r02-green set rotated below
        # the cap for the never-externally-checked round-3 queries)
        "q1_lineitem": q1_lineitem,
        "d_char_stats": d_char_stats,
        "d_exact_dups": d_exact_dups,
        "emb_knn": emb_knn,
        "q_priority_revenue": q_priority_revenue,
        "q_anti_bloom_big": q_anti_bloom_big,
        "q_cube_revenue": q_cube_revenue,
        "e_value_corr": e_value_corr,
        "d_tfidf_top_terms": d_tfidf_top_terms,
        "e_hourly": e_hourly,
        "e_user_first_last": e_user_first_last,
        "e_daily_active": e_daily_active,
        "e_funnel": e_funnel,
        "e_retention": e_retention,
        "e_global_rank": e_global_rank,
        "e_pareto": e_pareto,
        "e_topk": e_topk,
        "e_window": e_window,
        "e_point_lookup": e_point_lookup,
        "d_token_counts": d_token_counts,
        "d_token_percentiles": d_token_percentiles,
        "d_top_tokens": d_top_tokens,
        "e_value_quantiles": e_value_quantiles,
        "q_nation_revenue": q_nation_revenue,
        "q_semi_bloom": q_semi_bloom,
        "q_anti_bloom": q_anti_bloom,
        "e_share": e_share,
        "e_props_extract": e_props_extract,
        "e_user_chain": e_user_chain,
        "q_region_brand_revenue": q_region_brand_revenue,
        "d_lang_eval": d_lang_eval,
        "e_mode_hour": e_mode_hour,
        "e_window_join": e_window_join,
        "e_top_per_user": e_top_per_user,
        # r03-green rows demoted in the round-4 rotation above
        "e_asof": e_asof,
        "e_asof_big": e_asof_big,
        "e_window_join_big": e_window_join_big,
        "e_rolling": e_rolling,
        "e_sliding": e_sliding,
        "e_sessions": e_sessions,
        # rows-only (non-SQL-expressible)
        "emb_kmeans": emb_kmeans,
        "d_top_tokens_approx": d_top_tokens_approx,
        "e_distinct_users_approx": e_distinct_users_approx,
        "e_sample": e_sample,
        "e_value_quantiles_approx": e_value_quantiles_approx,
        "emb_knn_ivf": emb_knn_ivf,
        "emb_knn_lsh": emb_knn_lsh,
        "emb_near_dups": emb_near_dups,
        "d_analysis": d_analysis,
        "d_simhash": d_simhash,
        "media_features": media_features,
        "media_frames": media_frames,
    }
    first50 = list(q)[:50]
    assert len(q) == 102 and all(n in build_oracles() for n in first50), \
        "driver checks only the first 50 keys — keep them oracle-backed"
    return q


def _simhash_pairs_oracle_sql() -> str:
    """All-pairs 63-bit simhash XOR-popcount oracle for d_simhash_pairs.

    Recomputes the engine's simhash from scratch in SQL: FNV-1a word
    hashes via a recursive-CTE fold over codepoints (bit-exact vs the
    numpy fold in SimHasher._fnv1a_words — pinned by a pytest), per-bit
    majority votes as 63 GENERATED sum expressions (no word x bit row
    explosion), then an all-pairs self-join at hamming <= 3.  Wordless
    docs get simhash 0 (every vote CASE falls to ELSE 0 on NULL), same
    as the engine."""
    psums = ",\n    ".join(
        f"sum(CAST((h >> {b}) & 1 AS BIGINT)) AS p{b}" for b in range(63))
    bits = "\n      + ".join(
        f"CASE WHEN 2 * p{b} > cnt THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(63))
    return f"""
WITH RECURSIVE dw AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(COALESCE(text, '')), '\\S+')) AS w
  FROM documents
),
words AS (SELECT DISTINCT w FROM dw),
fold(w, n, pos, h) AS (
  SELECT w, length(w), 0, CAST(14695981039346656037 AS UBIGINT) FROM words
  UNION ALL
  SELECT w, n, pos + 1,
    CAST((CAST(xor(h, CAST(unicode(substr(w, pos + 1, 1)) AS UBIGINT))
          AS HUGEINT) * 1099511628211) % 18446744073709551616 AS UBIGINT)
  FROM fold WHERE pos < n
),
wh AS (SELECT w, h FROM fold WHERE pos = n),
votes AS (
  SELECT doc_id, count(*) AS cnt,
    {psums}
  FROM dw JOIN wh USING (w)
  GROUP BY doc_id
),
sh AS (
  SELECT d.doc_id,
    {bits} AS simhash
  FROM (SELECT doc_id FROM documents) d
  LEFT JOIN votes USING (doc_id)
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b
"""


def build_oracles() -> dict[str, str]:
    sql = transcript_oracle_sql()
    sql.update({
        "e_hourly": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       count(*) FILTER (WHERE event_type <> 'error') AS ok,
       count(*) FILTER (WHERE event_type = 'error') AS nok
FROM events GROUP BY 1
""",
        "e_pareto": "SELECT event_type, count(*) AS n FROM events GROUP BY 1",
        "e_user_first_last": """
SELECT user_id, first_type, last_type, n_events FROM (
  SELECT user_id,
         first_value(event_type) OVER w AS first_type,
         last_value(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
         ) AS last_type,
         count(*) OVER (PARTITION BY user_id) AS n_events,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
) WHERE rn = 1
""",
        "e_topk": """
SELECT event_id, value FROM events
ORDER BY value DESC, event_id ASC LIMIT 10
""",
        "e_window": """
SELECT event_id, value FROM events
WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-04'
  AND event_type = 'purchase'
""",
        "e_point_lookup": """
SELECT event_id, event_type, value FROM events WHERE user_id = 5
""",
        "q1_lineitem": """
SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
       count(*) AS n, round(sum(l_quantity) / count(*), 6) AS avg_qty
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
""",
        "d_token_counts": r"""
SELECT doc_id, len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tok,
       len(regexp_extract_all(text, '\S+')) AS n_ws_tok
FROM documents
""",
        "d_char_stats": """
SELECT doc_id, length(text) AS text_len, n_chars FROM documents
""",
        "d_token_percentiles": r"""
WITH c AS (SELECT len(regexp_extract_all(COALESCE(text, ''), '\S+')) AS v
           FROM documents)
SELECT count(*) AS n, quantile_disc(v, 0.5) AS q50,
       quantile_disc(v, 0.9) AS q90, quantile_disc(v, 0.99) AS q99
FROM c
""",
        "e_value_quantiles": """
SELECT event_type, count(value) AS n,
       quantile_disc(value, 0.5) AS q50, quantile_disc(value, 0.9) AS q90
FROM events GROUP BY event_type
""",
        "d_percentile_filter": """
WITH thr AS (
  SELECT lang, quantile_disc(n_chars, 0.75) AS thr
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN thr t ON d.lang = t.lang
WHERE d.n_chars >= t.thr
""",
        "d_unit_dedup": """
WITH w AS (
  SELECT doc_id,
         unnest(str_split(COALESCE(text, ''), ' ')) AS u,
         generate_subscripts(str_split(COALESCE(text, ''), ' '), 1) AS i
  FROM documents
), r AS (
  SELECT doc_id, u, i,
         row_number() OVER (PARTITION BY doc_id, u ORDER BY i) AS rn
  FROM w
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       COALESCE(string_agg(u, ' ' ORDER BY i) FILTER (WHERE rn = 1),
                '') AS text_clean,
       count(*) FILTER (WHERE rn > 1) AS n_removed
FROM r GROUP BY doc_id
""",
        # generate_series takes constants only: 4096 >> max word count
        # at any fixture sf (99 at sf0.01/0.1); a longer doc would
        # silently undercount SQL-side grams (sibling-oracle convention)
        "d_ngram_overlap": r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '\S+') AS w
  FROM documents
),
idx AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 4096) g(i)),
gr AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i, least(i + 2, len(w))), ' ') AS s
  FROM d JOIN idx ON idx.i <= greatest(1, len(d.w) - 2)
  WHERE len(w) > 0
),
bench AS (SELECT DISTINCT s FROM gr WHERE doc_id % 97 = 0),
cnt AS (SELECT doc_id, count(*) AS n_grams FROM gr
        WHERE doc_id % 97 <> 0 GROUP BY doc_id),
ov AS (SELECT gr.doc_id, count(*) AS n_overlap
       FROM gr JOIN bench USING (s)
       WHERE gr.doc_id % 97 <> 0 GROUP BY gr.doc_id)
SELECT CAST(cnt.doc_id AS BIGINT) AS doc_id,
       cnt.n_grams AS n_grams, ov.n_overlap AS n_overlap
FROM cnt JOIN ov ON cnt.doc_id = ov.doc_id
""",
        "d_contamination": """
WITH probes AS (
  SELECT DISTINCT substr(text, 1, 40) AS probe
  FROM documents WHERE doc_id % 97 = 0 AND length(text) >= 40
)
SELECT d.doc_id, count(*) AS n_hits
FROM documents d JOIN probes p ON contains(d.text, p.probe)
GROUP BY d.doc_id
""",
        "q_customer_order_counts": """
SELECT c.c_custkey, count(o.o_custkey) AS n_orders
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""",
        "d_lang_mix": """
WITH cnt AS (
  SELECT lang, count(*) AS c FROM documents
  WHERE lang IS NOT NULL GROUP BY lang
), q AS (
  SELECT lang,
         least(c, greatest(1, 4 * cast(floor(sqrt(c)) AS BIGINT))) AS quota
  FROM cnt
), r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents WHERE lang IS NOT NULL
)
SELECT r.doc_id, r.lang, r.rn
FROM r JOIN q USING (lang) WHERE r.rn <= q.quota
""",
        "q_nation_revenue": """
SELECT n.n_name,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
        "q_priority_revenue": """
SELECT o.o_orderpriority,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue_e4,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
        "q_semi_bloom": """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n_items
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
""",
        "q_anti_bloom": """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n_items
FROM lineitem l
WHERE l_orderkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderpriority = '1-URGENT'
                    AND o.o_orderkey = l.l_orderkey)
GROUP BY l_returnflag
""",
        "q_anti_bloom_big": """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n_items
FROM lineitem l
WHERE l_orderkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderpriority = '1-URGENT'
                    AND o.o_orderkey = l.l_orderkey)
GROUP BY l_returnflag
""",
        "q_cube_revenue": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue_e4,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
        "e_value_corr": """
SELECT event_type,
       count(CASE WHEN value IS NOT NULL AND ts IS NOT NULL
                  THEN 1 END) AS n,
       round(corr(CAST(round(value * 1000) AS BIGINT), hour(ts)), 6)
         AS corr6
FROM events
GROUP BY event_type
""",
        "e_retention": """
WITH ad AS (
  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS active_day
  FROM events
), fd AS (
  SELECT user_id, min(active_day) AS cohort_day FROM ad GROUP BY user_id
)
SELECT cohort_day, active_day, count(*) AS n_users
FROM ad JOIN fd USING (user_id)
GROUP BY 1, 2
""",
        "e_share": """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       count(*) AS n,
       round(count(*) * 1.0 /
             sum(count(*)) OVER (PARTITION BY strftime(ts, '%Y-%m-%d')), 6)
         AS share6
FROM events
GROUP BY 1, 2
""",
        "q_region_brand_revenue": """
SELECT r.r_name, p.p_brand,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue_e4,
       count(*) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY r.r_name, p.p_brand
""",
        "e_mode_hour": """
WITH c AS (
  SELECT event_type, hour(ts) AS mode_hour, count(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY count(*) DESC, hour(ts)) AS rk
  FROM events GROUP BY event_type, hour(ts)
)
SELECT event_type, mode_hour, n FROM c WHERE rk = 1
""",
        "e_user_chain": """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS chain
FROM events
WHERE user_id % 37 = 0
GROUP BY user_id
ORDER BY user_id
""",
        "e_funnel": """
WITH s AS (SELECT user_id, min(ts) AS t FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s.t GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id)
SELECT 'signup' AS stage, count(*) AS n_users FROM s
UNION ALL SELECT 'click', count(*) FROM c
UNION ALL SELECT 'purchase', count(*) FROM p
""",
        "e_global_rank": """
WITH r AS (
  SELECT event_id,
         CAST(round(value * 1000000) AS BIGINT) AS value_e6,
         ROW_NUMBER() OVER (ORDER BY value, event_id) AS rk
  FROM events
)
SELECT rk, event_id, value_e6 FROM r WHERE rk % 997 = 1
""",
        "e_props_extract": """
SELECT event_type,
       CAST(coalesce(sum(CAST(json_extract_string(props, '$.k')
                              AS BIGINT)), 0) AS BIGINT) AS sum_k,
       count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                       >= 50 THEN 1 END) AS n_hi,
       count(json_extract_string(props, '$.k')) AS n_k
FROM events
GROUP BY event_type
""",
        "e_daily_active": """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
""",
        "d_tfidf_top_terms": r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(COALESCE(text, ''), '\S+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
), dfreq AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
), n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         CAST((tf.tf * 1000000 * (n.n + 1)) // (dfreq.df + 1) AS BIGINT)
           AS score_e6
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
), ranked AS (
  SELECT doc_id, token, score_e6,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_e6 DESC, token) AS rk
  FROM scored)
SELECT doc_id, token, score_e6, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
""",
        "d_top_tokens": r"""
WITH t AS (
  SELECT unnest(regexp_extract_all(COALESCE(text, ''), '\S+')) AS token
  FROM documents
)
SELECT token, count(*) AS n FROM t
GROUP BY token ORDER BY n DESC, token LIMIT 20
""",
        # Exact all-pairs 5-char-shingle Jaccard at threshold 0.6 — equals
        # the MinHash+LSH output because the engine verifies candidates
        # with exact Jaccard and the fixture's near-dups (J >= 0.92) are
        # deterministically recalled (see d_minhash_pairs docstring).
        # generate_series takes constants only: 4096 >> max doc length at
        # the driver's sf0.01 (553 chars).
        "d_minhash_pairs": r"""
WITH d AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
  FROM documents
),
idx AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 4096) g(i)),
sh AS (
  SELECT DISTINCT doc_id, substr(t, i, 5) AS s
  FROM d JOIN idx ON idx.i <= greatest(1, length(d.t) - 4)
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isz
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT doc_a, doc_b, isz * 1.0 / (ca.n + cb.n - isz) AS jac
  FROM inter
  JOIN cnt ca ON ca.doc_id = inter.doc_a
  JOIN cnt cb ON cb.doc_id = inter.doc_b
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       round(jac, 4) AS jaccard
FROM j WHERE jac >= 0.6
ORDER BY doc_a, doc_b
""",
        # Exact all-pairs 63-bit simhash XOR-popcount at hamming <= 3 —
        # equals the engine's 4x16-band LSH output by pigeonhole recall
        # (see d_simhash_pairs docstring); generated SQL, see the helper.
        "d_simhash_pairs": _simhash_pairs_oracle_sql(),
        "d_budget_select": _d_budget_select_sql(),
        # LSH cross-corpus variant: the same shingle CTE restricted to
        # cross-side pairs (new = doc_id % 7 == 0); equality holds by the
        # d_minhash_pairs recall argument (exact verify + recall 1.0 at
        # the fixture's J >= 0.92 planted near-dups).
        "d_cross_dedup_lsh": r"""
WITH d AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
  FROM documents
),
idx AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 4096) g(i)),
sh AS (
  SELECT DISTINCT doc_id, substr(t, i, 5) AS s
  FROM d JOIN idx ON idx.i <= greatest(1, length(d.t) - 4)
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS new_doc, b.doc_id AS corpus_doc, count(*) AS isz
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0
  GROUP BY 1, 2
),
j AS (
  SELECT new_doc, corpus_doc, isz * 1.0 / (ca.n + cb.n - isz) AS jac
  FROM inter
  JOIN cnt ca ON ca.doc_id = inter.new_doc
  JOIN cnt cb ON cb.doc_id = inter.corpus_doc
)
SELECT CAST(new_doc AS BIGINT) AS new_doc,
       CAST(corpus_doc AS BIGINT) AS corpus_doc,
       CAST(floor(jac * 10000) AS BIGINT) AS jaccard_e4
FROM j WHERE jac >= 0.6
ORDER BY new_doc, corpus_doc
""",
        # Exact all-pairs word-TRIGRAM Jaccard at threshold 0.5 — the
        # engine's prefix-filter candidate generation has recall exactly
        # 1.0 (SSJoin/PPJoin prefix bound) and verifies with exact
        # Jaccard, so engine == oracle at any threshold on any data.
        # Short docs (< 3 words) contribute ONE gram (the whole word
        # sequence) on both sides; empty/null text contributes none.
        # generate_series takes constants only: 4096 >> max word count.
        "d_wordgram_pairs": r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '\S+') AS w
  FROM documents
),
idx AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 4096) g(i)),
gr AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i, least(i + 2, len(w))), ' ') AS s
  FROM d JOIN idx ON idx.i <= greatest(1, len(d.w) - 2)
  WHERE len(w) > 0
),
cnt AS (SELECT doc_id, count(*) AS n FROM gr GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isz
  FROM gr a JOIN gr b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT doc_a, doc_b, isz * 1.0 / (ca.n + cb.n - isz) AS jac
  FROM inter
  JOIN cnt ca ON ca.doc_id = inter.doc_a
  JOIN cnt cb ON cb.doc_id = inter.doc_b
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       round(jac, 4) AS jaccard
FROM j WHERE jac >= 0.5
ORDER BY doc_a, doc_b
""",
        "d_cross_dedup": r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '\S+') AS w
  FROM documents
),
idx AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 4096) g(i)),
gr AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i, least(i + 2, len(w))), ' ') AS s
  FROM d JOIN idx ON idx.i <= greatest(1, len(d.w) - 2)
  WHERE len(w) > 0
),
cnt AS (SELECT doc_id, count(*) AS n FROM gr GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS new_doc, b.doc_id AS corpus_doc, count(*) AS isz
  FROM gr a JOIN gr b ON a.s = b.s
  WHERE a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0
  GROUP BY 1, 2
),
j AS (
  SELECT new_doc, corpus_doc, isz * 1.0 / (ca.n + cb.n - isz) AS jac
  FROM inter
  JOIN cnt ca ON ca.doc_id = inter.new_doc
  JOIN cnt cb ON cb.doc_id = inter.corpus_doc
)
SELECT CAST(new_doc AS BIGINT) AS new_doc,
       CAST(corpus_doc AS BIGINT) AS corpus_doc,
       round(jac, 4) AS jaccard
FROM j WHERE jac >= 0.5
ORDER BY new_doc, corpus_doc
""",
        "d_curation_pipeline": r"""
WITH red AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(COALESCE(text, ''),
                                       '\bspark\b', '<TOOL>', 'g'),
                        '\bcustomer\b', '<ENTITY>', 'g') AS t
  FROM documents
),
d AS (SELECT doc_id, t, string_split(t, ' ') AS ws FROM red),
w AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w
      FROM d),
base AS (SELECT doc_id, count(*) AS nw, count(DISTINCT w) AS nd
         FROM w GROUP BY doc_id),
bi AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
       FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
bc AS (SELECT doc_id, w1, w2, count(*) AS c FROM bi GROUP BY 1, 2, 3),
t2 AS (SELECT doc_id, max(c) AS top2 FROM bc GROUP BY doc_id),
kept AS (
  SELECT d.doc_id, d.t
  FROM d JOIN base USING (doc_id) LEFT JOIN t2 USING (doc_id)
  WHERE (nw - nd) * 10 <= 3 * nw
    AND coalesce(top2, 0) * 5 <= greatest(nw - 1, 0)
),
ded AS (
  SELECT doc_id, t,
         row_number() OVER (PARTITION BY t ORDER BY doc_id) AS rn
  FROM kept
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, t AS text_curated
FROM ded WHERE rn = 1 ORDER BY doc_id
""",
        "d_redact": r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\bspark\b')) AS BIGINT)
           AS n_tool,
       CAST(len(regexp_extract_all(text, '\bcustomer\b')) AS BIGINT)
           AS n_entity,
       regexp_replace(regexp_replace(text, '\bspark\b', '<TOOL>', 'g'),
                      '\bcustomer\b', '<ENTITY>', 'g') AS text_redacted
FROM documents ORDER BY doc_id
""",
        "d_boilerplate": r"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w
      FROM d),
common AS (
  SELECT w FROM w GROUP BY w
  HAVING count(DISTINCT doc_id) >=
         CAST(ceil(0.5 * (SELECT count(*) FROM documents)) AS BIGINT)),
kept AS (SELECT doc_id, i, w FROM w
         WHERE w NOT IN (SELECT w FROM common)),
agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS t,
               count(*) AS kn
        FROM kept GROUP BY doc_id)
SELECT d0.doc_id, coalesce(agg.t, '') AS text_clean,
       CAST(len(string_split(d0.text, ' ')) - coalesce(agg.kn, 0)
            AS BIGINT) AS n_removed
FROM documents d0 LEFT JOIN agg USING (doc_id) ORDER BY doc_id
""",
        "d_chunks": r"""
WITH c AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(greatest(length(text), 1) / 80.0)
                              AS BIGINT))) AS chunk_idx,
         text
  FROM documents)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       substr(text, CAST(chunk_idx * 80 + 1 AS BIGINT), 100) AS chunk
FROM c ORDER BY doc_id, chunk_idx
""",
        "d_repetition": r"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w
      FROM d),
base AS (SELECT doc_id, count(*) AS nw, count(DISTINCT w) AS nd
         FROM w GROUP BY doc_id),
bi AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
       FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
bc AS (SELECT doc_id, w1, w2, count(*) AS c FROM bi GROUP BY 1, 2, 3),
t2 AS (SELECT doc_id, max(c) AS top2 FROM bc GROUP BY doc_id)
SELECT base.doc_id,
       CAST(nw AS BIGINT) AS n_words,
       CAST(nd AS BIGINT) AS n_distinct,
       CAST(greatest(nw - 1, 0) AS BIGINT) AS n_2grams,
       CAST(coalesce(top2, 0) AS BIGINT) AS top2_count,
       CAST(CASE WHEN (nw - nd) * 10 <= 3 * nw
                  AND coalesce(top2, 0) * 5 <= greatest(nw - 1, 0)
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM base LEFT JOIN t2 USING (doc_id) ORDER BY doc_id
""",
        "d_pack": r"""
WITH RECURSIVE
o AS (
  SELECT doc_id, doc_id % 8 AS part, n_chars AS len,
         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
             AS rn
  FROM documents),
r AS (
  SELECT part, rn, doc_id, len, len AS fill, CAST(0 AS BIGINT) AS seq
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.part, o.rn, o.doc_id, o.len,
         CASE WHEN r.fill + o.len > 2000 THEN o.len
              ELSE r.fill + o.len END,
         CASE WHEN r.fill + o.len > 2000 THEN r.seq + 1 ELSE r.seq END
  FROM o JOIN r ON o.part = r.part AND o.rn = r.rn + 1)
SELECT doc_id, CAST(part AS BIGINT) AS part, seq
FROM r ORDER BY doc_id
""",
        "d_dup_clusters": r"""
WITH RECURSIVE
d AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
  FROM documents
),
idx AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 4096) g(i)),
sh AS (
  SELECT DISTINCT doc_id, substr(t, i, 5) AS s
  FROM d JOIN idx ON idx.i <= greatest(1, length(d.t) - 4)
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isz
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM inter
  JOIN cnt ca ON ca.doc_id = inter.doc_a
  JOIN cnt cb ON cb.doc_id = inter.doc_b
  WHERE isz * 1.0 / (ca.n + cb.n - isz) >= 0.6
),
edges AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
walk(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT w.node, edges.b FROM walk w JOIN edges ON edges.a = w.r
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM walk GROUP BY node ORDER BY doc_id
""",
        "d_dedup_keep": r"""
WITH RECURSIVE
d AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
  FROM documents
),
idx AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 4096) g(i)),
sh AS (
  SELECT DISTINCT doc_id, substr(t, i, 5) AS s
  FROM d JOIN idx ON idx.i <= greatest(1, length(d.t) - 4)
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isz
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM inter
  JOIN cnt ca ON ca.doc_id = inter.doc_a
  JOIN cnt cb ON cb.doc_id = inter.doc_b
  WHERE isz * 1.0 / (ca.n + cb.n - isz) >= 0.6
),
edges AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
walk(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT w.node, edges.b FROM walk w JOIN edges ON edges.a = w.r
),
comp AS (SELECT node, min(r) AS cluster_id FROM walk GROUP BY node)
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> cluster_id)
ORDER BY doc_id
""",
        "d_dedup_best": r"""
WITH RECURSIVE
d AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
  FROM documents
),
idx AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, 4096) g(i)),
sh AS (
  SELECT DISTINCT doc_id, substr(t, i, 5) AS s
  FROM d JOIN idx ON idx.i <= greatest(1, length(d.t) - 4)
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isz
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM inter
  JOIN cnt ca ON ca.doc_id = inter.doc_a
  JOIN cnt cb ON cb.doc_id = inter.doc_b
  WHERE isz * 1.0 / (ca.n + cb.n - isz) >= 0.6
),
edges AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
walk(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT w.node, edges.b FROM walk w JOIN edges ON edges.a = w.r
),
comp AS (SELECT node, min(r) AS cluster_id FROM walk GROUP BY node),
best AS (
  SELECT comp.node,
         row_number() OVER (PARTITION BY comp.cluster_id
                            ORDER BY doc.n_chars DESC, comp.node ASC)
             AS rn
  FROM comp JOIN documents doc ON doc.doc_id = comp.node
)
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM best WHERE rn > 1)
ORDER BY doc_id
""",
        "d_exact_dups": """
SELECT text, count(*) AS n, min(doc_id) AS keep_doc_id
FROM documents GROUP BY text HAVING count(*) > 1
""",
        "emb_knn": """
WITH q AS (SELECT embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 1)
SELECT vec_id,
       CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(embedding, (SELECT qe FROM q)) DESC,
                  vec_id ASC) AS BIGINT) AS rank
FROM embeddings
ORDER BY rank LIMIT 10
""",
        # batched variant: rank per query over the 4-query cross join
        "emb_knn_batch": """
WITH q AS (SELECT vec_id AS q_id, embedding AS qe
           FROM embeddings ORDER BY vec_id LIMIT 4)
SELECT q.q_id, e.vec_id,
       CAST(row_number() OVER (PARTITION BY q.q_id
         ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC,
                  e.vec_id ASC) AS BIGINT) AS rank
FROM embeddings e CROSS JOIN q
QUALIFY rank <= 10
ORDER BY q_id, rank
""",
        # full probe == exact → identical oracle to emb_knn
        "emb_knn_ivf_full": """
WITH q AS (SELECT embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 1)
SELECT vec_id,
       CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(embedding, (SELECT qe FROM q)) DESC,
                  vec_id ASC) AS BIGINT) AS rank
FROM embeddings
ORDER BY rank LIMIT 10
""",
        "emb_near_dups_exact": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6)
         AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.5
""",
        "d_quality": _d_quality_sql(),
        "d_lang_eval": (
            "WITH q AS (" + _d_quality_sql() + ")\n"
            "SELECT d.lang AS lang_true, q.lang_pred, count(*) AS n\n"
            "FROM q JOIN documents d USING (doc_id)\n"
            "GROUP BY 1, 2"),
        "media_digest": _media_digest_sql(),
        "media_stats": _media_stats_sql(),
        "e_hash_sample": """
SELECT event_id, event_type FROM events
WHERE (event_id * 2654435761) % 4294967296 < 429496729
""",
        "e_stratified_sample": """
SELECT event_type, event_id, value, rn FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY (event_id * 2654435761) % 4294967296, event_id) AS rn
  FROM events)
WHERE rn <= 20
""",
        "e_reservoir_sample": """
SELECT event_id, event_type, rn FROM (
  SELECT event_id, event_type,
         row_number() OVER (
           ORDER BY (event_id * 2654435761) % 4294967296, event_id) AS rn
  FROM events)
WHERE rn <= 100
""",
        # sequential-Poisson priority in exact HUGEINT arithmetic: the
        # `//` integer division mirrors numpy's uint64 floor division
        "d_weighted_sample": """
SELECT doc_id, n_chars, rn FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY
           (CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296
                 AS HUGEINT) * 4294967296)
             // GREATEST(COALESCE(n_chars, 1), 1),
           doc_id) AS rn
  FROM documents)
WHERE rn <= 30
""",
        "e_asof": """
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, epoch_us(c.ts) AS click_ts, c.click_event_id
FROM p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
        # identical join, exercised through the big-big partitioned path
        "e_asof_big": """
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, epoch_us(c.ts) AS click_ts, c.click_event_id
FROM p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
        "e_rolling": """
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS run_sum
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
        "e_window_join": """
WITH h AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS hs, count(*) AS c
  FROM events GROUP BY 1
), w AS (
  SELECT hs - 1800000000 AS ws, hs + 5400000000 AS we,
         hs - 1800000000 AS window_start
  FROM h ORDER BY c DESC, hs LIMIT 3
)
SELECT e.event_id, w.window_start
FROM events e JOIN w ON epoch_us(e.ts) >= w.ws AND epoch_us(e.ts) < w.we
""",
        # identical join through the bucket-banded big-big path
        "e_window_join_big": """
WITH h AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS hs, count(*) AS c
  FROM events GROUP BY 1
), w AS (
  SELECT hs - 1800000000 AS ws, hs + 5400000000 AS we,
         hs - 1800000000 AS window_start
  FROM h ORDER BY c DESC, hs LIMIT 3
)
SELECT e.event_id, w.window_start
FROM events e JOIN w ON epoch_us(e.ts) >= w.ws AND epoch_us(e.ts) < w.we
""",
        "e_sliding": """
SELECT (epoch_us(ts) // 900000000 - j) * 900000000 AS window_start,
       event_type, count(*) AS n
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) shifts
GROUP BY 1, 2
""",
        "e_top_per_user": """
WITH r AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rk
  FROM events
)
SELECT user_id, event_id, value, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 3
""",
        "e_sessions": """
WITH o AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER w AS prev
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, us,
         sum(CASE WHEN prev IS NULL OR us - prev > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, min(us) AS session_start, max(us) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
""",
        "e_gaps": """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       count(*) AS n_gaps,
       CAST(sum(gap) AS BIGINT) AS sum_gap_us,
       CAST(max(gap) AS BIGINT) AS max_gap_us
FROM g WHERE gap IS NOT NULL GROUP BY 1
""",
    })
    return sql


def _d_quality_sql() -> str:
    """DuckDB twin of functions.text.quality_table, generated from the SAME
    stopword / language-profile constants so the two cannot drift.  Every
    float is an exact int-over-int IEEE division (or the same left-to-right
    0.4a+0.2b+0.2c+0.2d sum), so round(6) matches bitwise."""
    from ..functions.text import STOPWORDS, _LANG_PROFILES

    stop_sql = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    scores = ",\n         ".join(
        "(" + " + ".join(
            f"(length(lt) - length(replace(lt, '{tri}', ''))) // {len(tri)}"
            for tri in tris) + f") AS s_{lang}"
        for lang, tris in _LANG_PROFILES.items())
    langs = list(_LANG_PROFILES)  # tie-break = dict order (pandas idxmax)
    case = [f"WHEN {' AND '.join(f's_{a} >= s_{b}' for b in langs if b != a)} "
            f"THEN '{a}'" for a in langs[:-1]]
    lang_case = ("CASE WHEN greatest(" + ", ".join(f"s_{a}" for a in langs)
                 + ") = 0 THEN 'unk' " + " ".join(case)
                 + f" ELSE '{langs[-1]}' END")
    return rf"""
WITH f AS (
  SELECT doc_id, lower(text) AS lt,
         len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tok,
         len(regexp_extract_all(text, '[^\w\s]')) * 1.0
           / greatest(length(text), 1) AS punct_ratio,
         regexp_extract_all(lower(text), '[a-z]+') AS lw,
         regexp_extract_all(text, '\w+') AS ww
  FROM documents
), g AS (
  SELECT doc_id, n_tok, punct_ratio,
         CASE WHEN len(lw) = 0 THEN 0.0
              ELSE len(list_filter(lw, w -> w in ({stop_sql}))) * 1.0
                   / len(lw) END AS stopword_ratio,
         coalesce(list_avg(list_transform(ww, w -> length(w))), 0.0)
           AS mean_word_len,
         {scores}
  FROM f
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       round(0.4 * (CASE WHEN n_tok >= 10 AND n_tok <= 100000
                         THEN 1.0 ELSE 0.0 END)
           + 0.2 * (CASE WHEN punct_ratio < 0.3 THEN 1.0 ELSE 0.0 END)
           + 0.2 * (CASE WHEN stopword_ratio > 0.01 THEN 1.0 ELSE 0.0 END)
           + 0.2 * (CASE WHEN mean_word_len > 2 AND mean_word_len < 12
                         THEN 1.0 ELSE 0.0 END), 6) AS quality,
       {lang_case} AS lang_pred,
       round(punct_ratio, 6) AS punct_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(mean_word_len, 6) AS mean_word_len
FROM g
"""


def _media_digest_sql() -> str:
    """DuckDB twin of functions.multimodal.media_digest over the persisted
    synthetic media parquet (written by the query side too; persisted here
    as well so the oracle works regardless of call order).  DuckDB's sha256
    only takes VARCHAR → both sides hash the UPPER-hex payload string; the
    first 4 digest bytes are decoded little-endian via hex-digit strpos."""
    from ..functions.multimodal import persist_synth_media

    persist_synth_media(_MEDIA_ORACLE_PATH, n=48)

    def byte(i: int) -> str:  # digest hex chars are 1-indexed in substr
        hi, lo = 2 * i + 1, 2 * i + 2
        return (f"((strpos('0123456789abcdef', substr(h, {hi}, 1)) - 1) * 16"
                f" + (strpos('0123456789abcdef', substr(h, {lo}, 1)) - 1))")

    return f"""
WITH m AS (
  SELECT media_id, kind, octet_length(payload) AS payload_bytes,
         sha256(hex(payload)) AS h
  FROM read_parquet('{_MEDIA_ORACLE_PATH}')
)
SELECT media_id, kind, CAST(payload_bytes AS BIGINT) AS payload_bytes,
       CAST(({byte(0)} + 256 * {byte(1)} + 65536 * {byte(2)}
             + 16777216 * {byte(3)}) % 10000 AS BIGINT) AS f0
FROM m
"""
