"""ict_log_parser_ray — Ray-Data-native transcript log-processing engine.

Package map (import the submodule you need; nothing heavy imports here):

- ``pipelines.flagship`` / ``pipelines.streaming`` — the end-to-end
  parse → enrich → rank → route pipeline (materialized and fully
  streaming variants, row-identical outputs).
- ``pipelines.reports`` / ``pipelines.daily_report`` /
  ``pipelines.export`` — yield reports, Paretos, hourly stats, daily
  workbook, long/matrix exports.
- ``pipelines.driver_queries`` — the full ``queries()`` /
  ``oracle_sql()`` registry (every operator as a runnable example).
- ``stages.*`` — parse, enrich, dedup, route, joins (broadcast / hash /
  bloom semi+anti), temporal operators (as-of, interval, sliding
  window, sessionization), skew helpers.
- ``functions.*`` — training-data operators: document dedup
  (exact/MinHash-LSH/SimHash), similarity (brute-force + IVF ANN,
  k-means), text analysis, TF-IDF, sketches (HLL, DDSketch-style
  quantiles, Misra-Gries, count-min), CUBE/ROLLUP, moments/corr,
  connected components, JSON extraction, quantiles, vocab, multimodal
  plumbing.
- ``state.manifest`` — per-shard checkpointing, resumable + watch runs.
- ``fixtures`` — the deterministic seeded transcript generator.
- ``parity`` — the sequential pure-Python semantic reference.

Library code never calls ``ray.init()``; the caller owns the session.
See README.md, SURVEY.md (§2 operator inventory), COVERAGE.md
(operator → implementation/test/oracle map), and BASELINE.md.
"""
