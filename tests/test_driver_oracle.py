"""Self-check of the driver contract: run every ``queries()`` entry at
sf=0.01 and compare row-count, column names, and order-insensitive values
against its ``oracle_sql()`` twin via DuckDB — the same procedure the driver
uses for CORRECTNESS_r{N}.json."""

import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


ORACLE_NAMES = [
    "t_yields_sb", "t_yields_mb", "t_pareto_all", "t_pareto_first_pass",
    "t_pareto_after_retest", "t_hourly", "t_hourly_chain", "t_limit_changes", "t_testlist",
    "t_attempts", "t_mb_results", "t_measurements", "t_sink_counts",
    "t_text_identity",
    "t_failed_boards", "t_export_long", "t_product_hourly", "t_test_series", "e_hourly", "e_pareto", "e_user_first_last", "e_topk",
    "e_window", "e_point_lookup", "q1_lineitem", "d_token_counts",
    "d_char_stats", "d_exact_dups", "emb_knn",
    "emb_knn_ivf_full", "emb_near_dups_exact", "d_quality", "media_digest",
    "e_hash_sample", "e_asof", "e_rolling", "d_minhash_pairs",
    "e_window_join", "e_sliding", "e_asof_big", "d_token_percentiles",
    "e_sessions", "d_top_tokens", "e_top_per_user", "e_window_join_big",
    "e_value_quantiles", "q_nation_revenue", "q_priority_revenue",
    "q_semi_bloom", "q_anti_bloom", "e_daily_active", "e_stratified_sample",
    "d_tfidf_top_terms", "q_cube_revenue", "e_value_corr",
    "d_dup_clusters", "e_retention", "e_share", "q_anti_bloom_big",
    "e_props_extract", "d_dedup_keep", "e_global_rank", "e_funnel",
    "e_user_chain", "q_region_brand_revenue", "d_lang_eval", "e_mode_hour",
    "d_weighted_sample", "e_reservoir_sample", "d_percentile_filter",
    "d_contamination", "q_customer_order_counts", "d_lang_mix",
    "d_wordgram_pairs", "d_redact", "d_boilerplate", "d_chunks",
    "d_pack", "d_repetition", "d_dedup_best", "d_cross_dedup",
    "d_cross_dedup_lsh", "d_curation_pipeline", "e_gaps",
    "d_ngram_overlap", "d_unit_dedup", "d_simhash_pairs",
    "d_budget_select", "emb_knn_batch", "media_stats",
]


def test_every_oracle_has_a_query(contract):
    q, s = contract
    assert set(s) <= set(q)
    assert set(ORACLE_NAMES) == set(s)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(contract, con, name):
    q, s = contract
    got = _canon(_to_df(q[name](SF_DIR)))
    want = _canon(con.sql(s[name]).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-9, atol=1e-9)


ROWS_ONLY = ["e_sample", "emb_knn_ivf", "emb_knn_lsh", "emb_near_dups",
             "d_analysis", "d_simhash", "media_features", "media_frames",
             "e_distinct_users_approx", "e_value_quantiles_approx",
             "emb_kmeans", "d_top_tokens_approx"]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(contract, name):
    q, _ = contract
    df = _to_df(q[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


def test_ngram_oracle_word_cap(con):
    """The d_ngram_overlap oracle's generate_series(1, 4096) caps the
    SQL-side gram index; a fixture doc longer than 4096 words would
    silently undercount oracle grams and red-flag the ENGINE (the
    correct side).  Fail loudly here if the testdata ever changes."""
    mx = con.sql(r"""
        SELECT max(len(regexp_extract_all(lower(COALESCE(text, '')),
                                          '\S+')))
        FROM documents""").fetchone()[0]
    assert mx < 4096, f"documents fixture now has a {mx}-word doc — " \
        "raise the d_ngram_overlap oracle's generate_series cap"


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = e.entry()
    assert len(df) >= 1
    assert set(df.columns) == {"sink", "n"}


def test_dedup_chain_k_threaded(contract):
    """VERDICT r4 item 3: the dedup-chain queries expose the shingle
    length k (default 5 = the oracle-pinned fixture setting; corpus
    callers pass k=8).  On the planted-dup testdata both shingle
    lengths verify the same exact-Jaccard pair set, so the whole chain
    must be value-identical at k=5 and k=8 — which also proves the
    parameter actually reaches the LSH stage (a dropped kwarg would
    TypeError, a mis-thread would change nothing detectably, hence the
    cache-key check below)."""
    from ict_log_parser_ray.pipelines import driver_queries as dq

    q, _ = contract
    p5 = _to_df(q["d_minhash_pairs"](SF_DIR))
    p8 = _to_df(dq.d_minhash_pairs(SF_DIR, k=8))
    assert p5[["doc_a", "doc_b"]].values.tolist() == \
        p8[["doc_a", "doc_b"]].values.tolist() and len(p5) > 0
    # distinct cache entries per (sf_dir, k) — k=8 must not have
    # poisoned the oracle-facing k=5 memo
    assert (SF_DIR, 5) in dq._MINHASH_PAIRS_CACHE
    assert (SF_DIR, 8) in dq._MINHASH_PAIRS_CACHE

    c5 = dq.d_dup_clusters(SF_DIR)
    c8 = dq.d_dup_clusters(SF_DIR, k=8)
    assert c5.equals(c8) and len(c5) > 0
    k5 = dq.d_dedup_keep(SF_DIR)
    k8 = dq.d_dedup_keep(SF_DIR, k=8)
    assert k5.equals(k8) and len(k5) > 0
