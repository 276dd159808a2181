"""Every registry query's physical plan passes the anti-pattern linter.

This is the fleet-wide dogfood of plans/linter.py: builds each queries()
entry at sf0.001 (plan analysis only — no execution beyond what query
construction itself does) and asserts no error-severity finding, with
declared exceptions for deliberate patterns.
"""

import pytest

import __spark_entry__ as entrymod
from iatlas_cbioportal_export_spark.plans.linter import assert_scale_safe

SF_DIR = "/root/testdata/sf0.001"

# deliberate nested-loop users: broadcast cross joins against tiny sides
ALLOW_NESTED_LOOP = {
    "sim_topk_bruteforce",     # scoring vs broadcast query set
    "eval_mrr",                # nests the brute-force scorer (same cross)
    "events_resample_ffill",   # keys x 1-row global-span broadcast cross
    "decontamination",         # 1-row snippet crossJoin (planted contract)
    "tpch_q11_important_parts",  # HAVING-over-scalar: one-row broadcast join
    "tpch_q22_sales_opportunity",  # scalar avg subquery, one-row broadcast
    "dedup_cross_corpus",      # tiny planted batch vs corpus
    "text_tfidf",              # corpus-size scalar: one-row broadcast join
    "text_bm25",               # avg-doc-length scalar: one-row broadcast join
    "text_inverted_index",     # corpus-count scalar for the df gate: one-row broadcast join (r10)
    "v_validation_suite",      # 1-row aggregate crossJoins (finding rows)
    "text_unigram_logprob",    # corpus-total scalar: one-row broadcast join
    "text_naive_bayes",        # k-row class table (priors/defaults) broadcast cross
    "profile_join_cardinality",  # three ONE-ROW totals frames broadcast-crossed
    "sample_class_balanced",   # one-row min-class-count broadcast cross
    "text_length_histogram",   # corpus-total scalar: one-row broadcast join
    "sample_mixture_weights",  # one-row weight-total broadcast cross
    "text_bigram_logprob",     # corpus-total scalar: one-row broadcast join
    "text_trigram_backoff",    # corpus-total scalar: one-row broadcast join
    "text_cooccurrence_pmi",   # pair/token totals: one-row broadcast join
    "stats_chi_square",        # r x c marginal grid: categorical-sized broadcast cross
    "stats_psi_drift",         # bin totals: one-row broadcast join
    "stats_ks_test",           # sample totals: one-row broadcast join
    "maf_gene_cooccurrence",   # top-gene pair grid + totals: tiny broadcast crosses
    "graph_triangles",         # stats assembly: one-row broadcast crosses
    "stats_ab_ztest",          # two one-row bucket frames crossed
    "graph_kcore",             # driver-literal result frame (LocalTableScan)
    "stats_correlation",       # driver-literal result frame (LocalTableScan)
    "graph_bfs",               # 1-row source frame union/joins
    "sim_association_rules",   # basket-count scalar: one-row broadcast join
    "graph_label_propagation", # checkpointed per-round state scans
    "stats_mutual_information",# marginal/total one-row broadcast crosses
    "events_time_to_convert",  # two 1-row percentile picks broadcast-crossed
    "profile_key_skew",        # (total, n_keys) scalar: one-row broadcast join
    "sim_mips_topk",           # scoring vs broadcast query set (= bruteforce)
    "text_vocab_growth",       # two 1-row aggregates crossed (curve assembly)
    "sketch_hll_set_ops",      # 1-row est x 1-row exact crossed (report row)
    "graph_hits",              # L1-norm totals: one-row broadcast crosses
    "constraint_suite",        # FK finding row: 1-row count x 1-row total
}

_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_registry_query_plan_is_scale_safe(spark, name):
    from iatlas_cbioportal_export_spark.plans.linter import (
        unpartitioned_windows,
    )

    df = _QUERIES[name](spark, SF_DIR)
    assert_scale_safe(df, allow_nested_loop=name in ALLOW_NESTED_LOOP)
    # r10: ZERO single-partition windows registry-wide, no exceptions —
    # the last five (ks ECDF, logrank risk sets, time-to-convert ranks,
    # key-skew rank, moving-avg RANGE frame) were rewritten onto bucketed
    # running sums / TakeOrdered literal ranks / explode-contribution
    bad = unpartitioned_windows(df)
    assert not bad, f"single-partition window(s) in {name}: {bad}"


def test_every_oracle_has_a_registered_query():
    """An oracle_sql() entry without a queries() twin is dead weight the
    driver never compares — catches forgotten registrations (graph_ppr
    slipped through exactly this way in round 4)."""
    orphans = set(entrymod.oracle_sql()) - set(_QUERIES)
    assert not orphans, f"oracle_sql keys with no queries() entry: {sorted(orphans)}"
