"""Every registered query vs its DuckDB oracle at sf0.001, inside the
test suite.

The external harness only budgets the first ~50 registered queries per
round; this test closes the gap by running the IDENTICAL comparison
(tools/check.py:compare_query — row count, column names, exact values
including float bits) over ALL queries at the smallest scale factor,
so a query sitting past the external budget is still value-checked on
every pytest run, not just operator-checked.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tools.check import compare_query, oracle_connection

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def oracle_con():
    con = oracle_connection(SF_DIR)
    yield con
    con.close()


# Bare integer SUM() in a DuckDB oracle's OUTPUT is the bug class that
# cost rounds 2 and 3: DuckDB types SUM(int) as HUGEINT/DECIMAL(38,0)
# while Spark's sum(bigint) is bigint, so the driver's schema/hash
# compare fails even when values agree. Every SUM in an oracle must be
# wrapped in CAST(...), except the reviewed-safe occurrences below —
# adding a new bare SUM means either casting it or consciously
# extending this table with the reason it cannot mismatch.
_BARE_SUM_ALLOWED = {
    # HAVING comparison — never reaches the output schema
    "q18_large_volume_customers": 1,
    # CTE-internal exact-DECIMAL sum (sum_wx) consumed only by the
    # final projection's CAST(CAST(.. AS VARCHAR) AS DOUBLE) hop —
    # the type is pinned one level out, deliberately NOT a direct
    # CAST..AS DOUBLE because DuckDB's decimal→double double-rounds
    # past 2^53 (see the query docstring)
    "events_ewma_smoothing": 1,
    # wsum/tot: the same reviewed pattern — exact DECIMAL sums whose
    # only output path is the VARCHAR-hop double conversion
    "orders_gini_by_segment": 2,
    # m1..m4 raw power sums: same reviewed VARCHAR-hop pattern
    "customer_acctbal_moments": 4,
    # one CTE-internal score SUM(m*w) consumed only by ROW_NUMBER's
    # ORDER BY, plus the reviewed dq_k_anonymity ppm pattern: both
    # SUMs inside ONE outer CAST((1e6*SUM(..)) // SUM(..) AS BIGINT)
    "text_lang_id": 3,
    "text_lang_id_probe": 3,
    # the shared prediction CTEs only: the score SUM consumed by
    # ROW_NUMBER — the confusion output itself is COUNT(*) cast
    "text_lang_confusion": 1,
    # the two milli ratios: SUMs inside ONE outer CAST((1000*SUM(..))
    # // SUM(..) AS BIGINT) each — the reviewed dq_k_anonymity pattern
    "text_tokenizer_fertility": 4,
    # every SUM term sits inside an outer CAST(... AS BIGINT) arith
    # expression (packed/naive sequence counts and wastes, savings
    # ppm) — all integer arithmetic over BIGINT SUMs, output types
    # pinned one level out; same reviewed pattern
    "pack_efficiency_report": 11,
    # both SUMs sit inside ONE outer CAST((1e6*SUM(..)) // SUM(..) AS
    # BIGINT) — the output type is pinned one level out, the reviewed
    # pack_training_sequences pattern
    "dq_k_anonymity": 2,
    # CTE-internal signature arithmetic, consumed before the output
    "dedup_simhash_pairs": 2,
    # CTE-internal session counter feeding a later GROUP BY key
    "events_session_window": 1,
    # SUM over DOUBLE ln() terms — double in both engines
    "bm25_topk_search": 1,
    # the same BM25 CTE reused for the lexical ranker: SUM over DOUBLE
    # ln() terms, consumed by ROW_NUMBER before the output schema
    "hybrid_rrf_search": 1,
    # running SUM(BIGINT) wrapped in CAST(COALESCE(...) AS BIGINT) one
    # level out — the output type is pinned, just not adjacent to SUM(
    "pack_training_sequences": 1,
    # CTE-internal duplicated-shingle counter; every output reference
    # is wrapped (CAST(n_dup AS BIGINT) / CAST(n_dup AS DOUBLE))
    "text_dup_span_profile": 1,
    # running SUM(BIGINT) wrapped in CAST(COALESCE(...) AS BIGINT) one
    # level out — the same reviewed pattern as pack_training_sequences
    "training_pipeline_e2e": 1,
    # same reviewed running-SUM pattern, BPE-counted packing variant
    "pack_training_sequences_bpe": 1,
    # CTE-internal window sums feeding only the cumw >= totw/2.0
    # comparison — never reach the output schema (output is MIN of a
    # raw data double)
    "udaf_weighted_median": 2,
    # list_sum( (the regex sees its "sum(") — DuckDB returns HUGEINT
    # for an INTEGER list, and the output reference IS wrapped:
    # CAST(list_sum(codes) AS BIGINT)
    "embedding_quantize_int8": 1,
    # numerator of chars_removed_frac: SUM(int)/CAST(SUM AS DOUBLE) —
    # any integer width divided by DOUBLE is DOUBLE in both engines,
    # and the only output reference is the rounded ratio
    "dedup_impact_report": 1,
}


def test_every_integer_sum_in_oracle_output_is_cast():
    import re
    bare_sum = re.compile(r"(?i)(?<!CAST\()sum\s*\(")
    offenders = {}
    for name, sql in sorted(_ORACLES.items()):
        n = len(bare_sum.findall(sql))
        if n != _BARE_SUM_ALLOWED.get(name, 0):
            offenders[name] = n
    assert not offenders, (
        f"oracles with unreviewed bare SUM( occurrences: {offenders} — "
        f"wrap in CAST(... AS BIGINT/DOUBLE) or extend _BARE_SUM_ALLOWED "
        f"with the reason the DuckDB result type cannot diverge from Spark's")


# Fast-lane budget (round-12 verdict, next #7): the full 190-query
# gate dominates the fast lane (~7 min and growing with the registry).
# Queries that ALREADY hold a green row from the driver-identical
# comparator for the round being built (CHECKLOCAL_r{N}.json ∪
# CORRECTNESS_r{N}.json — the freshest artifacts) are demoted to the
# slow lane: the per-commit `pytest -m fast` run re-checks exactly
# the queries not yet re-verified this round (new queries, changed
# paths, anything checklocal has not reached), while the full sweep
# still runs every query in the slow lane / at round close.
def _green_this_round() -> set:
    import glob
    import json
    import os
    import re
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = {}
    for path in (glob.glob(os.path.join(here, "CHECKLOCAL_r*.json"))
                 + glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if m:
            rounds.setdefault(int(m.group(1)), []).append(path)
    if not rounds:
        return set()
    # the round being built = the newest CHECKLOCAL round if one
    # exists beyond the newest CORRECTNESS round, else nothing is
    # "this round" yet and the whole gate stays fast
    newest_corr = max((r for r, ps in rounds.items()
                       if any("CORRECTNESS" in p for p in ps)),
                      default=0)
    building = newest_corr + 1
    green = set()
    for path in rounds.get(building, []):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("rows_match") \
                    and row.get("schema_match") and row.get("hash_match"):
                green.add(name)
    return green


_GREEN_NOW = _green_this_round()


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.slow) if n in _GREEN_NOW
    else n for n in sorted(_QUERIES)])
def test_query_matches_oracle(spark, oracle_con, name):
    status, detail = compare_query(
        spark, oracle_con, SF_DIR, name, _QUERIES[name], _ORACLES.get(name))
    if status == "weak":
        pytest.skip(f"rows-only by design: {detail[0]}")
    assert status == "pass", "; ".join(detail)
