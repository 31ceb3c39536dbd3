"""Property-based checks (hypothesis) for the operators whose
correctness argument is subtle: the prefix-filtered AllPairs join must
equal brute force for ANY corpus (including all-identical, empty, and
adversarially overlapping token sets), connected components must equal
union-find for ANY edge list, and SimHash pigeonhole banding must have
exact recall. Fixed fixtures can't cover these shapes; random ones do.

Examples are deliberately few and small: each example round-trips
through Spark, so the budget goes to shape diversity, not volume.
"""

import sys

sys.path.insert(0, "/root/repo")

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from cati_database_feeder_spark.operators.dedup import (
    jaccard_similarity_join, simhash_near_dup_pairs)
from cati_database_feeder_spark.operators.graph import connected_components

# derandomize: the driver's gate must be reproducible run-to-run — a
# fresh falsifying example should come from widening max_examples
# locally, never from CI roulette
_SETTINGS = dict(max_examples=12, deadline=None, derandomize=True,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

# small alphabet → heavy token overlap → dense candidate buckets,
# identical-set clusters, and boundary-exact Jaccard values
_token = st.sampled_from(["a", "b", "c", "d", "e"])
_doc = st.lists(_token, min_size=0, max_size=8).map(" ".join)


def _brute_jaccard_pairs(docs, threshold):
    out = set()
    sets = {i: set(t.split()) for i, t in docs}
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[j]:
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                if union and inter / union >= threshold:
                    out.add((i, j))
    return out


@given(docs=st.lists(_doc, min_size=0, max_size=12),
       threshold=st.sampled_from([0.5, 0.6, 0.8, 1.0]))
@settings(**_SETTINGS)
def test_allpairs_join_equals_brute_force(spark, docs, threshold):
    rows = [(i, t, "s") for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string") \
        if rows else spark.createDataFrame([], "doc_id long, text string, source string")
    got = {(r["id_a"], r["id_b"])
           for r in jaccard_similarity_join(
               df, threshold=threshold, block_col="source").collect()}
    want = _brute_jaccard_pairs(list(enumerate(docs)), threshold)
    assert got == want


def _union_find_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(edges=st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_connected_components_equals_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    want = _union_find_components(edges)
    # DISTRIBUTED path pinned (the default cap would route these small
    # graphs to the driver fast path) ...
    got = {r["id"]: r["component"]
           for r in connected_components(df, driver_edge_cap=None).collect()}
    assert got == want
    # ... and the driver fast path must agree label-for-label
    got_fast = {r["id"]: r["component"]
                for r in connected_components(df).collect()}
    assert got_fast == want


@given(docs=st.lists(_doc.filter(lambda t: t.strip()), min_size=2, max_size=10))
@settings(**_SETTINGS)
def test_simhash_banding_exact_recall(spark, docs):
    """Pigeonhole guarantee: every pair within max_hamming MUST be
    returned (banding may only prune pairs that are provably far)."""
    from cati_database_feeder_spark.operators.dedup import (
        simhash_from_hashes, simhash_hamming)
    from cati_database_feeder_spark.functions import text as T
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_near_dup_pairs(df, max_hamming=3).collect()}

    sigs = {r["doc_id"]: r["sig"] for r in df.select(
        "doc_id",
        simhash_from_hashes(
            F.transform(T.tokens(F.col("text")), T.hash64)).alias("sig")).collect()}
    for i in sigs:
        for j in sigs:
            if i < j:
                ham = bin(sigs[i] ^ sigs[j]).count("1")
                if ham <= 3:
                    assert (i, j) in got and got[(i, j)] == ham
                else:
                    assert (i, j) not in got


@given(edges=st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=20),
    split=st.integers(0, 20))
@settings(**_SETTINGS)
def test_incremental_components_equals_full_for_any_split(spark, edges, split):
    """For ANY edge list and ANY old/new split point, updating CC(old)
    with the new edges equals CC over the union — the contraction
    argument, exercised over random graphs (merges across the split,
    self-contained new components, edges internal to old components)."""
    from cati_database_feeder_spark.operators.graph import incremental_components

    old, new = edges[:split], edges[split:]
    base = (connected_components(spark.createDataFrame(old, "id_a long, id_b long"))
            if old else spark.createDataFrame([], "id long, component long"))
    new_df = (spark.createDataFrame(new, "id_a long, id_b long")
              if new else spark.createDataFrame([], "id_a long, id_b long"))
    got = {r["id"]: r["component"]
           for r in incremental_components(base, new_df).collect()}
    assert got == _union_find_components(edges)


@given(docs=st.lists(_doc, min_size=0, max_size=10),
       delta_mod=st.sampled_from([2, 3, 4]))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_near_dup_equals_filtered_full_for_any_corpus(
        spark, docs, delta_mod):
    """For ANY corpus and ANY id-based delta slice, the incremental
    output equals the full near-dup pair set restricted to pairs that
    touch the delta — including all-identical corpora (dense within
    groups), empty deltas, and empty-token docs."""
    from cati_database_feeder_spark.operators.dedup import (
        incremental_near_dup_pairs, near_dup_pairs)

    schema = "doc_id long, text string"
    rows = [(i, t) for i, t in enumerate(docs)]
    df = (spark.createDataFrame(rows, schema) if rows
          else spark.createDataFrame([], schema))
    corpus = df.filter(F.col("doc_id") % delta_mod != 0)
    delta = df.filter(F.col("doc_id") % delta_mod == 0)
    got = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in incremental_near_dup_pairs(
               corpus, delta, threshold=0.6).collect()}
    full = {(r["id_a"], r["id_b"], r["jaccard"])
            for r in near_dup_pairs(df, threshold=0.6).collect()}
    want = {(a, b, j) for a, b, j in full
            if a % delta_mod == 0 or b % delta_mod == 0}
    assert got == want


@given(docs=st.lists(_doc, min_size=0, max_size=12),
       delta_mod=st.sampled_from([2, 3, 5]))
@settings(**_SETTINGS)
def test_store_backed_incremental_equals_filtered_full(
        spark, docs, delta_mod):
    """For ANY corpus and ANY id-based delta slice, the STORE-BACKED
    incremental path (reads only members/reps/buckets — no corpus
    text) equals the full near-dup pair set restricted to
    delta-touching pairs: the same contract as
    incremental_near_dup_pairs, under stable group ids. Covers
    all-identical corpora, empty deltas, empty-token docs, and delta
    docs whose sets match corpus groups with larger AND smaller ids."""
    from cati_database_feeder_spark.operators.dedup import (
        incremental_near_dup_pairs_from_store, near_dup_pairs,
        rep_band_buckets, tokset_groups, tokset_key)

    schema = "doc_id long, text string"
    rows = [(i, t) for i, t in enumerate(docs)]
    df = (spark.createDataFrame(rows, schema) if rows
          else spark.createDataFrame([], schema))
    corpus = df.filter(F.col("doc_id") % delta_mod != 0)
    delta = df.filter(F.col("doc_id") % delta_mod == 0)
    memb = tokset_groups(corpus)
    members = memb.select("id", "gid")
    reps = (memb.filter(F.col("id") == F.col("gid"))
            .select("gid", "toks", tokset_key(F.col("toks")).alias("key")))
    buckets = rep_band_buckets(memb)
    pairs, _, _ = incremental_near_dup_pairs_from_store(
        delta, members, reps, buckets, threshold=0.6)
    got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in pairs.collect()}
    full = {(r["id_a"], r["id_b"], r["jaccard"])
            for r in near_dup_pairs(df, threshold=0.6).collect()}
    want = {(a, b, j) for a, b, j in full
            if a % delta_mod == 0 or b % delta_mod == 0}
    assert got == want


@given(edges=st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=0, max_size=15),
    scores=st.lists(st.integers(0, 5), min_size=13, max_size=13))
@settings(**_SETTINGS)
def test_keep_best_per_cluster_equals_reference(spark, edges, scores):
    """For ANY cluster graph and ANY scores: exactly one survivor per
    cluster, the survivor maximizes (score, -id), every clustered doc
    is emitted once, unclustered docs never appear."""
    from cati_database_feeder_spark.operators.dedup import keep_best_per_cluster

    comp = _union_find_components(edges)
    labels = (spark.createDataFrame(list(comp.items()), "id long, component long")
              if comp else spark.createDataFrame([], "id long, component long"))
    sc = spark.createDataFrame(list(enumerate(scores)), "doc_id long, score long")
    got = {r["doc_id"]: (r["component"], r["kept_id"], r["keep"])
           for r in keep_best_per_cluster(labels, sc).collect()}
    # driver reference
    want_kept = {}
    for node, c in comp.items():
        cand = (scores[node], -node)
        if c not in want_kept or cand > want_kept[c]:
            want_kept[c] = cand
    assert set(got) == set(comp)
    for node, c in comp.items():
        kept_id = -want_kept[c][1]
        assert got[node] == (c, kept_id, node == kept_id)


@given(w=st.sampled_from([0.0, 0.4, 1.0, 1.7, 2.0, 3.3]),
       n=st.integers(5, 40))
@settings(**_SETTINGS)
def test_epoch_repeat_consistent_with_stratified_sample(spark, w, n):
    """The epoch-repetition contract: every doc appears exactly
    floor(w) or floor(w)+1 times, epochs are dense 1..reps, and the
    docs receiving the EXTRA fractional copy are exactly the docs a
    (w - floor(w))-fraction down-sample keeps — the consistency that
    makes nested mixes composable."""
    import math

    from cati_database_feeder_spark.operators.sampling import (
        epoch_repeat, stratified_sample)

    df = spark.createDataFrame([(i, "s") for i in range(n)],
                               ["doc_id", "lang"])
    out = epoch_repeat(df, "lang", "doc_id", {"s": w}).collect()
    full = math.floor(w)
    per_doc: dict[int, list[int]] = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    kept_frac = {r["doc_id"] for r in stratified_sample(
        df, "lang", "doc_id", {"s": w - full}).collect()}
    for i in range(n):
        eps = sorted(per_doc.get(i, []))
        want_reps = full + (1 if i in kept_frac else 0)
        assert eps == list(range(1, want_reps + 1)), (i, eps, want_reps)


# small integer coordinates → exact dot products, centroid ties (broken
# by cell id in both paths), zero-norm vectors (cosine NULL → filtered
# identically), and dense same-cell clusters
_vec = st.lists(st.sampled_from([-1.0, 0.0, 1.0, 2.0]),
                min_size=3, max_size=3)


@given(vecs=st.lists(_vec, min_size=1, max_size=12),
       delta_mod=st.sampled_from([2, 3, 4]))
@settings(**_SETTINGS)
def test_incremental_semdedup_equals_filtered_full(spark, vecs, delta_mod):
    """For ANY embedding corpus and ANY id-based delta slice, the
    cell-store-backed incremental SemDeDup equals the full-recompute
    pair set restricted to delta-touching pairs — the per-row cell
    assignment is what makes the restriction exact (no pair can span
    an un-probed cell). Covers empty deltas/corpora, zero vectors,
    and ties in the centroid argmin."""
    from cati_database_feeder_spark.operators.similarity import (
        assign_cells, incremental_semdedup_pairs, semdedup_pairs)

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(i, v) for i, v in rows[:4]]
    corpus = df.filter(F.col("vec_id") % delta_mod != 0)
    delta = df.filter(F.col("vec_id") % delta_mod == 0)
    store = assign_cells(corpus, cents, by="ip")
    got = {(r["id_a"], r["id_b"], r["cosine"])
           for r in incremental_semdedup_pairs(
               delta, store, cents, threshold=0.5, by="ip").collect()}
    full = {(r["id_a"], r["id_b"], r["cosine"])
            for r in semdedup_pairs(df, cents, threshold=0.5,
                                    by="ip").collect()}
    want = {(a, b, c) for a, b, c in full
            if a % delta_mod == 0 or b % delta_mod == 0}
    assert got == want


@given(
    a_pre=st.lists(st.sampled_from("pqrs"), max_size=6),
    a_suf=st.lists(st.sampled_from("tuvw"), max_size=6),
    b_pre=st.lists(st.sampled_from("jkl"), max_size=6),
    b_suf=st.lists(st.sampled_from("mno"), max_size=6),
    run_len=st.integers(min_value=7, max_value=12),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_winnow_guarantee_property(spark, a_pre, a_suf, b_pre, b_suf,
                                   run_len):
    """E73 randomized guarantee: for ANY surrounding context and any
    shared run of length >= w+k-1 (=7 at k=w=4), the two documents
    share at least one winnowing fingerprint — the SIGMOD-03 theorem,
    checked on generated inputs rather than one fixture. The run
    tokens are disjoint from every context alphabet so the shared
    k-grams come only from the planted run."""
    from cati_database_feeder_spark.operators.dedup import (
        winnow_fingerprints)
    run = [f"r{i}" for i in range(run_len)]
    doc_a = " ".join(list(a_pre) + run + list(a_suf))
    doc_b = " ".join(list(b_pre) + run + list(b_suf))
    df = spark.createDataFrame([(1, doc_a), (2, doc_b)],
                               ["doc_id", "text"])
    fps = {1: set(), 2: set()}
    for r in winnow_fingerprints(df, k=4, w=4).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2]


@given(docs=st.lists(_doc, min_size=0, max_size=12),
       window=st.integers(min_value=2, max_value=5),
       parts=st.sampled_from([1, 3, 7]))
@settings(**_SETTINGS)
def test_sorted_neighborhood_equals_driver_reference(
        spark, docs, window, parts):
    """E93 ≡ a driver-computed reference for ANY corpus, window size
    and partition count: rank by (16-char normalized prefix, padded
    id), pair every record with its window-1 successors, keep pairs
    at exact-Jaccard ≥ 0.5. Exercises empty docs (empty token sets →
    NULL-guarded jaccard), identical prefixes (rank falls through to
    the id tie-break), and the ordinal machinery across partition
    counts."""
    import re as _re
    from cati_database_feeder_spark.operators.dedup import (
        sorted_neighborhood_pairs)
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string") \
        if rows else spark.createDataFrame([], "doc_id long, text string")

    def key(i, t):
        norm = _re.sub(r"\s+", " ", t.strip().lower())
        return norm[:16].ljust(16) + str(i).zfill(20)

    ranked = sorted(rows, key=lambda r: key(*r))
    want = set()
    for a_idx, (ai, at) in enumerate(ranked):
        for b_idx in range(a_idx + 1, min(a_idx + window, len(ranked))):
            bi, bt = ranked[b_idx]
            sa, sb = set(at.split()), set(bt.split())
            union = len(sa | sb)
            if union == 0:
                continue
            j = round(len(sa & sb) / union, 6)
            if j >= 0.5:
                want.add((min(ai, bi), max(ai, bi), j))
    got = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in sorted_neighborhood_pairs(
               df, window=window, threshold=0.5,
               partitions=parts).collect()}
    assert got == want


@given(docs=st.lists(_doc, min_size=0, max_size=12),
       threshold=st.sampled_from([0.55, 0.72, 0.9]),
       max_df=st.sampled_from([None, 3, 6]))
@settings(**_SETTINGS)
def test_tfidf_cosine_allpairs_equals_brute_force(
        spark, docs, threshold, max_df):
    """E94 completeness: the maxweight-prefix-filtered join must equal
    the brute-force tf/df-weighted cosine over every pair, for ANY
    corpus, threshold and df cap — including all-identical docs
    (cosine 1 clusters), empty docs (no features), and docs emptied BY
    the cap. The reference mirrors the weighting in plain floats; the
    round-to-6 on both sides absorbs the decimal-vs-float accumulation
    difference."""
    import math
    from collections import Counter
    from cati_database_feeder_spark.operators.dedup import (
        tfidf_cosine_pairs)
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string") \
        if rows else spark.createDataFrame([], "doc_id long, text string")

    tfs = {i: Counter(t.split()) for i, t in rows}
    dfs = Counter(tok for c in tfs.values() for tok in c)
    vecs = {}
    for i, c in tfs.items():
        w = {tok: n / dfs[tok] for tok, n in c.items()
             if max_df is None or dfs[tok] <= max_df}
        nrm = math.sqrt(sum(x * x for x in w.values()))
        if nrm > 0:
            vecs[i] = {tok: x / nrm for tok, x in w.items()}
    want = set()
    for i in vecs:
        for j in vecs:
            if i < j:
                shared = set(vecs[i]) & set(vecs[j])
                c = round(sum(vecs[i][s] * vecs[j][s] for s in shared), 6)
                if c >= threshold:
                    want.add((i, j, c))
    got = {(r["id_a"], r["id_b"], r["cosine"])
           for r in tfidf_cosine_pairs(df, threshold=threshold,
                                       max_df=max_df).collect()}
    assert got == want
