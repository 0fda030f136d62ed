"""Connected-components canonicalization: synthetic graph shapes (chain,
clique, singleton), LSH-pairs integration, and the planted near-dup
documents end-to-end."""

from pyspark.sql import functions as F

from biomed_timeseries_preprocessing_spark.operators.components import (
    connected_components,
    neardup_clusters,
    shared_shingle_pairs,
)
from biomed_timeseries_preprocessing_spark.operators.dedup import minhash_dedup, word_shingles


def test_connected_components_shapes(spark):
    # chain 0-1-2-3-4 (stress pointer jumping), clique {10,11,12},
    # pair {20,21}, singletons 30, 31
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    nodes = list(range(5)) + [10, 11, 12, 20, 21, 30, 31]
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long")
    got = {r["id"]: r["component"] for r in connected_components(n, e).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 31}


def test_connected_components_long_chain_converges(spark):
    """A 200-node chain has diameter 199 — plain propagation would need
    ~200 rounds; path halving must converge within the 25-round cap."""
    edges = [(i, i + 1) for i in range(199)]
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    n = spark.createDataFrame([(i,) for i in range(200)], "id long")
    got = connected_components(n, e)
    assert got.filter(F.col("component") != 0).count() == 0


def test_neardup_clusters_planted_docs(spark):
    """Planted near-dups: doc B = doc A with one word changed; doc C
    unrelated. A+B cluster together under canonical min id; C stays
    its own canonical."""
    base = "the quick brown fox jumps over the lazy dog again and again until done"
    rows = [
        (1, base),
        (2, base.replace("lazy", "sleepy")),
        (3, "completely different content about spark shuffles and partitions here"),
        (4, base),  # exact dup of 1 → also same cluster
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["canonical_id"], r["cluster_size"], r["is_duplicate"])
           for r in neardup_clusters(docs, threshold=0.5).collect()}
    assert got[1] == (1, 3, False)
    assert got[2] == (1, 3, True)
    assert got[4] == (1, 3, True)
    assert got[3] == (3, 1, False)


def test_neardup_clusters_from_lsh_pairs(spark):
    """The LSH candidate path feeds the same components operator: on the
    planted set the MinHash pairs produce identical clusters."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    rows = [(1, base), (2, base.replace("theta", "sigma")), (3, "unrelated words entirely disjoint vocabulary nothing shared with others at all")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = neardup_clusters(docs, threshold=0.5)
    lsh_pairs = minhash_dedup(docs, threshold=0.5)
    via_lsh = neardup_clusters(docs, threshold=0.5, pairs=lsh_pairs)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, via_lsh.collect()))


def test_shared_shingle_pairs_df_cap(spark):
    """df_cap removes a ubiquitous shingle from candidate generation:
    docs related ONLY through the boilerplate trigram stop pairing."""
    boiler = "click here to subscribe"
    rows = [(i, f"{boiler} item number {i} unique content piece {i * 7}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = word_shingles(docs)
    uncapped = shared_shingle_pairs(sh, threshold=0.0)
    capped = shared_shingle_pairs(sh, threshold=0.0, df_cap=3)
    assert uncapped.count() > 0
    assert capped.count() < uncapped.count()


def test_shared_shingle_prefix_filter_exact(spark):
    """AllPairs prefix filtering is candidate pruning only: at any
    threshold the emitted (pair, jaccard) set is bit-identical to the
    unfiltered inverted index. Randomized token-soup corpus with planted
    near-dups so both true pairs and near-threshold pairs exist."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(60):
        toks = [rng.choice(vocab) for _ in range(rng.randint(5, 25))]
        rows.append((d, " ".join(toks)))
        if d % 4 == 0:  # plant a near-dup: one token mutated
            mut = list(toks)
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
            rows.append((1000 + d, " ".join(mut)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = word_shingles(docs)
    for t in (0.1, 0.5, 0.9, 1.0):
        plain = sorted(map(tuple, shared_shingle_pairs(sh, t, prefix_filter=False).collect()))
        pref = sorted(map(tuple, shared_shingle_pairs(sh, t, prefix_filter=True).collect()))
        assert pref == plain, f"prefix-filtered pair set diverged at threshold {t}"
    assert len(sorted(map(tuple, shared_shingle_pairs(sh, 0.5).collect()))) > 0
