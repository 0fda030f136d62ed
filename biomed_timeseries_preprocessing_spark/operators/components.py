"""Near-dup cluster canonicalization: connected components over
similarity pairs → one canonical doc per cluster + drop flags.

This completes the dedup story the pair emitters (``dedup.py``) start:
a training-data pipeline doesn't want (doc_a, doc_b, jaccard) rows, it
wants ``canonical_id`` per document and a drop-list. The reference's
analog is its ordered dedup + manifest routing
(``/root/reference/utils/sleep_data_prep/File_Struct.py:101,129-133``),
which keeps the first-seen member of each duplicate group.

Algorithm (public knowledge — Kiveris et al. "Connected Components in
MapReduce and Beyond", and the classic pointer-jumping/label-propagation
family): iterate
  1. **propagate**  lbl(v) ← min(lbl(v), min over neighbors lbl(u))
  2. **jump**       lbl(v) ← lbl(lbl(v))   (path halving)
until no label changes. Propagation alone needs O(diameter) rounds;
the jump step makes long chains collapse in O(log d) rounds. Every round
is two shuffles (neighbor groupBy + label-map join) on DataFrames —
no driver-side graph state, so it scales to edge sets that don't fit on
one machine. Per-round ``localCheckpoint`` truncates the logical plan so
the iteration count doesn't blow up lineage/codegen.

Candidate pairs can come from MinHash-LSH (``minhash_dedup`` — the
100 TB path) or from the exact shared-shingle inverted index below
(oracle-friendly: no hash functions, reproducible in plain SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.truncate import plan_checkpoint
from .dedup import word_shingles


def shared_shingle_pairs(
    shingled: DataFrame,
    threshold: float = 0.5,
    df_cap: int | None = None,
    prefix_filter: bool | None = None,
    reuse_shingles: bool = True,
) -> DataFrame:
    """Exact near-dup pairs from the shingle inverted index: two docs are
    candidates iff they share ≥1 shingle (a guaranteed superset of any
    pair with Jaccard > 0), verified with exact integer Jaccard.

    ``df_cap`` drops shingles whose document frequency exceeds the cap
    from CANDIDATE GENERATION ONLY (the standard guard against a
    boilerplate shingle exploding the self-join quadratically); the
    Jaccard itself is always counted against the FULL shingle sets, so
    every reported similarity is exact — the cap can only lose pairs
    whose *every* shared shingle is ubiquitous, never skew a surviving
    pair's score. Leave it None when exhaustiveness is required (e.g.
    oracle comparison); at 100 TB set a cap and/or use the MinHash-LSH
    path for candidates.

    ``prefix_filter`` applies AllPairs prefix filtering (Bayardo, Ma &
    Srikant, WWW'07 "Scaling Up All Pairs Similarity Search" — public
    algorithm) to the candidate index, WITHOUT approximation: under any
    global total order of shingles, a doc only needs its
    ``|d| - ceil(t·|d|) + 1`` smallest shingles in the index — if
    J(a,b) ≥ t then o = |a∩b| ≥ t·max(|a|,|b|) (since |a∪b| ≥ max), and
    if no common shingle fell in both prefixes then every common shingle
    exceeds the smaller prefix's last element, forcing
    o ≤ ceil(t·|a|) − 1 < o — contradiction. The order used is
    (document frequency ASC, shingle ASC), so prefixes hold each doc's
    RAREST shingles and the inverted index's per-shingle posting lists
    shrink quadratically where it matters most. A length filter
    (t·|a| ≤ |b| ∧ t·|b| ≤ |a|, same paper) prunes inside the self-join.
    Both prune candidates only; n_inter is then counted against the FULL
    shingle sets, so the emitted Jaccard is exact and the pair set is
    bit-identical to the unfiltered index (locked by
    ``test_shared_shingle_prefix_filter_exact`` at t ∈ {0.1,0.5,0.9,1}).

    **Default OFF — a measured decision, not an oversight.** Prefix
    filtering pays for its dfreq join + per-doc rank window + full-set
    verification join only when the df distribution is Zipfian (a rare
    tail carries most postings, so rare-first prefixes collapse the
    inverted index). Every corpus in this sandbox is near-uniform-df
    synthetic text (driver documents table: df p50=9, p99=18, max=25
    over a 27k vocabulary; dedup_scale token soup: same shape) and
    there the pruning cannot win — measured 4–6 s plain vs 12–16 s
    prefix-filtered on the sf0.1 documents table (interleaved, 2 reps),
    and worse at 50k docs where the dense-overlap candidate set is
    inherently quadratic and the verify join multiplies it. On a real
    web corpus (Zipf df, sparse overlap) flip it on; the equivalence
    test guarantees the switch can never change results.
    """
    if prefix_filter is None:
        prefix_filter = False
    if reuse_shingles:
        # same reasoning as minhash_dedup: the shingle plan feeds up to
        # four consumers (index side ×2 of the self-join, dfreq, sizes
        # ×2) and Spark reuses none of those branches — the physical
        # plan showed the corpus explode+distinct running 4× (sizes
        # alone re-derived twice for the n_a and n_b builds). Lazy
        # localCheckpoint tokenizes the corpus once.
        shingled = plan_checkpoint(shingled, eager=False)
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh = shingled
    need_full_verify = df_cap is not None or prefix_filter
    if df_cap is not None or prefix_filter:
        # document frequency: the df_cap filter needs it; prefix
        # filtering uses it as the global order key (rare-first).
        dfreq = shingled.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        cond = F.col("_df") >= 2  # df=1 shingles join only with themselves
        if df_cap is not None:
            cond = cond & (F.col("_df") <= df_cap)
        sh = shingled.join(dfreq.filter(cond), "shingle")
    if prefix_filter:
        from pyspark.sql.window import Window

        # rank within doc by (df asc, shingle asc); keep the
        # |d| − ceil(t·|d|) + 1 rarest. n_sh is the FULL set size (the
        # df≥2/df_cap drop must not lengthen another doc's prefix
        # budget... it can only shorten the indexed set further, which
        # keeps the superset guarantee: every surviving shingle's rank
        # here is ≤ its rank in the full order, so rank ≤ prefix_len
        # retains at least the full-order prefix survivors).
        # The 1e-9 nudge keeps ceil exact when t·n is integral but the
        # double product lands epsilon above it (0.1·10 → 1.0000…2);
        # erring low lengthens the prefix — more candidates, never fewer.
        w = Window.partitionBy("doc_id").orderBy("_df", "shingle")
        sh = (
            sh.join(sizes, "doc_id")
            .withColumn("_rk", F.row_number().over(w))
            .filter(
                F.col("_rk")
                <= F.col("n_sh")
                - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
                + F.lit(1)
            )
            .select("doc_id", "shingle", "n_sh")
        )
    elif df_cap is not None:
        sh = sh.drop("_df")
    a = sh.alias("a")
    b = sh.alias("b")
    join_cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    if prefix_filter:
        # length filter: J ≥ t ⟹ t·|a| ≤ |b| and t·|b| ≤ |a|
        # (float comparisons err toward keeping — verification is exact)
        join_cond = (
            join_cond
            & (F.lit(threshold) * F.col("a.n_sh") <= F.col("b.n_sh") + F.lit(1e-9))
            & (F.lit(threshold) * F.col("b.n_sh") <= F.col("a.n_sh") + F.lit(1e-9))
        )
    cand = a.join(b, join_cond).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    if not need_full_verify:
        # full index: intersection counts come straight off the self-join
        inter = cand.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_inter"))
    else:
        # capped: count n_inter by joining distinct candidate pairs back
        # to the FULL shingle sets (mirrors jaccard_verify in the LSH
        # path) so jaccard is exact even when the candidate index dropped
        # high-df shingles
        inter = (
            cand.distinct()
            .join(shingled.withColumnRenamed("doc_id", "doc_a"), "doc_a")
            .join(
                shingled.select(
                    F.col("doc_id").alias("doc_b"), F.col("shingle").alias("shingle_b")
                ),
                "doc_b",
            )
            .filter(F.col("shingle") == F.col("shingle_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id) + (src, dst) undirected edges → (id, component) where
    component = min node id reachable. Min-label propagation with path
    halving; converges in O(log diameter) rounds, each round two
    shuffles. Raises if ``max_iter`` rounds don't converge (a graph with
    diameter > 2^25 is not a dedup clustering problem)."""
    # symmetrize with ONE scan of the edge plan: a two-branch union
    # (select(a,b) ∪ select(b,a)) evaluates the upstream twice, and the
    # edge input here is typically an expensive unpersisted similarity
    # plan — measured 27.4 → 16.5 s on the 50k-doc exact clusters path
    # (BENCH/clusters_profile.json) just from not computing pairs twice
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                    F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .distinct()
    )
    sym = plan_checkpoint(sym, eager=True)
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("lbl"))
    labels = plan_checkpoint(labels, eager=True)

    # convergence test: for integral ids, labels are monotonically
    # non-increasing under min-propagation, so an unchanged exact
    # decimal(38,0) sum ⟺ fixed point — one aggregate per round. That
    # cast THROWS on string ids under Spark 4 ANSI (and NULLs out on
    # non-ANSI, "converging" wrongly after one round), so non-integral
    # ids use an any-label-changed check (join vs previous labels,
    # limit(1) for early exit) instead; min() itself is well-defined on
    # any orderable type, so the propagation needs no change.
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = isinstance(
        nodes.schema[id_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    )

    def _label_sum(df) -> int:
        row = df.select(F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")).collect()[0]
        return int(row["s"] or 0)

    prev_sum = _label_sum(labels) if integral else None
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "d"), "d")
            .groupBy(F.col("s").alias("id"))
            .agg(F.min("lbl").alias("_nbr"))
        )
        prop = labels.join(nbr_min, "id", "left").select(
            "id", F.least("lbl", F.coalesce("_nbr", "lbl")).alias("lbl")
        )
        # path halving: lbl ← lbl(lbl) (labels are node ids, so the map
        # always has an entry)
        jumped = (
            prop.alias("x")
            .join(
                prop.select(F.col("id").alias("lbl"), F.col("lbl").alias("_lbl2")).alias("m"),
                "lbl",
                "left",
            )
            .select("id", F.coalesce("_lbl2", "lbl").alias("lbl"))
        )
        new_labels = plan_checkpoint(jumped, eager=True)
        if integral:
            cur_sum = _label_sum(new_labels)
            done = cur_sum == prev_sum
            prev_sum = cur_sum
        else:
            done = (
                new_labels.join(
                    labels.select("id", F.col("lbl").alias("_prev")), "id"
                )
                .filter(F.col("lbl") != F.col("_prev"))
                .limit(1)
                .count()
                == 0
            )
        labels = new_labels
        if done:
            return labels.select("id", F.col("lbl").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def neardup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Canonicalize near-duplicates: docs → similarity pairs → connected
    components → one row per doc with its cluster's canonical id (min
    doc_id), cluster size, and drop flag.

    ``pairs`` overrides candidate generation (pass ``minhash_dedup``
    output for the LSH path); default is the exact shared-shingle index.
    """
    if pairs is None:
        pairs = shared_shingle_pairs(word_shingles(docs, id_col, text, n), threshold)
    nodes = docs.select(F.col(id_col).alias("id"))
    comp = connected_components(nodes, pairs)
    clusters = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(clusters, "component")
        .select(
            F.col("id").alias(id_col),
            F.col("component").alias("canonical_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            (F.col("id") != F.col("component")).alias("is_duplicate"),
        )
    )
