"""Round-4 guards from ADVICE.md / VERDICT.md (r3).

1. embedding_neardup_pairs hash-oracle rides on floor(cosine*1e6) and a
   >= 0.42 cutoff evaluated independently by Spark and DuckDB; a 1-ulp
   cross-engine difference at either boundary would flip a row.  This
   test certifies (on the exact driver fixture, sf0.01) that no pair's
   cosine sits within epsilon of the threshold or of an e6 floor
   boundary, so the dual-engine comparison cannot flake.
"""

import os
import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from pyspark.sql import functions as F

SF001 = os.environ.get("SPARK_GRAFT_SF001_DIR", "/root/testdata/sf0.01")


def _load_embeddings():
    t = pq.read_table(f"{SF001}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, mat


def test_embedding_neardup_oracle_boundaries_are_safe():
    _, mat = _load_embeddings()
    norms = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(mat), k=1)
    c = cos[iu]
    # cross-engine double arithmetic differs by ~1e-12 at worst (same
    # math, different summation grouping); demand 1000x headroom.
    threshold_margin = np.abs(c - 0.42).min()
    assert threshold_margin > 1e-9, (
        f"a pair's cosine is {threshold_margin} from the 0.42 cutoff — "
        "the embedding_neardup_pairs hash oracle could flip"
    )
    above = c[c >= 0.42]
    assert len(above) > 0  # the query is non-degenerate on the fixture
    e6 = above * 1_000_000.0
    floor_margin = np.minimum(e6 - np.floor(e6), np.ceil(e6) - e6).min()
    assert floor_margin > 1e-6, (
        f"an emitted cosine_e6 is {floor_margin} ulp-e6 from a floor "
        "boundary — the hash oracle could flip"
    )


def test_gapfill_stream_late_passthrough_does_not_crash_timeout(spark, tmp_path):
    """ADVICE r3 (medium): on the pass-through path (late duplicate turn
    with turn_idx <= last_idx but a fresh event time) state's last_us
    stays old; if last_us + TTL is already behind the watermark,
    setTimeoutTimestamp raised INVALID_TIMEOUT_TIMESTAMP and killed the
    query.  The fix clamps the timeout to watermark + 1 ms."""
    from biomed_timeseries_preprocessing_spark.streaming.gapfill_stream import (
        run_gapfill_to_memory,
    )

    path = str(tmp_path / "lateturns")
    os.makedirs(path)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    h = pd.Timedelta(hours=1)

    def write_batch(rows):
        rows = [(*r[:-1], r[-1].to_pydatetime()) for r in rows]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.2)

    # batch 1: conv A head — state.last_us = t0 + 1 minute
    write_batch([("A", 0, "user", "a0", None, t0), ("A", 1, "agent", "a1", None, t0 + h / 60)])
    # batch 2: conv B far ahead — after this batch the watermark jumps
    # way past A's last_us + TTL (1h)
    write_batch([("B", 0, "user", "b0", None, t0 + 10 * h)])
    # batch 3: a LATE DUPLICATE of A turn 1 with a fresh event time: it
    # passes the watermark filter, takes the pass-through branch
    # (turn_idx <= last_idx, last_us unchanged), and pre-fix the TTL
    # re-registration crashed the query
    write_batch([("A", 1, "agent", "a1-dup", None, t0 + 10 * h + h / 60)])

    got = run_gapfill_to_memory(
        spark, path, "t_gapfill_late", state_ttl_sec=3600, watermark_delay="1 minute"
    ).toPandas()
    # the query survived and the late row passed through un-filled
    a_rows = got[(got["conv_id"] == "A") & (got["turn_idx"] == 1)]
    assert len(a_rows) == 2 and not a_rows["is_gap_filled"].any()


# ----------------------- metamorphic ANN identities (VERDICT r3 #1)

def _emb_df(spark, n=120, dim=8):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _topk_set(df):
    return {(r["q_id"], r["rnk"], r["nbr_id"]) for r in df.collect()}


def test_ivf_full_probe_equals_bruteforce(spark):
    """ivf_topk(nprobe=n_cells) probes every cell -> candidate set is
    the whole table -> shared re-rank kernel makes it EXACT.  This is
    the metamorphic identity the ann_topk_ivf_full driver query
    hash-checks against the brute-force oracle."""
    from biomed_timeseries_preprocessing_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    df = _emb_df(spark)
    queries = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = brute_force_topk(df, queries, k=5)
    full = ivf_topk(df, queries, dim=8, k=5, n_cells=6, nprobe=6)
    assert _topk_set(full) == _topk_set(exact)


def test_lsh_one_bit_bands_multiprobe_equals_bruteforce(spark):
    """lsh_topk(bands=n_planes, multiprobe=True): 1 bit per band and the
    multi-probe flip covers both values of every band, so recall is
    exactly 1 and the result equals brute force."""
    from biomed_timeseries_preprocessing_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    df = _emb_df(spark)
    queries = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = brute_force_topk(df, queries, k=5)
    ex_lsh = lsh_topk(df, queries, dim=8, k=5, n_planes=16, bands=16, multiprobe=True)
    assert _topk_set(ex_lsh) == _topk_set(exact)


# ------------------------------- W7 neighbor context (VERDICT r3 #7)

def test_with_neighbor_context_clips_at_edges(spark):
    from biomed_timeseries_preprocessing_spark.operators.derive import (
        with_neighbor_context,
    )

    rows = [("A", i, i * 10) for i in range(5)] + [("B", 0, 99)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, v int")
    got = {
        (r["conv_id"], r["turn_idx"]): r["v_ctx"]
        for r in with_neighbor_context(df, k=2, value_col="v").collect()
    }
    assert got[("A", 0)] == [0, 10, 20]          # clipped head
    assert got[("A", 2)] == [0, 10, 20, 30, 40]  # full frame, own value center
    assert got[("A", 4)] == [20, 30, 40]         # clipped tail
    assert got[("B", 0)] == [99]                 # singleton conversation
    # k=0 degenerates to a 1-element array of the row's own value
    k0 = with_neighbor_context(df, k=0, value_col="v", out_col="c").collect()
    assert all(r["c"] == [r["v"]] for r in k0)


# ----------------------- packed-lane simhash (VERDICT r3 #8)

def test_simhash_packed_identical_to_unpacked(spark):
    from biomed_timeseries_preprocessing_spark.operators.dedup import (
        simhash,
        simhash_packed,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "der hund lauft und die katze ist nicht mit dem ball zu sehen"),
        (2, "completely different content about spark query engines and shuffles"),
        (3, "a " * 200 + "b c d"),  # heavy term-frequency weighting
        (4, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(3)
    a = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash_packed(df).collect()}
    assert a == b


# ------------- fingerprint injectivity (metamorphic oracle preflight)

def test_fingerprint_collision_free_on_driver_corpora(spark):
    """The fingerprint_injectivity_audit driver query is hash-exact iff
    the 31-bit rolling fingerprint is deterministic AND collision-free
    on the corpus. Determinism is structural (pure expression of the
    token sequence); this certifies collision-freedom on BOTH driver
    corpora (sf0.01 and sf0.1) so the dual-engine oracle cannot fail on
    a corpus property: #distinct fingerprints == #distinct canonical
    token sequences."""
    from biomed_timeseries_preprocessing_spark.operators.text import with_fingerprint

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        if not os.path.isdir(sf_dir):
            continue
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        fp = with_fingerprint(docs).withColumn(
            "canon", F.array_join(F.split(F.trim(F.lower("text")), r"\s+"), " ")
        )
        got = fp.agg(
            F.countDistinct("fingerprint").alias("n_fp"),
            F.countDistinct("canon").alias("n_canon"),
        ).collect()[0]
        assert got["n_fp"] == got["n_canon"], sf_dir


# ------------- size-scaled auto bucket count (r4 seventh session)

def test_auto_buckets_scales_with_source_bytes(spark, tmp_path):
    """--buckets 0 sizes the resume/commit unit count from the source:
    floor 4 for small lakes (measured: fewer buckets win at 0.8M and
    8.6M turns on one box), one per ~512 MB beyond it, cap 4096. The
    stage marker already encodes the modulus, so a re-run whose auto
    count differs from a prior explicit run re-stages safely."""
    from jobs.rollup_job import auto_buckets

    src = str(tmp_path / "src")
    spark.range(1000).selectExpr("cast(id as string) conv_id").write.parquet(src)
    assert auto_buckets(spark, src) == 4  # tiny source → floor
    assert auto_buckets(spark, None) == 4  # synth source → floor
    assert auto_buckets(spark, str(tmp_path / "missing")) == 4  # unsizable → floor
    # a source many multiples of the target hits the 4096 cap
    assert auto_buckets(spark, src, target_bytes=1) == 4096
    size = sum(
        f.stat().st_size for f in (tmp_path / "src").iterdir() if f.is_file()
    )
    assert auto_buckets(spark, src, target_bytes=max(1, size // 6)) in (6, 7)
