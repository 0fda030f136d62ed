"""File-catalog pairing operators (SURVEY §2 P3/P4/P5, J1, K12):
known-answer tests mirroring File_Struct.py's directory-walk semantics."""

from biomed_timeseries_preprocessing_spark.sources.pairing import (
    classify_files,
    labeler_filter,
    pair_files,
    patient_map,
)


def catalog(spark):
    rows = [
        ("/lake/p001.edf",),            # data
        ("/lake/p001.a1.tsv",),         # label, labeler a1
        ("/lake/p001.a2.tsv",),         # label, labeler a2 (dedup target)
        ("/lake/p002.edf",),
        ("/lake/p002.a1.tsv",),
        ("/lake/p003.edf",),            # data with NO label → integrity drop
        ("/lake/p004.a1.tsv",),         # label with NO data → integrity drop
        ("/lake/readme.txt",),          # matches neither ending → excluded
    ]
    return spark.createDataFrame(rows, "path string")


def test_classify_name_predicate(spark):
    c = classify_files(catalog(spark), [".edf"], [".tsv"])
    got = {(r["path"], r["is_data"], r["is_label"]) for r in c.collect()}
    assert ("/lake/p001.edf", True, False) in got
    assert ("/lake/p001.a1.tsv", False, True) in got
    assert all("readme" not in p for p, _, _ in got)
    # membership list gates like the reference's train/test split
    only = classify_files(catalog(spark), [".edf"], [".tsv"], members=["p002"])
    assert {r["patient"] for r in only.collect()} == {"p002"}


def test_labeler_dedup_and_pairing_integrity(spark):
    c = labeler_filter(classify_files(catalog(spark), [".edf"], [".tsv"]), "a1")
    # a2 labeler file removed, data untouched
    assert not any("a2" in r["path"] for r in c.collect())
    paired, dropped = pair_files(c)
    got = {(r["patient"], r["data_file"], r["label_file"]) for r in paired.collect()}
    assert got == {
        ("p001", "/lake/p001.edf", "/lake/p001.a1.tsv"),
        ("p002", "/lake/p002.edf", "/lake/p002.a1.tsv"),
    }
    bad = {(r["patient"], r["n_data"], r["n_label"]) for r in dropped.collect()}
    assert bad == {("p003", 1, 0), ("p004", 0, 1)}


def test_patient_map_deterministic(spark):
    c = classify_files(catalog(spark), [".edf"], [".tsv"])
    m1 = {r["patient"]: r["patient_id"] for r in patient_map(c).collect()}
    m2 = {
        r["patient"]: r["patient_id"]
        for r in patient_map(c.repartition(7)).collect()
    }
    assert m1 == m2  # partitioning-invariant id assignment
    assert m1["p001"] == "patient_0000" and m1["p004"] == "patient_0003"
