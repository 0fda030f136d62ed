"""Annotation format adapters (S4 XML / S5 TSV / S6 duration filter) and
group admission guards (P11 class coverage, K5 min-rows)."""

import datetime as dt

from pyspark.sql import functions as F

from biomed_timeseries_preprocessing_spark.operators.guards import (
    class_coverage,
    class_coverage_filter,
    min_rows_guard,
)
from biomed_timeseries_preprocessing_spark.sources.annotations import (
    anchored,
    tsv_annotations_to_intervals,
    xml_annotations_to_intervals,
    xml_exclude_map,
)

XML = """<PSG><SoftwareVersion/><EpochLength/><ScoredEvents>
<ScoredEvent><EventType>Stages|Stages</EventType><EventConcept>Wake|0</EventConcept><Start>0.0</Start><Duration>30.0</Duration></ScoredEvent>
<ScoredEvent><EventType>Stages|Stages</EventType><EventConcept>Stage1|1</EventConcept><Start>60.0</Start><Duration>30.0</Duration></ScoredEvent>
<ScoredEvent><EventType>Respiratory|Apnea</EventType><EventConcept>Apnea</EventConcept><Start>40.0</Start><Duration>10.0</Duration></ScoredEvent>
<ScoredEvent><EventType>Stages|Stages</EventType><EventConcept>Stage2|2</EventConcept><Start>90.0</Start><Duration>30.0</Duration></ScoredEvent>
</ScoredEvents></PSG>"""


def test_xml_annotation_adapter(spark):
    """Stage events → intervals (non-stage events ignored), hole between
    consecutive stage intervals lands in the exclude map — the
    Extract_Labels_XML.get_labels semantics."""
    df = spark.createDataFrame([(1, XML)], "record_id long, xml string")
    iv = xml_annotations_to_intervals(df)
    rows = sorted(map(tuple, iv.collect()))
    assert rows == [
        (1, 0.0, 30.0, "Wake|0"),
        (1, 60.0, 90.0, "Stage1|1"),
        (1, 90.0, 120.0, "Stage2|2"),
    ]
    holes = sorted(map(tuple, xml_exclude_map(iv).collect()))
    assert holes == [(1, 30.0, 60.0)]  # the 30-60s gap, like previous_end logic
    ts = anchored(iv, dt.datetime(2026, 1, 1)).collect()
    assert min(r["start_ts"] for r in ts) == dt.datetime(2026, 1, 1)


def test_tsv_annotation_adapter(spark, tmp_path):
    p = str(tmp_path / "ann.tsv")
    with open(p, "w") as f:
        f.write("# comment header\tNone\tNone\t\n")
        f.write("10\t20\tseizure\tx\n")
        f.write("None\tNone\tNone\t\n")
        f.write("30\t31\tblip\tx\n")  # 1s — dropped by min duration
        f.write("40\t90\tseizure\tx\n")
    iv = tsv_annotations_to_intervals(
        spark, p, record_id="r1", min_duration_sec=5.0
    )
    rows = sorted(map(tuple, iv.collect()))
    assert rows == [
        ("r1", 0.0, 10.0, "Background"),  # head-fill like the reference
        ("r1", 10.0, 20.0, "seizure"),
        ("r1", 40.0, 90.0, "seizure"),
    ]


def test_class_coverage_filter(spark):
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "x"), ("c", "y")]
    df = spark.createDataFrame(rows, "grp string, lab string")
    rep = {r["grp"]: r["covered"] for r in class_coverage(df, ["grp"], "lab", ["x", "y"]).collect()}
    assert rep == {"a": True, "b": False, "c": False}
    kept = class_coverage_filter(df, ["grp"], "lab", ["x", "y"])
    assert {r["grp"] for r in kept.collect()} == {"a"}
    assert kept.count() == 2


def test_min_rows_guard(spark):
    rows = [("a", i) for i in range(5)] + [("b", 0), ("b", 1)] + [("c", 0)]
    df = spark.createDataFrame(rows, "grp string, v int")
    kept, dropped = min_rows_guard(df, ["grp"], min_rows=2)
    assert {r["grp"] for r in kept.collect()} == {"a", "b"}
    d = {r["grp"]: r["n_rows"] for r in dropped.collect()}
    assert d == {"c": 1}  # dropped groups are reportable, not silent


def test_edfplus_tal_adapter(spark):
    """S7: EDF+ TAL stream → intervals; timekeeping TALs (no label) are
    skipped; multi-label TALs emit one interval per label; missing
    duration means a zero-length marker."""
    from biomed_timeseries_preprocessing_spark.sources.annotations import (
        edfplus_tal_to_intervals,
        xml_exclude_map,
    )

    tal = (
        "+0\x14\x14\x00"                                   # timekeeping only
        "+30\x15120\x14Sleep stage W\x14\x00"              # onset 30, dur 120
        "+150\x15300\x14Sleep stage N1\x14Arousal\x14\x00"  # two labels, one span
        "+600\x14Marker\x14\x00"                           # no duration → len 0
    )
    df = spark.createDataFrame([("r1", tal)], "record_id string, tal string")
    got = {
        (r["start_sec"], r["end_sec"], r["label"])
        for r in edfplus_tal_to_intervals(df).collect()
    }
    assert got == {
        (30.0, 150.0, "Sleep stage W"),
        (150.0, 450.0, "Sleep stage N1"),
        (150.0, 450.0, "Arousal"),
        (600.0, 600.0, "Marker"),
    }
    # the reference's exclude map (holes between intervals) composes
    holes = {
        (r["start_sec"], r["end_sec"])
        for r in xml_exclude_map(
            edfplus_tal_to_intervals(df).filter("label != 'Arousal'")
        ).collect()
    }
    assert (0.0, 30.0) in holes and (450.0, 600.0) in holes


def test_tsv_empty_parse_background_fallback(spark, tmp_path):
    """ADVICE fix: an all-comment/'None' TSV with file_duration_sec set
    yields a single [0, duration] Background interval, not an empty set."""
    from biomed_timeseries_preprocessing_spark.sources.annotations import (
        tsv_annotations_to_intervals,
    )

    p = str(tmp_path / "empty.tsv")
    with open(p, "w") as f:
        f.write("# comment line\nNone\tNone\tNone\tx\n")
    got = tsv_annotations_to_intervals(
        spark, p, "rec9", file_duration_sec=3600.0
    ).collect()
    assert [(r["start_sec"], r["end_sec"], r["label"]) for r in got] == [
        (0.0, 3600.0, "Background")
    ]
    # and a file WITH valid rows does not emit the fallback
    p2 = str(tmp_path / "ok.tsv")
    with open(p2, "w") as f:
        f.write("0\t10\tSeizure\tx\n")
    got2 = tsv_annotations_to_intervals(
        spark, p2, "rec9", file_duration_sec=3600.0, background_headfill=False
    ).collect()
    assert [(r["start_sec"], r["end_sec"], r["label"]) for r in got2] == [
        (0.0, 10.0, "Seizure")
    ]
