"""Annotation-source format adapters (SURVEY §2.1 S4–S6): XML and TSV
annotation files → the engine's interval schema
(record_id, start_sec, end_sec, label).

Reference parity:
- S4 XML: ``Extract_Labels_XML.get_labels``
  (``/root/reference/utils/helpers/Extract_Transform_Labeler.py:87-114``)
  walks ScoredEvent elements, keeps ``Stages|Stages`` events, builds
  [start, start+duration] label intervals and an exclude map of the
  holes between consecutive stage intervals. Here the walk is Spark's
  JVM-side ``xpath()`` over the XML string column (arrays_zip + explode
  — no Python in the parse), and the exclude map falls out of the same
  lag-window arithmetic the interval operators use.
- S5/S6 TSV: ``Extract_Labels_TSV.get_labels`` (ibid. :116-151) reads a
  tab-separated (start, stop, label) file, skips '#' comment rows and
  'None' sentinels, and head-fills [0, first_start) with Background.
  Here: ``spark.read.csv(sep='\\t')`` + filters; the S6 variant drops
  intervals shorter/longer than a duration window.

Downstream, ``interval_merge``/``overlap_join_windows``
(operators/intervals.py) consume these rows once a recording start
timestamp anchors seconds to the timeline (``anchored``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

INTERVAL_SCHEMA_DOC = "record_id, start_sec double, end_sec double, label string"


def xml_annotations_to_intervals(
    xml_docs: DataFrame,
    id_col: str = "record_id",
    xml_col: str = "xml",
    event_type: str = "Stages|Stages",
) -> DataFrame:
    """XML annotation documents → label intervals. One xpath pass per
    field, zipped and exploded (JVM-side; one row in → n events out)."""
    fields = {
        "etype": "EventType",
        "label": "EventConcept",
        "start": "Start",
        "dur": "Duration",
    }
    cols = [
        F.expr(f"xpath({xml_col}, '//ScoredEvent/{tag}/text()')").alias(name)
        for name, tag in fields.items()
    ]
    exploded = (
        xml_docs.select(F.col(id_col).alias("record_id"), *cols)
        .select("record_id", F.explode(F.arrays_zip("etype", "label", "start", "dur")).alias("e"))
        .select(
            "record_id",
            F.col("e.etype").alias("etype"),
            F.col("e.label").alias("label"),
            F.col("e.start").cast("double").alias("start_sec"),
            (F.col("e.start").cast("double") + F.col("e.dur").cast("double")).alias("end_sec"),
        )
    )
    return exploded.filter(F.col("etype") == event_type).select(
        "record_id", "start_sec", "end_sec", "label"
    )


def xml_exclude_map(intervals: DataFrame) -> DataFrame:
    """The holes between consecutive stage intervals — the reference's
    ``exclude_map`` accumulation (Extract_Transform_Labeler.py:108-110),
    as one lag window: previous end (0 at the head) up to each start."""
    w = Window.partitionBy("record_id").orderBy("start_sec", "end_sec")
    prev_end = F.coalesce(F.lag("end_sec").over(w), F.lit(0.0))
    return (
        intervals.withColumn("prev_end", prev_end)
        .filter(F.col("prev_end") < F.col("start_sec"))
        .select(
            "record_id",
            F.col("prev_end").alias("start_sec"),
            F.col("start_sec").alias("end_sec"),
        )
    )


TSV_SCHEMA = "start_sec string, end_sec string, label string, extra string"


def tsv_annotations_to_intervals(
    spark: SparkSession,
    path: str,
    record_id: str,
    skip_rows: int = 0,
    min_duration_sec: float | None = None,
    max_duration_sec: float | None = None,
    background_headfill: bool = True,
    file_duration_sec: float | None = None,
) -> DataFrame:
    """TSV annotation file → label intervals (S5), with the duration
    filter variant (S6) and the reference's Background head-fill.

    ``file_duration_sec`` enables the reference's empty-parse fallback
    (Extract_Labels_TSV.get_labels appends a [0, file_duration]
    Background interval when no valid label rows parse): when set and
    the parsed interval set is empty, a single all-Background interval
    covering the recording is emitted instead of an empty frame."""
    raw = spark.read.csv(path, sep="\t", schema=TSV_SCHEMA, header=False)
    # annotation files are per-recording and tiny: file order IS the row
    # semantics (the reference's line-indexed parse), so the read is
    # explicitly coalesced to ONE partition — monotonically_increasing_id
    # is only order-stable within a partition, and a multi-split read
    # would otherwise silently scramble skip_rows
    w = Window.orderBy(F.monotonically_increasing_id())
    raw = raw.coalesce(1)
    rows = raw.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") > skip_rows)
    iv = (
        rows.filter(
            F.col("start_sec").isNotNull()
            & F.col("end_sec").isNotNull()
            & (F.col("start_sec") != "None")
            & (F.col("end_sec") != "None")
            & ~F.col("start_sec").startswith("#")
        )
        .select(
            F.lit(record_id).alias("record_id"),
            F.col("start_sec").cast("double").alias("start_sec"),
            F.col("end_sec").cast("double").alias("end_sec"),
            F.col("label"),
        )
        .filter(F.col("start_sec").isNotNull() & F.col("end_sec").isNotNull())  # tolerant parse
    )
    if min_duration_sec is not None:
        iv = iv.filter((F.col("end_sec") - F.col("start_sec")) >= min_duration_sec)
    if max_duration_sec is not None:
        iv = iv.filter((F.col("end_sec") - F.col("start_sec")) <= max_duration_sec)
    if background_headfill:
        head = (
            iv.groupBy("record_id")
            .agg(F.min("start_sec").alias("first_start"))
            .filter(F.col("first_start") > 0)
            .select(
                "record_id",
                F.lit(0.0).alias("start_sec"),
                F.col("first_start").alias("end_sec"),
                F.lit("Background").alias("label"),
            )
        )
        iv = iv.unionByName(head)
    if file_duration_sec is not None:
        fallback = spark.createDataFrame(
            [(record_id, 0.0, float(file_duration_sec), "Background")],
            "record_id string, start_sec double, end_sec double, label string",
        )
        # emit the fallback row only when iv parsed empty: anti-join on an
        # always-true condition removes it as soon as iv has any row
        # (stays lazy — no eager count of the interval frame)
        fallback = fallback.join(
            iv.select(F.lit(1).alias("_one")).limit(1), F.lit(True), "left_anti"
        )
        iv = iv.unionByName(fallback)
    return iv


def edfplus_tal_to_intervals(
    tals: DataFrame, id_col: str = "record_id", tal_col: str = "tal"
) -> DataFrame:
    """S7: EDF+ embedded annotations → label intervals.

    The reference reads these with ``mne.read_annotations`` and walks
    (onset, duration, description) triples
    (``Extract_Transform_Labeler.py:197-222``). The EDF *container* is
    out of scope for a lake engine (COVERAGE.md), but the annotation
    payload itself — the EDF+ TAL stream (Kemp & Olivan 2003, public
    spec): ``+onset[␕duration]␔label[␔label…]␔␀`` — is plain text this
    adapter parses JVM-side: split on the ␀ terminator, explode,
    regexp the onset/duration header, posexplode the ␔-separated labels
    (pos 0 is the header; empty labels are the timekeeping TALs that
    merely mark record starts and carry no annotation). Gap/exclude
    maps come from ``xml_exclude_map`` on the result, exactly like the
    reference's ``previous_end != start_ann`` walk."""
    t = tals.select(
        F.col(id_col).alias("record_id"),
        F.explode(F.split(F.col(tal_col), "\x00")).alias("t"),
    ).filter(F.length("t") > 0)
    onset = F.regexp_extract("t", r"^([+-][0-9.]+)", 1).cast("double")
    dur = F.coalesce(
        F.nullif(F.regexp_extract("t", "\x15([0-9.]+)", 1), F.lit("")).cast("double"),
        F.lit(0.0),
    )
    return (
        t.select(
            "record_id",
            onset.alias("start_sec"),
            (onset + dur).alias("end_sec"),
            F.posexplode(F.split(F.col("t"), "\x14")).alias("pos", "label"),
        )
        .filter((F.col("pos") >= 1) & (F.col("label") != "") & F.col("start_sec").isNotNull())
        .select("record_id", "start_sec", "end_sec", "label")
    )


def anchored(intervals: DataFrame, start_ts) -> DataFrame:
    """Anchor second-offset intervals to the timeline of a recording that
    began at ``start_ts`` → (record_id, start_ts, end_ts, label), the
    shape the interval operators consume."""
    base = F.unix_micros(F.lit(start_ts).cast("timestamp"))
    return intervals.select(
        "record_id",
        F.timestamp_micros(base + (F.col("start_sec") * 1_000_000).cast("long")).alias("start_ts"),
        F.timestamp_micros(base + (F.col("end_sec") * 1_000_000).cast("long")).alias("end_ts"),
        "label",
    )
