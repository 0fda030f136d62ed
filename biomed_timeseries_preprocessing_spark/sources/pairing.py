"""File-catalog pairing: name predicates, labeler dedup, data↔label
pairing with integrity checks, and the anonymized patient map.

Reference parity (``/root/reference/utils/sleep_data_prep/File_Struct.py``):
- P3 name predicate (:80-99): a file belongs to the catalog iff its name
  contains one of the configured data/label endings; membership lists
  (train/test splits) further gate SeizIT1-style datasets.
- P4 labeler dedup (:131-133): when multiple labelers annotated the same
  recording, keep exactly one (the reference keeps the ``a1`` files).
- P5 pairing integrity (:134-141): a patient whose data- and label-file
  counts differ (or that has zero label files) is warned about and
  dropped whole — never half-paired.
- J1 data↔label pairing (:144-148): the i-th data file (sorted) pairs
  with the i-th label file (sorted) per patient.
- K12 patient map (:109-112): ``names_dict`` maps each patient name to
  an anonymized sequential id (``patient_0000`` …); here a dim table a
  sink can write.

All operators take a *file catalog* DataFrame — (path string) or
(patient, path) — the shape ``sources/catalog.py`` scans produce. These
are driver-light, JVM-only column ops; catalogs are small relative to
data, but nothing here collects to the driver, so a 10⁸-file lake
catalog still works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def classify_files(
    files: DataFrame,
    data_endings: list[str],
    label_endings: list[str],
    path_col: str = "path",
    members: list[str] | None = None,
) -> DataFrame:
    """P3: tag every path with is_data / is_label by substring endings
    (the reference's ``ending in patient_name`` containment, not a strict
    suffix) and derive ``patient`` = basename up to the first dot.
    ``members`` optionally gates to a membership list (S12/train-test
    splits); rows matching neither ending are dropped."""
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    out = files.withColumn("patient", F.split(base, "\\.")[0]).withColumn(
        "is_data",
        F.lit(False) if not data_endings
        else sum((base.contains(e).cast("int") for e in data_endings), F.lit(0)) > 0,
    ).withColumn(
        "is_label",
        F.lit(False) if not label_endings
        else sum((base.contains(e).cast("int") for e in label_endings), F.lit(0)) > 0,
    )
    out = out.filter(F.col("is_data") | F.col("is_label"))
    if members is not None:
        out = out.filter(F.col("patient").isin(members))
    return out


def labeler_filter(
    classified: DataFrame, keep_labeler: str = "a1", path_col: str = "path"
) -> DataFrame:
    """P4: among label files, keep only the configured labeler's
    (path contains the labeler tag); data files pass through untouched."""
    return classified.filter(
        ~F.col("is_label") | F.col(path_col).contains(keep_labeler)
    )


def pair_files(
    classified: DataFrame, path_col: str = "path"
) -> tuple[DataFrame, DataFrame]:
    """J1 + P5: per patient, sort data files and label files by path and
    pair them positionally. Returns ``(paired, dropped)``:

    - ``paired``: (patient, file_idx, data_file, label_file) — only for
      patients whose data/label counts match and are nonzero;
    - ``dropped``: (patient, n_data, n_label) — the integrity report the
      reference emits as a warning before skipping the patient.
    """
    data = (
        classified.filter("is_data")
        .select("patient", F.col(path_col).alias("data_file"))
        .withColumn("file_idx", F.row_number().over(
            Window.partitionBy("patient").orderBy("data_file")) - 1)
    )
    labels = (
        classified.filter("is_label")
        .select("patient", F.col(path_col).alias("label_file"))
        .withColumn("file_idx", F.row_number().over(
            Window.partitionBy("patient").orderBy("label_file")) - 1)
    )
    counts = (
        data.groupBy("patient").agg(F.count(F.lit(1)).alias("n_data"))
        .join(
            labels.groupBy("patient").agg(F.count(F.lit(1)).alias("n_label")),
            "patient",
            "full",
        )
        .fillna(0, ["n_data", "n_label"])
    )
    ok = counts.filter((F.col("n_data") == F.col("n_label")) & (F.col("n_label") > 0))
    dropped = counts.filter(
        (F.col("n_data") != F.col("n_label")) | (F.col("n_label") == 0)
    ).select("patient", "n_data", "n_label")
    paired = (
        data.join(ok.select("patient"), "patient")
        .join(labels, ["patient", "file_idx"])
        .select("patient", "file_idx", "data_file", "label_file")
    )
    return paired, dropped


def patient_map(classified: DataFrame) -> DataFrame:
    """K12: anonymized patient dim — (patient, patient_id) with
    ``patient_id = patient_XXXX`` assigned densely in sorted-name order
    (deterministic under any partitioning; the reference assigns ids in
    directory-listing order, which is not even stable across hosts).
    The global window is intentional: this is a dim table of distinct
    patients, orders of magnitude smaller than the file catalog."""
    w = Window.orderBy("patient")
    return (
        classified.select("patient")
        .distinct()
        .withColumn(
            "patient_id",
            F.format_string("patient_%04d", F.row_number().over(w) - 1),
        )
    )
