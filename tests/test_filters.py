"""P1/P2 filter truth tables — NULL semantics are the load-bearing part
(reference tests/test_clinical.py:91-128)."""

from iatlas_cbioportal_export_spark.operators.filters import (
    neq_filter_keep_nulls,
    regex_filter_scoped,
)

SCOPED = "Anders_JITC_2022"
OTHER = "Other_Dataset"
PATTERN = r"-(?:nd|ad|nr)-"


def test_regex_filter_truth_table(spark):
    rows = [
        ("s-nd-1", SCOPED, False),   # matches, in scope -> dropped
        ("s-ad-1", SCOPED, False),
        ("s-nr-1", SCOPED, False),
        ("s-ar-1", SCOPED, True),    # non-matching pattern kept
        ("s-ND-1", SCOPED, True),    # case-sensitive (pandas default)
        (None, SCOPED, True),        # na=False -> NULL id KEPT
        ("s-nd-1", OTHER, True),     # out of scope: everything kept
        (None, OTHER, True),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "SAMPLE_ID string, Dataset string"
    )
    out = regex_filter_scoped(df, "SAMPLE_ID", PATTERN, "Dataset", SCOPED)
    kept = {(r["SAMPLE_ID"], r["Dataset"]) for r in out.collect()}
    for sid, ds, keep in rows:
        assert ((sid, ds) in kept) == keep, (sid, ds)


def test_neq_filter_keeps_nulls(spark):
    df = spark.createDataFrame(
        [("chr1",), ("chrM",), (None,)], "Chromosome string"
    )
    out = neq_filter_keep_nulls(df, "Chromosome", "chrM")
    vals = [r["Chromosome"] for r in out.collect()]
    assert sorted(vals, key=str) == ["None", "chr1"] or set(map(str, vals)) == {"chr1", "None"}
