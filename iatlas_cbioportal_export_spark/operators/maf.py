"""MAF mutation-path operators (SURVEY.md §2.8, §3.2).

The reference's MAF pipeline is: folder scan+union → 40k-row chunking →
Genome Nexus annotation per chunk via a docker subprocess fanned out with
``multiprocessing.Pool`` (``maf.py:75-130``) → concat → chrM filter → write.

Spark-native shape: the chunking IS partitioning, the process pool IS task
parallelism, and the external annotation is a ``mapInPandas`` stage issuing
batched calls per partition — the one "UDTF-shaped" operator in the
reference. The real service needs network + docker (not available here), so
the annotator is pluggable: a deterministic fake implements the same
contract (adds annotation columns + routes failures to an error side-band)
for tests; the HTTP implementation is a drop-in.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Columns the annotator adds (a representative subset of the ~40 Genome
# Nexus annotation columns; the contract is "input columns + these").
ANNOTATION_COLS = [
    ("HGVSp_Short", "string"),
    ("Annotation_Status", "string"),
]

Annotator = Callable[[pd.DataFrame], pd.DataFrame]


def fake_annotator(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for the Genome Nexus REST annotator.

    Real implementation posts ≤40k-row batches to the GRCh38 endpoint with
    ``--isoform-override mskcc`` (reference ``maf.py:113-121``); this fake
    derives the annotation from the VARIANT KEY (never from row/batch
    position, which would vary with partitioning) so runs are hermetic and
    value-hash reproducible (SURVEY.md §7: "CI uses the fake").

    Contract: with ``Chromosome``+``Start_Position`` present,
    ``HGVSp_Short = 'p.<chrom>:<pos>'`` and a NULL chromosome marks the row
    FAILED (routed to the error side-band); without those columns the key is
    the colon-joined row values and every row SUCCEEDs.
    """
    out = batch.copy()
    if {"Chromosome", "Start_Position"}.issubset(out.columns):
        chrom = out["Chromosome"].astype("string")
        pos = out["Start_Position"].astype("Int64").astype("string")
        key = chrom + ":" + pos  # string-NA propagates
    else:
        key = pd.Series(
            [
                ":".join("" if pd.isna(v) else str(v) for v in row)
                for row in batch.itertuples(index=False)
            ],
            index=batch.index,
            dtype="string",
        )
    out["HGVSp_Short"] = ("p." + key).where(key.notna(), None)
    out["Annotation_Status"] = key.notna().map({True: "SUCCESS", False: "FAILED"})
    return out


def http_annotator(
    endpoint: str,
    transport: Callable[[bytes], bytes] | None = None,
    timeout_s: float = 60.0,
    isoform_override: str = "mskcc",
) -> Annotator:
    """Build a REST annotator for the real Genome Nexus service (reference
    runs it as a docker subprocess per 40k-row chunk, ``maf.py:113-121``,
    GRCh38 endpoint with ``--isoform-override mskcc``).

    Executor-side: each Arrow batch is POSTed as JSON records and the
    response's annotation columns are joined back positionally. ``transport``
    abstracts the wire call (bytes in → bytes out) so tests inject a fake;
    the default uses stdlib ``urllib`` — no extra dependencies. Failures mark
    the whole batch FAILED rather than raising, matching the reference's
    error-report routing (``maf.py:160-177``).
    """
    import json

    def default_transport(payload: bytes) -> bytes:
        from urllib.request import Request, urlopen

        req = Request(
            f"{endpoint}?isoformOverrideSource={isoform_override}",
            data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urlopen(req, timeout=timeout_s) as resp:  # noqa: S310 (cluster-side)
            return resp.read()

    send = transport or default_transport

    def annotator(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        try:
            payload = json.dumps(batch.to_dict(orient="records"), default=str).encode()
            records = json.loads(send(payload))
            ann = pd.DataFrame.from_records(records)
            for name, _typ in ANNOTATION_COLS:
                out[name] = (
                    ann[name].to_numpy()
                    if name in ann.columns and len(ann) == len(out)
                    else None
                )
            if "Annotation_Status" not in ann.columns:
                out["Annotation_Status"] = "SUCCESS"
        except Exception as exc:  # network/parse failure → error side-band
            for name, _typ in ANNOTATION_COLS:
                out[name] = None
            out["Annotation_Status"] = f"FAILED: {type(exc).__name__}"
        return out

    return annotator


def annotate(
    maf: DataFrame,
    annotator: Annotator = fake_annotator,
    max_rows_per_batch: int = 40_000,
) -> DataFrame:
    """Annotation as a ``mapInPandas`` stage.

    Partition sizing replaces the reference's manual 40k-row chunking: Arrow
    batch size bounds each pandas batch handed to the annotator, and Spark
    task parallelism replaces ``multiprocessing.Pool(n_workers)``. Failed
    batches surface as ``Annotation_Status != 'SUCCESS'`` rows and are split
    by :func:`split_annotation_errors` (reference routes failures to an error
    report, ``maf.py:160-177``).
    """
    out_schema = maf.schema.simpleString().rstrip(">")[len("struct<"):]
    schema = ",".join(
        [out_schema] + [f"{name}:{typ}" for name, typ in ANNOTATION_COLS]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for start in range(0, len(batch), max_rows_per_batch):
                yield annotator(batch.iloc[start : start + max_rows_per_batch])

    return maf.mapInPandas(run, schema=schema)


def split_annotation_errors(annotated: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route failed annotations to the error side-band (reference
    ``maf.py:160-177`` writes a separate failure report)."""
    ok = annotated.filter(F.col("Annotation_Status") == "SUCCESS")
    failed = annotated.filter(
        (F.col("Annotation_Status") != "SUCCESS")
        | F.col("Annotation_Status").isNull()
    )
    return ok, failed


def drop_chrm(maf: DataFrame, chrom_col: str = "Chromosome") -> DataFrame:
    """P2: drop mitochondrial variants, keeping NULL chromosomes (pandas
    ``!=`` semantics — reference ``maf.py:181-195``)."""
    c = F.col(chrom_col)
    return maf.filter((c != F.lit("chrM")) | c.isNull())


def allele_frequency(maf: DataFrame) -> DataFrame:
    """V11 companion: AF = t_alt / (t_alt + t_ref) (reference documents the
    formula at ``maf.py:256-258`` while checking the inputs are non-null)."""
    t_alt = F.col("t_alt_count").cast("double")
    t_ref = F.col("t_ref_count").cast("double")
    return maf.withColumn(
        "tumor_allele_freq",
        F.when((t_alt + t_ref) > 0, F.round(t_alt / (t_alt + t_ref), 6)),
    )
