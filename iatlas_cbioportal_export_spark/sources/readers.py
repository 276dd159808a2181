"""Sources: TSV / MAF / parquet scans (SURVEY.md §2.1 S1-S3).

Reference behavior being re-expressed (not copied):
- S1 Synapse TSV scan  -> header'd tab-separated read with an explicit schema
  (reference: ``clinical.py:319-322`` uses ``pd.read_csv(sep="\\t")`` with
  inferred dtypes; we declare schemas so the whole ``%.12g`` float-format
  subplot disappears).
- S2 multi-file MAF folder scan with ``comment="#"`` skip and outer column
  alignment (reference: ``maf.py:14-36``).
- S3 header-skipping re-read of cBioPortal clinical output (reference:
  ``clinical.py:798-808`` with ``skiprows=4``; the 4 header rows are
  ``#``-prefixed so a comment option expresses the same scan).

Scale notes: every reader returns a lazy DataFrame; globbed multi-file reads
parallelize across executors; column pruning and predicate pushdown reach the
scan because nothing is materialized here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    comment: str | None = None,
) -> DataFrame:
    """S1: tab-separated scan with header; explicit schema preferred.

    With ``schema=None`` we fall back to sampled inference (one extra pass) —
    acceptable for tiny dimension tables, wrong for 100 TB fact tables.
    """
    reader = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("nullValue", "")
        .option("emptyValue", "")
    )
    if comment:
        reader = reader.option("comment", comment)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_maf_folder(
    spark: SparkSession,
    folder: str,
    schema: StructType | None = None,
) -> DataFrame | None:
    """S2: scan ``*.maf`` files in a folder, skipping ``#`` comment lines.

    The reference reads each file then ``pd.concat(ignore_index=True)`` which
    outer-aligns columns by NAME (``maf.py:14-36``). With a declared schema a
    single globbed scan expresses that; with heterogeneous headers we read
    per-file and ``unionByName(allowMissingColumns=True)`` — same semantics,
    still a parallel scan per file.

    Returns ``None`` when the folder holds no ``.maf`` files (reference
    returns ``None`` for an empty folder).
    """
    files = sorted(
        os.path.join(folder, f) for f in os.listdir(folder) if f.endswith(".maf")
    )
    if not files:
        return None
    if schema is not None:
        return read_tsv(spark, files, schema=schema, comment="#")  # type: ignore[arg-type]
    dfs = [read_tsv(spark, f, comment="#") for f in files]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def read_tsv_skip_cbioportal_header(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """S3: re-read a cBioPortal clinical file, dropping the 4 ``#`` header rows."""
    return read_tsv(spark, path, schema=schema, comment="#")


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """JSON-lines scan with a REQUIRED explicit schema.

    Schema is not optional here by design: json inference is a full extra
    pass over the data (and samples by default), which is never acceptable
    on a 100 TB corpus — declare the shape, let the scan project only the
    requested fields (Spark's json reader prunes unparsed fields when the
    schema names only what you need)."""
    return spark.read.schema(schema).json(path)


def read_jsonl_tracked(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """JSONL scan that ROUTES malformed lines instead of dropping them:
    PERMISSIVE mode with a corrupt-record column, split into
    (good_rows, bad_rows). Web-scale corpora always contain broken lines;
    silently dropping them (DROPMALFORMED) hides data loss and failing the
    job (FAILFAST) wastes the cluster — the error side-band is the same
    contract the MAF annotator uses for failed batches.

    ``bad`` carries (corrupt_record) — the raw line for quarantine/replay.
    Spark requires the corrupt column consumers to cache-or-re-scan; the
    split here filters on the same scan twice, which stays two passes over
    the SAME files (no shuffle either way)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    corrupt = "_corrupt_record"
    full = StructType(list(schema.fields) + [StructField(corrupt, StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(path)
    )
    # Spark disallows filtering on only the corrupt column of a lazy json
    # scan (SPARK-21610) — materialize the tiny bad set via cache
    df = df.cache()
    good = df.filter(F.col(corrupt).isNull()).drop(corrupt)
    bad = df.filter(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("corrupt_record")
    )
    return good, bad


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line, the LLM-corpus interchange
    format). Distributed write — one file per partition."""
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan. Columnar like parquet (column pruning + predicate pushdown
    reach the scan); schema optional because ORC carries its own."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the interchange format for Hive-ecosystem consumers."""
    df.write.mode(mode).orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | None = None,
) -> DataFrame:
    """XML scan (Spark 4's built-in xml source). Schema is strongly
    recommended for the same no-inference-pass reason as
    :func:`read_jsonl`; ``row_tag`` names the repeating element. Each task
    stream-parses its own files (StAX) — the scan distributes like any
    text source, but XML carries no column statistics, so filters CANNOT
    push down into the scan: treat it as an ingest format, convert to
    parquet at the boundary (the ``read → write_parquet`` hop is one narrow
    pass)."""
    reader = spark.read.option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.xml(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str, mode: str = "overwrite"
) -> None:
    """XML sink — one ``<row_tag>`` element per row, one file per
    partition. Interchange with XML-expecting consumers (clinical-data
    registries, legacy ETL); not a storage format."""
    df.write.mode(mode).option("rowTag", row_tag).xml(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver's parquet testdata tables as lazy DataFrames."""
    return {
        name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for name in names
    }
