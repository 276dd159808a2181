"""CLI surface mirroring the reference's four entry points
(``clinical.py:842-954``, ``maf.py:272-348``, ``validate.py:229-284``,
``load.py:85-137`` — each an argparse ``main()``), re-expressed over the
Spark plans:

    python -m iatlas_cbioportal_export_spark.cli clinical  --clinical c.tsv --oncotree o.tsv --dataset D --out dir
    python -m iatlas_cbioportal_export_spark.cli maf       --maf-folder dir --out dir [--endpoint URL]
    python -m iatlas_cbioportal_export_spark.cli validate  --bundle dir
    python -m iatlas_cbioportal_export_spark.cli load      --bundle dir --dest dir

``validate`` exits non-zero when any check ERRORs — the reference's
``ErrorFlagHandler`` gate (``utils.py:52-58``) as an exit code.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

from pyspark.sql import SparkSession


def _spark() -> SparkSession:
    from iatlas_cbioportal_export_spark.session import get_spark

    return get_spark("iatlas-cli")


def cmd_clinical(args: argparse.Namespace) -> int:
    from iatlas_cbioportal_export_spark.operators.projections import (
        split_patient_sample,
    )
    from iatlas_cbioportal_export_spark.plans.bundle import write_study_bundle
    from iatlas_cbioportal_export_spark.plans.clinical_pipeline import (
        preprocess_clinical,
    )
    from iatlas_cbioportal_export_spark.sources.readers import read_tsv

    spark = _spark()
    clinical = read_tsv(spark, args.clinical)
    oncotree = read_tsv(spark, args.oncotree)
    codes = read_tsv(spark, args.codes) if args.codes else None
    neo = read_tsv(spark, args.neoantigen) if args.neoantigen else None
    header_renames: dict[str, str] = {}
    case_modes: dict[str, str] = {}
    attr_types: dict[str, str] = {}
    if args.mapping:
        # The cli→cBioPortal attribute mapping drives three things in the
        # reference: header renames (clinical.py:334-340), per-column case
        # normalization (clinical.py:136-167) and the PATIENT/SAMPLE split
        # (clinical.py:381-395). It is a kilobyte dimension table — collect.
        for row in read_tsv(spark, args.mapping).collect():
            src = row["iATLAS_attribute"] if "iATLAS_attribute" in row else None
            dst = row["NORMALIZED_HEADER"]
            if src and dst and src != dst:
                header_renames[src] = dst
            case = row["Case"] if "Case" in row else None
            if case:
                case_modes[dst] = case
            attr_type = row["ATTRIBUTE_TYPE"] if "ATTRIBUTE_TYPE" in row else None
            if attr_type:
                attr_types[dst] = attr_type
    pre = preprocess_clinical(
        clinical,
        oncotree,
        neoantigen=neo,
        header_renames=header_renames or None,
        case_modes=case_modes or None,
        oncotree_codes=codes,
    )
    if not attr_types:
        # no mapping given: the reference cannot split either — treat every
        # non-key column as a sample attribute (documented degraded mode)
        attr_types = {c: "SAMPLE" for c in pre.columns if c not in ("PATIENT_ID",)}
    patient, sample = split_patient_sample(pre, attr_types)
    artifacts = write_study_bundle(args.out, args.dataset, patient, sample)
    print(f"wrote {len(artifacts)} artifacts to {args.out}")
    return 0


def cmd_maf(args: argparse.Namespace) -> int:
    from iatlas_cbioportal_export_spark.operators.maf import (
        annotate,
        drop_chrm,
        fake_annotator,
        http_annotator,
        split_annotation_errors,
    )
    from iatlas_cbioportal_export_spark.sources.readers import read_maf_folder
    from iatlas_cbioportal_export_spark.sources.sinks import write_chunked_tsv

    spark = _spark()
    maf = read_maf_folder(spark, args.maf_folder)
    if maf is None:
        print("no .maf files found", file=sys.stderr)
        return 1
    annotator = http_annotator(args.endpoint) if args.endpoint else fake_annotator
    ok, failed = split_annotation_errors(annotate(maf, annotator=annotator))
    write_chunked_tsv(drop_chrm(ok), os.path.join(args.out, "data_mutations_extended"),
                      max_rows=args.max_rows)
    n_failed = failed.count()
    if n_failed:
        write_chunked_tsv(failed, os.path.join(args.out, "annotation_errors"))
        print(f"{n_failed} rows failed annotation", file=sys.stderr)
    return 0


def cmd_validate(args: argparse.Namespace) -> int:
    from iatlas_cbioportal_export_spark.operators.validation import (
        findings_union,
        has_errors,
        no_all_null_columns,
        no_duplicate_rows,
        no_null_keys,
    )
    from iatlas_cbioportal_export_spark.sources.readers import (
        read_tsv_skip_cbioportal_header,
    )

    spark = _spark()
    findings = []
    for name, key in (
        ("data_clinical_patient.txt", "PATIENT_ID"),
        ("data_clinical_sample.txt", "SAMPLE_ID"),
    ):
        path = os.path.join(args.bundle, name)
        if not os.path.exists(path):
            print(f"MISSING {name}", file=sys.stderr)  # V1
            return 1
        df = read_tsv_skip_cbioportal_header(spark, path)
        findings.extend(
            [
                no_null_keys(df, [key]),
                no_all_null_columns(df),
                no_duplicate_rows(df, check=f"no_dup_rows_{name}"),
            ]
        )
    suite = findings_union(findings)
    suite.show(100, truncate=False)
    return 1 if has_errors(suite) else 0


def cmd_load(args: argparse.Namespace) -> int:
    # S7: the reference uploads to Synapse (load.py:38-82); here the bundle
    # is copied to the destination store path (driver-side, kilobyte metas +
    # already-distributed data files).
    shutil.copytree(args.bundle, args.dest, dirs_exist_ok=True)
    print(f"loaded bundle {args.bundle} -> {args.dest}")
    return 0


def cmd_curate(args: argparse.Namespace) -> int:
    """LLM-corpus curation end-to-end over JSONL: normalize → quality gates
    → language filter → PII redaction → exact dedup → JSONL out. Each stage
    is the library operator; the CLI only wires them."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from iatlas_cbioportal_export_spark.operators import curation as cur
    from iatlas_cbioportal_export_spark.operators.dedup import exact_dedup_keep_min
    from iatlas_cbioportal_export_spark.operators.text import language_id
    from iatlas_cbioportal_export_spark.sources.readers import read_jsonl, write_jsonl

    spark = _spark()
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    docs = read_jsonl(spark, args.input, schema)
    n_in = docs.count()
    normed = cur.normalize_text(docs).withColumnRenamed("text_norm", "text")
    gates = cur.gopher_quality(normed, min_words=args.min_words)
    kept = normed.join(
        gates.filter(F.col("passes")).select("doc_id"), "doc_id", "left_semi"
    )
    if args.lang:
        langs = language_id(kept)
        kept = kept.join(
            langs.filter(F.col("predicted_lang") == args.lang).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    redacted = cur.redact_pii(kept).withColumnRenamed("text_redacted", "text")
    keepers = exact_dedup_keep_min(redacted).select("doc_id")
    out = redacted.select("doc_id", "text").join(keepers, "doc_id", "left_semi")
    write_jsonl(out, args.output)
    n_out = out.count()
    print(f"curated {n_in} -> {n_out} docs ({args.input} -> {args.output})")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="iatlas-export-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("clinical", help="preprocess clinical TSVs into a study bundle")
    c.add_argument("--clinical", required=True)
    c.add_argument("--oncotree", required=True)
    c.add_argument("--codes")
    c.add_argument("--neoantigen")
    c.add_argument(
        "--mapping",
        help="clinical→cBioPortal attribute mapping TSV (iATLAS_attribute, "
        "NORMALIZED_HEADER, ATTRIBUTE_TYPE, Case) driving renames, case "
        "normalization and the patient/sample split",
    )
    c.add_argument("--dataset", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_clinical)

    m = sub.add_parser("maf", help="annotate and export mutation data")
    m.add_argument("--maf-folder", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--endpoint", help="Genome Nexus REST endpoint (default: offline fake)")
    m.add_argument("--max-rows", type=int, default=40_000)
    m.set_defaults(fn=cmd_maf)

    v = sub.add_parser("validate", help="run the validation suite on a bundle")
    v.add_argument("--bundle", required=True)
    v.set_defaults(fn=cmd_validate)

    load = sub.add_parser("load", help="copy a bundle to its destination store")
    load.add_argument("--bundle", required=True)
    load.add_argument("--dest", required=True)
    load.set_defaults(fn=cmd_load)

    cu = sub.add_parser(
        "curate",
        help="LLM-corpus curation over JSONL: normalize, quality-gate, "
        "language-filter, PII-redact, dedup",
    )
    cu.add_argument("--input", required=True, help="input JSONL path/dir")
    cu.add_argument("--output", required=True, help="output JSONL dir")
    cu.add_argument("--min-words", type=int, default=50)
    cu.add_argument("--lang", help="keep only this predicted language (e.g. en)")
    cu.set_defaults(fn=cmd_curate)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
