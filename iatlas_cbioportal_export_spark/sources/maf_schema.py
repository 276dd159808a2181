"""The 118-column annotated-MAF schema the reference validates against
(`/root/reference/src/iatlascbioportalexport/validate.py:14-133`,
``REQUIRED_MAF_COLS``) as an explicit Spark ``StructType``.

The reference never declares types — every read re-infers them per file,
which is what forces its ``%.12g`` float-format workaround. Declaring the
schema makes MAF scans deterministic (S1 contract), lets V12 check presence
AND type, and removes the whole inferred-dtype subplot.

Typing policy (MAF spec + VEP/gnomAD annotation conventions):
positions/counts/depths → long; allele frequencies and scores → double;
everything else (ids, alleles, flags, annotations) → string.
"""

from __future__ import annotations

from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

_LONG_COLS = {
    "Entrez_Gene_Id",
    "Start_Position",
    "End_Position",
    "ALLELE_NUM",
    "DISTANCE",
    "HGVS_OFFSET",
    "MOTIF_POS",
    "n_ref_count",
    "n_alt_count",
    "n_depth",
    "t_depth",
    "t_ref_count",
    "t_alt_count",
    "vcf_pos",
}

_DOUBLE_COLS = {
    "Score",
    "AA_AF",
    "AF",
    "AFR_AF",
    "AMR_AF",
    "ASN_AF",
    "EAS_AF",
    "EA_AF",
    "EUR_AF",
    "SAS_AF",
    "MOTIF_SCORE_CHANGE",
    "gnomADe_AF",
    "gnomADe_AFR_AF",
    "gnomADe_AMR_AF",
    "gnomADe_ASJ_AF",
    "gnomADe_EAS_AF",
    "gnomADe_FIN_AF",
    "gnomADe_NFE_AF",
    "gnomADe_OTH_AF",
    "gnomADe_SAS_AF",
    "vcf_qual",
    "MHCflurry_2.1.1_affinity_nm",
    "MHCflurry_2.1.1_presentation_score",
}

# Exact names and order of the reference's REQUIRED_MAF_COLS
# (validate.py:14-133). 118 entries.
REQUIRED_MAF_COLS: list[str] = (
    "Hugo_Symbol Entrez_Gene_Id Center NCBI_Build Chromosome "
    "Start_Position End_Position Strand Consequence "
    "Variant_Classification Variant_Type Reference_Allele "
    "Tumor_Seq_Allele1 Tumor_Seq_Allele2 dbSNP_RS dbSNP_Val_Status "
    "Tumor_Sample_Barcode Matched_Norm_Sample_Barcode "
    "Match_Norm_Seq_Allele1 Match_Norm_Seq_Allele2 "
    "Tumor_Validation_Allele1 Tumor_Validation_Allele2 "
    "Match_Norm_Validation_Allele1 Match_Norm_Validation_Allele2 "
    "Verification_Status Validation_Status Mutation_Status "
    "Sequencing_Phase Sequence_Source Validation_Method Score BAM_File "
    "Sequencer n_ref_count n_alt_count HGVSc HGVSp HGVSp_Short "
    "Transcript_ID RefSeq Protein_position Codons Exon_Number AA_AF AF "
    "AFR_AF ALLELE_NUM AMR_AF ASN_AF Allele Amino_acids BIOTYPE CANONICAL "
    "CCDS CDS_position CLIN_SIG DISTANCE DOMAINS EAS_AF EA_AF ENSP EUR_AF "
    "EXON Existing_variation FILTER Feature Feature_type GENE_PHENO Gene "
    "HGNC_ID HGVS_OFFSET HIGH_INF_POS IMPACT INTRON MINIMISED MOTIF_NAME "
    "MOTIF_POS MOTIF_SCORE_CHANGE PHENO PICK PUBMED PolyPhen SAS_AF SIFT "
    "SOMATIC STRAND_VEP SWISSPROT SYMBOL SYMBOL_SOURCE TREMBL TSL UNIPARC "
    "VARIANT_CLASS all_effects cDNA_position flanking_bps "
    "genomic_location_explanation gnomADe_AF gnomADe_AFR_AF "
    "gnomADe_AMR_AF gnomADe_ASJ_AF gnomADe_EAS_AF gnomADe_FIN_AF "
    "gnomADe_NFE_AF gnomADe_OTH_AF gnomADe_SAS_AF n_depth t_depth "
    "t_ref_count t_alt_count vcf_id vcf_pos vcf_qual Annotation_Status "
    "Peptide HLA_Allele MHCflurry_2.1.1_affinity_nm "
    "MHCflurry_2.1.1_presentation_score "
).split()



def _field_type(name: str):
    if name in _LONG_COLS:
        return LongType()
    if name in _DOUBLE_COLS:
        return DoubleType()
    return StringType()


MAF_SCHEMA = StructType(
    [StructField(name, _field_type(name), nullable=True) for name in REQUIRED_MAF_COLS]
)
