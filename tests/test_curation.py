"""Corpus-curation operators: PII redaction, decontamination, repetition
removal, Gopher quality gates."""

from iatlas_cbioportal_export_spark.operators.curation import (
    decontaminate,
    gopher_quality,
    redact_pii,
    remove_repeated_paragraphs,
)


def test_redact_pii_all_categories(spark):
    df = spark.createDataFrame(
        [
            (1, "write to bob@example.com or 10.0.0.1 or 555-123-4567 now"),
            (2, "no pii here"),
            (3, "two mails a@b.io c@d.org and 192.168.1.255"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["text_redacted"] == "write to <EMAIL> or <IP> or <PHONE> now"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 1, 1)
    assert out[2]["text_redacted"] == "no pii here"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[3]["text_redacted"] == "two mails <EMAIL> <EMAIL> and <IP>"
    assert out[3]["n_email"] == 2 and out[3]["n_ipv4"] == 1


def test_redact_pii_email_host_not_rechewed(spark):
    # the email replacement runs before IP/phone so its host digits can't
    # be re-matched
    df = spark.createDataFrame(
        [(1, "x 1.2.3.4@mail.com y")], "doc_id long, text string"
    )
    row = redact_pii(df).collect()[0]
    assert row["text_redacted"] == "x <EMAIL> y"
    assert row["n_ipv4"] == 1  # counts are per-pattern on the ORIGINAL text


def test_decontaminate_flags_shared_ngrams(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "prefix words alpha beta gamma delta suffix"),  # contains 4-gram
            (2, "alpha beta nothing gamma delta"),  # no shared 4-gram
            (3, "unrelated text entirely here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=4).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert not out[3]["contaminated"]


def test_decontaminate_counts_distinct_grams_once(spark):
    bench = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
    # the shared 4-gram appears twice in the doc — distinct grams count once
    docs = spark.createDataFrame(
        [(1, "a b c d x a b c d")], "doc_id long, text string"
    )
    row = decontaminate(docs, bench, n=4).collect()[0]
    assert row["n_hits"] == 1


def test_remove_repeated_paragraphs_keeps_first_in_order(spark):
    df = spark.createDataFrame(
        [(1, "one\ntwo\none\nthree\ntwo"), (2, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_repeated_paragraphs(df).collect()}
    assert out[1]["text_clean"] == "one\ntwo\nthree"
    assert out[1]["n_paragraphs"] == 5 and out[1]["n_removed"] == 2
    assert out[2]["text_clean"] == "solo" and out[2]["n_removed"] == 0


def test_gopher_quality_rules(spark):
    good = "the and " + " ".join(f"word{i}" for i in range(60))
    short = "tiny text"
    symbols = "the " + " ".join("#" for _ in range(60))
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_quality(df, min_words=50).collect()}
    assert out[1]["passes"]
    assert not out[2]["ok_word_count"] and not out[2]["passes"]
    assert not out[3]["ok_symbol_ratio"] and not out[3]["ok_alpha_words"]
    assert not out[3]["passes"]


def test_gopher_quality_empty_text(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = gopher_quality(df).collect()[0]
    assert row["n_words"] == 0 and not row["passes"]


def test_normalize_text(spark):
    from iatlas_cbioportal_export_spark.operators.curation import normalize_text

    df = spark.createDataFrame(
        [
            (1, "  Hello\tWorld\x00 FOO\n\nbar  "),
            (2, "already clean"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert out[1]["text_norm"] == "hello world foo bar"
    assert out[1]["n_chars_removed"] > 0
    assert out[2]["text_norm"] == "already clean"
    assert out[2]["n_chars_removed"] == 0


def test_dsir_weights_prefer_target_like_docs(spark):
    from iatlas_cbioportal_export_spark.operators.curation import (
        dsir_importance_weights,
    )

    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps again"),   # target-like
            (2, "zzz qqq xxx vvv kkk www"),           # off-domain
            (3, ""),                                  # empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dsir_importance_weights(raw, target, dim=32).collect()}
    assert out[1]["dsir_weight"] > out[2]["dsir_weight"]
    assert out[3]["dsir_weight"] == 0.0 and out[3]["n_features"] == 0
    # unigrams + bigrams: 6 tokens -> 6 + 5 features
    assert out[1]["n_features"] == 11


def test_dsir_weights_deterministic_across_partitionings(spark):
    from iatlas_cbioportal_export_spark.operators.curation import (
        dsir_importance_weights,
    )

    rows = [(i, f"token{i % 7} filler common words here {i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = df.filter("doc_id % 5 = 0")
    a = dsir_importance_weights(df.repartition(1), tgt, dim=16).collect()
    b = dsir_importance_weights(df.repartition(13), tgt, dim=16).collect()
    assert {(r["doc_id"], r["dsir_weight"]) for r in a} == {
        (r["doc_id"], r["dsir_weight"]) for r in b
    }


def test_char_entropy_bands(spark):
    import math

    from iatlas_cbioportal_export_spark.operators.curation import (
        char_entropy_score,
    )

    rows = [
        (1, "aaaaaaaa"),          # degenerate -> 0
        (2, "abababab"),          # two classes -> ln 2
        (3, ""),                  # empty -> 0
        (4, "abcdefgh"),          # uniform 8 -> ln 8
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in char_entropy_score(df).collect()}
    assert out[1]["entropy"] == 0.0
    assert out[2]["entropy"] == round(math.log(2), 6)
    assert out[3] ["entropy"] == 0.0 and out[3]["n_chars"] == 0
    assert out[4]["entropy"] == round(math.log(8), 6)


def test_pii_pseudonym_map_stable_and_counted(spark):
    from iatlas_cbioportal_export_spark.operators.curation import (
        pii_pseudonym_map,
    )
    from iatlas_cbioportal_export_spark.functions.text import _FP_BASE, _FP_MOD

    df = spark.createDataFrame(
        [
            (1, "contact a@b.com and a@b.com again"),
            (2, "a@b.com cc x@y.org, server 10.0.0.1, call 555-123-4567"),
            (3, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {(r["kind"], r["value"]): r for r in pii_pseudonym_map(df).collect()}
    ab = out[("email", "a@b.com")]
    assert ab["n_docs"] == 2 and ab["n_occurrences"] == 3

    def fp(s):
        acc = 0
        for ch in s:
            acc = (acc * _FP_BASE + ord(ch)) % _FP_MOD
        return acc

    # same value -> same pseudonym, derived from the portable fingerprint
    assert ab["pseudonym"] == f"<EMAIL_{fp('a@b.com')}>"
    assert out[("ipv4", "10.0.0.1")]["pseudonym"] == f"<IPV4_{fp('10.0.0.1')}>"
    assert out[("phone", "555-123-4567")]["n_docs"] == 1
    assert ("email", "no") not in out and len(out) == 4


def test_nfc_normalize_composes_and_keeps_nulls(spark):
    from iatlas_cbioportal_export_spark.operators.curation import nfc_normalize

    decomposed = "cafe\u0301"      # e + COMBINING ACUTE
    composed = "caf\u00e9"         # single-codepoint e-acute
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, "ascii only"), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text_nfc"] for r in nfc_normalize(df).collect()}
    assert out[1] == composed and len(out[1]) == 4
    assert out[2] == composed          # already-NFC text is a fixpoint
    assert out[3] == "ascii only"
    assert out[4] is None


def test_canonicalize_urls_rules(spark):
    from iatlas_cbioportal_export_spark.operators.curation import (
        canonicalize_urls,
    )

    rows = [
        (1, "HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag"),
        (2, "http://example.com/a/b?a=1&b=2"),
        (3, "https://Example.com:443/a/b?a=1&b=2"),
        (4, "https://example.com:8443/a/b"),   # non-default port kept
        (5, "http://example.com/a/b?gclid=Z&fbclid=Y"),  # all tracking
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r["id"]: r["canonical_url"]
           for r in canonicalize_urls(df).collect()}
    assert out[1] == "http://example.com/a/b?a=1&b=2"
    assert out[2] == "http://example.com/a/b?a=1&b=2"
    assert out[3] == "https://example.com/a/b?a=1&b=2"
    assert out[4] == "https://example.com:8443/a/b"
    assert out[5] == "http://example.com/a/b"
    assert out[6] is None


def test_k_anonymity_report_sizes_and_l_diversity(spark):
    from iatlas_cbioportal_export_spark.operators.curation import (
        k_anonymity_report,
    )

    rows = (
        # class (30, x): 5 members, 2 sensitive values -> safe at k=5
        [(30, "x", f"d{i % 2}") for i in range(5)]
        # class (30, y): 3 members -> k-violation
        + [(30, "y", f"d{i}") for i in range(3)]
        # class (40, x): 6 members but ONE sensitive value -> l=1 leak
        + [(40, "x", "d9")] * 6
    )
    df = spark.createDataFrame(rows, "age long, zip string, diag string")
    got = {
        (r.age, r.zip): (r.class_size, r.l_diversity)
        for r in k_anonymity_report(
            df, ["age", "zip"], "diag", k=5
        ).collect()
    }
    assert got == {(30, "y"): (3, 3), (40, "x"): (6, 1)}
    # without a sensitive column: only the size rule, no l_diversity col
    plain = k_anonymity_report(df, ["age", "zip"], k=5)
    assert plain.columns == ["age", "zip", "class_size"]
    assert {(r.age, r.zip) for r in plain.collect()} == {(30, "y")}


def test_k_anonymity_null_sensitive_is_a_distinct_state(spark):
    # NULL counts as a sensitive state of its own: an all-NULL class is
    # homogeneous (l=1, reported even at size >= k) and a {NULL, value}
    # class has l=2 (safe). Bare countDistinct would score the all-NULL
    # class 0 and silently pass it through the privacy gate.
    from iatlas_cbioportal_export_spark.operators.curation import (
        k_anonymity_report,
    )

    rows = (
        # class (50, x): 6 members, ALL NULL sensitive -> l=1 leak
        [(50, "x", None)] * 6
        # class (50, y): 6 members, NULL + one value -> l=2, safe
        + [(50, "y", None)] * 3
        + [(50, "y", "d1")] * 3
    )
    df = spark.createDataFrame(rows, "age long, zip string, diag string")
    got = {
        (r.age, r.zip): (r.class_size, r.l_diversity)
        for r in k_anonymity_report(
            df, ["age", "zip"], "diag", k=5
        ).collect()
    }
    assert got == {(50, "x"): (6, 1)}
