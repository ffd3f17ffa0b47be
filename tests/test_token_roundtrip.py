"""Per-row invariant (BASELINE.json input_hint): token-array equality —
the tokens arrays, run through the exploded pipeline and reassembled per
doc_id, must reconstruct the original arrays exactly (order preserved)."""

from pyspark.sql import functions as F

from cardinality_estimation_evaluation_framework_spark.datagen import tokens as tk


def test_tokenize_vocab_roundtrip_exact(spark, docs):
    tokens_tbl = tk.tokenize_vocab(docs).cache()
    # explode with position, then reassemble in order
    exploded = tokens_tbl.select(
        "doc_id", F.posexplode("tokens").alias("pos", "tid")
    )
    rebuilt = (
        exploded.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"],
            ).alias("tokens2")
        )
    )
    joined = tokens_tbl.join(rebuilt, "doc_id")
    mismatches = joined.where(F.col("tokens") != F.col("tokens2")).count()
    assert mismatches == 0
    # n_tok consistent
    assert tokens_tbl.where(F.size("tokens") != F.col("n_tok")).count() == 0


def test_tokenize_vocab_matches_raw_text_tokens(spark, docs):
    """The vocab-id arrays decode back to the exact token strings of the
    original text (full pipeline inverse check on a sample)."""
    v = tk.vocab(docs)
    id2tok = {r["tid"]: r["tok"] for r in v.collect()}
    sample = tk.tokenize_vocab(docs).join(
        docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text"), "doc_id"
    ).limit(50).collect()
    import re

    for row in sample:
        expected = [t for t in re.split("[^a-z0-9]+", row["text"].lower()) if t]
        decoded = [id2tok[t] for t in row["tokens"]]
        assert decoded == expected, row["doc_id"]


def test_tokenize_hashed_counts_match_vocab_path(spark, docs):
    a = tk.tokenize_hashed(docs).select("doc_id", "n_tok")
    b = tk.tokenize_vocab(docs).select("doc_id", "n_tok")
    assert a.join(b, "doc_id").where(a.n_tok != b.n_tok).count() == 0
