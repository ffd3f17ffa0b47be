"""Randomized differential gate: draw random operator configs AND random
small corpora, run the Spark operator and its DuckDB SQL twin on the
same input, and compare value-exactly.

The fixed-parameter oracle gate (tools/check_oracles.py) pins one config
per operator; the residual correctness risk is parameter-dependent edge
cases — odd rows_per_band splits, tiny register counts, n=1 grams,
empty/NULL/unicode texts, quoted group names. Every twin builder in the
package is parameterized, so this is a driver loop: each trial derives
its config and its corpus deterministically from (master_seed, trial).

Usage:
    python tools/fuzz_oracles.py [n_trials] [master_seed]

Prints one line per trial (family, params digest, OK/MISMATCH) and a
summary; exit 1 on any mismatch. Writes FUZZ.json with the full record.
"""

from __future__ import annotations

import json
import random
import sys
import time

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracles import normalize

from cardinality_estimation_evaluation_framework_spark.operators import (
    aggregate as agg,
    decontam as decontam_ops,
    dedup as dedup_ops,
    mixing as mixing_ops,
    text as text_ops,
)
from cardinality_estimation_evaluation_framework_spark.session import get_spark
from cardinality_estimation_evaluation_framework_spark.sketches.countmin import (
    _PORTABLE_AB,
    CountMinKernel,
)
from cardinality_estimation_evaluation_framework_spark.sketches.hll import (
    PortableHllKernel,
)
from cardinality_estimation_evaluation_framework_spark.sketches.vector_of_counts import (
    VocKernel,
)

# vocabulary mixing language markers (so lang-ID is non-trivial), digits,
# and plain filler — word split on both engines is [^a-z0-9]+
_WORDS = (
    "the and of to is der die und das el la los que le et les est "
    "alpha beta gamma delta data spark duck oracle fuzz gate word "
    "x1 y2 z3 42 7 999 corpus token"
).split()
_PUNCT = ["", "", ",", ".", "!", "?", ";", ":", "—", "…"]
_SPECIALS = [
    "",  # empty doc
    "one",  # single word (below most n-gram thresholds)
    "o'reilly café naïve 日本語 text",  # unicode + quote
    "aaa aaa aaa aaa aaa",  # maximal repetition
    "The THE the tHe",  # case folding
    "dup line\ndup line\nother\n\npara\n\npara",  # line/paragraph dups
    "  \n \n\n  ",  # whitespace-only lines
]


def rand_text(rng: random.Random, max_words: int = 30) -> str | None:
    roll = rng.random()
    if roll < 0.06:
        return None
    if roll < 0.18:
        return rng.choice(_SPECIALS)
    n = rng.randint(1, max_words)
    sep = lambda: "\n" if rng.random() < 0.07 else " "  # occasional newlines
    out = ""
    for i in range(n):
        out += ("" if i == 0 else sep()) + rng.choice(_WORDS) + rng.choice(_PUNCT)
    return out


def rand_docs(rng: random.Random, spark, n_docs: int = 40,
              dup_frac: float = 0.3):
    """(spark_df, pandas_df) of a random doc corpus with planted exact and
    near duplicates (so pair-finding families produce non-empty outputs)."""
    rows = []
    for i in range(n_docs):
        rows.append((str(i), rand_text(rng), f"src{i % 3}"))
    n_dups = int(n_docs * dup_frac)
    for j in range(n_dups):
        base = rows[rng.randrange(len(rows))]
        txt = base[1]
        if txt and rng.random() < 0.5:  # near-dup: perturb one word
            words = txt.split()
            if words:
                words[rng.randrange(len(words))] = rng.choice(_WORDS)
            txt = " ".join(words)
        rows.append((str(n_docs + j), txt, f"src{j % 3}"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    sdf = spark.createDataFrame(rows, "doc_id string, text string, source string")
    return sdf, pdf


def compare(spark_df, con, sql: str) -> str | None:
    """None if value-exact, else a one-line diff description."""
    a = normalize(spark_df.toPandas())
    b = normalize(con.execute(sql).df())
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return f"cols {list(a.columns)} vs {list(b.columns)}; rows {len(a)} vs {len(b)}"
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)
    except AssertionError as e:
        return str(e).splitlines()[0]
    return None


# ---------------- families ----------------
# each: (rng, spark, con) -> (params_desc, mismatch_or_None)


def fam_hll(rng, spark, con):
    p = rng.randint(4, 14)
    a = rng.randrange(3, 2**31, 2)
    b = rng.randrange(0, 2**31)
    n = rng.choice([0, 1, 7, 200, 2000])
    vals = [rng.randrange(0, 2**31) for _ in range(n)]
    vals += vals[: n // 3]  # duplicates
    kernel = PortableHllKernel(p=p, a=a, b=b)
    items = spark.createDataFrame([(v,) for v in vals], "item long")
    state = agg.sketch(items, kernel)
    rows = [(int(i), int(r)) for i, r in enumerate(state["registers"].tolist()) if r > 0]
    sdf = spark.createDataFrame(rows, "bucket int, rho int")
    con.register("items", pd.DataFrame({"item": pd.Series(vals, dtype="int64")}))
    sql = (
        f"SELECT bucket, max(rho) AS rho FROM ("
        f"SELECT {kernel.register_sql('item')} FROM items) GROUP BY bucket"
    )
    return f"p={p} a={a} b={b} n={len(vals)}", compare(sdf, con, sql)


def fam_voc(rng, spark, con):
    m = rng.choice([1, 2, 13, 64, 257, 4096])
    seed = rng.randrange(0, 2**31)
    n = rng.choice([0, 1, 50, 1500])
    vals = sorted({rng.randrange(0, 2**31) for _ in range(n)})
    kernel = VocKernel(num_buckets=m, seed=seed, portable=True)
    items = spark.createDataFrame([(v,) for v in vals], "item long")
    state = agg.sketch(items, kernel)
    rows = [(int(i), int(c)) for i, c in enumerate(state["stats"].tolist()) if c > 0]
    sdf = spark.createDataFrame(rows, "bucket int, cnt int")
    con.register("items", pd.DataFrame({"item": pd.Series(vals, dtype="int64")}))
    sql = (
        f"SELECT bucket, CAST(count(*) AS INT) AS cnt FROM ("
        f"SELECT {kernel.bucket_sql('item')} AS bucket FROM items) GROUP BY bucket"
    )
    return f"m={m} seed={seed} n={len(vals)}", compare(sdf, con, sql)


def fam_countmin(rng, spark, con):
    width = rng.choice([2, 3, 17, 256, 1024])
    depth = rng.randint(1, len(_PORTABLE_AB))
    seed = rng.randrange(0, 2**20)
    n = rng.choice([0, 1, 300, 2500])
    vals = [rng.randrange(0, 2**31) for _ in range(n)]
    vals += vals[: n // 2]  # multiset: duplicates count
    kernel = CountMinKernel(width=width, depth=depth, seed=seed, portable=True)
    items = spark.createDataFrame([(v,) for v in vals], "item long")
    state = agg.sketch(items, kernel)
    rows = [
        (int(r), int(b), int(state["table"][r, b]))
        for r in range(depth) for b in range(width)
        if state["table"][r, b] > 0
    ]
    sdf = spark.createDataFrame(rows, "r int, bucket int, cnt int")
    con.register("items", pd.DataFrame({"item": pd.Series(vals, dtype="int64")}))
    sql = " UNION ALL ".join(
        f"SELECT {r} AS r, bucket, CAST(count(*) AS INT) AS cnt FROM ("
        f"SELECT {kernel.row_bucket_sql('item', r)} AS bucket FROM items"
        f") GROUP BY bucket"
        for r in range(depth)
    ) or "SELECT 0 AS r, 0 AS bucket, 0 AS cnt WHERE false"
    return f"w={width} d={depth} seed={seed} n={len(vals)}", compare(sdf, con, sql)


def fam_minhash(rng, spark, con):
    num_hashes = rng.randint(4, 48)
    bands = rng.randint(1, num_hashes)  # non-dividing splits on purpose
    threshold = round(rng.uniform(0.0, 0.9), 2)
    n = rng.randint(1, 4)
    seed = rng.randrange(0, 10**6)
    docs, pdf = rand_docs(rng, spark)
    got = dedup_ops.minhash_dedup_pairs(
        docs, threshold=threshold, num_hashes=num_hashes, bands=bands,
        n=n, seed=seed, persist=False, portable=True,
    )
    con.register("documents", pdf)
    sql = dedup_ops.minhash_dedup_pairs_sql(
        threshold=threshold, num_hashes=num_hashes, bands=bands, n=n, seed=seed,
    )
    desc = f"k={num_hashes} bands={bands} t={threshold} n={n} seed={seed}"
    return desc, compare(got, con, sql)


def fam_simhash(rng, spark, con):
    max_hamming = rng.randint(0, 12)
    seed = rng.randrange(0, 10**6)
    docs, pdf = rand_docs(rng, spark)
    got = dedup_ops.simhash_near_dup_pairs(
        docs, max_hamming=max_hamming, seed=seed, portable=True,
    )
    con.register("documents", pdf)
    sql = dedup_ops.simhash_near_dup_pairs_sql(max_hamming=max_hamming, seed=seed)
    return f"ham={max_hamming} seed={seed}", compare(got, con, sql)


def fam_jaccard(rng, spark, con):
    n = rng.randint(1, 4)
    threshold = round(rng.uniform(0.0, 0.8), 2)
    docs, pdf = rand_docs(rng, spark, n_docs=25)
    got = dedup_ops.ngram_jaccard_pairs(docs, n=n, threshold=threshold)
    con.register("documents", pdf)
    sql = dedup_ops.ngram_jaccard_pairs_sql(n=n, threshold=threshold)
    return f"n={n} t={threshold}", compare(got, con, sql)


def fam_decontam(rng, spark, con):
    n = rng.randint(2, 6)
    min_hits = rng.randint(1, 3)
    mod = rng.choice([3, 5, 7])
    docs, pdf = rand_docs(rng, spark)
    bench = docs.where(F.col("doc_id").cast("long") % mod == 0)
    got = decontam_ops.ngram_overlap_exact(docs, bench, n=n, min_hits=min_hits)
    con.register("documents", pdf)
    sql = decontam_ops.ngram_overlap_exact_sql(
        n=n, min_hits=min_hits,
        bench_sql=f"SELECT * FROM documents WHERE CAST(doc_id AS BIGINT) % {mod} = 0",
    )
    return f"n={n} min_hits={min_hits} mod={mod}", compare(got, con, sql)


def fam_sample(rng, spark, con):
    groups = rng.sample(
        ["src0", "src1", "src2", "o'reilly", 'qu"ote', "café", "with space"], 4
    )
    fractions = {g: round(rng.random(), 3) for g in groups}
    seed = rng.randrange(0, 10**6)
    default = rng.choice([0.0, 0.15, 1.0])
    docs, pdf = rand_docs(rng, spark)
    # rename a slice of sources to the exotic group names
    docs = docs.withColumn(
        "source",
        F.when(F.col("doc_id").cast("long") % 4 == 0, F.lit(groups[0]))
        .when(F.col("doc_id").cast("long") % 4 == 1, F.lit(groups[1]))
        .otherwise(F.col("source")),
    ).select("doc_id", "source")
    pdf = pdf.copy()
    ids = pdf["doc_id"].astype("int64")
    pdf["source"] = np.where(
        ids % 4 == 0, groups[0], np.where(ids % 4 == 1, groups[1], pdf["source"])
    )
    got = mixing_ops.deterministic_sample(
        docs, fractions, seed=seed, default_fraction=default)
    con.register("documents", pdf[["doc_id", "source"]])
    sql = mixing_ops.deterministic_sample_sql(
        fractions, seed=seed, default_fraction=default,
        source_sql="SELECT doc_id, source FROM documents",
    )
    return f"groups={groups} seed={seed} default={default}", compare(got, con, sql)


def fam_textstats(rng, spark, con):
    docs, pdf = rand_docs(rng, spark, n_docs=30)
    got = text_ops.with_token_counts(
        text_ops.with_quality_score(text_ops.with_lang_id(docs))
    ).select("doc_id", "lang_pred", "quality_score", "n_tok_ws", "n_tok_bpe")
    con.register("documents", pdf)
    tc = text_ops.token_counts_sql("text")
    sql = (
        f"SELECT doc_id, {text_ops.lang_id_sql('text')} AS lang_pred, "
        f"{text_ops.quality_score_sql('text')} AS quality_score, "
        f"coalesce({tc['n_tok_ws']}, 0) AS n_tok_ws, "
        f"coalesce({tc['n_tok_bpe']}, 0) AS n_tok_bpe "
        f"FROM documents"
    )
    # NULL text: Spark token counts are NULL too — align by coalescing both
    got = got.fillna(0, subset=["n_tok_ws", "n_tok_bpe"])
    return "corpus-only", compare(got, con, sql)


def fam_fingerprint(rng, spark, con):
    docs, pdf = rand_docs(rng, spark, n_docs=30)
    got = text_ops.with_fingerprint(docs).select("doc_id", "fingerprint")
    con.register("documents", pdf)
    sql = (
        f"SELECT doc_id, {text_ops.fingerprint_sql('text')} AS fingerprint "
        f"FROM documents"
    )
    return "corpus-only", compare(got, con, sql)


def fam_repetition(rng, spark, con):
    docs, pdf = rand_docs(rng, spark, n_docs=30)
    got = text_ops.with_repetition_stats(docs).select(
        "doc_id", "word_rep_frac", *text_ops.TOP_NGRAM_COLS.values(),
        "dup_line_frac", "dup_para_frac")
    con.register("documents", pdf)
    sql = text_ops.repetition_stats_sql()
    return "corpus-only", compare(got, con, sql)


def fam_pii(rng, spark, con):
    docs, pdf = rand_docs(rng, spark, n_docs=25)
    # plant PII on a third of docs (same plant both sides via the corpus)
    plant = " reach me: u%s@example.org or +44 20 7946 0958 at 192.168.1.%d"
    rows = [
        (r.doc_id, (r.text or "") + (plant % (r.doc_id, int(r.doc_id) % 250))
         if int(r.doc_id) % 3 == 0 else r.text)
        for r in pdf.itertuples(index=False)
    ]
    pdf2 = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs2 = spark.createDataFrame(rows, "doc_id string, text string")
    got = mixing_ops.scrub_pii(docs2, out_col="scrubbed").select(
        "doc_id", "scrubbed", "n_pii_email", "n_pii_phone", "n_pii_ipv4")
    con.register("documents", pdf2)
    ex = mixing_ops.scrub_pii_sql("text")
    sql = (
        f"SELECT doc_id, {ex['scrubbed']} AS scrubbed, "
        f"{ex['n_pii_email']} AS n_pii_email, {ex['n_pii_phone']} AS n_pii_phone, "
        f"{ex['n_pii_ipv4']} AS n_pii_ipv4 FROM documents"
    )
    return "planted-pii", compare(got, con, sql)


FAMILIES = [
    ("hll_portable", fam_hll),
    ("voc_portable", fam_voc),
    ("countmin_portable", fam_countmin),
    ("minhash_lsh", fam_minhash),
    ("simhash", fam_simhash),
    ("ngram_jaccard", fam_jaccard),
    ("decontam_exact", fam_decontam),
    ("deterministic_sample", fam_sample),
    ("text_stats", fam_textstats),
    ("fingerprint", fam_fingerprint),
    ("repetition_stats", fam_repetition),
    ("pii_scrub", fam_pii),
]


def run(n_trials: int, master_seed: int, spark=None) -> dict:
    spark = spark or get_spark("fuzz-oracles", cores=8)
    results = []
    failures = 0
    t_start = time.time()
    for trial in range(n_trials):
        fam_name, fam = FAMILIES[trial % len(FAMILIES)]
        rng = random.Random(f"{master_seed}|{trial}")
        con = duckdb.connect()
        t0 = time.time()
        try:
            desc, mismatch = fam(rng, spark, con)
        except Exception as e:  # a crash on either engine is a failure too
            desc, mismatch = "<crashed>", f"{type(e).__name__}: {e}"
        finally:
            con.close()
        ok = mismatch is None
        failures += 0 if ok else 1
        results.append({
            "trial": trial, "family": fam_name, "params": desc,
            "ok": ok, "err": mismatch, "sec": round(time.time() - t0, 2),
        })
        print(f"  [{trial:3d}] {fam_name:20s} {desc:55s} "
              f"{'OK' if ok else 'MISMATCH: ' + str(mismatch)[:120]}")
    summary = {
        "n_trials": n_trials, "master_seed": master_seed,
        "failures": failures, "total_sec": round(time.time() - t_start, 1),
        "results": results,
    }
    return summary


def main() -> int:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    master_seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260817
    summary = run(n_trials, master_seed)
    with open("/root/repo/FUZZ.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"FUZZ: {summary['n_trials']} trials, {summary['failures']} failures, "
          f"{summary['total_sec']}s -> FUZZ.json")
    return 1 if summary["failures"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
