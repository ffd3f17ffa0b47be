"""Dataset mixing: deterministic per-group sampling for training-data
mixture weights, plus PII scrubbing.

``deterministic_sample`` keeps a row iff
portable_u01(id) < fraction(group): a pure function of the row's id and
the seed — re-running, re-partitioning, or re-reading the input yields
the SAME sample (unlike ``DataFrame.sample``/``sampleBy``, whose output
depends on partitioning and evaluation order). That reproducibility is
what a training pipeline needs: the mixture is an auditable property of
the dataset, not of the job that happened to materialize it. The
uniform comes from the md5-u64 portable hash (hashing.md5_u64_spark),
so a DuckDB twin reproduces membership EXACTLY — the correctness gate
compares the sampled ids value-for-value, not just counts.

``scrub_pii`` redacts emails / international-ish phone numbers / IPv4s
with conservative regexes that mean the same thing in Spark (Java regex)
and DuckDB (RE2), single pass per pattern, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cardinality_estimation_evaluation_framework_spark.hashing import (
    md5_u64_duckdb,
    md5_u64_spark,
)

# conservative, dialect-portable patterns (no lookaround, no \b on RE2
# edge cases beyond word chars)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}
_REDACTED = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}


def _sql_str(s: str) -> str:
    """Escape a Python string for splicing into a single-quoted SQL
    literal (doubles embedded quotes — ``o'reilly`` -> ``o''reilly``)."""
    return str(s).replace("'", "''")


def _u01(col: Column) -> Column:
    """Deterministic uniform in [0, 1): portable md5-u64 of the id, top 53
    bits (exact in double) / 2^53. Signed int64 -> unsigned via the
    shiftrightunsigned by 11 (the sign bit lands in the mantissa range)."""
    return F.shiftrightunsigned(md5_u64_spark(col), 11) / F.lit(float(1 << 53))


def _u01_duckdb(expr: str) -> str:
    return f"CAST(({md5_u64_duckdb(expr)} >> 11) AS DOUBLE) / {float(1 << 53)}"


# beyond this many groups the chained-CASE fraction lookup is replaced by
# a broadcast join against a fractions table: Catalyst keeps every CASE
# branch as a separate expression node, so a thousand-domain mixture would
# bloat the plan (same failure shape as the lang-ID 2^k argmax blowup,
# SCALE.md) — while a broadcast hash join against a #groups-row table is
# O(1) per row regardless of map size
_CASE_CHAIN_MAX = 64


def deterministic_sample(df: DataFrame, fractions: dict[str, float],
                         group_col: str = "source",
                         id_col: str = "doc_id",
                         seed: int = 0,
                         default_fraction: float = 0.0,
                         use_join: bool | None = None) -> DataFrame:
    """Keep each row iff u01(seed || id) < fraction of its group.

    Groups absent from ``fractions`` fall back to ``default_fraction``
    (0.0 = drop, 1.0 = keep all). The decision never looks at other rows:
    no shuffle, no state — the filter rides the scan and the same row is
    kept in every run, any partitioning.

    Fraction lookup: a chained CASE for small maps (stays inside the
    scan's codegen stage), a broadcast join against a #groups-row
    fractions table beyond ``_CASE_CHAIN_MAX`` groups (``use_join``
    overrides the auto choice; membership is identical either way — the
    kept set is a pure function of (seed, id, fraction), not of the plan).
    """
    u = _u01(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    if use_join is None:
        use_join = len(fractions) > _CASE_CHAIN_MAX
    if use_join and fractions:
        spark = df.sparkSession
        ftab = spark.createDataFrame(
            [(str(g), float(p)) for g, p in sorted(fractions.items())],
            "_ds_group string, _ds_frac double",
        )
        frac = F.coalesce(F.col("_ds_frac"), F.lit(float(default_fraction)))
        return (
            df.join(
                F.broadcast(ftab),
                F.col(group_col).cast("string") == F.col("_ds_group"),
                "left",
            )
            .where(u < frac)
            .drop("_ds_group", "_ds_frac")
        )
    frac = None
    for g, p in sorted(fractions.items()):
        cond = F.col(group_col).cast("string") == g
        frac = F.when(cond, F.lit(float(p))) if frac is None else frac.when(cond, F.lit(float(p)))
    frac = F.lit(float(default_fraction)) if frac is None else frac.otherwise(
        F.lit(float(default_fraction)))
    return df.where(u < frac)


def deterministic_sample_sql(fractions: dict[str, float],
                             group_col: str = "source",
                             id_col: str = "doc_id",
                             seed: int = 0,
                             default_fraction: float = 0.0,
                             source_sql: str = "SELECT * FROM documents") -> str:
    """DuckDB twin of :func:`deterministic_sample` (same kept rows)."""
    u = _u01_duckdb(f"'{seed}|' || CAST({id_col} AS VARCHAR)")
    cases = " ".join(
        f"WHEN CAST({group_col} AS VARCHAR) = '{_sql_str(g)}' THEN {float(p)}"
        for g, p in sorted(fractions.items())
    )
    frac = f"(CASE {cases} ELSE {float(default_fraction)} END)" if cases else (
        str(float(default_fraction)))
    return f"SELECT * FROM ({source_sql}) WHERE {u} < {frac}"


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str | None = None) -> DataFrame:
    """Redact emails/phones/IPv4s (one regexp_replace pass per pattern)
    and attach per-row redaction counts n_pii_<kind>."""
    out_col = out_col or text_col
    scrubbed = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        df = df.withColumn(
            f"n_pii_{kind}",
            F.regexp_count(scrubbed, F.lit(pat)).cast("int"),
        )
        scrubbed = F.regexp_replace(scrubbed, pat, _REDACTED[kind])
    return df.withColumn(out_col, scrubbed)


def scrub_pii_sql(text_col: str = "text") -> dict[str, str]:
    """DuckDB twins: expressions for the scrubbed text and per-kind
    counts. Application order matters (email before phone/ip, matching
    scrub_pii's dict order) because redaction can destroy later matches;
    counts are measured on the PROGRESSIVELY scrubbed text like the
    Spark side."""
    exprs = {}
    scrubbed = text_col
    for kind, pat in PII_PATTERNS.items():
        exprs[f"n_pii_{kind}"] = (
            f"CAST(len(regexp_extract_all({scrubbed}, '{pat}')) AS INT)"
        )
        scrubbed = (
            f"regexp_replace({scrubbed}, '{pat}', '{_REDACTED[kind]}', 'g')"
        )
    exprs["scrubbed"] = scrubbed
    return exprs


def deterministic_sample_k(df: DataFrame, k: int,
                           group_col: str = "source",
                           id_col: str = "doc_id",
                           seed: int = 0) -> DataFrame:
    """Keep exactly min(k, |group|) rows per group: the k rows whose
    portable u01(seed || id) rank lowest (ties broken by id). A uniform
    without-replacement sample that, like :func:`deterministic_sample`,
    is a pure function of (seed, id) — identical under any partitioning,
    any run, and reproducible by the DuckDB twin value-for-value.

    Scale posture (100 TB): the rank filter sits directly above the
    window, so Catalyst rewrites it to WindowGroupLimit (Spark 3.5+) —
    each map task keeps only its local top-k per group BEFORE the
    shuffle, so at most (#partitions x k) rows per group ever move; the
    plan audit asserts the WindowGroupLimit node. Hot groups therefore
    cost O(k) per task, not O(|group| log |group|) at the reducer.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = _u01(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    w = (Window.partitionBy(F.col(group_col).cast("string"))
         .orderBy(u.asc(), F.col(id_col).cast("string").asc()))
    return (
        df.withColumn("_sk_rn", F.row_number().over(w))
        .where(F.col("_sk_rn") <= k)
        .drop("_sk_rn")
    )


def deterministic_sample_k_sql(k: int,
                               group_col: str = "source",
                               id_col: str = "doc_id",
                               seed: int = 0,
                               source_sql: str = "SELECT * FROM documents",
                               ) -> str:
    """DuckDB twin of :func:`deterministic_sample_k` (same kept rows —
    the u01 rank is an exactly-representable 53-bit double on both
    sides, so the orderings agree bit-for-bit)."""
    u = _u01_duckdb(f"'{seed}|' || CAST({id_col} AS VARCHAR)")
    return f"""
SELECT * FROM ({source_sql})
QUALIFY row_number() OVER (
  PARTITION BY CAST({group_col} AS VARCHAR)
  ORDER BY {u}, CAST({id_col} AS VARCHAR)) <= {int(k)}
"""
