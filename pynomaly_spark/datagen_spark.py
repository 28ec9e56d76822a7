"""Distributed synthetic code-table generator (Catalyst-native).

The pandas generator (:mod:`pynomaly_spark.datagen`) is fine for unit
fixtures; benchmark inputs of 10M+ rows need to be generated IN Spark.
Everything here is deterministic expression code seeded by ``xxhash64(id,
seed)`` — no Python per row, no RNG state, rerun-identical output.

Same table family as the pandas generator (files / commits / sha_oracle)
with exactly-counted planted defects carved out of disjoint id ranges
(duplicates, RI orphans, NULL lang, NULL content) and a drifted length
distribution in one lang partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datagen import _LANGS, _WORDS

__all__ = ["generate_code_table_spark", "write_code_table_spark", "DATAGEN_VERSION"]

# bump when generated content/defect planting changes so benchmark caches
# keyed on (version, rows) regenerate instead of serving stale tables
DATAGEN_VERSION = 2


def _u(col, seed: int):
    """Deterministic uniform [0,1) from the row id."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)


def generate_code_table_spark(
    spark: SparkSession,
    n_rows: int,
    seed: int = 7,
    n_repos: int = 200,
    hot_repo_share: float = 0.30,
    dup_rows: int | None = None,
    orphan_rows: int | None = None,
    null_lang_rows: int | None = None,
    null_content_rows: int | None = None,
):
    """Return ``(files, commits, expected)``; files has no sha column."""
    dup_rows = dup_rows if dup_rows is not None else max(25, n_rows // 2000)
    orphan_rows = (
        orphan_rows if orphan_rows is not None else max(40, n_rows // 2000)
    )
    null_lang_rows = (
        null_lang_rows if null_lang_rows is not None else max(30, n_rows // 3000)
    )
    null_content_rows = (
        null_content_rows
        if null_content_rows is not None
        else max(20, n_rows // 4000)
    )

    base = spark.range(n_rows)  # id
    rid = F.col("id")

    # zipf-ish repo skew: hot repo takes hot_repo_share, the rest decay
    u_repo = _u(rid, seed + 1)
    cold = F.floor(
        F.pow(u_repo, F.lit(2.0)) * F.lit(float(n_repos - 1))
    ) + 1
    repo_idx = F.when(
        _u(rid, seed + 2) < hot_repo_share, F.lit(0)
    ).otherwise(cold)
    repo = F.concat(
        F.lit("org"), (repo_idx % 7).cast("string"),
        F.lit("/repo"), repo_idx.cast("string"),
    )

    # lang with a dominant-python boost (skew for the salting story)
    langs_arr = F.array(*[F.lit(l) for l in _LANGS])
    lang_pick = F.get(
        langs_arr,
        F.pmod(F.xxhash64(rid, F.lit(seed + 3)), F.lit(len(_LANGS))).cast("int"),
    )
    lang = F.when(_u(rid, seed + 4) < 0.4, F.lit("python")).otherwise(lang_pick)

    # ~20 commits per repo, sha-shaped
    commit = F.substring(
        F.sha2(
            F.concat(
                repo,
                F.lit(":"),
                F.pmod(F.xxhash64(rid, F.lit(seed + 5)), F.lit(20)).cast(
                    "string"
                ),
            ),
            256,
        ),
        1,
        40,
    )

    # content: seeded pseudo-code, exponential length.  The drifted
    # partition (lang=c) plants anomalies at TWO grains:
    #  - 0.2% individually-extreme rows (two orders of magnitude outside
    #    the length cloud).  Kept RARER THAN k per drift sub-fit so they
    #    stay LOCAL outliers at any scale — a denser anomalous
    #    subpopulation forms its own mode at 10^5+ rows and LoOP
    #    (correctly) stops calling its members outliers;
    #  - a moderate shift on another 10% of rows that moves the
    #    partition's length QUANTILES (caught by the quantile check).
    u_len = _u(rid, seed + 6)
    n_words = (
        F.lit(10) + F.floor(-60.0 * F.log(u_len + F.lit(1e-9)))
    ).cast("int")
    u_drift = _u(rid, seed + 7)
    extreme = (lang == "c") & (u_drift < 0.002)
    shifted = (lang == "c") & (u_drift >= 0.002) & (u_drift < 0.102)
    n_words = (
        F.when(
            extreme,
            (
                F.lit(20000)
                + F.floor(-5000.0 * F.log(_u(rid, seed + 8) + F.lit(1e-9)))
            ).cast("int"),
        )
        .when(
            shifted,
            (
                F.lit(150)
                + F.floor(-120.0 * F.log(_u(rid, seed + 8) + F.lit(1e-9)))
            ).cast("int"),
        )
        .otherwise(n_words)
    )
    words_arr = F.array(*[F.lit(w) for w in _WORDS])
    content = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.get(
                words_arr,
                F.pmod(F.xxhash64(rid, i.cast("long")), F.lit(len(_WORDS))).cast(
                    "int"
                ),
            ),
        ),
        " ",
    )

    path = F.concat(
        F.lit("src/"), lang, F.lit("/mod_"), (rid % 97).cast("string"),
        F.lit("/file_"), rid.cast("string"), F.lit("."), F.substring(lang, 1, 2),
    )

    files = base.select(
        rid.alias("id"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )

    # planted defects in DISJOINT id ranges (no cross-contamination):
    # [0, dup)                -> rows duplicated verbatim
    # [dup, dup+nl)           -> NULL lang
    # [dup+nl, dup+nl+nc)     -> NULL content
    nl_lo, nl_hi = dup_rows, dup_rows + null_lang_rows
    nc_lo, nc_hi = nl_hi, nl_hi + null_content_rows
    files = files.withColumn(
        "lang",
        F.when((rid >= nl_lo) & (rid < nl_hi), F.lit(None)).otherwise(
            F.col("lang")
        ),
    ).withColumn(
        "content",
        F.when((rid >= nc_lo) & (rid < nc_hi), F.lit(None)).otherwise(
            F.col("content")
        ),
    )

    dups = files.where(rid < dup_rows)

    orphans = spark.range(orphan_rows).select(
        (F.col("id") + n_rows).alias("id"),
        F.concat(
            F.lit("org"), (F.col("id") % 7).cast("string"),
            F.lit("/repo"), (F.col("id") % n_repos).cast("string"),
        ).alias("repo"),
        F.concat(F.lit("src/orphan/file_"), F.col("id").cast("string"), F.lit(".py")).alias(
            "path"
        ),
        F.substring(
            F.sha2(F.concat(F.lit("orphan:"), F.col("id").cast("string")), 256),
            1,
            40,
        ).alias("commit"),
        F.lit("python").alias("lang"),
        F.lit("def orphan(): return 0").alias("content"),
    )

    all_files = files.unionByName(dups).unionByName(orphans).drop("id")

    # key table: every (repo, commit) except the orphan commits
    commits = (
        files.select("repo", "commit").distinct()
    )

    expected = {
        "dup_extra_rows": dup_rows,
        "orphan_rows": orphan_rows,
        "null_lang_rows": null_lang_rows,
        "null_content_rows": null_content_rows,
        "total_rows": n_rows + dup_rows + orphan_rows,
        "drift_partition": "lang=c",
    }
    return all_files, commits, expected


def write_code_table_spark(
    spark: SparkSession, out_dir: str, n_rows: int, seed: int = 7, **kw
):
    files, commits, expected = generate_code_table_spark(
        spark, n_rows, seed=seed, **kw
    )
    files.write.mode("overwrite").parquet(f"{out_dir}/files.parquet")
    files_back = spark.read.parquet(f"{out_dir}/files.parquet")
    commits.write.mode("overwrite").parquet(f"{out_dir}/commits.parquet")
    files_back.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("content_sha")
    ).write.mode("overwrite").parquet(f"{out_dir}/sha_oracle.parquet")
    return expected
