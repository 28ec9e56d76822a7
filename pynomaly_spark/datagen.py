"""Deterministic synthetic source-code table generator (FIXTURES.md B1).

Produces the engine's north-rule input — ``(repo, path, commit, lang,
content)`` — with seeded, exactly-counted planted defects so constraint
verdicts have golden expectations:

* zipf-skewed repo sizes (one hot repo with ~30% of rows: the salting /
  AQE-skew exercise),
* duplicate ``(repo, path, commit)`` rows,
* rows whose ``(repo, commit)`` is absent from the companion ``commits``
  key table (referential-integrity violations),
* NULL ``lang`` / NULL ``content`` at known rates,
* one drifted partition whose content lengths come from a shifted
  distribution (the LoOP drift check must flag it).

Everything derives from ``numpy.random.RandomState(seed)`` + sha256 — no
wall clock, no external data.  ``content_sha`` is computed at generation
time into the oracle table for the per-row invariant check.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

__all__ = ["CodeTableSpec", "generate_code_table", "write_code_table"]

_LANGS = ["python", "java", "go", "rust", "js", "c"]
_WORDS = (
    "def class return import for while if else try except lambda yield "
    "public static void int float string struct fn let mut impl trait "
    "func package var const chan go map slice append len cap make new"
).split()


@dataclass
class CodeTableSpec:
    n_rows: int = 5000
    n_repos: int = 50
    seed: int = 7
    hot_repo_share: float = 0.30
    dup_rows: int = 25  # exact duplicate (repo,path,commit) rows appended
    orphan_rows: int = 40  # rows whose (repo,commit) misses the key table
    null_lang_rows: int = 30
    null_content_rows: int = 20
    drift_partition: str = "lang=c"  # partition with shifted length dist
    langs: list = field(default_factory=lambda: list(_LANGS))


def _content(rng: np.random.RandomState, n_words: int) -> str:
    idx = rng.randint(0, len(_WORDS), size=n_words)
    return " ".join(_WORDS[i] for i in idx)


def generate_code_table(spec: CodeTableSpec | None = None):
    """Return ``(files_df, commits_df, expected)`` as pandas frames plus a
    dict of exact planted-defect counts for golden verdict tests."""
    spec = spec or CodeTableSpec()
    rng = np.random.RandomState(spec.seed)

    repos = [f"org{r % 7}/repo{r}" for r in range(spec.n_repos)]
    # zipf-ish skew: hot repo takes hot_repo_share, rest decays 1/rank
    weights = np.array([1.0 / (r + 1) for r in range(spec.n_repos)])
    weights = weights / weights.sum() * (1.0 - spec.hot_repo_share)
    weights[0] = spec.hot_repo_share
    weights = weights / weights.sum()

    n = spec.n_rows
    repo_idx = rng.choice(spec.n_repos, size=n, p=weights)
    langs = np.array(spec.langs)[rng.randint(0, len(spec.langs), size=n)]
    # dominant lang for extra skew
    langs[rng.rand(n) < 0.4] = "python"

    rows = []
    commit_pool: dict[str, list[str]] = {r: [] for r in repos}
    for i in range(n):
        repo = repos[repo_idx[i]]
        if not commit_pool[repo] or rng.rand() < 0.2:
            commit = hashlib.sha256(
                f"{repo}:{len(commit_pool[repo])}".encode()
            ).hexdigest()[:40]
            commit_pool[repo].append(commit)
        else:
            commit = commit_pool[repo][rng.randint(0, len(commit_pool[repo]))]
        lang = langs[i]
        # drifted partition: shifted + widened length distribution
        if f"lang={lang}" == spec.drift_partition and rng.rand() < 0.15:
            n_words = 400 + int(rng.exponential(300))
        else:
            n_words = 10 + int(rng.exponential(60))
        path = f"src/{lang}/mod_{i % 97}/file_{i}.{lang[:2]}"
        rows.append((repo, path, commit, lang, _content(rng, n_words)))

    files = pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )

    # planted defects -----------------------------------------------------
    dup_src = files.sample(n=spec.dup_rows, random_state=spec.seed + 1)
    files = pd.concat([files, dup_src], ignore_index=True)

    orphan_rows = []
    for j in range(spec.orphan_rows):
        repo = repos[int(rng.randint(0, spec.n_repos))]
        bad_commit = hashlib.sha256(f"orphan:{j}".encode()).hexdigest()[:40]
        orphan_rows.append(
            (
                repo,
                f"src/orphan/file_{j}.py",
                bad_commit,
                "python",
                _content(rng, 30),
            )
        )
    files = pd.concat(
        [
            files,
            pd.DataFrame(
                orphan_rows,
                columns=["repo", "path", "commit", "lang", "content"],
            ),
        ],
        ignore_index=True,
    )

    # never null a row that also serves as a duplicate source — otherwise
    # one (repo,path,commit) key would carry two different contents and the
    # sha-invariant check would (correctly) flag rows we did not plant
    eligible = np.setdiff1d(np.arange(spec.n_rows), dup_src.index.to_numpy())
    null_lang_idx = rng.choice(
        eligible, size=spec.null_lang_rows, replace=False
    )
    files.loc[null_lang_idx, "lang"] = None
    remaining = np.setdiff1d(eligible, null_lang_idx)
    null_content_idx = rng.choice(
        remaining, size=spec.null_content_rows, replace=False
    )
    files.loc[null_content_idx, "content"] = None

    # companion key table: every (repo, commit) EXCEPT the orphans
    commits = (
        files.iloc[: len(files) - spec.orphan_rows][["repo", "commit"]]
        .drop_duplicates()
        .reset_index(drop=True)
    )

    files["content_sha"] = files["content"].map(
        lambda c: None
        if c is None
        else hashlib.sha256(c.encode()).hexdigest()
    )

    expected = {
        "dup_key_rows": int(
            files.groupby(["repo", "path", "commit"]).size().pipe(
                lambda s: s[s > 1].sum()
            )
        ),
        "dup_extra_rows": spec.dup_rows,
        "orphan_rows": spec.orphan_rows,
        "null_lang_rows": int(files["lang"].isna().sum()),
        "null_content_rows": int(files["content"].isna().sum()),
        "total_rows": len(files),
        "drift_partition": spec.drift_partition,
    }
    return files, commits, expected


def write_code_table(spark, out_dir: str, spec: CodeTableSpec | None = None):
    """Materialize files/commits/oracle parquet under ``out_dir``; returns
    (files_df, commits_df, expected) as Spark DataFrames + dict."""
    files_pd, commits_pd, expected = generate_code_table(spec)
    oracle_pd = files_pd[["repo", "path", "commit", "content_sha"]]
    files_pd = files_pd.drop(columns=["content_sha"])

    files = spark.createDataFrame(files_pd)
    commits = spark.createDataFrame(commits_pd)
    oracle = spark.createDataFrame(oracle_pd)
    files.write.mode("overwrite").parquet(f"{out_dir}/files.parquet")
    commits.write.mode("overwrite").parquet(f"{out_dir}/commits.parquet")
    oracle.write.mode("overwrite").parquet(f"{out_dir}/sha_oracle.parquet")
    return files, commits, expected
