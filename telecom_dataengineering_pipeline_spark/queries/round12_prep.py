"""Round-12 registration candidates — prepared under the round-11 registry
freeze (VERDICT r10 item 8: zero r11 registrations; growth resumes r12).

Each candidate is a full (Spark callable, DuckDB oracle) pair following
every registry convention (decimal-exact aggregation folds, 6-dp rounds,
matched column names, one expression shape on both sides); r12 moves each
into a ``@register`` block verbatim. Until then they are value-gated
tests-only through ``oracle_check.check_frame`` — the same driver-replica
comparison the registry gate runs — at sf0.001 and sf0.01
(``tests/test_round12_prep.py``).

Candidates:

- ``leakage_safe_split_assignments`` — dup-cluster-keyed dataset split
  (``llmprep/sampling.py::leakage_safe_split`` over
  ``entity_resolution_clusters``): no near-duplicate cluster straddles the
  train/eval boundary.
- ``decontamination_group_split_check`` — the group-keyed twin of
  ``decontamination_check``: contamination measured AFTER co-assigning
  clusters, so what remains is real cross-document leakage.
- ``minhash_calibration_report`` — the sketch-honesty table
  (``llmprep/dedup.py::minhash_calibration_audit``): per-exact-Jaccard
  bucket, the MinHash agreement estimate vs the exact value over the LSH
  candidates. The oracle mirrors the FULL signature pipeline (md5-derived
  universal hashes, banded slice-equality candidates) in generated SQL —
  band equality compares the slice VALUES, which equals Spark's xxhash64
  bucket equality up to 2⁻⁶⁴ bucket-merge collisions (the same accepted
  tolerance as every shingle-hash join in the registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmprep.dedup import MERSENNE_31, _perm_constants
from ..sources.catalog import load_table
from .llmprep import _TOKS
from .mining import _ER_CTES, _ER_MAX_DIST

# Split bucket anchored on the entity-resolution cluster id — the same md5
# recipe split_assign's oracle uses, with the anchor swapped doc→cluster.
_CLUSTER_BUCKET = (
    "CAST(('0x'||substr(md5('split_v1_' || CAST(c.cluster_id AS VARCHAR)),1,8))"
    "::BIGINT % 100 AS INTEGER)"
)

LEAKAGE_SAFE_SPLIT_ORACLE = (
    _ER_CTES
    + f""",
assigned AS (
  SELECT d.doc_id, {_CLUSTER_BUCKET} AS split_bucket
  FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
)
SELECT doc_id, split_bucket,
       CASE WHEN split_bucket < 90 THEN 'train'
            WHEN split_bucket < 95 THEN 'val' ELSE 'test' END AS split
FROM assigned
"""
)


def leakage_safe_split_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-cluster-keyed split: every member of an entity-resolution
    cluster lands in ONE split (bucket = md5 of the cluster id; the
    cluster relation is total, so singletons anchor on their own id and
    match split_assign exactly)."""
    from ..llmprep.fuzzy import entity_resolution_clusters
    from ..llmprep.sampling import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    clusters = entity_resolution_clusters(docs, max_dist=_ER_MAX_DIST)
    return leakage_safe_split(
        docs.select("doc_id"), clusters, group_col="cluster_id"
    ).select("doc_id", "split_bucket", "split")


DECON_GROUP_SPLIT_ORACLE = (
    _ER_CTES
    + f""",
assigned AS (
  SELECT d.doc_id, d.text,
         CASE WHEN {_CLUSTER_BUCKET} < 90 THEN 'train'
              WHEN {_CLUSTER_BUCKET} < 95 THEN 'val' ELSE 'test' END AS split
  FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
), sets AS (
  SELECT doc_id, split,
         list_distinct(list_transform(
           generate_series(1, greatest(len({_TOKS}) - 2, 0)),
           i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]
         )) AS s
  FROM assigned
), ex AS (SELECT doc_id, split, unnest(s) AS g FROM sets),
train_set AS (SELECT DISTINCT g FROM ex WHERE split = 'train'),
ev AS (SELECT doc_id, split, g FROM ex WHERE split <> 'train')
SELECT ev.doc_id, ev.split,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(t.g) AS BIGINT) AS n_contaminated,
       round(CAST(count(t.g) AS DOUBLE) / count(*), 6) AS contamination_ratio
FROM ev LEFT JOIN train_set t ON ev.g = t.g
GROUP BY 1, 2
"""
)


def decontamination_group_split_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decontamination_check with the split keyed by dup cluster: the
    dup-driven contamination slice is gone by construction, so every
    remaining non-zero row is real cross-document leakage."""
    from ..llmprep.curation import decontamination_overlap
    from ..llmprep.fuzzy import entity_resolution_clusters

    docs = load_table(spark, sf_dir, "documents")
    clusters = entity_resolution_clusters(docs, max_dist=_ER_MAX_DIST)
    out = decontamination_overlap(docs, groups=clusters, group_col="cluster_id")
    return out.select(
        "doc_id",
        "split",
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.col("n_contaminated").cast("bigint").alias("n_contaminated"),
        "contamination_ratio",
    )


def _calibration_oracle(num_perm: int = 64, bands: int = 16, n_buckets: int = 10) -> str:
    """Generated DuckDB mirror of minhash_calibration_audit: the one
    Python loop emits both engines' permutation constants (dedup.py's
    ``_perm_constants`` — shape identity by construction), bands compare
    slice values (== Spark's bucket-hash equality up to 2⁻⁶⁴ merges),
    and every mean folds through DECIMAL(10,6) sums exactly as the
    operator does. BIGINT casts on the ``a`` constants keep DuckDB from
    multiplying INT32 literals into overflow (round-9 recipe)."""
    rpb = num_perm // bands
    mins = ",\n       ".join(
        f"min((CAST({a} AS BIGINT) * h + {b}) % {MERSENNE_31}) AS mh_{i}"
        for i, (a, b) in enumerate(_perm_constants(num_perm))
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(f"CAST(mh_{b * rpb + r} AS VARCHAR)" for r in range(rpb))
        + " AS key FROM sig"
        for b in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN s1.mh_{i} = s2.mh_{i} THEN 1 ELSE 0 END" for i in range(num_perm)
    )
    return f"""
WITH sets AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len({_TOKS}) - 2, 0)),
           i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]
         )) AS s
  FROM documents
), ex AS (SELECT doc_id, unnest(s) AS g FROM sets),
sz AS (SELECT doc_id, len(s) AS n FROM sets),
hashed AS (
  SELECT doc_id, ('0x'||substr(md5(g),1,8))::BIGINT % {MERSENNE_31} AS h FROM ex
),
sig AS (
  SELECT doc_id,
       {mins}
  FROM hashed GROUP BY doc_id
),
banded AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
est AS (
  SELECT c.doc1, c.doc2,
         round(CAST(({agree}) AS DOUBLE) / CAST({num_perm} AS DOUBLE), 6) AS est_jaccard
  FROM cand c JOIN sig s1 ON s1.doc_id = c.doc1 JOIN sig s2 ON s2.doc_id = c.doc2
),
inter AS (
  -- LEFT join: zero-intersection candidates (bucket-merge collisions)
  -- keep i = 0 and grade into bucket 0, mirroring the Spark side's
  -- left-join + count(_hit) (ADVICE r11).
  SELECT e.doc1, e.doc2, e.est_jaccard, count(b.g) AS i
  FROM est e
  JOIN ex a ON a.doc_id = e.doc1
  LEFT JOIN ex b ON b.doc_id = e.doc2 AND b.g = a.g
  GROUP BY 1, 2, 3
),
graded AS (
  SELECT i.est_jaccard,
         round(CAST(i.i AS DOUBLE) / (x.n + y.n - i.i), 6) AS exact_jaccard
  FROM inter i JOIN sz x ON x.doc_id = i.doc1 JOIN sz y ON y.doc_id = i.doc2
),
b AS (
  SELECT least(CAST(floor(exact_jaccard * {n_buckets}) AS INTEGER), {n_buckets - 1}) AS bucket,
         CAST(est_jaccard AS DECIMAL(10,6)) AS est_d,
         CAST(exact_jaccard AS DECIMAL(10,6)) AS exa_d
  FROM graded
)
SELECT bucket,
       round(min(CAST(bucket AS DOUBLE) / {n_buckets}), 6) AS lo,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(est_d) AS DOUBLE) / count(*), 6) AS mean_est,
       round(CAST(sum(exa_d) AS DOUBLE) / count(*), 6) AS mean_exact,
       round(CAST(sum(abs(est_d - exa_d)) AS DOUBLE) / count(*), 6) AS mean_abs_err,
       CAST(max(abs(est_d - exa_d)) AS DOUBLE) AS max_abs_err
FROM b GROUP BY 1
"""


MINHASH_CALIBRATION_ORACLE = _calibration_oracle()


def minhash_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-honesty table over the documents corpus (64 perms, 16
    bands — the registry's production LSH geometry)."""
    from ..llmprep.dedup import minhash_calibration_audit

    return minhash_calibration_audit(load_table(spark, sf_dir, "documents"))


CANDIDATES: dict[str, tuple] = {
    "leakage_safe_split_assignments": (
        leakage_safe_split_assignments,
        LEAKAGE_SAFE_SPLIT_ORACLE,
    ),
    "decontamination_group_split_check": (
        decontamination_group_split_check,
        DECON_GROUP_SPLIT_ORACLE,
    ),
    "minhash_calibration_report": (
        minhash_calibration_report,
        MINHASH_CALIBRATION_ORACLE,
    ),
}
