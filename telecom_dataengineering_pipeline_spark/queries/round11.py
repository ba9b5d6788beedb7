"""Round-8 registrations.

Registered OUTSIDE the round-8 driver window by design (VERDICT r7 item 1:
the window head belongs to the round-7 session-4 catch-up plus the 20-slot
r3-stale rotation; pinned in tests/test_probe_outliers_merges.py). Every
query here carries three-SF local oracle evidence on registration day and
heads the round-9 window.

Reference parity: these extend the engine beyond the reference's own
operator inventory (training-data-pipeline tier), same as rounds 3-7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Closed-form 2-D-marginal PCA (llmprep/projections.py::pairwise_pca_variance)
# — the PCA family's first VALUE-checkable driver query (VERDICT r7 item 3):
# real eigenvalues + explained-variance ratios through the rows+schema+hash
# gate. The d×d eigh (pca_embedding_projection) stays rows-only; a pinned
# test ties these closed forms to numpy.linalg.eigvalsh on the same sums.
# ---------------------------------------------------------------------------

_PCA_VAR_ORACLE = """
WITH px AS (
  SELECT t.p AS pair,
         CAST(embedding[CAST(t.p * 2 + 1 AS INT)] AS DOUBLE) AS xa,
         CAST(embedding[CAST(t.p * 2 + 2 AS INT)] AS DOUBLE) AS xb
  FROM embeddings, range(0, 32) t(p)
), agg AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(xa, 12) AS DECIMAL(38,12))) AS sa,
         sum(CAST(round(xb, 12) AS DECIMAL(38,12))) AS sb,
         sum(CAST(round(xa * xa, 12) AS DECIMAL(38,12))) AS saa,
         sum(CAST(round(xb * xb, 12) AS DECIMAL(38,12))) AS sbb,
         sum(CAST(round(xa * xb, 12) AS DECIMAL(38,12))) AS sab
  FROM px GROUP BY 1
), stats AS (
  SELECT pair, n,
    round((CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
          / (CAST(n AS DOUBLE) - 1.0), 9) AS var_a,
    round((CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
          / (CAST(n AS DOUBLE) - 1.0), 9) AS var_b,
    round((CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
          / (CAST(n AS DOUBLE) - 1.0), 9) AS cov_ab
  FROM agg
), eig AS (
  SELECT *,
    round((var_a + var_b) / 2.0
          + sqrt(((var_a - var_b) / 2.0) * ((var_a - var_b) / 2.0) + cov_ab * cov_ab), 9) AS lambda1,
    round((var_a + var_b) / 2.0
          - sqrt(((var_a - var_b) / 2.0) * ((var_a - var_b) / 2.0) + cov_ab * cov_ab), 9) AS lambda2
  FROM stats
)
SELECT CAST(pair AS INT) AS pair, CAST(pair * 2 AS INT) AS dim_a,
       CAST(pair * 2 + 1 AS INT) AS dim_b, n, var_a, var_b, cov_ab,
       lambda1, lambda2,
       CASE WHEN var_a + var_b <> 0 THEN round(lambda1 / (var_a + var_b), 6) END AS evr1
FROM eig
"""


@register("pca_variance_explained", oracle=_PCA_VAR_ORACLE, tags=("LLM", "ann"))
def pca_variance_explained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmprep.projections import pairwise_pca_variance

    emb = load_table(spark, sf_dir, "embeddings")
    return pairwise_pca_variance(emb, dims=64)
