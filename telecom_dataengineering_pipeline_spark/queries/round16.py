"""Round-16 registrations (round 12, growth tier) — the curation-audit
surfaces a training-data team runs AROUND the dedup/decontamination core
already in the registry:

- ``decon_source_attribution`` — per (eval split, train source): the
  volume of eval shingles that appear in that train source's vocabulary.
  decontamination_check says HOW contaminated; this says WHICH train feed
  to quarantine first.
- ``phrase_tag_profile_by_source`` — a broadcast phrase-dictionary tagger
  (bigram → topic tag) profiled per corpus source: the classic
  broadcast-small-dim-onto-corpus-stream shape, plan-pinned to a
  BroadcastHashJoin so the corpus side never shuffles for the join.
- ``dedup_quality_bias_bands`` — do near-dup clusters skew document
  quality? Mean quality-filter features per dup-group-size band
  ('unique' / 'pair' / 'cluster'), the keep-one-per-group policy audit.
- ``token_budget_mixture_schedule`` — exact water-filling allocation of a
  token budget across sources under a repeat cap (closed-form λ via
  sorted prefix/suffix windows — no iteration, no driver-side solve).

Second batch (same session):

- ``semdedup_cell_prune`` — SemDeDup (arXiv:2303.09540): IVF-cell-scoped
  cosine pruning with a deterministic min-id keeper policy; Σ|cell|²
  comparisons instead of O(n²).
- ``ngram_novelty_curve`` — per-doc fraction of shingles first seen in
  that document (curriculum/ordering signal).
- ``contamination_weighted_mixing`` — mixing weights with the leakage
  penalty folded in: sources down-weighted by their attributed share of
  eval contamination, renormalized.

Third batch (same session):

- ``knn_label_agreement_audit`` — label-noise triage: per vector, the
  fraction of its k nearest cell-mates sharing its label (cell-scoped
  like SemDeDup; rounded-cosine ranking with id tie-break).
- ``quality_drift_by_source`` — per-source JSD of the quality-gate
  distribution vs the corpus (integer gate-count categories; the
  round-9-recipe decimal-summed log terms).

Oracle conventions as ever: shingle-hash join equality == string-shingle
equality up to 2⁻⁶⁴ xxhash64 merges; LSH candidate recall ~1 at the
64-perm/16-band 0.5-threshold geometry (same grounds as
dedup_connected_groups); every mean folds through DECIMAL sums; doubles
leave aggregations only through round().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..llmprep.text import PHRASE_TAGS
from ..sources.catalog import load_table
from .llmprep import _SPLIT_BUCKET, _TOKS
from .registry import register

_SHINGLES3 = (
    "list_distinct(list_transform("
    f"generate_series(1, greatest(len({_TOKS}) - 2, 0)), "
    f"i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]))"
)

_DECON_SOURCE_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id, text, source,
         CASE WHEN {_SPLIT_BUCKET} < 90 THEN 'train'
              WHEN {_SPLIT_BUCKET} < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), sets AS (
  SELECT doc_id, split, source, {_SHINGLES3} AS s FROM assigned
), ex AS (SELECT doc_id, split, source, unnest(s) AS g FROM sets),
train_dict AS (SELECT DISTINCT g, source AS train_source FROM ex WHERE split = 'train'),
ev AS (SELECT doc_id, split, g FROM ex WHERE split <> 'train')
SELECT ev.split, t.train_source,
       CAST(count(*) AS BIGINT) AS n_hits,
       CAST(count(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs,
       CAST(count(DISTINCT ev.g) AS BIGINT) AS n_shingles
FROM ev JOIN train_dict t ON ev.g = t.g
GROUP BY 1, 2
"""


@register(
    "decon_source_attribution",
    oracle=_DECON_SOURCE_ORACLE,
    tags=("LLM", "curation"),
)
def decon_source_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination attributed to train sources: the actionable half of
    the decontamination audit (which feed leaked into eval). Same
    distinct-shingle-hash equi-join spine as decontamination_check, with
    the train side keyed (shingle_h, source)."""
    from ..llmprep.curation import decontamination_source_attribution

    return decontamination_source_attribution(load_table(spark, sf_dir, "documents"))


def _phrase_values() -> str:
    return ", ".join(f"('{p}', '{t}')" for p, t in PHRASE_TAGS)


_PHRASE_TAG_ORACLE = f"""
WITH dict(phrase, tag) AS (VALUES {_phrase_values()}),
t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id, source,
         unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                               i -> toks[i] || ' ' || toks[i+1])) AS g
  FROM t
)
SELECT source, d.tag,
       CAST(count(*) AS BIGINT) AS n_hits,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM bg JOIN dict d ON bg.g = d.phrase
GROUP BY 1, 2
"""


@register(
    "phrase_tag_profile_by_source",
    oracle=_PHRASE_TAG_ORACLE,
    tags=("LLM", "text", "join"),
)
def phrase_tag_profile_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-dictionary phrase tagging rolled up per corpus source.
    The dictionary is the explicit broadcast side; the corpus bigram
    stream keeps its by-document layout (plan-pinned in
    test_round16.py)."""
    from ..llmprep.text import phrase_tag_profile

    return phrase_tag_profile(load_table(spark, sf_dir, "documents"))


# Near-dup group spine: exact-Jaccard pairs at the registry's 0.5 threshold
# + recursive-CTE connected components — same grounds as the
# dedup_connected_groups oracle (LSH recall ~1 at 64 perm / 16 bands).
_CC_SPINE = f"""
WITH sets AS (
  SELECT doc_id, {_SHINGLES3} AS s FROM documents
), ex AS (SELECT doc_id, unnest(s) AS g FROM sets),
sz AS (SELECT doc_id, len(s) AS n FROM sets),
inter AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS i
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc1, doc2
  FROM inter JOIN sz x ON doc1 = x.doc_id JOIN sz y ON doc2 = y.doc_id
  WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5
), edges AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs UNION SELECT doc2, doc1 FROM pairs
), walk AS (
  WITH RECURSIVE w(doc_id, label) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.b, w.label FROM w JOIN edges e ON e.a = w.doc_id
  )
  SELECT doc_id, label FROM w
), grp AS (SELECT doc_id, min(label) AS group_id FROM walk GROUP BY doc_id)"""

_QUALITY_BIAS_ORACLE = (
    _CC_SPINE
    + f""",
gsz AS (SELECT group_id, count(*) AS gsz FROM grp GROUP BY 1),
lab AS (
  SELECT d.doc_id, d.text, g.group_id, z.gsz
  FROM documents d
  LEFT JOIN grp g ON g.doc_id = d.doc_id
  LEFT JOIN gsz z ON z.group_id = g.group_id
), feat AS (
  SELECT CASE WHEN gsz IS NULL THEN 'unique'
              WHEN gsz = 2 THEN 'pair'
              ELSE 'cluster' END AS band,
         group_id,
         CAST(len({_TOKS}) AS BIGINT) AS ntok,
         CAST(round(CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                    / greatest(len({_TOKS}), 1), 6) AS DECIMAL(10,6)) AS dtr,
         CAST(length(text) AS BIGINT) AS nch
  FROM lab
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT group_id) AS BIGINT) AS n_groups,
       round(CAST(sum(ntok) AS DOUBLE) / count(*), 6) AS mean_tokens,
       round(CAST(sum(dtr) AS DOUBLE) / count(*), 6) AS mean_distinct_ratio,
       round(CAST(sum(nch) AS DOUBLE) / count(*), 6) AS mean_chars
FROM feat GROUP BY 1
"""
)


@register(
    "dedup_quality_bias_bands",
    oracle=_QUALITY_BIAS_ORACLE,
    tags=("LLM", "dedup", "curation"),
)
def dedup_quality_bias_bands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter features per dup-group-size band — the audit behind
    a keep-one-per-group policy decision."""
    from ..llmprep.curation import dedup_quality_bias
    from ..llmprep.dedup import connected_dup_groups, minhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    groups = connected_dup_groups(minhash_near_dup_pairs(docs, threshold=0.5))
    return dedup_quality_bias(docs, groups)


_BUDGET_FACTOR = 1.95
_MAX_EPOCHS = 2.0

_BUDGET_SCHEDULE_ORACLE = f"""
WITH per_source AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), w AS (
  SELECT *,
         {_BUDGET_FACTOR} * sum(n_tokens) OVER () AS b,
         sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER () AS wt,
         {_MAX_EPOCHS} * n_tokens AS cap
  FROM per_source
), o AS (
  SELECT *, cap / wt AS r,
         coalesce(sum(cap) OVER (ORDER BY n_tokens, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_prev,
         sum(wt) OVER (ORDER BY n_tokens, source
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS sw,
         lag(cap / wt) OVER (ORDER BY n_tokens, source) AS r_prev
  FROM w
), lamt AS (
  SELECT min(CASE WHEN (b - c_prev) / sw <= r
                   AND (r_prev IS NULL OR r_prev <= (b - c_prev) / sw)
                  THEN (b - c_prev) / sw END) AS lam_star
  FROM o
), alloc AS (
  SELECT o.*, lam_star,
         CASE WHEN lam_star IS NULL THEN cap
              ELSE least(cap, lam_star * wt) END AS al
  FROM o CROSS JOIN lamt
)
SELECT source, n_docs, n_tokens,
       round(wt, 6) AS mix_weight,
       round(cap, 2) AS cap_tokens,
       round(al, 2) AS alloc_tokens,
       round(al / n_tokens, 6) AS epochs,
       (lam_star IS NULL OR r <= lam_star) AS capped,
       round(CAST(sum(CAST(round(al, 2) AS DECIMAL(18,2))) OVER () AS DOUBLE) / b, 6)
         AS budget_fill
FROM alloc
"""


@register(
    "token_budget_mixture_schedule",
    oracle=_BUDGET_SCHEDULE_ORACLE,
    tags=("LLM", "sampling", "curation"),
)
def token_budget_mixture_schedule_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token allocation across sources: budget = 1.95×
    corpus tokens, repeat cap 2 epochs — a genuine capped/uncapped mix at
    every SF (the per-source token spread straddles the cap; 2.0× would
    make B = Σcap exactly, the degenerate all-capped corner)."""
    from ..llmprep.curation import token_budget_schedule

    return token_budget_schedule(
        load_table(spark, sf_dir, "documents"),
        budget_factor=_BUDGET_FACTOR,
        max_epochs=_MAX_EPOCHS,
    )


# ---------------------------------------------------------------------------
# Second growth batch: semantic dedup (SemDeDup), n-gram novelty curve,
# contamination-penalized mixing weights.
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.35  # corpus-calibrated: synthetic embeddings are near-
# orthogonal (within-cell max-cos p99 ~0.46); real encoders run ~0.95.

_SEMDEDUP_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
), cent AS (
  SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % 100 = 0
), scored AS (
  SELECT n.vec_id, n.v, n.nrm, cent.cid,
         list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn) AS c_cos
  FROM n CROSS JOIN cent
), assigned AS (
  SELECT vec_id, v, nrm, cid AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, cid ASC) AS _rn
    FROM scored
  ) WHERE _rn = 1
), px AS (
  SELECT b.vec_id,
         round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
), mx AS (SELECT vec_id, max(cos) AS max_lower_cos FROM px GROUP BY 1)
SELECT s.vec_id, s.cell, m.max_lower_cos,
       coalesce(m.max_lower_cos >= {_SEMDEDUP_TAU}, FALSE) AS pruned
FROM assigned s LEFT JOIN mx m ON m.vec_id = s.vec_id
"""


@register(
    "semdedup_cell_prune",
    oracle=_SEMDEDUP_ORACLE,
    tags=("LLM", "dedup", "similarity"),
)
def semdedup_cell_prune_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: IVF-cell-scoped cosine pruning,
    min-id keeper policy (llmprep.similarity.semdedup_cell_prune)."""
    from ..llmprep.similarity import semdedup_cell_prune

    return semdedup_cell_prune(
        load_table(spark, sf_dir, "embeddings"), threshold=_SEMDEDUP_TAU
    )


_NOVELTY_ORACLE = f"""
WITH sets AS (
  SELECT doc_id, {_SHINGLES3} AS s FROM documents
), ex AS (SELECT doc_id, unnest(s) AS g FROM sets),
fs AS (SELECT g, min(doc_id) AS first FROM ex GROUP BY 1)
SELECT ex.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN fs.first = ex.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN fs.first = ex.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS novelty_ratio
FROM ex JOIN fs ON fs.g = ex.g
GROUP BY 1
"""


@register(
    "ngram_novelty_curve",
    oracle=_NOVELTY_ORACLE,
    tags=("LLM", "curation", "text"),
)
def ngram_novelty_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty ratio: fraction of its shingles first seen in this
    document (corpus-order curriculum signal)."""
    from ..llmprep.curation import ngram_novelty_scores

    return ngram_novelty_scores(load_table(spark, sf_dir, "documents"))


_CONTAM_MIX_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id, text, source,
         CASE WHEN {_SPLIT_BUCKET} < 90 THEN 'train'
              WHEN {_SPLIT_BUCKET} < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), sets AS (
  SELECT doc_id, split, source, {_SHINGLES3} AS s FROM assigned
), ex AS (SELECT doc_id, split, source, unnest(s) AS g FROM sets),
train_dict AS (SELECT DISTINCT g, source AS train_source FROM ex WHERE split = 'train'),
ev AS (SELECT doc_id, split, g FROM ex WHERE split <> 'train'),
hits AS (
  SELECT t.train_source AS source, CAST(count(*) AS BIGINT) AS n_hits
  FROM ev JOIN train_dict t ON ev.g = t.g GROUP BY 1
), per_source AS (
  SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), j AS (
  SELECT p.source, p.n_tokens, coalesce(h.n_hits, 0) AS n_hits
  FROM per_source p LEFT JOIN hits h ON h.source = p.source
), w AS (
  SELECT *,
         sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER () AS wt,
         coalesce(CAST(n_hits AS DOUBLE)
                  / nullif(CAST(sum(n_hits) OVER () AS DOUBLE), 0.0), 0.0) AS share
  FROM j
), a AS (SELECT *, wt * (1.0 - share) AS adj FROM w)
SELECT source, n_tokens, n_hits,
       round(wt, 6) AS mix_weight,
       round(share, 6) AS contamination_share,
       round(adj / sum(adj) OVER (), 6) AS adj_weight
FROM a
"""


@register(
    "contamination_weighted_mixing",
    oracle=_CONTAM_MIX_ORACLE,
    tags=("LLM", "curation", "sampling"),
)
def contamination_weighted_mixing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixing weights with the leakage penalty folded in: sources are
    down-weighted by their share of attributed eval contamination and the
    weights renormalized."""
    from ..llmprep.curation import contamination_weighted_mixing

    return contamination_weighted_mixing(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Third growth batch: label-noise audit (kNN label agreement) and
# per-source quality drift (grouped JSD).
# ---------------------------------------------------------------------------

_KNN_LABEL_ORACLE = """
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
), cent AS (
  SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % 100 = 0
), scored AS (
  SELECT n.vec_id, n.v, n.nrm, cent.cid,
         list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn) AS c_cos
  FROM n CROSS JOIN cent
), assigned AS (
  SELECT vec_id, v, nrm, cid AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, cid ASC) AS _rn
    FROM scored
  ) WHERE _rn = 1
), px AS (
  SELECT b.vec_id, a.vec_id AS oid,
         round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id <> b.vec_id
), rk AS (
  SELECT vec_id, oid,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, oid ASC) AS rn
  FROM px
), nb AS (
  SELECT r.vec_id,
         CAST(count(*) AS BIGINT) AS n_neighbors,
         CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END) AS BIGINT) AS n_same
  FROM rk r
  JOIN e la ON la.vec_id = r.oid
  JOIN e lb ON lb.vec_id = r.vec_id
  WHERE r.rn <= 5
  GROUP BY 1
)
SELECT e.vec_id, e.label,
       coalesce(nb.n_neighbors, 0) AS n_neighbors,
       coalesce(nb.n_same, 0) AS n_same_label,
       round(CAST(nb.n_same AS DOUBLE) / nb.n_neighbors, 6) AS agreement,
       coalesce(round(CAST(nb.n_same AS DOUBLE) / nb.n_neighbors, 6) <= 0.2, FALSE)
         AS suspect
FROM e LEFT JOIN nb ON nb.vec_id = e.vec_id
"""


@register(
    "knn_label_agreement_audit",
    oracle=_KNN_LABEL_ORACLE,
    tags=("LLM", "similarity", "quality"),
)
def knn_label_agreement_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise triage: per vector, the fraction of its 5 nearest
    cell-mates sharing its label (llmprep.similarity.knn_label_agreement)."""
    from ..llmprep.similarity import knn_label_agreement

    return knn_label_agreement(load_table(spark, sf_dir, "embeddings"), k=5)


# Python-computed constant embedded in BOTH engines' expressions (house
# float-determinism recipe).
_LN2 = "0.6931471805599453"

_STOPS = "('the','a','of','and','to','in','is','on','for','with')"

_QUALITY_DRIFT_ORACLE = f"""
WITH t AS (
  SELECT source, {_TOKS} AS toks FROM documents
), g AS (
  SELECT source,
    (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
    + (CASE WHEN CAST(len(list_filter(toks, x -> x IN {_STOPS})) AS DOUBLE)
             / greatest(len(toks), 1) >= 0.05
         AND CAST(len(list_filter(toks, x -> x IN {_STOPS})) AS DOUBLE)
             / greatest(len(toks), 1) <= 0.6 THEN 1 ELSE 0 END)
    + (CASE WHEN CAST(len(list_distinct(toks)) AS DOUBLE)
             / greatest(len(toks), 1) >= 0.3 THEN 1 ELSE 0 END) AS gates
  FROM t
), per_sc AS (SELECT source, gates, CAST(count(*) AS BIGINT) AS _a FROM g GROUP BY 1, 2),
per_cat AS (SELECT gates, CAST(count(*) AS BIGINT) AS _b FROM g GROUP BY 1),
srcs AS (SELECT source, CAST(count(*) AS BIGINT) AS _n FROM g GROUP BY 1),
grid AS (SELECT s.source, s._n, c.gates, c._b FROM srcs s CROSS JOIN per_cat c),
cells AS (
  SELECT gr.source, gr._n, gr.gates, gr._b, coalesce(p._a, 0) AS _a
  FROM grid gr LEFT JOIN per_sc p ON p.source = gr.source AND p.gates = gr.gates
), terms AS (
  SELECT source, _n, _a, _b, sum(_b) OVER (PARTITION BY source) AS _nb FROM cells
), jt AS (
  SELECT source, _n,
    CASE WHEN _a > 0 THEN CAST(round(
           (CAST(_a AS DOUBLE) / CAST(_n AS DOUBLE))
           * ln((CAST(_a AS DOUBLE) / CAST(_n AS DOUBLE))
                / ((CAST(_a AS DOUBLE) / CAST(_n AS DOUBLE)
                    + CAST(_b AS DOUBLE) / CAST(_nb AS DOUBLE)) / 2.0)), 9)
         AS DECIMAL(28,9)) ELSE CAST(0 AS DECIMAL(28,9)) END AS tp,
    CAST(round(
           (CAST(_b AS DOUBLE) / CAST(_nb AS DOUBLE))
           * ln((CAST(_b AS DOUBLE) / CAST(_nb AS DOUBLE))
                / ((CAST(_a AS DOUBLE) / CAST(_n AS DOUBLE)
                    + CAST(_b AS DOUBLE) / CAST(_nb AS DOUBLE)) / 2.0)), 9)
         AS DECIMAL(28,9)) AS tq
  FROM terms
)
SELECT source,
       CAST(max(_n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_categories,
       round((CAST(sum(tp) AS DOUBLE) + CAST(sum(tq) AS DOUBLE)) / 2.0, 6) AS jsd_nats,
       round(((CAST(sum(tp) AS DOUBLE) + CAST(sum(tq) AS DOUBLE)) / 2.0) / {_LN2}, 6)
         AS jsd_bits,
       CASE WHEN ((CAST(sum(tp) AS DOUBLE) + CAST(sum(tq) AS DOUBLE)) / 2.0) / {_LN2}
                 < 0.05 THEN 'stable'
            WHEN ((CAST(sum(tp) AS DOUBLE) + CAST(sum(tq) AS DOUBLE)) / 2.0) / {_LN2}
                 < 0.2 THEN 'moderate_shift'
            ELSE 'major_shift' END AS status
FROM jt GROUP BY 1
"""


@register(
    "quality_drift_by_source",
    oracle=_QUALITY_DRIFT_ORACLE,
    tags=("LLM", "curation", "DQ", "drift"),
)
def quality_drift_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source JSD of the quality-gate distribution vs the corpus
    (llmprep.curation.quality_drift_by_source)."""
    from ..llmprep.curation import quality_drift_by_source

    return quality_drift_by_source(load_table(spark, sf_dir, "documents"))
