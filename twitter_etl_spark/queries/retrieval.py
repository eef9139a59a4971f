"""Late-interaction retrieval and statistical regression
aggregates (SURVEY.md §2 [EXT]).

- **MaxSim** (``q_sim_maxsim``): ColBERT-style late-interaction
  scoring — score(Q, doc) = Σ_{q∈Q} max_{v∈doc} cos(q, v), with the
  label groups of the embeddings table standing in for multi-vector
  documents and vec_id < 3 as the query token set. ONE pass: the
  3-row query side broadcasts, per-pair cosines reduce with a
  conditional-max pivot per (label, query token), and the final sum
  runs in FIXED q0+q1+q2 order (max is order-independent; float
  SUM order is the cross-engine contract, cf. ``similarity.py``).
  At 100 TB this is the exact re-ranking stage that follows the ANN
  candidate fetch (``q_sim_ann_ivf``) — candidates × small Q, never
  doc × doc.
- **grouped OLS** (``q_fn_regression``): per-event-type
  least-squares fit of value against time via the built-in
  ``regr_slope`` / ``regr_intercept`` / ``regr_r2`` aggregates
  (Spark ≥ 3.4 and DuckDB share the PostgreSQL definitions) — the
  trend-per-segment primitive. Time is rescaled to days-since-epoch
  BEFORE aggregating: slope per microsecond underflows the rounded
  comparison; slope per day is O(1). Rounded at 6 to absorb
  engine-side accumulation-order ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table

from .similarity import _as_double, _dot

#: number of query-token vectors for MaxSim (vec_id < N).
MAXSIM_Q = 3

_US_PER_DAY = 86_400_000_000.0


def q_sim_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxSim late-interaction score per label group."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    e = e.withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = e.where(F.col("vec_id") < MAXSIM_Q).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))
    pairs = e.crossJoin(F.broadcast(q)).select(
        "label", "qid", cos.alias("cos_sim")
    )
    pivot = pairs.groupBy("label").agg(
        *[
            F.max(F.when(F.col("qid") == i, F.col("cos_sim"))).alias(f"m{i}")
            for i in range(MAXSIM_Q)
        ]
    )
    score = F.col("m0")
    for i in range(1, MAXSIM_Q):
        score = score + F.col(f"m{i}")
    return pivot.select(
        "label", F.round(score, 6).alias("maxsim")
    ).orderBy(F.desc("maxsim"), "label")


def q_fn_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS of value vs time (days since epoch)."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_micros("ts") / _US_PER_DAY).alias("t_days"),
        "value",
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("regr_slope(value, t_days)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(value, t_days)"), 6).alias(
            "intercept"
        ),
        F.round(F.expr("regr_r2(value, t_days)"), 6).alias("r2"),
    )


RRF_K = 60  # the standard reciprocal-rank-fusion constant
RRF_TOPN = 20  # depth of each arm's candidate list


def q_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al. 2009 — public) of the
    two retrieval arms this engine already certifies: the LEXICAL
    arm is `q_text_bm25`'s top-20 (BM25 over the fixed term query)
    and the SEMANTIC arm is exact cosine of every embedding against
    query vector vec_id=0 (vec_id stands for doc_id — the document
    embedding), top-20. Fused score = Σ_arms 1/(K + rank), K=60;
    ids present in only one arm contribute that arm's term alone
    (standard RRF over the union).

    This is the hybrid-search primitive: at 100 TB each arm is its
    own candidate fetch (inverted index / ANN probe) returning a
    k-row frame, so the fusion join is trivially small — the plan
    here keeps both arms TakeOrderedAndProject (per-partition heaps)
    and the only unpartitioned windows ride the already-LIMITed
    ≤20-row frames (allowlisted in the plan sweep, zipf-style)."""
    from pyspark.sql import Window

    from .llmprep import q_text_bm25
    from .similarity import cosine

    lex = q_text_bm25(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), "doc_id"))
        .alias("lex_rank"),
    )
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sem_scored = (
        e.filter(F.col("vec_id") > 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
    )
    sem = (
        sem_scored.orderBy(F.desc("cos_sim"), "vec_id")
        .limit(RRF_TOPN)
        .select(
            "vec_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cos_sim"), "vec_id"))
            .alias("sem_rank"),
        )
    )
    fused = lex.join(sem, lex.doc_id == sem.vec_id, "full")
    rrf = F.coalesce(
        1.0 / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("sem_rank")), F.lit(0.0))
    return fused.select(
        F.coalesce("doc_id", "vec_id").alias("doc_id"),
        "lex_rank",
        "sem_rank",
        F.round(rrf, 6).alias("rrf"),
    )


QUERIES = {
    "q_sim_maxsim": q_sim_maxsim,
    "q_fn_regression": q_fn_regression,
    "q_retrieval_rrf": q_retrieval_rrf,
}

_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

from .llmprep import ORACLE as _LLM_ORACLE  # noqa: E402 (bm25 arm reuse)

ORACLE = {
    "q_retrieval_rrf": (
        # the lexical arm IS q_text_bm25's oracle, verbatim, as a CTE
        "WITH bm_base AS (" + _LLM_ORACLE["q_text_bm25"] + "), "
        "lex AS (SELECT doc_id, row_number() OVER "
        "(ORDER BY bm25 DESC, doc_id) AS lex_rank FROM bm_base), "
        "e AS (SELECT vec_id, " + _V + " AS v FROM embeddings), "
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0), "
        "sem_scored AS (SELECT vec_id, "
        "round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * "
        "sqrt(list_dot_product(qv, qv))), 6) AS cos_sim "
        "FROM e CROSS JOIN q WHERE vec_id > 0), "
        "sem AS (SELECT vec_id, row_number() OVER "
        "(ORDER BY cos_sim DESC, vec_id) AS sem_rank FROM "
        "(SELECT * FROM sem_scored ORDER BY cos_sim DESC, vec_id "
        f"LIMIT {RRF_TOPN}) s) "
        "SELECT coalesce(lex.doc_id, sem.vec_id) AS doc_id, "
        "lex_rank, sem_rank, "
        f"round(coalesce(1.0 / ({RRF_K} + lex_rank), 0.0) + "
        f"coalesce(1.0 / ({RRF_K} + sem_rank), 0.0), 6) AS rrf "
        "FROM lex FULL JOIN sem ON lex.doc_id = sem.vec_id"
    ),
    "q_sim_maxsim": (
        "WITH e AS (SELECT vec_id, label, " + _V + " AS v, "
        "sqrt(list_dot_product(" + _V + ", " + _V + ")) AS norm "
        "FROM embeddings), "
        "q AS (SELECT vec_id AS qid, v AS qv, norm AS qn FROM e "
        f"WHERE vec_id < {MAXSIM_Q}), "
        "pairs AS (SELECT e.label, q.qid, "
        "list_dot_product(q.qv, e.v) / (q.qn * e.norm) AS cos_sim "
        "FROM e CROSS JOIN q), "
        "pv AS (SELECT label, "
        + ", ".join(
            f"max(CASE WHEN qid = {i} THEN cos_sim END) AS m{i}"
            for i in range(MAXSIM_Q)
        )
        + " FROM pairs GROUP BY label) "
        "SELECT label, round("
        + " + ".join(f"m{i}" for i in range(MAXSIM_Q))
        + ", 6) AS maxsim FROM pv ORDER BY maxsim DESC, label"
    ),
    "q_fn_regression": (
        "WITH e AS (SELECT event_type, "
        f"epoch_us(ts) / {_US_PER_DAY} AS t_days, value FROM events) "
        "SELECT event_type, count(*) AS n, "
        "round(regr_slope(value, t_days), 6) AS slope, "
        "round(regr_intercept(value, t_days), 6) AS intercept, "
        "round(regr_r2(value, t_days), 6) AS r2 "
        "FROM e GROUP BY event_type"
    ),
}
