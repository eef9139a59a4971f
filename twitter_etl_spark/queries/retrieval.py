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


QUERIES = {
    "q_sim_maxsim": q_sim_maxsim,
    "q_fn_regression": q_fn_regression,
}

_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

ORACLE = {
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
