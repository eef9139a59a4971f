"""Corpus-level dedup/cleanup operators ([EXT], SURVEY.md §2.6).

Near-dup *pair* generators (``dedup.py``) answer "which documents
look alike"; a training-data pipeline then needs "which documents do
I keep". That is a graph problem: pairs are edges, connected
components are duplicate clusters, and the canonical keeper is the
minimum ``doc_id`` per component (the same keep-first rule as the
reference's exact dedup, ``main.R:105``).

Scale design:

- **Connected components**: iterative min-label propagation over
  DataFrame joins — each round is one shuffle join on the edge key
  plus a hash agg, and rounds needed = graph diameter. Near-dup
  graphs are shallow (clusters are template families, diameter ~2-4),
  so a handful of rounds converge; the loop re-checks convergence
  with a cheap single-long action per round and each round's result
  is persisted so lineage stays O(1). For adversarial deep graphs the
  classic fix is large-star/small-star (alternating pointer-halving
  rounds, O(log n) convergence) — same join/agg building blocks.
  Driver-side iteration with a per-round action is inherent to
  iterative graph algorithms (Pregel does the same superstep
  barrier); the per-round data volume is |V|+|E|, not the corpus.
- **Corpus-adaptive stopwords**: document frequency is one explode +
  hash agg; the discovered stop list is a few hundred tokens max by
  construction (df > threshold·N bounds its size by 1/threshold
  times the doc count over any disjoint support — in practice
  vocabulary-head sized), so it broadcasts, and the scrub itself is
  a codegen'd per-row array filter. No second corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark import StorageLevel

from ..tables import table
from .dedup import ORACLE as _DEDUP_ORACLE
from .dedup import _spread, _tokens, q_dedup_ngram_jaccard

# Stop when this many min-label rounds did not change any label.
# Diameter of near-dup clusters is small; 20 is a generous ceiling
# that also bounds lineage depth.
_MAX_CC_ROUNDS = 20

# A token present in more than this fraction of documents is
# corpus boilerplate (template chrome, navigation text) and is
# scrubbed. 0.5 mirrors the "appears in most documents" heuristic
# used by adaptive-stopword corpus cleaners.
_STOPWORD_DF_FRACTION = 0.5


def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over the 3-gram
    Jaccard pair graph (``q_dedup_ngram_jaccard``), one row per
    document that participates in at least one near-dup pair, with
    ``cluster_id`` = min ``doc_id`` of its component — the canonical
    keeper; every other member is a drop candidate.

    Min-label propagation: every node starts labeled with itself;
    each round every node takes the min label among itself and its
    neighbors; converged when a round changes nothing. Rounds =
    component diameter.
    """
    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    # symmetric edge list: label flows both directions
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(_MAX_CC_ROUNDS):
        # min label among each node's neighborhood
        neigh_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("neigh_label"))
        )
        new_labels = (
            labels.join(neigh_min, labels["node"] == neigh_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("neigh_label", "label")
                ).alias("label"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # convergence probe: sum(label) is monotone non-increasing
        # under min-propagation and strictly decreases while any
        # label changes — one cheap scalar action per round
        cur_sum = new_labels.agg(F.sum("label")).first()[0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def q_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup accounting: per near-dup cluster, its
    size and how many documents a keep-canonical policy would drop
    (size - 1). The corpus-level sum of ``n_dropped`` is the dedup
    yield of the near-dup stage."""
    clusters = q_dedup_cluster(spark, sf_dir)
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .withColumn("n_dropped", F.col("cluster_size") - F.lit(1))
    )


def q_text_corpus_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-adaptive boilerplate scrub: discover tokens whose
    document frequency exceeds ``_STOPWORD_DF_FRACTION`` of the
    corpus (template chrome — the corpus-statistics analogue of the
    reference's fixed Spanish stopword list, ``main.R:101``), then
    delete them from every document, preserving token order.

    The stop list is discovered, aggregated to a single sorted-array
    row, and broadcast; the scrub is a per-row ``filter`` +
    ``array_join`` — whole-stage codegen, no Python."""
    d = _spread(
        table(spark, sf_dir, "documents").select("doc_id", _tokens().alias("toks"))
    )
    ex = d.select("doc_id", F.explode(F.array_distinct("toks")).alias("token"))
    dfreq = ex.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.countDistinct("doc_id").alias("n"))
    stop_row = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") > _STOPWORD_DF_FRACTION * F.col("n"))
        .agg(F.array_sort(F.collect_list("token")).alias("stop"))
    )
    return d.crossJoin(F.broadcast(stop_row)).select(
        "doc_id",
        F.array_join(
            F.filter(
                F.col("toks"), lambda t: ~F.array_contains(F.col("stop"), t)
            ),
            " ",
        ).alias("scrubbed_text"),
        F.size("stop").alias("n_stopwords"),
    )


QUERIES = {
    "q_dedup_cluster": q_dedup_cluster,
    "q_dedup_cluster_stats": q_dedup_cluster_stats,
    "q_text_corpus_stopwords": q_text_corpus_stopwords,
}

# The pair graph is the ngram-Jaccard oracle verbatim (single source
# of truth for the edge set), wrapped as a CTE; components then come
# from a recursive label-spread CTE — DuckDB's UNION-dedup
# fixpoint terminates because (node, lab) pairs are finite.
_PAIRS_CTE = "(" + _DEDUP_ORACLE["q_dedup_ngram_jaccard"] + ")"

_CC_SQL = (
    "WITH RECURSIVE pairs AS " + _PAIRS_CTE + ", "
    "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
    "          UNION ALL SELECT doc_b, doc_a FROM pairs), "
    "nodes AS (SELECT DISTINCT src AS node FROM edges), "
    "reach(node, lab) AS ("
    "  SELECT node, node FROM nodes "
    "  UNION "
    "  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node) "
    "SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node"
)

ORACLE = {
    "q_dedup_cluster": _CC_SQL,
    "q_dedup_cluster_stats": (
        "WITH cc AS (" + _CC_SQL + ") "
        "SELECT cluster_id, count(*)::BIGINT AS cluster_size, "
        "(count(*) - 1)::BIGINT AS n_dropped FROM cc GROUP BY cluster_id"
    ),
    "q_text_corpus_stopwords": (
        "WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks "
        "           FROM documents), "
        "ex AS (SELECT doc_id, unnest(list_distinct(toks)) AS token FROM t), "
        "dfreq AS (SELECT token, count(*) AS df FROM ex GROUP BY token), "
        "n AS (SELECT count(*) AS n_docs FROM documents), "
        "stop AS (SELECT coalesce(list_sort(list(token)), []) AS s "
        "         FROM dfreq, n WHERE df > 0.5 * n_docs) "
        # stop is a single row; cross join it in (DuckDB lambdas may
        # reference correlated columns but not subqueries)
        # DuckDB's array_to_string([]) is NULL; Spark's array_join is ''
        "SELECT doc_id, coalesce("
        "array_to_string(list_filter(toks, x -> NOT list_contains(s, x)), ' '), "
        "'') AS scrubbed_text, len(s)::INT AS n_stopwords FROM t, stop"
    ),
}
