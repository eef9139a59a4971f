"""Python UDTF surface (SURVEY.md §2.7 [EXT]).

``q_udtf_runlength``: run-length encoding of each document's token
stream via a real Python UDTF (``pyspark.sql.functions.udtf``,
Spark ≥ 3.5 / first-class in Spark 4) applied with a LATERAL join —
the 1→N expansion shape that neither a scalar UDF (1→1) nor a
pandas grouped map (needs a shuffle) expresses: per-row Python
iteration, no shuffle, pipelined with the scan.

The UDTF is the API-coverage twin of the expression-only
``llmprep.q_text_squeeze_runs`` (same run structure; this one also
emits the length of every run). Policy note (SURVEY §2.7): UDTFs
are row-at-a-time Python — the expression/HOF form wins the hot
path; this exists because a 100 TB pipeline inevitably has a few
genuinely-Python expansions (parsers, tokenizers), and they must
pipeline with the scan instead of forcing a shuffle.

Oracle: pure SQL run detection — change-points via lag over the
exploded token stream, run ids via a running sum, one group-by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import table


def q_udtf_runlength(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, run_len int")
    class RunLength:
        def eval(self, text: str):
            # str.split() == split on \s+ runs after trim (ASCII
            # corpus: Java/RE2/Python whitespace classes agree)
            toks = (text or "").split()
            i = 0
            pos = 0
            while i < len(toks):
                j = i
                while j < len(toks) and toks[j] == toks[i]:
                    j += 1
                yield pos, toks[i], j - i
                i = j
                pos += 1

    spark.udtf.register("tes_runlength", RunLength)
    table(spark, sf_dir, "documents").createOrReplaceTempView(
        "tes_udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, s.pos, s.token, s.run_len "
        "FROM tes_udtf_docs d, LATERAL tes_runlength(d.text) s"
    )


QUERIES = {"q_udtf_runlength": q_udtf_runlength}

ORACLE = {
    "q_udtf_runlength": (
        "WITH t AS (SELECT doc_id, "
        "string_split_regex(trim(text), '\\s+') AS l FROM documents), "
        "e AS (SELECT doc_id, i, l[i] AS token, "
        "CASE WHEN i = 1 OR l[i] <> l[i - 1] THEN 1 ELSE 0 END AS is_start "
        "FROM t, unnest(generate_series(1, len(l))) AS u(i)), "
        "runs AS (SELECT doc_id, i, token, "
        "sum(is_start) OVER (PARTITION BY doc_id ORDER BY i "
        "ROWS UNBOUNDED PRECEDING) AS run_id FROM e) "
        "SELECT doc_id, (run_id - 1)::INT AS pos, "
        "min(token) AS token, count(*)::INT AS run_len "
        "FROM runs GROUP BY doc_id, run_id"
    ),
}


def q_udtf_splitn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output
    SCHEMA is computed at plan time from a constant argument — here
    ``split_n(text, 3)`` emits columns tok0..tok2, and a different N
    literally changes the relation's shape. This is the
    dynamic-schema connector/parser shape (wide CSV exploders,
    configurable feature extractors) that static ``returnType``
    UDTFs cannot express. Same row-at-a-time-Python policy note as
    q_udtf_runlength: coverage surface, not the hot path."""
    from pyspark.sql.functions import (
        AnalyzeArgument,
        AnalyzeResult,
        udtf,
    )
    from pyspark.sql.types import StringType, StructType

    @udtf
    class SplitN:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            toks = (text or "").split()
            yield tuple(
                (toks[i] if i < len(toks) else None) for i in range(n)
            )

    spark.udtf.register("split_n", SplitN)
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT doc_id, s.tok0, s.tok1, s.tok2 "
        "FROM documents, LATERAL split_n(text, 3) s"
    )


QUERIES["q_udtf_splitn"] = q_udtf_splitn
ORACLE["q_udtf_splitn"] = (
    "WITH t AS (SELECT doc_id, "
    "string_split_regex(trim(text), '\\s+') AS l FROM documents) "
    "SELECT doc_id, l[1] AS tok0, l[2] AS tok1, l[3] AS tok2 FROM t"
)
