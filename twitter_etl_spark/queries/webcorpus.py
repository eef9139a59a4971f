"""Web-corpus curation operators (SURVEY.md §2 [EXT]): PII
scrubbing, per-domain corpus accounting, unigram-LM scoring, and
Zipf frequency profiling — the C4/RefinedWeb-style cleaning stages a
training-data pipeline runs between raw crawl and tokenizer.

The fixture's ``documents.text`` is a synthetic bag of words with no
URLs/emails/digits, so the PII and domain operators first ANNOTATE
each document with a deterministic contact block derived from
``doc_id`` (same technique as :mod:`geo`'s synthetic coordinates:
pure string arithmetic, bit-identical on both engines). The regex
scrub/extract logic — the part that matters — then runs on realistic
patterns and is fully oracle-certified.

Scale notes: every operator here is explode → broadcast-joined
lookup → hash agg, or pure per-row projection. The unigram model
broadcasts the vocabulary (bounded by distinct-word count, not
corpus size); per-token scores are summed as FIXED-POINT BIGINTs so
no float-sum-order nondeterminism exists anywhere
(cf. graph.q_graph_pagerank). The Zipf window ranks the
already-aggregated vocabulary frame (tiny), never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: PII patterns — ASCII classes only (Java regex \b/\d Unicode
#: semantics vs RE2 differ; explicit classes are identical).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1 555-[0-9]{4}"
HOST_RE = r"https?://([A-Za-z0-9.-]+)"

#: Zipf profile depth.
ZIPF_TOP = 30


def _annotated(d: DataFrame) -> DataFrame:
    """text + deterministic contact block: one email, one phone, one
    primary URL, and (for every third doc) a mirror URL."""
    i = F.col("doc_id")
    email = F.concat(
        F.lit("user"), i.cast("string"),
        F.lit("@example"), (i % 7).cast("string"), F.lit(".org"),
    )
    phone = F.concat(F.lit("+1 555-"), (1000 + i % 9000).cast("string"))
    url1 = F.concat(
        F.lit("https://site"), (i % 13).cast("string"),
        F.lit(".example.org/p/"), i.cast("string"),
    )
    url2 = F.when(
        i % 3 == 0,
        F.concat(
            F.lit(" http://mirror"), (i % 5).cast("string"),
            F.lit(".example.net/x"),
        ),
    ).otherwise(F.lit(""))
    ann = F.concat(
        F.col("text"), F.lit(" contact "), email, F.lit(" or "), phone,
        F.lit(" see "), url1, url2,
    )
    return d.select("doc_id", ann.alias("ann"))


_SQL_ANNOTATED = (
    "SELECT doc_id, text || ' contact user' || doc_id || '@example' "
    "|| (doc_id % 7) || '.org or +1 555-' || (1000 + doc_id % 9000) "
    "|| ' see https://site' || (doc_id % 13) || '.example.org/p/' || doc_id "
    "|| CASE WHEN doc_id % 3 = 0 THEN ' http://mirror' || (doc_id % 5) "
    "|| '.example.net/x' ELSE '' END AS ann FROM documents"
)


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and redact emails/phones per document. Pure per-row
    projection — embarrassingly parallel, zero shuffle; the scrubbed
    text is returned as md5 to keep the certified output skinny."""
    a = _annotated(table(spark, sf_dir, "documents"))
    ann = F.col("ann")
    scrub = F.regexp_replace(
        F.regexp_replace(ann, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return a.select(
        "doc_id",
        F.size(F.regexp_extract_all(ann, F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(ann, F.lit(PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.md5(scrub).alias("scrubbed_md5"),
    )


def q_text_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus accounting (the C4 domain-mix report): URL
    hosts extracted per doc, exploded, hash-aggregated. One shuffle
    on the domain key."""
    a = _annotated(table(spark, sf_dir, "documents"))
    hosts = F.regexp_extract_all(F.col("ann"), F.lit(HOST_RE), F.lit(1))
    return (
        a.select("doc_id", F.explode(hosts).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
        )
    )


def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal per document: p(w) from the corpus
    itself, score = mean −ln p(w) over the doc's tokens — the
    classic cheap quality/outlier signal (gibberish and boilerplate
    both stand out).

    Per-token scores are FIXED-POINT (round 6, ×1e6, BIGINT floor)
    before the per-doc sum, so the reduction is exact integer math —
    no float-sum-order nondeterminism; only the final mean is float.
    The vocabulary (distinct words) is broadcast to the token scan.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
    total = vocab.agg(F.sum("wc").alias("total"))
    fp = F.floor(
        F.round(-F.log(F.col("wc") / F.col("total")), 6) * 1e6 + F.lit(0.5)
    ).cast("bigint")
    probs = vocab.crossJoin(F.broadcast(total)).select("w", fp.alias("fp"))
    # the vocab->logprob map grows with the corpus (Heaps' law) —
    # un-hinted so AQE only broadcasts it while it is genuinely small
    scored = toks.join(probs, "w")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.round(F.sum("fp") / F.count(F.lit(1)) / 1e6, 4).alias("avg_neglogp"),
    )


def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf profile: top-30 words by corpus frequency with rank and
    per-10k-token rate.

    The top-30 selection is ``orderBy(...).limit(30)`` — planned as
    TakeOrderedAndProject, a parallel per-partition top-k + driver
    merge that never sorts the vocabulary globally. Only the already
    30-row result gets the rank window (an unpartitioned window over
    a LIMITed frame is bounded by the limit, not the data). At web
    scale the vocabulary is 1e8+ rows; ranking it with a bare
    ``row_number().over(Window.orderBy(...))`` would move the entire
    frame to one partition — the r04 verdict flagged exactly that,
    and tests/test_plans.py now pins the TakeOrderedAndProject plan.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
    total = vocab.agg(F.sum("wc").alias("total"))
    top = (
        vocab.crossJoin(F.broadcast(total))
        .orderBy(F.desc("wc"), F.asc("w"))
        .limit(ZIPF_TOP)
    )
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("wc"), F.asc("w"))),
    )
    return ranked.select(
        "rank",
        "w",
        "wc",
        F.round(F.col("wc") * 10000.0 / F.col("total"), 4).alias("per_10k"),
    )


QUERIES = {
    "q_text_pii_scrub": q_text_pii_scrub,
    "q_text_domain_stats": q_text_domain_stats,
    "q_text_unigram_logprob": q_text_unigram_logprob,
    "q_text_zipf": q_text_zipf,
}

ORACLE = {
    "q_text_pii_scrub": (
        "WITH a AS (" + _SQL_ANNOTATED + ") "
        "SELECT doc_id, "
        "len(regexp_extract_all(ann, '" + EMAIL_RE + "'))::INT AS n_emails, "
        "len(regexp_extract_all(ann, '" + PHONE_RE + "'))::INT AS n_phones, "
        "md5(regexp_replace(regexp_replace(ann, '" + EMAIL_RE + "', "
        "'<EMAIL>', 'g'), '" + PHONE_RE + "', '<PHONE>', 'g')) "
        "AS scrubbed_md5 FROM a"
    ),
    "q_text_domain_stats": (
        "WITH a AS (" + _SQL_ANNOTATED + "), "
        "h AS (SELECT doc_id, unnest(regexp_extract_all(ann, "
        "'" + HOST_RE + "', 1)) AS domain FROM a) "
        "SELECT domain, count(*)::BIGINT AS n_urls, "
        "count(DISTINCT doc_id)::BIGINT AS n_docs FROM h GROUP BY domain"
    ),
    "q_text_unigram_logprob": (
        "WITH toks AS (SELECT doc_id, "
        "unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents), "
        "vocab AS (SELECT w, count(*)::BIGINT AS wc FROM toks GROUP BY w), "
        "tot AS (SELECT sum(wc)::BIGINT AS total FROM vocab), "
        "probs AS (SELECT w, floor(round(-ln(wc::DOUBLE / total), 6) * 1e6 "
        "+ 0.5)::BIGINT AS fp FROM vocab CROSS JOIN tot), "
        "scored AS (SELECT doc_id, fp FROM toks JOIN probs USING (w)) "
        "SELECT doc_id, count(*)::BIGINT AS n_tok, "
        "round(sum(fp)::BIGINT / count(*) / 1e6, 4) AS avg_neglogp "
        "FROM scored GROUP BY doc_id"
    ),
    "q_text_zipf": (
        "WITH toks AS (SELECT unnest(string_split_regex(trim(text), "
        "'\\s+')) AS w FROM documents), "
        "vocab AS (SELECT w, count(*)::BIGINT AS wc FROM toks GROUP BY w), "
        "tot AS (SELECT sum(wc)::BIGINT AS total FROM vocab) "
        "SELECT row_number() OVER (ORDER BY wc DESC, w) AS rank, w, wc, "
        "round(wc * 10000.0 / total, 4) AS per_10k "
        "FROM vocab CROSS JOIN tot "
        f"ORDER BY rank LIMIT {ZIPF_TOP}"
    ),
}


#: temperature for mixture reweighting and the token budget used to
#: express weights as per-source epoch counts.
MIX_TAU = 0.7
MIX_BUDGET = 1_000_000


def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture reweighting: per-source token counts →
    temperature-flattened sampling weights w_s ∝ n_s^τ (τ=0.7, the
    multilingual-LM standard for up-weighting small sources) and the
    implied epochs over each source at a fixed token budget.

    Plan: one hash agg over documents, then a 1-row Σ n^τ broadcast —
    the weight math is O(|sources|), independent of corpus size."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n_tok")
    )
    powed = counts.select(
        "source", "n_tok", F.pow("n_tok", F.lit(MIX_TAU)).alias("p")
    )
    denom = powed.agg(F.sum("p").alias("z"))
    w = F.col("p") / F.col("z")
    return powed.crossJoin(F.broadcast(denom)).select(
        "source",
        "n_tok",
        F.round(w, 6).alias("weight"),
        F.round(w * MIX_BUDGET / F.col("n_tok"), 4).alias("epochs"),
    )


QUERIES["q_mix_weights"] = q_mix_weights

ORACLE["q_mix_weights"] = (
    "WITH counts AS (SELECT source, "
    "sum(len(string_split_regex(trim(text), '\\s+')))::BIGINT AS n_tok "
    "FROM documents GROUP BY source), "
    f"powed AS (SELECT source, n_tok, pow(n_tok, {MIX_TAU}) AS p FROM counts), "
    "z AS (SELECT sum(p) AS z FROM powed) "
    "SELECT source, n_tok, round(p / z, 6) AS weight, "
    f"round(p / z * {MIX_BUDGET} / n_tok, 4) AS epochs "
    "FROM powed CROSS JOIN z"
)


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling", arXiv:2302.03169 —
# public). Hashed n-gram bag-of-words generative models for a TARGET
# distribution (here: the English subcorpus) vs the RAW corpus; each
# document scores its mean per-ngram log importance ratio. Documents
# that "look like" the target distribution score high — the standard
# cheap lever for steering a 100 TB crawl toward a target domain
# without a neural scorer.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def q_text_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance log-weight.

    Features are word bigrams WITH multiplicity, hashed into
    ``DSIR_BUCKETS`` buckets via the engine-portable md5 bucket
    (sampling.hash_bucket idiom). Bucket models: add-0.5 smoothed
    counts from the target subcorpus (lang = 'en') and the raw
    corpus; per-bucket weight = log p_target(b) − log p_raw(b),
    fixed-pointed (round 6, ×1e6, BIGINT) before the per-doc sum so
    the reduction is exact integer math (q_text_unigram_logprob's
    no-float-sum-order trick). Docs shorter than 2 tokens have no
    features and drop out.

    Plan: ONE pass builds the bucket table (conditional counts in
    the same hash agg — the target model costs no second scan); the
    weight table is key-space-bounded (exactly ``DSIR_BUCKETS``
    rows) so its broadcast hint is safe at any SF; per-doc scoring
    is one hash agg on doc_id. Two shuffles total (bucket agg, doc
    agg) regardless of corpus size.

    The hashed feature frame feeds BOTH the model agg and the
    scoring agg, so it is persisted (MEMORY_AND_DISK, via the
    one-slot ``cacheutil.cache_latest`` so repeated invocations in a
    long cert/bench session hold ONE cached copy, not a leak per
    run) — without it the bigram explode + md5 runs twice (measured
    2.24 s -> 1.74 s at sf0.1, n=3 best-of). The cached row is
    (doc_id, lang, bucket) — three ints, far cheaper than re-reading
    and re-hashing the text; at 100 TB this is the standard
    materialize-features-once trade, and the spill-to-disk level
    keeps it safe when the feature frame exceeds executor memory."""
    from .sampling import hash_bucket

    # deliberately NO _spread here: measured at sf0.1 (n=3 steady
    # state), round-robin repartitioning the docs before the bigram
    # explode made this SLOWER (1.6 s -> 2.2 s) — the extra exchange
    # ships full texts and costs more than the serialized md5 pass it
    # parallelizes, unlike the shingle-heavy dedup pipelines where
    # _spread wins. On real multi-split inputs the scan already
    # parallelizes.
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.trim("text"), r"\s+").alias("t")
    )
    count = F.greatest(F.size("t") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice("t", 1, count),
        F.slice("t", 2, count),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    from ..cacheutil import cache_latest

    ngb = cache_latest(
        "dsir_features",
        d.select(
            "doc_id",
            "lang",
            F.explode(bigrams).alias("ng"),
        ).select(
            "doc_id", "lang", hash_bucket(F.col("ng"), DSIR_BUCKETS).alias("b")
        ),
    )
    counts = ngb.groupBy("b").agg(
        F.count(F.lit(1)).alias("raw_c"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("tgt_c"),
    )
    totals = counts.agg(
        F.sum("raw_c").alias("raw_n"), F.sum("tgt_c").alias("tgt_n")
    )
    half_b = DSIR_BUCKETS * 0.5
    w = F.log(
        (F.col("tgt_c") + 0.5) / (F.col("tgt_n") + F.lit(half_b))
    ) - F.log((F.col("raw_c") + 0.5) / (F.col("raw_n") + F.lit(half_b)))
    wfp = F.floor(F.round(w, 6) * 1e6 + F.lit(0.5)).cast("bigint")
    wtab = counts.crossJoin(F.broadcast(totals)).select(
        "b", wfp.alias("wfp")
    )
    scored = ngb.join(F.broadcast(wtab), "b")
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum("wfp").alias("s"),
    )
    # exact final division (r15): mean per-ngram weight in 1e-4 fixed
    # point via integer half-away-from-zero rounding — the float
    # spelling round(s/n/1e6, 4) flipped a half-ulp boundary across
    # engines in q_quality_nb_score's sf1 drill; same family, same fix
    mean_e4 = F.expr(
        "CAST(CASE WHEN s < 0 THEN -1 ELSE 1 END AS BIGINT) * "
        "((2 * abs(s) + n_ngrams * 100) DIV (2 * n_ngrams * 100))"
    )
    return agg.select(
        "doc_id",
        "n_ngrams",
        (mean_e4 / F.lit(10000.0)).alias("dsir_logweight"),
    )


QUERIES["q_text_dsir"] = q_text_dsir

ORACLE["q_text_dsir"] = (
    "WITH t AS (SELECT doc_id, lang, "
    "string_split_regex(trim(text), '\\s+') AS toks FROM documents), "
    "ng AS (SELECT doc_id, lang, unnest(list_transform("
    "  range(1, greatest(len(toks) - 1, 0) + 1), "
    "  i -> toks[i] || ' ' || toks[i+1])) AS ng FROM t), "
    "ngb AS (SELECT doc_id, lang, "
    f"(('0x' || substr(md5(ng), 1, 8))::UBIGINT % {DSIR_BUCKETS}) AS b "
    "FROM ng), "
    "counts AS (SELECT b, count(*)::BIGINT AS raw_c, "
    f"sum((lang = '{DSIR_TARGET_LANG}')::BIGINT)::BIGINT AS tgt_c "
    "FROM ngb GROUP BY b), "
    "tot AS (SELECT sum(raw_c) AS raw_n, sum(tgt_c) AS tgt_n FROM counts), "
    "w AS (SELECT b, floor(round("
    f"  ln((tgt_c + 0.5) / (tgt_n + {DSIR_BUCKETS * 0.5})) - "
    f"  ln((raw_c + 0.5) / (raw_n + {DSIR_BUCKETS * 0.5})), 6) * 1e6 "
    "  + 0.5)::BIGINT AS wfp FROM counts CROSS JOIN tot) "
    ", a AS (SELECT doc_id, count(*)::BIGINT AS n_ngrams, "
    "sum(wfp)::BIGINT AS s FROM ngb JOIN w USING (b) GROUP BY doc_id) "
    "SELECT doc_id, n_ngrams, "
    "(CASE WHEN s < 0 THEN -1 ELSE 1 END) * "
    "((2 * abs(s) + n_ngrams * 100) // (2 * n_ngrams * 100)) / 10000.0 "
    "AS dsir_logweight FROM a"
)


def q_text_ccnet_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2019,
    arXiv:1911.00359 — public): within EACH language, rank documents
    by LM surprisal (`q_text_unigram_logprob`'s score standing in
    for the KenLM perplexity) and split into head/middle/tail
    tertiles — the standard crawl-quality partition LLM pipelines
    filter or mix on.

    The tertile window partitions by lang — CCNet's own semantics,
    and exactly what keeps this scale-safe: one shuffle on the
    language key, per-language parallel sorts, no global sort (the
    zipf-class trap). Ordering ties break on doc_id; the score is
    fixed-point-derived so both engines rank identical values."""
    scored = q_text_unigram_logprob(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = scored.join(d, "doc_id")
    w = Window.partitionBy("lang").orderBy("avg_neglogp", "doc_id")
    bucket = F.element_at(
        F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
        F.ntile(3).over(w),
    )
    return j.select(
        "doc_id", "lang", "avg_neglogp", bucket.alias("bucket")
    )


QUERIES["q_text_ccnet_bucket"] = q_text_ccnet_bucket

ORACLE["q_text_ccnet_bucket"] = (
    "WITH toks AS (SELECT doc_id, "
    "unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents), "
    "vocab AS (SELECT w, count(*)::BIGINT AS wc FROM toks GROUP BY w), "
    "tot AS (SELECT sum(wc)::BIGINT AS total FROM vocab), "
    "probs AS (SELECT w, floor(round(-ln(wc::DOUBLE / total), 6) * 1e6 "
    "+ 0.5)::BIGINT AS fp FROM vocab CROSS JOIN tot), "
    "scored AS (SELECT doc_id, count(*)::BIGINT AS n_tok, "
    "round(sum(fp)::BIGINT / count(*) / 1e6, 4) AS avg_neglogp "
    "FROM (SELECT doc_id, fp FROM toks JOIN probs USING (w)) s "
    "GROUP BY doc_id), "
    "j AS (SELECT s.doc_id, d.lang, s.avg_neglogp, "
    "ntile(3) OVER (PARTITION BY d.lang "
    "ORDER BY s.avg_neglogp, s.doc_id) AS t "
    "FROM scored s JOIN documents d USING (doc_id)) "
    "SELECT doc_id, lang, avg_neglogp, "
    "CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END "
    "AS bucket FROM j"
)


#: add-k smoothing constant for the bigram LM (Lidstone; k=0.5 is
#: Jeffreys-Perks). Exact binary float (2^-1), so the SQL literal
#: and the Spark lit are bit-identical by construction.
_BIGRAM_ALPHA = 0.5


def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprisal per document (KenLM-style scoring one
    order up from ``q_text_unigram_logprob``): p(cur|prev) estimated
    from the corpus itself with add-0.5 smoothing, score = mean
    −ln p over the doc's bigrams — the cheap fluency signal CCNet
    uses a real KenLM for; shuffled-word-order junk scores high here
    even when its unigram profile is clean.

    Same determinism contract as the unigram twin: each bigram's
    −ln p is FIXED-POINT (round 6, ×1e6, BIGINT floor) before the
    per-doc sum, so the distributed reduction is exact integer math.

    Scale: bigram extraction is a per-row zip of shifted slices
    (codegen'd, no UDF); the model is ONE hash agg keyed on the
    bigram (vocab² ceiling, Heaps-bounded in practice — the
    conditional C1 re-derives from C2 by a prev-keyed re-agg of the
    MODEL, never a second corpus pass); scoring joins the un-hinted
    model map so AQE broadcasts it only while it is genuinely
    small. Docs with < 2 tokens have no bigrams and drop out —
    same inner-join semantics on both engines."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    cnt = F.greatest(F.size(toks) - 1, F.lit(0))
    big = d.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(toks, 1, cnt),
                F.slice(toks, 2, cnt),
                lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.prev", "bg.cur")
    c2 = big.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    v = d.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    a = F.lit(_BIGRAM_ALPHA)
    fp = F.floor(
        F.round(
            -F.log((F.col("c2") + a) / (F.col("c1") + a * F.col("v"))), 6
        )
        * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    model = (
        c2.join(c1, "prev")
        .crossJoin(F.broadcast(v))
        .select("prev", "cur", fp.alias("fp"))
    )
    scored = big.join(model, ["prev", "cur"])
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("fp") / F.count(F.lit(1)) / 1e6, 4).alias("avg_neglogp2"),
    )


QUERIES["q_text_bigram_lm"] = q_text_bigram_lm

ORACLE["q_text_bigram_lm"] = (
    "WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') "
    "  AS toks FROM documents), "
    "big AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS prev, "
    "  unnest(toks[2:len(toks)]) AS cur FROM t WHERE len(toks) >= 2), "
    "c2 AS (SELECT prev, cur, count(*)::BIGINT AS c2 FROM big "
    "  GROUP BY prev, cur), "
    "c1 AS (SELECT prev, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY prev), "
    "v AS (SELECT count(DISTINCT w)::BIGINT AS v FROM ("
    "  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w "
    "  FROM documents)), "
    "model AS (SELECT prev, cur, "
    f"  floor(round(-ln((c2 + {_BIGRAM_ALPHA!r}) / "
    f"  (c1 + {_BIGRAM_ALPHA!r} * v)), 6) * 1e6 + 0.5)::BIGINT AS fp "
    "  FROM c2 JOIN c1 USING (prev) CROSS JOIN v) "
    "SELECT doc_id, count(*)::BIGINT AS n_bigrams, "
    "round(sum(fp)::BIGINT / count(*) / 1e6, 4) AS avg_neglogp2 "
    "FROM big JOIN model USING (prev, cur) GROUP BY doc_id"
)


#: epoch cap for the constrained mixture (the LLaMA-recipe "no
#: source repeats more than ~4 epochs" rule, tightened to bind on
#: this fixture's language skew) and the bounded redistribution
#: round count (the BFS_HOPS contract: fixed, documented, identical
#: in both engines).
MIX_EPOCH_CAP = 2.2
MIX_CAP_ROUNDS = 3


def q_mix_epochs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-capped training mixture (water-filling): temperature
    sampling (w ∝ n^τ, the q_mix_weights rule) says how the token
    budget WANTS to split, but real recipes also cap repetition —
    a source may not run past ``MIX_EPOCH_CAP`` epochs. Sources
    whose proportional share exceeds their cap are FROZEN at
    cap·n_tok and their excess budget redistributes over the
    remaining sources' temperature weights; ``MIX_CAP_ROUNDS``
    unrolled rounds (a newly enlarged share can push another source
    over — the classic water-filling cascade; this fixture
    converges in one, the test pins a crafted two-round cascade).
    Budget = 2·Σn_tok (scale-free: derived from the corpus itself).

    Output per language: n_tok, alloc_tok, epochs, capped flag —
    the sampling plan a data-loader executes.

    Scale: one hash agg over documents; everything after is
    O(|languages|) arithmetic on a broadcast-size frame (the 1-row
    budget/remainder aggs are the allowlisted q_agg_global class).
    Double determinism: Σ n^τ over ≤|languages| values, the same
    certified class as q_mix_weights' denominator."""
    d = table(spark, sf_dir, "documents")
    base = d.groupBy("lang").agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n_tok")
    ).select(
        "lang",
        "n_tok",
        F.pow("n_tok", F.lit(MIX_TAU)).alias("p"),
        (F.lit(MIX_EPOCH_CAP) * F.col("n_tok")).alias("cap_tok"),
    )
    budget = base.agg((2.0 * F.sum("n_tok")).alias("b"))
    state = base.crossJoin(F.broadcast(budget)).withColumn(
        "fixed_tok", F.lit(None).cast("double")
    )
    for _ in range(MIX_CAP_ROUNDS):
        aggs = state.agg(
            (F.first("b") - F.sum(F.coalesce("fixed_tok", F.lit(0.0)))).alias(
                "rem"
            ),
            F.sum(
                F.when(F.col("fixed_tok").isNull(), F.col("p"))
            ).alias("pact"),
        )
        share = F.col("p") / F.col("pact") * F.col("rem")
        state = (
            state.crossJoin(F.broadcast(aggs))
            .withColumn(
                "fixed_tok",
                F.when(F.col("fixed_tok").isNotNull(), F.col("fixed_tok"))
                .when(share > F.col("cap_tok"), F.col("cap_tok")),
            )
            .drop("rem", "pact")
        )
    aggs = state.agg(
        (F.first("b") - F.sum(F.coalesce("fixed_tok", F.lit(0.0)))).alias("rem"),
        F.sum(F.when(F.col("fixed_tok").isNull(), F.col("p"))).alias("pact"),
    )
    alloc = F.coalesce(
        F.col("fixed_tok"), F.col("p") / F.col("pact") * F.col("rem")
    )
    return state.crossJoin(F.broadcast(aggs)).select(
        "lang",
        "n_tok",
        F.round(alloc, 2).alias("alloc_tok"),
        F.round(alloc / F.col("n_tok"), 4).alias("epochs"),
        F.col("fixed_tok").isNotNull().cast("int").alias("capped"),
    )


QUERIES["q_mix_epochs_capped"] = q_mix_epochs_capped


def _mix_cap_round(prev: str, out: str) -> str:
    return (
        f"{out} AS (SELECT lang, n_tok, p, cap_tok, b, "
        "CASE WHEN fixed_tok IS NOT NULL THEN fixed_tok "
        "WHEN p / pact * rem > cap_tok THEN cap_tok END AS fixed_tok "
        f"FROM {prev} CROSS JOIN (SELECT "
        "any_value(b) - sum(coalesce(fixed_tok, 0.0)) AS rem, "
        "sum(CASE WHEN fixed_tok IS NULL THEN p END) AS pact "
        f"FROM {prev}))"
    )


ORACLE["q_mix_epochs_capped"] = (
    "WITH base AS (SELECT lang, "
    "sum(len(string_split_regex(trim(text), '\\s+')))::BIGINT AS n_tok, "
    f"pow(sum(len(string_split_regex(trim(text), '\\s+'))), {MIX_TAU}) AS p, "
    f"{MIX_EPOCH_CAP} * sum(len(string_split_regex(trim(text), '\\s+'))) "
    "AS cap_tok FROM documents GROUP BY lang), "
    "r0 AS (SELECT lang, n_tok, p, cap_tok, b, "
    "CAST(NULL AS DOUBLE) AS fixed_tok FROM base "
    "CROSS JOIN (SELECT 2.0 * sum(n_tok) AS b FROM base)), "
    + ", ".join(
        _mix_cap_round(f"r{i}", f"r{i+1}") for i in range(MIX_CAP_ROUNDS)
    )
    + f" SELECT lang, n_tok, "
    "round(coalesce(fixed_tok, p / pact * rem), 2) AS alloc_tok, "
    "round(coalesce(fixed_tok, p / pact * rem) / n_tok, 4) AS epochs, "
    "(fixed_tok IS NOT NULL)::INT AS capped "
    f"FROM r{MIX_CAP_ROUNDS} CROSS JOIN (SELECT "
    "any_value(b) - sum(coalesce(fixed_tok, 0.0)) AS rem, "
    "sum(CASE WHEN fixed_tok IS NULL THEN p END) AS pact "
    f"FROM r{MIX_CAP_ROUNDS})"
)


#: Kneser-Ney absolute discount — 0.75 = 3·2^-2, exact in binary so
#: the SQL literal and the Spark lit are bit-identical.
_KN_D = 0.75


def q_text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram surprisal per document (Chen &
    Goodman 1999, the smoothing real KenLM models default to —
    public): p(cur|prev) = max(c(prev,cur)−D, 0)/c(prev) +
    D·N1+(prev·)/c(prev) · N1+(·cur)/|bigram types|, with D = 0.75.
    The continuation-probability backoff is what separates KN from
    the add-k twin ``q_text_bigram_lm``: a word seen in MANY
    contexts (a true function word) backs off high, a word frequent
    in ONE collocation backs off low — the standard fluency score
    one notch closer to production perplexity filters.

    Determinism contract unchanged from the unigram/bigram twins:
    per-bigram −ln p is fixed-point (round 6, ×1e6, BIGINT floor)
    before the per-doc sum; every model quantity (c2, c1, the two
    N1+ tables, the type count) is an exact BIGINT; D is an exact
    binary float. Docs with < 2 tokens drop out (no bigrams).

    Scale: the model is derived ENTIRELY from the bigram-type table
    (one corpus hash agg): c1 and N1+(prev·) by one prev-keyed
    re-agg, N1+(·cur) by one cur-keyed re-agg, |types| as a 1-row
    broadcast — never a second corpus pass; scoring is one join of
    doc bigrams against the model, hot bigrams collapsing map-side."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    cnt = F.greatest(F.size(toks) - 1, F.lit(0))
    big = d.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(toks, 1, cnt),
                F.slice(toks, 2, cnt),
                lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.prev", "bg.cur")
    c2 = big.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    left = c2.groupBy("prev").agg(
        F.sum("c2").alias("c1"),
        F.count(F.lit(1)).alias("n1_fwd"),
    )
    right = c2.groupBy("cur").agg(F.count(F.lit(1)).alias("n1_ctx"))
    types = c2.agg(F.count(F.lit(1)).alias("t"))
    dd = F.lit(_KN_D)
    p = (
        F.greatest(F.col("c2") - dd, F.lit(0.0)) / F.col("c1")
        + (dd * F.col("n1_fwd") / F.col("c1"))
        * (F.col("n1_ctx") / F.col("t"))
    )
    fp = F.floor(F.round(-F.log(p), 6) * 1e6 + F.lit(0.5)).cast("bigint")
    model = (
        c2.join(left, "prev")
        .join(right, "cur")
        .crossJoin(F.broadcast(types))
        .select("prev", "cur", fp.alias("fp"))
    )
    scored = big.join(model, ["prev", "cur"])
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("fp") / F.count(F.lit(1)) / 1e6, 4).alias(
            "kn_surprisal"
        ),
    )


QUERIES["q_text_kneser_ney"] = q_text_kneser_ney

ORACLE["q_text_kneser_ney"] = (
    "WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') "
    "  AS toks FROM documents), "
    "big AS (SELECT doc_id, unnest(list_transform(range(1, "
    "  greatest(len(toks) - 1, 0) + 1), i -> {'prev': toks[i], "
    "  'cur': toks[i+1]})) AS bg FROM t), "
    "b AS (SELECT doc_id, bg.prev AS prev, bg.cur AS cur FROM big), "
    "c2 AS (SELECT prev, cur, count(*)::BIGINT AS c2 FROM b GROUP BY 1, 2), "
    "lft AS (SELECT prev, sum(c2)::BIGINT AS c1, count(*)::BIGINT AS n1_fwd "
    "  FROM c2 GROUP BY prev), "
    "rgt AS (SELECT cur, count(*)::BIGINT AS n1_ctx FROM c2 GROUP BY cur), "
    "ty AS (SELECT count(*)::BIGINT AS t FROM c2), "
    "model AS (SELECT c2.prev, c2.cur, "
    f"  floor(round(-ln(greatest(c2.c2 - {_KN_D}, 0.0) / lft.c1 "
    f"    + ({_KN_D} * lft.n1_fwd / lft.c1) * (rgt.n1_ctx * 1.0 / ty.t)), 6) "
    "    * 1e6 + 0.5)::BIGINT AS fp "
    "  FROM c2 JOIN lft USING (prev) JOIN rgt USING (cur) CROSS JOIN ty) "
    "SELECT doc_id, count(*)::BIGINT AS n_bigrams, "
    "round(sum(fp)::BIGINT / count(*) / 1e6, 4) AS kn_surprisal "
    "FROM b JOIN model USING (prev, cur) GROUP BY doc_id"
)


# ---------------------------------------------------------------------------
# Model-based quality classifier (r14 verdict #3). The GPT-3/LLaMA
# pipelines train a cheap linear classifier (fastText / logistic
# over hashed n-grams) on a bootstrap labeling and score the whole
# crawl with it (Brown et al. 2020 §A.2; Touvron et al. 2023 §2 —
# public). The public bootstrap: LABEL by the already-certified
# rule family (the Gopher pass flag), TRAIN a hashed-bigram
# Naive-Bayes log-odds model on those labels in one aggregation
# pass, then SCORE every document on the continuum the binary rules
# collapse — the standard "train on rules, rank by model" lever for
# steering a 100 TB crawl.
# ---------------------------------------------------------------------------


def q_quality_nb_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Naive-Bayes quality log-odds.

    Labels: the four Gopher rules of ``q_quality_gopher``
    (llmprep.py) conjoined per document — integer flags, no floats.
    Features: word bigrams with multiplicity, hashed into
    ``DSIR_BUCKETS`` buckets (the q_text_dsir feature space). Model:
    add-0.5 smoothed per-bucket class counts — the positive and
    negative models come out of ONE hash agg (the label rides the
    feature frame, so pos_c = sum(y) and neg_c = count − pos_c need
    no second pass); per-bucket weight = log p(b|pass) − log
    p(b|fail), fixed-pointed (round 6, ×1e6, BIGINT) before the
    per-doc sum so the reduction is exact integer math. Output:
    (doc_id, n_ngrams, label, nb_score) — nb_score is the mean
    per-ngram log-odds, integer-exact to the one final division;
    docs with < 2 tokens have no features and drop out.

    Plan: one projection builds (doc_id, y, b) — cached via the
    one-slot ``cacheutil`` because the model agg and the scoring agg
    both consume it (the r14 double-consumer lesson); one 1024-row
    hash agg + a 1-row totals broadcast train the model; the weight
    table broadcasts onto the features; one doc_id hash agg scores.
    Two shuffles total regardless of corpus size."""
    from ..cacheutil import cache_latest
    from .sampling import hash_bucket

    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(toks)
    sum_len = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    n_chars = F.length("text")
    n_sym = n_chars - F.length(
        F.regexp_replace(F.col("text"), r"[^A-Za-z0-9 ]", "")
    )
    n_stop = F.size(
        F.filter(
            toks,
            lambda x: x.isin("the", "a", "of", "and", "is", "in", "to"),
        )
    )
    y = (
        (n_words >= 10)
        & (n_words <= 1000)
        & (sum_len >= 3 * n_words)
        & (sum_len <= 10 * n_words)
        & (10 * n_sym <= n_chars)
        & (n_stop >= 2)
    ).cast("bigint")
    d = table(spark, sf_dir, "documents").select(
        "doc_id", y.alias("y"), toks.alias("t")
    )
    count = F.greatest(F.size("t") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice("t", 1, count),
        F.slice("t", 2, count),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    ngb = cache_latest(
        "nb_features",
        d.select("doc_id", "y", F.explode(bigrams).alias("ng")).select(
            "doc_id", "y", hash_bucket(F.col("ng"), DSIR_BUCKETS).alias("b")
        ),
    )
    counts = ngb.groupBy("b").agg(
        F.count(F.lit(1)).alias("all_c"), F.sum("y").alias("pos_c")
    )
    totals = counts.agg(
        F.sum("pos_c").alias("pos_n"),
        F.sum(F.col("all_c") - F.col("pos_c")).alias("neg_n"),
    )
    half_b = DSIR_BUCKETS * 0.5
    w = F.log(
        (F.col("pos_c") + 0.5) / (F.col("pos_n") + F.lit(half_b))
    ) - F.log(
        (F.col("all_c") - F.col("pos_c") + 0.5) / (F.col("neg_n") + F.lit(half_b))
    )
    wfp = F.floor(F.round(w, 6) * 1e6 + F.lit(0.5)).cast("bigint")
    wtab = counts.crossJoin(F.broadcast(totals)).select("b", wfp.alias("wfp"))
    scored = ngb.join(F.broadcast(wtab), "b")
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.max("y").alias("label"),
        F.sum("wfp").alias("s"),
    )
    # the one final division, kept EXACT: mean per-ngram log-odds in
    # 1e-4 fixed point via integer half-away-from-zero rounding
    # (sf1 drill caught round(sum/n/1e6, 4) flipping a half-ulp
    # boundary differently across engines — the r13 float-div trap)
    mean_e4 = F.expr(
        "CAST(CASE WHEN s < 0 THEN -1 ELSE 1 END AS BIGINT) * "
        "((2 * abs(s) + n_ngrams * 100) DIV (2 * n_ngrams * 100))"
    )
    return agg.select(
        "doc_id",
        "n_ngrams",
        "label",
        (mean_e4 / F.lit(10000.0)).alias("nb_score"),
    )


QUERIES["q_quality_nb_score"] = q_quality_nb_score

_NB_GOPHER_Y = (
    "((len(toks) BETWEEN 10 AND 1000) AND "
    "(length(regexp_replace(trim(text), '\\s+', '', 'g')) "
    "BETWEEN 3 * len(toks) AND 10 * len(toks)) AND "
    "(10 * (length(text) - length(regexp_replace(text, "
    "'[^A-Za-z0-9 ]', '', 'g'))) <= length(text)) AND "
    "(len(list_filter(toks, x -> x IN "
    "('the', 'a', 'of', 'and', 'is', 'in', 'to'))) >= 2))::BIGINT"
)

ORACLE["q_quality_nb_score"] = (
    "WITH t0 AS (SELECT doc_id, text, "
    "string_split_regex(trim(text), '\\s+') AS toks FROM documents), "
    "t AS (SELECT doc_id, toks, " + _NB_GOPHER_Y + " AS y FROM t0), "
    "ng AS (SELECT doc_id, y, unnest(list_transform("
    "  range(1, greatest(len(toks) - 1, 0) + 1), "
    "  i -> toks[i] || ' ' || toks[i+1])) AS ng FROM t), "
    "ngb AS (SELECT doc_id, y, "
    f"(('0x' || substr(md5(ng), 1, 8))::UBIGINT % {DSIR_BUCKETS}) AS b "
    "FROM ng), "
    "counts AS (SELECT b, count(*)::BIGINT AS all_c, "
    "sum(y)::BIGINT AS pos_c FROM ngb GROUP BY b), "
    "tot AS (SELECT sum(pos_c) AS pos_n, "
    "sum(all_c - pos_c) AS neg_n FROM counts), "
    "w AS (SELECT b, floor(round("
    f"  ln((pos_c + 0.5) / (pos_n + {DSIR_BUCKETS * 0.5})) - "
    f"  ln((all_c - pos_c + 0.5) / (neg_n + {DSIR_BUCKETS * 0.5})), 6) * 1e6 "
    "  + 0.5)::BIGINT AS wfp FROM counts CROSS JOIN tot) "
    ", a AS (SELECT doc_id, count(*)::BIGINT AS n_ngrams, "
    "max(y)::BIGINT AS label, sum(wfp)::BIGINT AS s "
    "FROM ngb JOIN w USING (b) GROUP BY doc_id) "
    "SELECT doc_id, n_ngrams, label, "
    "(CASE WHEN s < 0 THEN -1 ELSE 1 END) * "
    "((2 * abs(s) + n_ngrams * 100) // (2 * n_ngrams * 100)) / 10000.0 "
    "AS nb_score FROM a"
)
