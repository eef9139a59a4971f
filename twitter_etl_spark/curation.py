"""End-to-end LLM corpus curation: the operator families composed
into the pipeline they exist for ([EXT]; the 100 TB analogue of the
reference's clean→dedup→append loop, ``main.R:82-121``).

Stages (each individually oracle-certified as a query; this module
is their composition):

1. **Normalize** — the 5-step cleaning chain (``cleaning.py``).
2. **Exact dedup** — keep-first by normalized digest
   (``q_dedup_normalized`` semantics): one hash-agg shuffle on a
   32-byte key.
3. **Quality gate** — minimum token count on the normalized text
   (the ``q_text_quality`` banding, reduced to its load-bearing
   predicate so the oracle stays simple).
4. **Leakage-safe split** — train/val/test by digest hash
   (``q_sample_leakage_safe``): duplicates co-travel by
   construction, because the split key IS the dedup key.
5. **Shard export** — deterministic content-keyed shards
   (``sinks.export_training_shards``).

Scale: stages 1/3/4 are per-row projections; stage 2 is the one
shuffle (on the digest); stage 5 is one shuffle on the shard id.
Nothing else moves data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cleaning import clean_chain

MIN_TOKENS = 3


def curate(docs: DataFrame) -> DataFrame:
    """documents -> curated rows (doc_id, text, norm_digest, split).

    Keep-first exact dedup on the normalized digest via
    ``min_by(struct)`` (hash agg, map-side combine — the flagship's
    skew-robust shape), then the quality gate and the digest-keyed
    split assignment."""
    from .queries.sampling import hash_bucket

    norm = clean_chain(F.col("text"))
    d = docs.select(
        "doc_id", "text", F.md5(norm).alias("norm_digest"), norm.alias("__norm")
    )
    keeper = (
        d.groupBy("norm_digest")
        .agg(F.min_by(F.struct("doc_id", "text", "__norm"), F.col("doc_id")).alias("w"))
        .select(
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.text").alias("text"),
            "norm_digest",
            F.col("w.__norm").alias("__norm"),
        )
    )
    quality_ok = F.size(F.split(F.trim("__norm"), r"\s+")) >= MIN_TOKENS
    bucket = hash_bucket(F.col("norm_digest"))
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    return (
        keeper.filter(quality_ok)
        .select("doc_id", "text", "norm_digest", split.alias("split"))
    )


def curate_and_shard(docs: DataFrame, out_dir: str, n_shards: int = 8) -> dict:
    """Run the full pipeline and export per-split shard directories.
    Returns per-split row counts (one write action per split, ONE
    count job for all splits — not one count per split)."""
    from .sinks import export_training_shards

    curated = curate(docs).cache()
    for split in ("train", "val", "test"):
        part = curated.filter(F.col("split") == split)
        export_training_shards(part, f"{out_dir}/{split}", "norm_digest", n_shards)
    counted = {
        r["split"]: r["n"]
        for r in curated.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    curated.unpersist()
    return {s: counted.get(s, 0) for s in ("train", "val", "test")}
