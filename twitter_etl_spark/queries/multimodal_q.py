"""Multimodal pipeline queries (SURVEY.md §2.6; rows-only).

The decode step is a deterministic stub (no codec libs in the
container) so these are rows-only for the driver, with the metadata
half additionally pinned by an oracle twin: digests/lengths are
computable in pure SQL on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import attach_binary_payload, decode_features
from ..tables import table


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct -> Arrow-batched feature
    extraction (stubbed codec; real mapInPandas plumbing).

    The feature vector is projected to scalar columns ``f0..f3``
    (fixed-width here; real codecs would keep the array internally
    and surface whatever fixed heads the downstream needs) — scalar
    output keeps the result hashable for any pandas-side comparator,
    and lets the stub's byte math be oracle-checked in pure SQL.
    """
    from ..session import ship_package_to_executors

    ship_package_to_executors(spark)
    d = table(spark, sf_dir, "documents")
    feats = decode_features(attach_binary_payload(d))
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        "digest",
        F.col("features")[0].alias("f0"),
        F.col("features")[1].alias("f1"),
        F.col("features")[2].alias("f2"),
        F.col("features")[3].alias("f3"),
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only projection over the multimodal frame — must
    never read the payload bytes at scale (column pruning); digest
    and byte length are oracle-checkable."""
    d = table(spark, sf_dir, "documents")
    mm = attach_binary_payload(d)
    return mm.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.digest").alias("digest"),
    )


#: frame-sampling geometry: 8-byte frames every 16 bytes, first 4
#: frames — 16 hex chars at stride 32 over the hex view.
_N_FRAMES, _FRAME_HEX, _STRIDE_HEX = 4, 16, 32


def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame sampling over the binary payload (the
    video/audio frame-sample shape): fixed-size byte windows at a
    fixed stride, as pure column expressions over the payload's hex
    view — one codegen'd projection + posexplode, no UDF, no
    payload shuffle (frames are cut where the payload is read).
    Partial tail frames are dropped (only full windows emitted)."""
    d = table(spark, sf_dir, "documents")
    h = F.hex(F.encode(F.col("text"), "UTF-8"))
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(_N_FRAMES - 1)),
        lambda i: F.substring(h, i * _STRIDE_HEX + 1, _FRAME_HEX),
    )
    return (
        d.select("doc_id", F.posexplode(frames).alias("frame_idx", "frame_hex"))
        .filter(F.length("frame_hex") == _FRAME_HEX)
    )


QUERIES = {
    "q_multimodal_decode": q_multimodal_decode,
    "q_multimodal_meta": q_multimodal_meta,
    "q_multimodal_framesample": q_multimodal_framesample,
}

ORACLE = {
    # The stub codec's byte math reproduced in SQL: f0 = byte length,
    # f1/f2 = first/last byte, f3 = sum(first 16 bytes) % 997 (all
    # exact integer-valued doubles, so cross-engine hashing is safe).
    "q_multimodal_decode": (
        "WITH b AS ("
        "  SELECT doc_id, text, hex(encode(text)) AS h, "
        "         octet_length(encode(text))::INT AS n FROM documents) "
        "SELECT doc_id, 'text-as-bytes' AS modality, n AS n_bytes, "
        "md5(text) AS digest, n::DOUBLE AS f0, "
        "CASE WHEN n = 0 THEN 0.0 "
        "     ELSE ('0x' || substring(h, 1, 2))::INT::DOUBLE END AS f1, "
        "CASE WHEN n = 0 THEN 0.0 "
        "     ELSE ('0x' || substring(h, 2*n - 1, 2))::INT::DOUBLE END AS f2, "
        "CASE WHEN n = 0 THEN 0.0 ELSE (list_sum(list_transform("
        "  range(0, least(16, n)), "
        "  i -> ('0x' || substring(h, i*2 + 1, 2))::INT))::BIGINT % 997)::DOUBLE "
        "END AS f3 FROM b"
    ),
    "q_multimodal_meta": (
        "SELECT doc_id, 'text-as-bytes' AS modality, "
        "length(text)::INT AS n_bytes, md5(text) AS digest FROM documents"
    ),
    "q_multimodal_framesample": (
        "SELECT doc_id, frame_idx, frame_hex FROM ("
        "  SELECT doc_id, "
        f"  UNNEST(range(0, {_N_FRAMES}))::INT AS frame_idx, "
        f"  UNNEST(list_transform(range(0, {_N_FRAMES}), "
        f"    i -> substring(hex(encode(text)), i*{_STRIDE_HEX} + 1, {_FRAME_HEX}))) "
        "    AS frame_hex "
        f"  FROM documents) WHERE len(frame_hex) = {_FRAME_HEX}"
    ),
}


#: WebDataset-style shard geometry: parallel pack groups (one
#: sequential writer each) and the target shard size in bytes.
_PACK_GROUPS = 8
_SHARD_BYTES = 4096


def q_multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest over the binary payloads: each
    document is assigned a (pack_group, shard_seq, byte_offset) — the
    exact index a multimodal tar-shard exporter writes so training
    readers can seek straight to a sample (payload bytes themselves
    never shuffle; the manifest is metadata-only).

    Layout rule: documents hash into ``_PACK_GROUPS`` independent
    pack groups (one sequential writer each — the unit of export
    parallelism; at cluster scale this is O(writers), here 8);
    within a group the stream order is doc_id, byte_offset is the
    running payload size, and a shard file starts every
    ``_SHARD_BYTES`` of stream offset (a payload whose START falls
    in shard k belongs to k, so files may straddle the boundary by
    one payload tail — the standard greedy-append policy, stated
    rather than hidden).

    Scale: ONE shuffle on pack_group + a per-group ordered window
    (the per-writer sequential order — embarrassingly parallel
    ACROSS groups, which is the knob that scales); metadata-only,
    the window sorts (doc_id, n_bytes) pairs, never payloads."""
    from pyspark.sql import Window

    from .sampling import hash_bucket

    d = table(spark, sf_dir, "documents")
    mm = attach_binary_payload(d)
    m = mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        hash_bucket(F.col("text"), _PACK_GROUPS).alias("pack_group"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = (F.sum("n_bytes").over(w) - F.col("n_bytes")).alias("byte_offset")
    return m.select("doc_id", "pack_group", "n_bytes", off).withColumn(
        "shard_seq",
        F.floor(F.col("byte_offset") / _SHARD_BYTES).cast("bigint"),
    )


#: caption snippet length for the paired manifest (chars of text).
_PAIR_CAPTION_CHARS = 48


def pair_manifest_frame(d: DataFrame) -> DataFrame:
    """The cross-modal pair manifest for a documents-shaped frame —
    shared by ``q_multimodal_pair_manifest`` and the paired-shard
    writer ``multimodal.export_paired_shards``."""
    from pyspark.sql import Window

    from .sampling import hash_bucket

    mm = attach_binary_payload(d)
    cap = F.concat(
        F.col("lang"),
        F.lit(": "),
        F.substring(F.col("text"), 1, _PAIR_CAPTION_CHARS),
    )
    m = mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("payload_bytes"),
        F.octet_length(cap).alias("caption_bytes"),
        hash_bucket(F.col("text"), _PACK_GROUPS).alias("pack_group"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = m.withColumn(
        "pair_bytes", F.col("payload_bytes") + F.col("caption_bytes")
    ).withColumn(
        "pair_start",
        (F.sum("pair_bytes").over(w) - F.col("pair_bytes")).cast("bigint"),
    )
    entries = F.array(
        F.struct(
            F.lit("payload").alias("kind"),
            F.col("payload_bytes").alias("n_bytes"),
            F.col("pair_start").alias("byte_offset"),
        ),
        F.struct(
            F.lit("caption").alias("kind"),
            F.col("caption_bytes").alias("n_bytes"),
            (F.col("pair_start") + F.col("payload_bytes")).alias(
                "byte_offset"
            ),
        ),
    )
    return g.select(
        "doc_id",
        "pack_group",
        F.floor(F.col("pair_start") / _SHARD_BYTES)
        .cast("bigint")
        .alias("shard_seq"),
        F.explode(entries).alias("e"),
    ).select(
        "doc_id",
        "pack_group",
        "shard_seq",
        F.col("e.kind").alias("kind"),
        F.col("e.n_bytes").alias("n_bytes"),
        F.col("e.byte_offset").alias("byte_offset"),
    )


def q_multimodal_pair_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal PAIRED shard manifest: each document contributes
    TWO adjacent entries — its binary payload and its caption text —
    co-located in the same pack-group stream, the WebDataset pairing
    real multimodal training reads (img.jpg + img.txt next to each
    other in one tar, seekable with one manifest; the r12 verdict's
    missing cross-modal surface). Output: one row per entry
    (doc_id, pack_group, shard_seq, kind ∈ {payload, caption},
    n_bytes, byte_offset).

    The pairing CONTRACT is what distinguishes this from running
    q_multimodal_shard_manifest twice: shard assignment is decided
    by the PAIR's start offset, and both entries inherit it — a
    sample's files must never split across tars (WebDataset's
    __key__ grouping rule), so the caption rides with its payload
    even when the shard boundary falls between them. The caption is
    the deterministic ``lang: text[:48]`` snippet (a real pipeline
    swaps in its caption column; byte arithmetic is identical).

    Scale: metadata-only like the single-modality manifest — ONE
    shuffle on pack_group, a per-group running-sum window over
    (doc_id, two small ints), then a 2-element explode. Payload and
    caption BYTES never shuffle; at 100 TB the window sorts 16-byte
    rows across O(writers) independent groups."""
    return pair_manifest_frame(table(spark, sf_dir, "documents"))


QUERIES["q_multimodal_pair_manifest"] = q_multimodal_pair_manifest
ORACLE["q_multimodal_pair_manifest"] = (
    "WITH m AS (SELECT doc_id, "
    "  octet_length(encode(text))::INT AS payload_bytes, "
    "  octet_length(encode(lang || ': ' || "
    f"    substring(text, 1, {_PAIR_CAPTION_CHARS})))::INT AS caption_bytes, "
    f"  (('0x' || substr(md5(text), 1, 8))::UBIGINT % {_PACK_GROUPS}) "
    "    AS pack_group FROM documents), "
    "g AS (SELECT *, payload_bytes + caption_bytes AS pair_bytes FROM m), "
    "o AS (SELECT *, CAST(sum(pair_bytes) OVER (PARTITION BY pack_group "
    "  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "  - pair_bytes AS BIGINT) AS pair_start FROM g) "
    "SELECT doc_id, pack_group, "
    f"CAST(floor(pair_start / {_SHARD_BYTES}) AS BIGINT) AS shard_seq, "
    "UNNEST(['payload', 'caption']) AS kind, "
    "UNNEST([payload_bytes, caption_bytes]) AS n_bytes, "
    "UNNEST([pair_start, pair_start + payload_bytes])::BIGINT AS byte_offset "
    "FROM o"
)


QUERIES["q_multimodal_shard_manifest"] = q_multimodal_shard_manifest
ORACLE["q_multimodal_shard_manifest"] = (
    "WITH m AS (SELECT doc_id, octet_length(encode(text))::INT AS n_bytes, "
    f"  (('0x' || substr(md5(text), 1, 8))::UBIGINT % {_PACK_GROUPS}) "
    "    AS pack_group FROM documents), "
    "o AS (SELECT *, CAST(sum(n_bytes) OVER (PARTITION BY pack_group "
    "  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "  - n_bytes AS BIGINT) AS byte_offset FROM m) "
    "SELECT doc_id, pack_group, n_bytes, byte_offset, "
    f"CAST(floor(byte_offset / {_SHARD_BYTES}) AS BIGINT) AS shard_seq FROM o"
)


#: dHash geometry: 8x8 sampled "pixels" -> 8 rows x 7 adjacent
#: comparisons = 56 hash bits; 4 bands of 14 bits for the LSH join.
_PH_PIX, _PH_ROWS, _PH_COLS = 64, 8, 8
_PH_BITS = _PH_ROWS * (_PH_COLS - 1)
_PH_BANDS, _PH_BAND_BITS = 4, 14
_PH_MAX_HAMMING = 12
#: hot-band cap (the MAX_SHINGLE_DF family): a band value shared by
#: more docs than this is skipped — boilerplate-identical payloads
#: would otherwise pair quadratically.
_PH_MAX_BAND_DF = 64


def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over binary payloads
    — the image-dedup stage of a multimodal curation pipeline
    (dHash, the difference-hash of Krawetz 2013), run end-to-end on
    the deterministic stub decode so the WHOLE chain is
    oracle-certified: sample the payload to an 8x8 "thumbnail"
    (byte value at a stride over the payload — the stub stand-in
    for decode+resize; a real codec swaps ONLY this projection),
    hash = 56 bits of adjacent-pixel comparisons (gradient signs —
    robust to brightness/scale shifts in real images), then banded
    LSH over 4x14-bit bands: docs sharing any band become candidate
    pairs, verified at Hamming distance <= 12 via bit_count(xor).

    Exactly the q_dedup_minhash_banded shape lifted to the image
    domain: ONE hash per payload (64 ascii lookups + 56 integer
    comparisons, pure codegen'd expressions — no UDF), one shuffle
    of the 4-row-per-doc band table, candidate pairs only WITHIN a
    band bucket (never all-pairs), hot bands df-capped at
    _PH_MAX_BAND_DF=64 (the MAX_SHINGLE_DF recall trade, stated by
    the oracle too), exact verify on the 8-byte hash. At 100 TB the
    payload reads once; everything downstream is 8-byte integers."""
    d = table(spark, sf_dir, "documents")
    # deliberately UNROLLED pixel/bit expressions: the HOF twin
    # (transform + aggregate over sequence) was measured 30x slower
    # (132 s vs 4 s at sf0.1 — per-element lambda interpretation),
    # so the 56 comparison terms pay their codegen size
    hashed = phash_frame(d)
    return phash_pairs(hashed)


def phash_frame(d: DataFrame) -> DataFrame:
    """(doc_id, phash) for a documents-shaped frame — the dHash
    computation shared by the one-shot query and the incremental
    rollup (rollup.update_phash_rollup)."""
    ln = F.length("text")
    stride = F.greatest(F.floor(ln / _PH_PIX).cast("int"), F.lit(1))
    px = [
        F.ascii(
            F.substring(
                F.col("text"),
                ((F.lit(i) * stride) % ln + 1).cast("int"),
                1,
            )
        )
        for i in range(_PH_PIX)
    ]
    bit_terms = []
    k = 0
    for r in range(_PH_ROWS):
        for c in range(_PH_COLS - 1):
            bit_terms.append(
                F.shiftleft(
                    (px[r * _PH_COLS + c] > px[r * _PH_COLS + c + 1]).cast(
                        "long"
                    ),
                    k,
                )
            )
            k += 1
    # deliberately one UNROLLED projection: the HOF twin (aggregate
    # over sequence with element_at lambdas) measured 30x slower
    # (132 s vs 4 s at sf0.1 — per-element interpreted lambdas), and
    # a staged multi-projection split is re-collapsed by Catalyst
    # into a duplicated tree that wedges analysis. The single big
    # expression exceeds the JVM method limit and evaluates
    # interpreted — at 56 integer ops/row that is still scan-bound.
    phash = sum(bit_terms[1:], bit_terms[0])
    # eager localCheckpoint (the q_geo_dbscan lesson): the hash frame
    # feeds the band table, the df-cap agg and both pair-join sides —
    # evaluate the 120-term expression once AND truncate the lineage
    # so downstream plans carry a 2-column scan, not 3 copies of the
    # giant tree (measured: planning dominated the 4 s at sf0.1)
    return d.select("doc_id", phash.alias("phash")).localCheckpoint()


def phash_pairs(hashed: DataFrame, b_side: DataFrame | None = None) -> DataFrame:
    """Banded near-dup pairs from a (doc_id, phash) frame. With
    ``b_side`` (a frame of batch doc_ids), the pair scan's b-side is
    restricted to the batch — |bucket|·|bucket ∩ batch| comparisons
    instead of |bucket|², the `_pairs_from_state` incremental shape;
    a batch doc dropped by the lower-id rule appears as doc_b."""
    bands = hashed.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("phash"), b * _PH_BAND_BITS)
                        .bitwiseAND(F.lit((1 << _PH_BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for b in range(_PH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "phash", "b.band_idx", "b.band_val")
    df_ok = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= _PH_MAX_BAND_DF)
        .select("band_idx", "band_val")
    )
    bands = bands.join(df_ok, ["band_idx", "band_val"])
    a = bands.select(
        "band_idx", "band_val",
        F.col("doc_id").alias("doc_a"), F.col("phash").alias("ha"),
    )
    b = bands.select(
        "band_idx", "band_val",
        F.col("doc_id").alias("doc_b"), F.col("phash").alias("hb"),
    )
    if b_side is not None:
        b = b.join(
            b_side.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi"
        )
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= _PH_MAX_HAMMING)
    )


QUERIES["q_multimodal_phash_dedup"] = q_multimodal_phash_dedup


def _ph_sql() -> str:
    px = [
        f"ascii(substr(text, ((({i} * s) % L) + 1)::INT, 1))"
        for i in range(_PH_PIX)
    ]
    terms = []
    k = 0
    for r in range(_PH_ROWS):
        for c in range(_PH_COLS - 1):
            terms.append(
                f"(({px[r * _PH_COLS + c]} > {px[r * _PH_COLS + c + 1]})"
                f"::BIGINT << {k})"
            )
            k += 1
    return " + ".join(terms)


ORACLE["q_multimodal_phash_dedup"] = (
    "WITH p AS (SELECT doc_id, greatest((length(text) // "
    f"{_PH_PIX}), 1) AS s, length(text) AS L, text FROM documents), "
    f"h AS (SELECT doc_id, ({_ph_sql()}) AS phash FROM p), "
    "bands AS (SELECT doc_id, phash, b AS band_idx, "
    f"((phash >> (b * {_PH_BAND_BITS})) & {(1 << _PH_BAND_BITS) - 1}) "
    "AS band_val FROM h, (SELECT unnest(range("
    f"{_PH_BANDS}))::INT AS b)), "
    "ok AS (SELECT band_idx, band_val FROM bands "
    f"GROUP BY 1, 2 HAVING count(*) <= {_PH_MAX_BAND_DF}), "
    "kept AS (SELECT bands.* FROM bands JOIN ok USING (band_idx, band_val)) "
    "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "bit_count(xor(a.phash, b.phash))::INT AS hamming "
    "FROM kept a JOIN kept b ON a.band_idx = b.band_idx "
    "AND a.band_val = b.band_val AND a.doc_id < b.doc_id "
    f"WHERE bit_count(xor(a.phash, b.phash)) <= {_PH_MAX_HAMMING}"
)


#: alignment-score geometry: 8-dim features both sides, bottom
#: decile flagged (the CLIP-style pair filter's keep/drop knob).
_ALIGN_DIM = 8
_ALIGN_LOW_Q = 0.10


def _align_char_class(r: int) -> str:
    """The caption-histogram buckets as EXPLICIT character classes:
    bucket r holds the printable-ASCII chars (32..126) whose
    codepoint % 8 == r; anything else counts nowhere. Explicit
    classes let both engines count via ONE regex strip per bucket
    (JVM/RE2 regex, codegen'd) instead of a per-character lambda
    fold — measured 1.88 s -> 0.59 s at sf0.1 for the 8 buckets."""
    import re as _re

    chars = "".join(chr(c) for c in range(32, 127) if c % _ALIGN_DIM == r)
    return "[^" + _re.sub(r"([\\\^\]\[\-])", r"\\\1", chars) + "]"


def q_multimodal_align_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal alignment scoring — the CLIP-style pair filter of
    multimodal curation (Radford et al. 2021's score, stub
    features), consuming the SAME payload/caption pairing as
    ``q_multimodal_pair_manifest`` (r13 verdict #5): per document,
    an 8-dim "image" feature (row sums of the dHash 8x8 byte-sample
    thumbnail — the stub decode of q_multimodal_phash_dedup; a real
    codec swaps only this projection) is scored against an 8-dim
    caption feature (character histogram of the manifest's
    ``lang: text[:48]`` caption over 8 explicit printable-ASCII
    codepoint%8 classes — :func:`_align_char_class`; one regex
    strip per bucket, no per-char lambdas) by
    cosine, and the bottom ``_ALIGN_LOW_Q`` of pairs is flagged
    ``low_align`` — the drop set a curation job would cut.

    Integer-exact until one final sqrt/round: both feature vectors
    are small-int arrays, the dot/norms are exact BIGINT sums.

    Scale: features are pure per-row projections over the payload
    read (no shuffle, no UDF); the decile threshold is ONE 1-row
    percentile_disc agg broadcast back (the q_behavior_rfm quantile
    pattern — never a global sort of scores)."""
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    ln = F.length("text")
    stride = F.greatest(F.floor(ln / _PH_PIX).cast("int"), F.lit(1))
    px = [
        F.ascii(
            F.substring(
                F.col("text"),
                ((F.lit(i) * stride) % ln + 1).cast("int"),
                1,
            )
        )
        for i in range(_PH_PIX)
    ]
    img = [
        sum([px[r * _PH_COLS + c] for c in range(1, _PH_COLS)],
            px[r * _PH_COLS]).cast("long")
        for r in range(_ALIGN_DIM)
    ]
    cap = F.concat(
        F.col("lang"),
        F.lit(": "),
        F.substring(F.col("text"), 1, _PAIR_CAPTION_CHARS),
    )
    hist = [
        F.length(F.regexp_replace(cap, _align_char_class(r), "")).cast(
            "long"
        )
        for r in range(_ALIGN_DIM)
    ]
    dot = sum(
        [img[r] * hist[r] for r in range(1, _ALIGN_DIM)], img[0] * hist[0]
    )
    n_img = sum([img[r] * img[r] for r in range(1, _ALIGN_DIM)], img[0] * img[0])
    n_cap = sum(
        [hist[r] * hist[r] for r in range(1, _ALIGN_DIM)], hist[0] * hist[0]
    )
    scored = d.select(
        "doc_id",
        F.round(
            dot.cast("double")
            / (F.sqrt(n_img.cast("double")) * F.sqrt(n_cap.cast("double"))),
            6,
        ).alias("align_score"),
    )
    # eager fence (the phash lineage lesson): the threshold agg AND
    # the final projection both consume `scored`, and without the
    # checkpoint each re-evaluates the 64-substring sample + the 9
    # interpreted caption HOFs (measured 6.6 s -> 3.4 s at sf0.1).
    # The checkpointed frame is (doc_id, double) — tiny.
    scored = scored.localCheckpoint()
    thr = scored.agg(
        F.expr(
            f"percentile_disc({_ALIGN_LOW_Q}) WITHIN GROUP (ORDER BY align_score)"
        ).alias("__thr")
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "align_score",
        F.when(F.col("align_score") <= F.col("__thr"), 1)
        .otherwise(0)
        .alias("low_align"),
    )


QUERIES["q_multimodal_align_score"] = q_multimodal_align_score


def _align_sql() -> str:
    img = [
        "("
        + " + ".join(
            f"ascii(substr(text, ((({r * _PH_COLS + c} * s) % L) + 1)::INT, 1))"
            for c in range(_PH_COLS)
        )
        + ")::BIGINT"
        for r in range(_ALIGN_DIM)
    ]
    def _sql_class(r: int) -> str:
        return _align_char_class(r).replace("'", "''")

    hist = [
        f"length(regexp_replace(cap, '{_sql_class(r)}', '', 'g'))::BIGINT"
        for r in range(_ALIGN_DIM)
    ]
    dot = " + ".join(f"i{r} * h{r}" for r in range(_ALIGN_DIM))
    n_img = " + ".join(f"i{r} * i{r}" for r in range(_ALIGN_DIM))
    n_cap = " + ".join(f"h{r} * h{r}" for r in range(_ALIGN_DIM))
    img_cols = ", ".join(f"{img[r]} AS i{r}" for r in range(_ALIGN_DIM))
    hist_cols = ", ".join(f"{hist[r]} AS h{r}" for r in range(_ALIGN_DIM))
    return (
        "WITH p AS (SELECT doc_id, text, lang, "
        f"greatest((length(text) // {_PH_PIX}), 1) AS s, "
        "length(text) AS L FROM documents WHERE length(text) > 0), "
        "c AS (SELECT doc_id, text, s, L, "
        f"lang || ': ' || substring(text, 1, {_PAIR_CAPTION_CHARS}) AS cap "
        "FROM p), "
        f"f AS (SELECT doc_id, {img_cols}, {hist_cols} FROM c), "
        f"scored AS (SELECT doc_id, round(({dot})::DOUBLE / "
        f"(sqrt(({n_img})::DOUBLE) * sqrt(({n_cap})::DOUBLE)), 6) "
        "AS align_score FROM f), "
        f"thr AS (SELECT quantile_disc(align_score, {_ALIGN_LOW_Q}) AS t "
        "FROM scored) "
        "SELECT doc_id, align_score, "
        "CASE WHEN align_score <= thr.t THEN 1 ELSE 0 END AS low_align "
        "FROM scored CROSS JOIN thr"
    )


ORACLE["q_multimodal_align_score"] = _align_sql()


#: caption-divergence threshold for the conflict flag.
_CONFLICT_JACCARD = 0.30


def q_multimodal_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal CONSISTENCY audit — the second consumer of the
    pairing surface: documents whose payloads are perceptual
    near-duplicates (``q_multimodal_phash_dedup``'s banded dHash
    pairs, Hamming ≤ 12) but whose captions DIVERGE (word-2-gram
    Jaccard < ``_CONFLICT_JACCARD`` between the two ``lang:
    text[:48]`` captions). Same image + different caption is the
    classic multimodal label-noise signature (mislabeled near-dup,
    stolen/re-captioned content); a curation job routes conflicts to
    arbitration instead of blindly keeping the lower doc_id. Output:
    every near-dup pair with its Hamming distance, caption Jaccard,
    and ``conflict`` 1/0.

    Scale: the pair list is the ALREADY-BOUNDED phash candidate set
    (banded LSH, hot bands df-capped), so the caption comparison is
    a per-pair array intersect over ≤ ~10-token shingle sets — two
    small equi-joins of the pair list against the per-doc caption
    shingles, payload bytes never touched after the hash."""
    d = table(spark, sf_dir, "documents")
    pairs = phash_pairs(phash_frame(d))
    cap = F.concat(
        F.col("lang"),
        F.lit(": "),
        F.substring(F.col("text"), 1, _PAIR_CAPTION_CHARS),
    )
    toks = F.split(F.trim(cap), r"\s+")
    sh = F.array_distinct(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            # null-PROPAGATING concat: zip_with pads the shorter side
            # with null, and concat_ws would silently turn that pad
            # into a spurious trailing unigram (caught by the oracle)
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    shingles = d.select("doc_id", sh.alias("sh")).select(
        "doc_id", F.expr("filter(sh, x -> x IS NOT NULL)").alias("sh")
    )
    j = (
        pairs.join(
            shingles.select(
                F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
            ),
            "doc_a",
        )
        .join(
            shingles.select(
                F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
            ),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(
        inter / F.nullif(union.cast("double"), F.lit(0.0)), 6
    )
    return j.select(
        "doc_a",
        "doc_b",
        "hamming",
        F.coalesce(jac, F.lit(0.0)).alias("caption_jaccard"),
        F.when(F.coalesce(jac, F.lit(0.0)) < _CONFLICT_JACCARD, 1)
        .otherwise(0)
        .alias("conflict"),
    )


QUERIES["q_multimodal_conflict"] = q_multimodal_conflict

ORACLE["q_multimodal_conflict"] = (
    "WITH p AS (SELECT doc_id, greatest((length(text) // "
    f"{_PH_PIX}), 1) AS s, length(text) AS L, text FROM documents), "
    f"h AS (SELECT doc_id, ({_ph_sql()}) AS phash FROM p), "
    "bands AS (SELECT doc_id, phash, b AS band_idx, "
    f"((phash >> (b * {_PH_BAND_BITS})) & {(1 << _PH_BAND_BITS) - 1}) "
    "AS band_val FROM h, (SELECT unnest(range("
    f"{_PH_BANDS}))::INT AS b)), "
    "ok AS (SELECT band_idx, band_val FROM bands "
    f"GROUP BY 1, 2 HAVING count(*) <= {_PH_MAX_BAND_DF}), "
    "kept AS (SELECT bands.* FROM bands JOIN ok USING (band_idx, band_val)), "
    "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "bit_count(xor(a.phash, b.phash))::INT AS hamming "
    "FROM kept a JOIN kept b ON a.band_idx = b.band_idx "
    "AND a.band_val = b.band_val AND a.doc_id < b.doc_id "
    f"WHERE bit_count(xor(a.phash, b.phash)) <= {_PH_MAX_HAMMING}), "
    "caps AS (SELECT doc_id, list_distinct(list_transform("
    "  range(1, greatest(len(toks) - 1, 0) + 1), "
    "  i -> toks[i] || ' ' || toks[i+1])) AS sh FROM "
    "  (SELECT doc_id, string_split_regex(trim(lang || ': ' || "
    f"   substring(text, 1, {_PAIR_CAPTION_CHARS})), '\\s+') AS toks "
    "   FROM documents)), "
    "v AS (SELECT doc_a, doc_b, hamming, "
    "  len(list_intersect(ca.sh, cb.sh)) AS n_i, "
    "  len(ca.sh) AS n_a, len(cb.sh) AS n_b "
    "  FROM pairs JOIN caps ca ON pairs.doc_a = ca.doc_id "
    "  JOIN caps cb ON pairs.doc_b = cb.doc_id) "
    "SELECT doc_a, doc_b, hamming, "
    "coalesce(round(n_i * 1.0 / nullif((n_a + n_b - n_i), 0), 6), 0.0) "
    "  AS caption_jaccard, "
    "CASE WHEN coalesce(round(n_i * 1.0 / nullif((n_a + n_b - n_i), 0), 6), 0.0) "
    f"  < {_CONFLICT_JACCARD} THEN 1 ELSE 0 END AS conflict "
    "FROM v"
)


def q_multimodal_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image duplicate-CLUSTER resolution — the third consumer of
    the perceptual-hash pair surface (after the incremental rollup
    and the conflict audit): connected components over the banded
    dHash near-dup pairs (``q_multimodal_phash_dedup``'s bounded
    candidate set), keeper = minimum doc_id per component — the
    keep-one-per-visual-duplicate-family stage an image curation
    job runs, lifted from the lexical twin ``q_dedup_cluster``.
    Output, one row per clustered payload: (doc_id, cluster_id,
    is_keeper).

    Scale: the pair stage is the certified banded/df-capped scan
    (never all-pairs); components come from the shared
    ``graph.star_components`` core — O(log n) large/small-star
    rounds, per-round localCheckpoint (the r14 plan-blowup lesson),
    one convergence probe per round. Oracle: the phash pair SQL
    wrapped in the recursive label-spread CTE (the q_dedup_cluster
    pattern)."""
    from .graph import star_components

    d = table(spark, sf_dir, "documents")
    pairs = phash_pairs(phash_frame(d)).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    cc = star_components(pairs, caller="q_multimodal_dedup_cluster")
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).cast("bigint").alias("is_keeper"),
    )


QUERIES["q_multimodal_dedup_cluster"] = q_multimodal_dedup_cluster

ORACLE["q_multimodal_dedup_cluster"] = (
    "WITH RECURSIVE pairs AS ("
    + ORACLE["q_multimodal_phash_dedup"]
    + "), "
    "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
    "          UNION ALL SELECT doc_b, doc_a FROM pairs), "
    "nodes AS (SELECT DISTINCT src AS node FROM edges), "
    "reach(node, lab) AS ("
    "  SELECT node, node FROM nodes "
    "  UNION "
    "  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node) "
    "SELECT node AS doc_id, min(lab) AS cluster_id, "
    "(node = min(lab))::BIGINT AS is_keeper FROM reach GROUP BY node"
)
