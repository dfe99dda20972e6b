"""Multimodal-tier queries — binary media columns with typed metadata
(SURVEY.md §2.11 X5) synthesized deterministically from the documents table
(multimodal/columns.media_from_documents), so every stage is
DuckDB-oracle-checkable: md5-over-UTF-8-bytes is identical on both sides,
and the stubbed decode's fake features (md5 digest bytes / 255) are
replicated in SQL via a 256-row hex→int lookup join.

Scale notes: payloads never leave the JVM except through Arrow batches in
the mapInPandas decode stage; metadata-only queries (media_metadata_by_type)
touch bytes solely via length/md5 — JVM-side, no Python. At 100 TB the
decode stage is bounded per-task by `spark.sql.files.maxPartitionBytes` and
is stateless, so speculative execution and retries are safe.
"""

from pyspark.sql import functions as F

from .query_registry import _t, pround, register

#: media_type synthesis shared by every oracle below (doc_id % 3 cycle).
_MTYPE = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


@register(
    "media_metadata_by_type",
    f"""
    WITH m AS (
      SELECT {_MTYPE} AS media_type,
             strlen(text) AS n_bytes, md5(text) AS payload_md5
      FROM documents
    )
    SELECT media_type, CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(count(DISTINCT payload_md5) AS BIGINT) AS distinct_payloads,
           round(CAST(sum(n_bytes) AS DOUBLE) / count(*), 4) AS avg_bytes
    FROM m GROUP BY media_type
    """,
    tags=("multimodal", "X5"),
)
def media_metadata_by_type(spark, sf_dir):
    """X5 — decode-free metadata pass (multimodal/columns.
    attach_media_metadata): byte length + md5 computed JVM-side over the
    binary payload, aggregated per modality. The shuffle carries 16-byte
    hashes and counters, never payloads."""
    from .multimodal.columns import attach_media_metadata, media_from_documents

    media = attach_media_metadata(media_from_documents(_t(spark, sf_dir, "documents")))
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("payload_md5").alias("distinct_payloads"),
        pround(F.sum("n_bytes").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_bytes"
        ),
    )


@register(
    "media_decode_features",
    """
    WITH hx AS (SELECT i, printf('%02x', i) AS h FROM range(256) t(i)),
    m AS (SELECT doc_id AS media_id, strlen(text) AS n_bytes, md5(text) AS dg
          FROM documents)
    SELECT m.media_id, CAST(coalesce(m.n_bytes, 0) AS BIGINT) AS n_bytes,
           round(coalesce(h0.i / 255.0, 0.0), 6) AS f0,
           round(coalesce(h1.i / 255.0, 0.0), 6) AS f1
    FROM m
    LEFT JOIN hx h0 ON substr(m.dg, 1, 2) = h0.h
    LEFT JOIN hx h1 ON substr(m.dg, 3, 2) = h1.h
    """,
    tags=("multimodal", "X5"),
)
def media_decode_features(spark, sf_dir):
    """X5 — the Arrow-batched mapInPandas decode stage (multimodal/columns.
    decode_media_batch, stubbed: features = md5 digest bytes / 255). The
    oracle reproduces the fake feature bytes in pure SQL with a 256-row
    hex lookup, so even the stub path is value-checked end to end."""
    from .multimodal.columns import decode_media_batch, media_from_documents

    decoded = decode_media_batch(media_from_documents(_t(spark, sf_dir, "documents")))
    return decoded.select(
        "media_id",
        F.col("n_bytes").alias("n_bytes"),
        pround(F.coalesce(F.element_at("features", 1), F.lit(0.0)), 6).alias("f0"),
        pround(F.coalesce(F.element_at("features", 2), F.lit(0.0)), 6).alias("f1"),
    )


@register(
    "media_frame_plan",
    f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 0
                  ELSE coalesce(n_chars, 0) * 10 END AS dur
      FROM documents
    ),
    n AS (SELECT media_id, greatest(1, dur // 1000) AS n_frames FROM m),
    f AS (SELECT media_id,
                 unnest(generate_series(0, n_frames - 1)) AS i
          FROM n)
    SELECT media_id, CAST(i AS INT) AS frame_idx,
           CAST(i * 1000 AS BIGINT) AS frame_ms
    FROM f
    """,
    tags=("multimodal", "X5"),
)
def media_frame_plan(spark, sf_dir):
    """X5 — video frame sampling as a row-expanding mapInPandas stage
    (multimodal/columns.frame_sample): one row per sampled frame at 1 s
    cadence, n = max(1, duration_ms // 1000). The oracle regenerates the
    frame grid with generate_series; frame features (stub-derived) are
    projected out so the check pins the expansion shape exactly."""
    from .multimodal.columns import frame_sample, media_from_documents

    frames = frame_sample(
        media_from_documents(_t(spark, sf_dir, "documents")), every_ms=1000
    )
    return frames.select(
        "media_id",
        "frame_idx",
        F.col("frame_ms").alias("frame_ms"),
    )


@register(
    "media_audio_rms_windows",
    """
    WITH audio AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
    samp AS (
      SELECT doc_id, CAST(i // 100 AS INT) AS window_idx,
             ((doc_id * 7919 + i * 31) % 2003) - 1001 AS s
      FROM audio, UNNEST(range(400)) t(i)
    )
    SELECT doc_id AS media_id, window_idx,
           CAST(count(*) AS INT) AS n_samples,
           round(sqrt(sum(s * s) / CAST(count(*) AS DOUBLE)), 6) AS rms,
           CAST(max(abs(s)) AS INT) AS peak
    FROM samp GROUP BY 1, 2
    """,
    tags=("multimodal", "X5", "audio"),
)
def media_audio_rms_windows(spark, sf_dir):
    """X5 — windowed audio features over REAL WAV bytes (multimodal/
    columns.audio_rms_windows): each audio doc gets a deterministic
    400-sample PCM16 payload synthesized from its id, written through
    codecs.encode_wav, then the operator decodes it back
    (codecs.decode_wav) and emits per-100-sample-window RMS + peak. The
    oracle computes the same windows straight from the sample formula —
    hash equality therefore proves the WAV encode→decode roundtrip AND
    the windowing, not just the arithmetic. Both Python stages are
    chained Arrow maps: no shuffle until the (tiny) output."""
    import numpy as np
    import pandas as pd

    from .multimodal.codecs import encode_wav
    from .multimodal.columns import audio_rms_windows

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)

    def synth(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                i = np.arange(400, dtype=np.int64)
                s = ((int(did) * 7919 + i * 31) % 2003) - 1001
                payloads.append(encode_wav(s.astype("int16"), 8000))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    wav = docs.select("doc_id").mapInPandas(synth, "media_id long, payload binary")
    out = audio_rms_windows(wav, window_samples=100)
    return out.select(
        "media_id",
        F.col("window_idx").cast("int").alias("window_idx"),
        F.col("n_samples").cast("int").alias("n_samples"),
        pround("rms", 6).alias("rms"),
        F.col("peak").cast("int").alias("peak"),
    )


@register(
    "media_vit_patch_plan",
    """
    WITH imgs AS (
      SELECT doc_id AS media_id,
             CAST(n_chars % 640 + 16 AS INT) AS width,
             CAST(n_chars % 480 + 16 AS INT) AS height
      FROM documents WHERE doc_id % 3 = 0
    ),
    grid AS (
      SELECT media_id, width, height,
             CAST(ceil(width / 16.0) AS INT) AS n_x,
             CAST(ceil(height / 16.0) AS INT) AS n_y
      FROM imgs
    )
    SELECT media_id, width, height, n_x, n_y,
           CAST(n_x * n_y AS INT) AS n_patches,
           CAST(n_x * n_y + 1 AS INT) AS n_vit_tokens,
           CAST(CASE WHEN n_x * n_y > 1024 THEN 1 ELSE 0 END AS INT)
             AS needs_tiling
    FROM grid
    """,
    tags=("multimodal", "X5", "vit", "plumbing"),
)
def media_vit_patch_plan(spark, sf_dir):
    """ViT preprocessing plan for the image corpus: 16×16 patch-grid
    dimensions, patch count, transformer token count (+1 CLS), and a
    tiling flag for images over a 1024-patch context — the budgeting
    pass a multimodal training pipeline runs BEFORE any pixel decode
    (batch shaping and packing need token counts; decoding to get them
    would be a full corpus read). Pure metadata arithmetic over the
    typed media columns (X5 discipline: payload stays opaque), map-only
    on the image slice."""
    from .multimodal.columns import media_from_documents

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    imgs = media.filter(F.col("media_type") == "image").select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    n_x = F.ceil(F.col("width") / 16.0).cast("int")
    n_y = F.ceil(F.col("height") / 16.0).cast("int")
    grid = imgs.select("media_id", "width", "height", n_x.alias("n_x"), n_y.alias("n_y"))
    np_ = (F.col("n_x") * F.col("n_y")).cast("int")
    return grid.select(
        "media_id",
        "width",
        "height",
        "n_x",
        "n_y",
        np_.alias("n_patches"),
        (np_ + 1).cast("int").alias("n_vit_tokens"),
        F.when(np_ > 1024, 1).otherwise(0).cast("int").alias("needs_tiling"),
    )


@register(
    "media_jpeg_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(8 + doc_id % 24 AS INT) AS width,
           CAST(8 + doc_id % 16 AS INT) AS height
    FROM documents WHERE doc_id % 3 = 0
    """,
    tags=("multimodal", "X5", "jpeg", "codec"),
)
def media_jpeg_roundtrip(spark, sf_dir):
    """REAL baseline-JPEG encode→decode roundtrip under the external
    gate (the audio-RMS pattern applied to the r4 JPEG codec): each
    image doc gets a deterministic doc_id-seeded gradient of
    doc_id-derived dimensions, runs through `codecs.encode_jpeg` then
    `codecs.decode_jpeg` inside one Arrow mapInPandas pass, and emits
    the DECODED array's dimensions — which the oracle recomputes from
    doc_id arithmetic. Rows where the roundtrip mean-absolute-error
    reaches 4.0 (far above the ~1-2 a q50 codec produces) are DROPPED,
    so a codec regression surfaces as a driver row-count mismatch: the
    lossy pixel path is externally verified without SQL having to
    replay a DCT."""
    import pandas as pd
    from pyspark.sql import types as T

    from .multimodal.codecs import decode_jpeg, encode_jpeg

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                img = _gradient_image(int(doc_id))
                dec = decode_jpeg(encode_jpeg(img))
                mae = float(np.abs(dec.astype(float) - img).mean())
                if mae < 4.0:
                    rows.append(
                        (int(doc_id), int(dec.shape[1]), int(dec.shape[0]))
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height"]
            )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return docs.select("doc_id").mapInPandas(run, schema)


def _gradient_image(doc_id: int):
    """The deterministic doc_id-seeded test image every real-codec query
    shares: dimensions from doc_id mod 24/16, phases from mod 31/17.
    Two image docs produce byte-identical JPEGs iff all four residues
    agree (doc_id ≡ mod lcm(48, 31, 17) = 25 296) — the invariant every
    media oracle's doc_id arithmetic rests on.

    That invariant is pinned by EXHAUSTIVE ENUMERATION, not an
    amplitude argument: the original unit-step phases carried a prose
    proof ("pixel differences ≥ several quantization levels") that the
    r10 enumeration test refuted — classes 15984 and 21408 differed by
    ≤3 pixel levels (the sin and cos phase shifts partially cancel) and
    QUANTIZED TO IDENTICAL JPEG BYTES, silently merging two oracle
    classes. The phase multipliers (3.1, 2.3) were chosen so all 8 432
    realizable classes encode to pairwise-distinct payloads
    (test_media_phash_oracle_residue_classes_are_md5_distinct walks
    every class; worst roundtrip MAE 1.84, far under the roundtrip
    gate's 4.0)."""
    import numpy as np

    w = 8 + doc_id % 24
    h = 8 + doc_id % 16
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        128.0
        + 60.0 * np.sin((xx + 3.1 * (doc_id % 31)) / 7.0)
        + 50.0 * np.cos((yy + 2.3 * (doc_id % 17)) / 5.0)
    ).clip(0, 255).astype(np.uint8)


def _dhash64(dec) -> tuple[int, int]:
    """64-bit difference hash of a decoded grayscale array as two
    int32-range halves: 8 rows × 9 sampled columns, bit = left sample >
    right neighbor. Sampling (not cell means) so every width ≥ 8 is
    well-defined; deterministic integer arithmetic end to end.

    For width ≥ 9 the sampled column grid (j·(w−1))//8 is strictly
    increasing, so all 8 comparisons per row carry signal. At width 8
    that grid degenerates (cs[0]==cs[1] and cs[7]==cs[8] — two bits per
    row compare a pixel with itself and are constant 0, ADVICE r9), so
    the 8-wide case compares adjacent columns with one wraparound pair
    (col 7 vs col 0) instead — every bit is a real pixel comparison.
    Affects only Hamming-based NEAR-dup recall on the smallest images
    (the ``include_near`` path); exact-duplicate classes come from
    payload md5, not the hash."""
    h2, w2 = dec.shape
    if w2 >= 9:
        cs = [(j * (w2 - 1)) // 8 for j in range(9)]
        col_pairs = [(cs[j], cs[j + 1]) for j in range(8)]
    else:
        col_pairs = [(j, (j + 1) % w2) for j in range(8)]
    rs = [(i * (h2 - 1)) // 7 for i in range(8)]
    lo = hi = 0
    for i, r in enumerate(rs):
        for j, (a, b) in enumerate(col_pairs):
            if int(dec[r, a]) > int(dec[r, b]):
                k = i * 8 + j
                if k < 32:
                    lo |= 1 << k
                else:
                    hi |= 1 << (k - 32)
    return lo, hi


@register(
    "media_phash_dedup",
    """
    WITH img AS (
      SELECT doc_id,
             CAST(8 + doc_id % 24 AS INT) AS width,
             CAST(8 + doc_id % 16 AS INT) AS height,
             doc_id % 31 AS p1, doc_id % 17 AS p2
      FROM documents WHERE doc_id % 3 = 0
    ),
    cls AS (
      SELECT width, height, p1, p2, count(*) AS n
      FROM img GROUP BY width, height, p1, p2
    )
    SELECT width, height,
           CAST(sum(n) AS BIGINT) AS n_images,
           CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS n_dup_pairs,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_classes,
           CAST(max(n) AS INT) AS max_class_size
    FROM cls GROUP BY width, height ORDER BY width, height
    """,
    tags=("multimodal", "X5", "dedup", "phash", "jpeg"),
)
def media_phash_dedup(spark, sf_dir, include_near: bool = False):
    """IMAGE dedup via perceptual hashing — the multimodal twin of the
    text near-dup family, run through the REAL pixel path: each image
    doc's payload goes JPEG encode → decode (the r4 codec), the decoded
    pixels produce a 64-bit dHash (9×8 sampled grid, bit = left pixel >
    right neighbor — the standard difference hash), candidates come
    from the SAME 4×16-bit pigeonhole Hamming blocking the SimHash text
    lane uses (`text/dedup._hamming_block_pairs`, Manku WWW'07), and
    collision survivors are verified by payload md5 equality. Output is
    the per-(width, height) dedup profile: images, VERIFIED duplicate
    pairs, duplicate classes, largest class.

    Correctness gate (the media_jpeg_roundtrip external-gate pattern —
    SQL never replays a DCT): byte-identical payloads arise exactly
    when the generator's four residues agree (see `_gradient_image` —
    distinct phases are provably ≥ several quantization levels apart),
    so the oracle derives every class from doc_id arithmetic alone. A
    missing image in a class is a hole in the codec/fingerprint path
    and surfaces as a value mismatch.

    Scale shape (restructured at its ×100 listing measurement): the
    first cut materialized every within-class pair through the block
    equi-join — C(n,2) per duplicate class, and classes GROW with the
    corpus, measured 274 s / exponent 1.74 at ×100 — the exact-
    duplicate-flood pathology `simhash_cluster_summary` documents for
    the text lane (r8). Now payload classes COLLAPSE first (one md5
    groupBy; pair counts are the closed form Σ C(n,2), never rows),
    and the Hamming machinery runs over class REPRESENTATIVES only —
    a relation bounded by the number of distinct payloads. The
    perceptual NEAR-pair path (Hamming ≤ 3 across different payloads —
    the recall the hash exists for, inherently not SQL-predictable) is
    behind ``include_near=True``, checked by a unit test that computes
    the expected dHash distances itself through the same codec; the
    registered form keeps every output column deterministic. One Arrow
    `mapInPandas` pass per image (tiny decodes, stateless, retry-safe),
    eagerly checkpointed as a ~40 B/row fingerprint relation — payloads
    never shuffle; the rollup is a ≤(24×16)-cell aggregate."""
    import hashlib

    import pandas as pd
    from pyspark.sql import types as T

    from .multimodal.codecs import decode_jpeg, encode_jpeg
    from .text.dedup import _hamming_block_pairs

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("lo", T.LongType()),
            T.StructField("hi", T.LongType()),
            T.StructField("payload_md5", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = encode_jpeg(_gradient_image(d))
                dec = decode_jpeg(payload)
                h2, w2 = dec.shape
                lo, hi = _dhash64(dec)
                rows.append(
                    (
                        d,
                        lo,
                        hi,
                        hashlib.md5(payload).hexdigest(),
                        w2,
                        h2,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "lo", "hi", "payload_md5", "width",
                    "height",
                ],
            )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    # the id-only projection is KBs — without an explicit repartition
    # the whole corpus' encode/decode work lands on one input split
    # (measured 17.1 s -> 6.7 s at x10 on local[32]; the residual is
    # the pure-python DCT itself, embarrassingly parallel)
    # spread() (r12): the id-only projection's size estimate is KBs, so
    # spread always repartitions it up at current corpora (same plan as
    # the old unconditional repartition); a corpus whose id projection
    # already scans wide keeps its partitioning.
    from .io.readers import spread

    fps = (
        spread(docs.select("doc_id"), "doc_id")
        .mapInPandas(run, schema)
        .localCheckpoint(eager=True)
    )
    cls = fps.groupBy("width", "height", "payload_md5").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("media_id").alias("rep"),
        F.min("lo").alias("lo"),   # constant within a payload class
        F.min("hi").alias("hi"),
    )
    out = (
        cls.groupBy("width", "height")
        .agg(
            F.sum("n").cast("bigint").alias("n_images"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2)
            .cast("bigint")
            .alias("n_dup_pairs"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_classes"),
            F.max("n").cast("int").alias("max_class_size"),
        )
        .orderBy("width", "height")
    )
    if not include_near:
        return out
    # perceptual near-dups ACROSS payload classes: blocking over the
    # payload-bounded representative relation, never raw images
    near = _hamming_block_pairs(
        cls.select(F.col("rep").alias("id"), "lo", "hi"),
        max_hamming=3,
        max_block=None,
    )
    rep_meta = cls.select(
        F.col("rep").alias("id"), "payload_md5", "width", "height"
    )
    near_pairs = (
        near.join(
            rep_meta.select(
                F.col("id").alias("id_a"),
                F.col("payload_md5").alias("m_a"),
                "width",
                "height",
            ),
            "id_a",
        )
        .join(
            rep_meta.select(
                F.col("id").alias("id_b"), F.col("payload_md5").alias("m_b")
            ),
            "id_b",
        )
        .filter(F.col("m_a") != F.col("m_b"))
        .groupBy("width", "height")
        .agg(F.count(F.lit(1)).alias("n_near_rep_pairs"))
    )
    return (
        out.join(near_pairs, ["width", "height"], "left")
        .select(
            "width", "height", "n_images", "n_dup_pairs",
            "n_dup_classes", "max_class_size",
            F.coalesce("n_near_rep_pairs", F.lit(0))
            .cast("bigint")
            .alias("n_near_rep_pairs"),
        )
        .orderBy("width", "height")
    )
