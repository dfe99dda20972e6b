"""Deduplication operators — exact, MinHash-LSH, n-gram Jaccard, SimHash.

Extension tier (SURVEY.md §2.11 X1/X2): training-data dedup at corpus
scale. Design constraints for 100 TB:

- **Never shuffle raw text.** Exact dedup groups on an md5 fingerprint
  (16 bytes) instead of the document body; near-dup candidates are found by
  banded MinHash buckets so the candidate-pair join is an equi-join on a
  small band hash — the O(n²) all-pairs comparison only ever runs *within*
  buckets (and a final exact-Jaccard verify runs only on candidates).
- **Determinism.** Hash seeds are static; MinHash components are the
  lexicographic minimum of fixed-seed md5 hex digests, which is
  order-invariant and reproducible in ANSI SQL — every stage here is
  oracle-checkable, unusual for LSH implementations.
- Everything is built-in `pyspark.sql.functions` (md5 / transform /
  array_min / aggregate) — JVM-side, no Python in the hot path.
  `pyspark.ml.feature.MinHashLSH` offers the same capability behind a
  fitted-model API; this formulation avoids the fit step (seeds are static)
  and keeps the plan a plain DataFrame graph.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (resolves the arrow lane's string type hints)
from pyspark.sql import Column, DataFrame, functions as F

from ..functions import pround

from .analysis import fingerprint, tokenize

#: Candidate-pair COUNT (not estimate) at or below which the LSH verify
#: joins may broadcast the (id_a, id_b) relation: 1M pairs ≈ 16 MB of
#: key payload, a hashed relation comfortably inside any driver/executor
#: at defaults. Above it the joins stay pinned sort-merge — the ×100
#: sweep showed Catalyst's under-threshold ESTIMATE broadcasting an
#: unbounded dup-rate × corpus relation into a driver OOM (r8).
MINHASH_BROADCAST_MAX_PAIRS = 1_000_000

#: Construction cache for the hot Column trees (shingles, minhash
#: signature, band structs). A PySpark Column is an immutable, unresolved
#: Catalyst expression handle — building one is pure driver/py4j work
#: (measured r11: the 8-component signature alone costs ~166 ms per
#: construction, paid on EVERY query call because higher-order-function
#: lambdas cross the py4j boundary expression-by-expression), and reusing
#: it across DataFrames/queries is safe because select() re-resolves the
#: same tree against each relation. Keyed by (builder, column NAME,
#: params) — only name-addressed inputs are cached; explicit Column
#: arguments build fresh, exactly as before.
_EXPR_CACHE: dict = {}


def _cached_expr(key, builder):
    hit = _EXPR_CACHE.get(key)
    if hit is None:
        hit = builder()
        _EXPR_CACHE[key] = hit
    return hit


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """X1 — exact dedup: one survivor per canonicalized text, smallest id
    wins (deterministic, unlike dropDuplicates). Shuffles the 128-bit
    fingerprint, not the document."""
    fp = fingerprint(F.col(text_col))
    return (
        df.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__fp")
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), the MinHash input unit.

    Accepts a column NAME for the hot paths — name-addressed trees are
    built once and reused via ``_EXPR_CACHE`` (see above); Column inputs
    build fresh.

    Built by zipping the token array with its own 1..n-1 shifts rather than
    slicing per position: higher-order functions are interpreted (outside
    whole-stage codegen), so n-1 linear ``zip_with`` passes beat k
    ``slice``+``concat_ws`` lambda evaluations ~7× on real documents.

    ZERO-token documents (empty / whitespace-only text) get an EMPTY
    shingle set — no evidence, never a near-dup candidate. The previous
    ``[""]`` sentinel silently made every empty document an exact
    MinHash twin of every other (Jaccard 1 through a [""]∩[""] set),
    while the SQL oracle's ``array_to_string([], ' ')`` is NULL and
    ``list_distinct([NULL])`` is [] — so the two lanes disagreed on any
    corpus containing ≥2 empty docs. Found by the r9 adversarial-corpus
    battery (tests/test_cross_engine_properties.py); the sf corpora
    have no empty docs, which is why five rounds of hash-green checks
    never saw it. Empty docs belong to exact dedup (fingerprint
    equality), not the similarity path.
    """
    if isinstance(text, str):
        return _cached_expr(
            ("shingles", text, n), lambda: shingles(F.col(text), n)
        )
    toks = tokenize(F.lower(text))
    k = F.size(toks)
    grams = toks
    for j in range(2, n + 1):
        grams = F.zip_with(
            grams,
            F.slice(toks, j, k),
            lambda acc, nxt: F.concat(acc, F.lit(" "), nxt),
        )
    grams = (
        F.when(k == 0, F.array().cast("array<string>"))
        .when(k < n, F.array(F.concat_ws(" ", toks)))
        .otherwise(F.slice(grams, 1, k - (n - 1)))
    )
    return F.array_distinct(grams)


def minhash_signature(sh: Column | str, num_hashes: int = 8) -> list[Column]:
    """MinHash signature: component i = min over shingles of
    ``md5(i || ':' || shingle)``.

    Accepts a column NAME for the hot paths (tree built once, cached —
    ~166 ms of py4j lambda construction per call otherwise); Column
    inputs build fresh.

    Fixed-length lowercase hex compares lexicographically in numeric order,
    so the string min *is* the hash min — no hex→int conversion needed,
    which keeps the construction portable to any SQL engine (the oracle).

    The per-component closure is a FACTORY, not a ``lambda s, i=i:``
    default-arg binding: a two-parameter lambda makes F.transform pass
    the array INDEX as the second argument, shadowing the intended
    Python int with an unresolved Column whose str() then leaks into the
    f-string prefix — a valid-but-wrong hash family that still passes
    any final-output check (uniform hashes are uniform), caught only
    when the r6 banding-sweep audit exposed raw candidate counts."""
    if isinstance(sh, str):
        return _cached_expr(
            ("minhash_signature", sh, num_hashes),
            lambda: minhash_signature(F.col(sh), num_hashes),
        )

    def component(i: int) -> Column:
        prefix = f"{i}:"
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(prefix), s)))
        ).alias(f"mh_{i}")

    return [component(i) for i in range(num_hashes)]


def band_structs(num_hashes: int, bands: int) -> Column:
    """Array of (band_idx, band_hash) structs over the ``mh_i`` signature
    columns — the LSH banding expression, built once and cached (same
    semantics as the inline construction it replaces; shared by the batch
    and streaming admission paths).

    r12 (the r11 "Not yet optimized" #2 item): ``band_hash`` is
    ``unhex(md5(...))`` — the 16-byte BINARY form of the md5 the oracles
    keep as hex text. unhex of a fixed-width hex rendering is a
    bijection, so bucket membership — and therefore every candidate set,
    flagged count and verified pair — is IDENTICAL to the 32-char hex
    form; only the key bytes halve through every banding groupBy/join
    exchange and at rest in the streaming admission index. Band hashes
    never surface in any output (join/group keys only), so the oracles'
    hex strings need no change. Measured nil at the ×10 sweep (the
    banded relations are ~20k-200k rows there); the win is shuffle and
    at-rest bytes at corpus scale."""

    def build() -> Column:
        rows_per_band = num_hashes // bands
        cols = []
        for b in range(bands):
            parts = [
                F.col(f"mh_{b * rows_per_band + r}")
                for r in range(rows_per_band)
            ]
            cols.append(
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.unhex(F.md5(F.concat_ws("|", *parts))).alias(
                        "band_hash"
                    ),
                )
            )
        return F.array(*cols)

    return _cached_expr(("band_structs", num_hashes, bands), build)


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket: int | None = None,
    persist: bool = False,
    scope_cache: bool = True,
) -> DataFrame:
    """X2 — banded MinHash LSH near-duplicate pairs, exact-verified.

    1. signature per doc (num_hashes components),
    2. band hash per (doc, band) — rows explode ×bands,
    3. self-equi-join on (band_idx, band_hash) → candidate pairs (id_a < id_b),
    4. exact shingle-Jaccard on candidates only; keep ≥ threshold.

    The join key is a 32-hex band digest: at 100 TB the shuffle carries
    (id, band_hash) pairs only. Candidate verification re-reads shingle
    sets for the candidate ids — a semi-join-pruned second scan, not a
    broadcast of the corpus.

    ``persist=True`` caches the (id, shingles) relation, which the plan
    references three times (signature build + both verify sides); without
    it each reference re-expands the tokenize/shingle subtree (exchange
    reuse is best-effort). Measured at sf0.1: 1.84 s → 1.18 s. With the
    default ``scope_cache=True`` the cache is scoped to this call: the
    (small — threshold-filtered pairs) result is eagerly materialized via
    ``localCheckpoint`` and the shingle cache released, so a long-lived
    session doesn't accumulate executor-memory residue or have later
    plans silently rewritten through cache substitution. Unlike the LSH
    top-k case the checkpoint here is near-free (the result is tiny and
    the computation runs exactly once either way). Pass
    ``scope_cache=False`` to keep the lazy plan + live cache — the CALLER
    then owns the cache lifetime, e.g. when a downstream step
    (``text/clusters``) checkpoints the pairs itself, or in plan tests
    that need to inspect the un-checkpointed query plan.
    """
    from ..io.readers import spread

    raw = spread(df, id_col).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__txt")
    )
    # no-evidence rule: zero-token docs have empty shingle sets and can
    # never verify >= threshold — dropping them BEFORE banding also kills
    # the degenerate all-empties bucket (C(k,2) wasted candidates on a
    # corpus with k empty docs). The filter tests the TOKEN count, not
    # size(sh): `sh` is empty iff tokenize() is empty (see shingles()),
    # and a filter on the shingle column itself is pushed below the
    # projection by Catalyst, duplicating the whole zip_with/md5 chain
    # per row (plan showed 2× zip_with trees; measured 0.94 → 0.42 s
    # for the shingle stage at sf0.1 — guide §4.4's pushdown-duplication
    # pathology, hit by a plain expensive expression instead of a UDF).
    base = raw.filter(
        F.size(tokenize(F.lower(F.col("__txt")))) > 0
    ).select("id", shingles("__txt", shingle_n).alias("sh"))
    if persist:
        base = base.persist()
    sig = base.select("id", *minhash_signature("sh", num_hashes))
    # Slim (id, band) rows only — the self-join shuffle never carries
    # shingle arrays (at corpus scale that's the difference between
    # shuffling 16-byte digests and shuffling the corpus).
    banded = sig.select(
        "id", F.explode(band_structs(num_hashes, bands)).alias("band")
    ).select(
        "id",
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_hash").alias("band_hash"),
    )

    # Candidate pairs by bucket aggregation, NOT a self-join: group ids per
    # (band_idx, band_hash), expand i<j pairs within each bucket. One
    # shuffle (the groupBy) vs the self-join's two + join, the signature
    # subtree appears once in the plan, and there's no reliance on
    # exchange-reuse/AQE behavior for a join whose both sides are the same
    # exchange (observed to lose rows intermittently under AQE). Bucket
    # arrays are near-dup groups — tiny by construction; a degenerate
    # mega-bucket (e.g. empty-text collisions) can be dropped via
    # `max_bucket` at corpus scale (standard LSH-dedup hygiene).
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    ids = F.array_sort(F.col("ids"))
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Exact verification on the candidate pairs: re-attach shingle sets by
    # id and compute true Jaccard. `cand` is referenced exactly once — every
    # extra DataFrame reference re-expands the whole band-join subtree in
    # the plan (exchange reuse is best-effort, not guaranteed), which
    # matters more than row-pruning the shingle recompute. At corpus scale,
    # persist `cand` (or pass an LSH bucket as `block_col` to
    # ngram_jaccard_pairs) so verification scans only candidate ids.
    #
    # Verify-join strategy is SIZE-AWARE (r8 verdict #7): `cand` grows
    # with dup-rate × corpus (UNBOUNDED), and its size ESTIMATE after
    # dropDuplicates routinely sits under the broadcast threshold, so an
    # unpinned plan picks a driver broadcast that works at sf scale and
    # OOMs the driver at corpus scale (first observed at the ×100
    # replica: 'Not enough memory to build and broadcast' building the
    # HashedRelation inside an 8 GB driver crowded with checkpoint
    # blocks). The r8 unconditional `hint("merge")` pin fixed ×100 but
    # cost ~0.6 s of needless sorts at sf0.1 (driver reading 1.48 →
    # 2.07 s). On the scoped-cache path we now persist `cand` (two
    # longs/row) and COUNT it — one extra banding job over the already
    # cached shingle relation — and the count, unlike the estimate, is
    # a provable bound: at or below MINHASH_BROADCAST_MAX_PAIRS the
    # verify joins run broadcast (shuffle- and sort-free over the
    # cached shingles); above it, spillable sort-merge. Un-scoped
    # callers (plan tests, cluster pipelines that checkpoint the pairs
    # themselves) keep the single lazy SMJ-pinned plan — no hidden
    # action inside the builder.
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    cand_cached = False
    if persist and scope_cache:
        cand = cand.persist()
        cand_cached = True
        if cand.count() <= MINHASH_BROADCAST_MAX_PAIRS:
            pairs = F.broadcast(cand).join(sh_a, "id_a").join(sh_b, "id_b")
        else:
            pairs = (
                cand.hint("merge").join(sh_a, "id_a")
                .hint("merge").join(sh_b, "id_b")
            )
    else:
        pairs = (
            cand.hint("merge").join(sh_a, "id_a")
            .hint("merge").join(sh_b, "id_b")
        )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = inter / F.when(union != 0, union).cast("double")
    out = (
        pairs.withColumn("jaccard", pround(jac, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if persist and scope_cache:
        out = out.localCheckpoint(eager=True)
        base.unpersist()
        if cand_cached:
            cand.unpersist()
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.3,
    block_col: Column | None = None,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all (optionally blocked) pairs.

    The exact-oracle counterpart of the LSH path: O(n²) within a block, so
    callers must block (e.g. by source, length bucket) at scale; unblocked
    it's the ground-truth oracle for LSH recall at test scale — guarded by
    ``operators.guards.guard_quadratic`` (unblocked inputs above the size
    cap raise unless ``allow_quadratic=True``).
    """
    from ..io.readers import spread
    from ..operators.guards import guard_quadratic

    guard_quadratic(df, block_col is not None, allow_quadratic, "ngram_jaccard_pairs")

    base = spread(df, id_col).select(
        F.col(id_col).alias("id"),
        (block_col if block_col is not None else F.lit(0)).alias("blk"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id"))
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = inter / F.when(union != 0, union).cast("double")
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            pround(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(text: Column, bits: int = 32, md5_offset: int = 1) -> Column:
    """SimHash fingerprint (default 32-bit for portable integer math).

    Per token: md5 → 8 hex chars starting at ``md5_offset`` (1-based) →
    uint32; bit b contributes +1/-1 to position b; fingerprint bit b =
    sign of the sum. Near-dups then differ in few bits (Hamming distance
    via bit_count(xor)).

    ``md5_offset`` selects which slice of the token's md5 feeds the
    votes, so two calls (offsets 1 and 9) yield two INDEPENDENT 32-bit
    halves — a portable 64-bit fingerprint as two BIGINT columns, each
    staying within double-exact integer range (the reason the packer
    can't emit one 64-bit value directly).

    Pure higher-order-function SQL (transform/aggregate/conv) — JVM-side.
    """
    toks = F.array_distinct(F.transform(tokenize(text), lambda x: F.lower(x)))
    hashes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), md5_offset, 8), 16, 10).cast("long"),
    )

    def bit_of(h, b):  # (h >> b) & 1 without shift-by-column: h < 2^32 is double-exact
        return (h / F.pow(F.lit(2.0), b.cast("double"))).cast("long") % 2

    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(bit_of(h, b) == 1, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(
            F.element_at(bit_votes, b + 1) > 0,
            F.pow(F.lit(2.0), b.cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def _simhash_parts_arrow():
    """Arrow-vectorized BOTH-HALVES SimHash — value-identical to
    ``simhash64(text)`` / ``simhash64(text, md5_offset=9)`` but ~70×
    faster (measured 181 s → 2.5 s whole-query at the ×10 sweep): the per-bit HOF
    vote expression is interpreted per (bit × token × half) ≈ 64
    lambda evaluations per token, while this lane md5s each distinct
    token once (hashlib — bit-identical to the JVM/DuckDB md5) and does
    ALL vote arithmetic as three numpy batch ops (unpackbits →
    add.reduceat per doc segment → majority-pack).

    Exact-semantics notes (each one is load-bearing for the oracle
    match): Spark ``trim`` strips 0x20 only; Spark ``split`` uses
    limit −1, so BOTH a leading and a trailing empty token survive
    when the trimmed string starts/ends with non-space whitespace
    (unlike Java's default limit 0, which drops trailing empties —
    ``re.split`` matches Spark here, caught by the random battery in
    tests/test_cross_engine_properties.py); Java ``\\s`` is ASCII
    ``[ \\t\\n\\x0B\\f\\r]`` (not the Unicode class Python defaults to);
    votes run over DISTINCT lowercased tokens; fingerprint bit b = 1
    iff strictly more than half the tokens set bit b (the +1/-1 sum
    is > 0)."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    # unpackbits(bitorder='little') index of value-bit b in 4 big-endian
    # bytes: byte (3 - b//8), bit (b % 8)
    bit_ix = np.array([(3 - b // 8) * 8 + b % 8 for b in range(32)])
    weights = (1 << np.arange(32, dtype=np.int64))

    @pandas_udf(
        StructType(
            [StructField("lo", LongType()), StructField("hi", LongType())]
        )
    )
    def parts(texts: pd.Series) -> pd.DataFrame:
        digests: list[bytes] = []
        seg_ends: list[int] = []
        counts = np.empty(len(texts), dtype=np.int64)
        n_tok = 0
        for i, t in enumerate(texts):
            s = (t or "").strip(" ")
            if s:
                uniq = list(dict.fromkeys(tok.lower() for tok in ws.split(s)))
            else:
                uniq = []
            for tok in uniq:
                digests.append(hashlib.md5(tok.encode("utf-8")).digest()[:8])
            counts[i] = len(uniq)
            n_tok += len(uniq)
            seg_ends.append(n_tok)
        if n_tok == 0:
            z = np.zeros(len(texts), dtype=np.int64)
            return pd.DataFrame({"lo": z, "hi": z})
        bits = np.unpackbits(
            np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(-1, 8),
            axis=1,
            bitorder="little",
        )
        lo_bits = bits[:, bit_ix].astype(np.int64)
        hi_bits = bits[:, bit_ix + 32].astype(np.int64)
        seg_starts = np.concatenate(
            ([0], np.asarray(seg_ends[:-1], dtype=np.int64))
        ).astype(np.int64)
        # reduceat needs strictly valid start offsets; empty docs (start
        # == next start) produce the previous segment's sum — mask after
        safe_starts = np.minimum(seg_starts, n_tok - 1)
        lo_sum = np.add.reduceat(lo_bits, safe_starts, axis=0)
        hi_sum = np.add.reduceat(hi_bits, safe_starts, axis=0)
        nonempty = (counts > 0)[:, None]
        lo_fp = ((2 * lo_sum > counts[:, None]) & nonempty) @ weights
        hi_fp = ((2 * hi_sum > counts[:, None]) & nonempty) @ weights
        return pd.DataFrame({"lo": lo_fp, "hi": hi_fp})

    return parts


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    lane: str = "arrow",
    max_block: int | None = None,
) -> DataFrame:
    """X2 — all document pairs whose 64-bit SimHash differs in at most
    ``max_hamming`` bits, found by BIT-SLICE BLOCKING (Manku/Jain/Sarma,
    "Detecting Near-Duplicates for Web Crawling", WWW'07): split the
    fingerprint into 4 contiguous 16-bit blocks; by pigeonhole, any pair
    within Hamming distance 3 agrees EXACTLY on at least one block, so
    candidate generation is a plain equi-join on (block_index,
    block_value) and the O(n²) Hamming comparison never runs — only the
    verify on block-collision survivors does.

    Requires ``max_hamming <= 3`` (the recall guarantee is exactly the
    4-block pigeonhole; a larger radius would need more/narrower blocks).

    ``lane``: ``"arrow"`` (default) computes both fingerprint halves
    with the vectorized `_simhash_parts_arrow` UDF — value-identical to
    the HOF expressions and ~70× faster at the ×10 sweep (181 s →
    2.5 s; the per-(bit×token×half) interpreted lambda was the entire
    cost). ``"hof"`` keeps the pure-built-in expression lane — the
    formulation the SQL oracle replays term-for-term — and the lane
    equality is pinned by a unit test on planted docs plus the
    sf-corpus oracle match.

    100 TB design: the fingerprint relation is eagerly checkpointed
    FIRST — three BIGINTs per document (~24 B/row), never text — so the
    per-document vote work runs once instead of being re-derived
    through the 4-way block explode × both self-join sides (measured
    50× on the prototype). The join shuffles ~28-byte rows keyed by
    16-bit block values; uniform fingerprints put n²/65536 candidates
    per block (quadratic only in the collision rate), and real
    near-dup clusters — the rows you want — dominate the survivors.
    The registered oracle is the EXACT quadratic Hamming self-join, so
    the sf-scale value match empirically witnesses the pigeonhole
    recall guarantee, not just the arithmetic.

    ``max_block`` (corpus-scale hygiene, default off — the registered
    query keeps exact semantics): a DEGENERATE block value — empty or
    boilerplate documents all hashing to the same fingerprint — turns
    the candidate equi-join quadratic in that block's population.
    Setting a cap drops (block_idx, block_value) cells above it before
    the join, the same `max_bucket` escape the MinHash lane exposes.
    Pairs whose ONLY agreeing block was dropped lose the recall
    guarantee, so run `exact_dedup` FIRST (identical-fingerprint
    floods are exact dups; after collapsing them no natural block
    should exceed a small multiple of the cluster size).
    """
    if max_hamming > 3:
        raise ValueError("4x16-bit blocking guarantees recall only for max_hamming <= 3")
    fps = _simhash_fps(df, id_col, text_col, lane)
    return _hamming_block_pairs(fps, max_hamming, max_block)


def _simhash_fps(
    df: DataFrame, id_col: str, text_col: str, lane: str
) -> DataFrame:
    """(id, lo, hi) 2×32-bit SimHash fingerprint relation, eagerly
    checkpointed (~24 B/row — the per-document vote work runs once, not
    re-derived through the block explode × both self-join sides)."""
    if lane == "arrow":
        parts = _simhash_parts_arrow()(F.col(text_col))
        fp_cols = [
            F.col("__p.lo").alias("lo"),
            F.col("__p.hi").alias("hi"),
        ]
        return (
            df.select(F.col(id_col).alias("id"), parts.alias("__p"))
            .select("id", *fp_cols)
            .localCheckpoint(eager=True)
        )
    return (
        df.select(
            F.col(id_col).alias("id"),
            simhash64(F.col(text_col)).alias("lo"),
            simhash64(F.col(text_col), md5_offset=9).alias("hi"),
        )
        .localCheckpoint(eager=True)
    )


def _hamming_block_pairs(
    fps: DataFrame, max_hamming: int, max_block: int | None
) -> DataFrame:
    """Pigeonhole-blocked Hamming pairs over an (id, lo, hi) relation."""
    blk = fps.select(
        "id",
        "lo",
        "hi",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("bi"), (F.col("lo") % 65536).alias("bv")),
                F.struct(
                    F.lit(1).alias("bi"),
                    F.floor(F.col("lo") / 65536).cast("long").alias("bv"),
                ),
                F.struct(F.lit(2).alias("bi"), (F.col("hi") % 65536).alias("bv")),
                F.struct(
                    F.lit(3).alias("bi"),
                    F.floor(F.col("hi") / 65536).cast("long").alias("bv"),
                ),
            )
        ).alias("b"),
    ).select("id", "lo", "hi", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    if max_block is not None:
        pop = (
            blk.groupBy("bi", "bv")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_block)
            .select("bi", "bv")
        )
        blk = blk.join(pop, ["bi", "bv"])
    a, b = blk.alias("a"), blk.alias("b")
    hamming = (
        F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
        + F.bit_count(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_cluster_summary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    lane: str = "arrow",
    max_block: int | None = None,
) -> DataFrame:
    """SimHash dedup clusters with EXACT-DUPLICATE COLLAPSE before the
    components pass (r8 verdict #5): identical fingerprints — exact or
    near-exact duplicate floods — are first grouped to one
    representative node (min id) carrying the group's weight, and the
    Hamming blocking + min-label CC loop runs over REPRESENTATIVES
    only. A k-duplicate flood contributes one node instead of a
    k-member clique (k²/2 edges dragged through every CC round), so
    the graph shrinks by the corpus dup-rate before the iterative
    stage — the dominant ×100 cost — ever starts.

    Semantics-preserving BY CONSTRUCTION, not probabilistically:
    members of a fingerprint group are pairwise Hamming-0 (one
    component), a member-level Hamming distance equals its groups'
    fingerprint distance (members carry exactly their group's bits),
    and the component label (min rep id) is the min member id because
    each rep is its group's minimum. Equality with the uncollapsed
    ``dedup_clusters(simhash_hamming_pairs(...))`` rollup is pinned by
    test on flood-planted corpora.

    Output schema matches dedup_clusters: (component, n_members,
    n_removed, max_member), where counts are weighted by group size and
    groups of weight ≥ 2 with no inter-group edge still surface (their
    members were pairs in the uncollapsed graph).
    """
    from .clusters import connected_components

    if max_hamming > 3:
        raise ValueError("4x16-bit blocking guarantees recall only for max_hamming <= 3")
    fps = _simhash_fps(df, id_col, text_col, lane)
    groups = (
        fps.groupBy("lo", "hi")
        .agg(
            F.min("id").alias("id"),
            F.count(F.lit(1)).alias("w"),
            F.max("id").alias("grp_max"),
        )
        .localCheckpoint(eager=True)  # reps feed blocking AND the rollup
    )
    pairs = _hamming_block_pairs(
        groups.select("id", "lo", "hi"), max_hamming, max_block
    )
    cc = connected_components(pairs)
    labeled = (
        groups.join(cc, "id", "left")
        .withColumn("component", F.coalesce("component", F.col("id")))
        # groups untouched by any edge are clusters only if they carry
        # an exact-dup flood of their own (w >= 2)
        .filter(cc["component"].isNotNull() | (F.col("w") >= 2))
    )
    return labeled.groupBy("component").agg(
        F.sum("w").alias("n_members"),
        (F.sum("w") - 1).alias("n_removed"),
        F.max("grp_max").alias("max_member"),
    )
