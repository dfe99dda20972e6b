"""Bloom-filter join pruning — the manual form of the runtime filter a
100 TB engine injects in front of a selective join.

At scale, a semi-join against a selective build side should not shuffle
(or even fully deserialize) the probe side: a Bloom filter of the build
keys, pushed into the probe scan as a map-only predicate, discards the
vast majority of non-matching rows BEFORE the join's exchange. Spark's
own runtime row-group filtering (`spark.sql.optimizer.runtime.bloomFilter
.enabled`) injects exactly this plan when statistics allow; this module is
the explicit, deterministic version — fixed-seed md5 hashes, engine-
independent bit math — so the behavior is guaranteed rather than
cost-model-dependent, and so the same filter can be rendered into any SQL
engine.

Shape
-----
- ``bloom_bitset``: aggregate the build side's key hashes into an
  ``m``-bit bitset represented as ≤ m/64 (word_idx, word) rows — a
  bounded relation regardless of build cardinality — then collect it to
  the driver (8 KiB at the default m=2^16; the collect is bounded by the
  CHOSEN filter size, never by data, the same bounded-collect discipline
  as operators/ranks' partition offsets).
- ``bloom_probe_col``: a pure-JVM boolean expression testing a key's k
  positions against the bitset rendered as an array literal —
  whole-stage-codegen'd, evaluated inside the probe table's scan stage.
- ``bloom_semi_join``: probe-filter → exact semi-join. The Bloom pass is
  a superset of the true matches (false positives possible, false
  negatives impossible), and the exact semi-join removes the false
  positives — so the composition equals the plain semi-join row-for-row,
  which is exactly what the differential oracle checks.

Sizing: for n build keys, m ≈ 10·n bits and k=4 gives ~1-2% false
positives; the default 2^16 bits covers ~6.5k keys at that rate.

Reference parity: the reference filters fact scans by dimension-derived
key lists (SURVEY.md §2 J7 semi-join via IN-set); this is that operator
re-expressed as it must be built when the IN-set no longer fits in a
query string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["bloom_positions", "bloom_bitset", "bloom_probe_col", "bloom_semi_join"]


def _bit_mask(bit: Column) -> Column:
    """``1L << bit`` with a Column shift amount (the DSL ``F.shiftleft``
    only takes a literal int)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bit.cast("int"))


def bloom_positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """The k bit positions of ``key``: first 8 hex chars of md5(seed:key)
    mod m — portable integer math, identical in any engine."""
    return [
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"b{i}:"), key.cast("string"))), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def bloom_bitset(
    df: DataFrame, key: Column, m_bits: int = 1 << 16, k: int = 4
) -> list[int]:
    """Build the filter: aggregate the build side's set bits into
    ≤ m_bits/64 (word_idx, word) rows via bit_or, collect (bounded by
    m_bits — 8 KiB of longs at the default — NOT by build cardinality),
    and densify into a python list of m_bits//64 words."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos = F.explode(F.array(*bloom_positions(key, k, m_bits))).alias("pos")
    words = (
        # NULL keys can never satisfy the downstream equi-join, and
        # md5(NULL) would inject NULL positions into the bitset build
        df.where(key.isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            _bit_mask(F.pmod(F.col("pos"), F.lit(64))).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r["word_idx"]] = r["word"]
    return dense


def bloom_probe_col(key: Column, bitset: list[int], k: int = 4) -> Column:
    """Boolean membership test: every one of the key's k positions has
    its bit set in ``bitset`` (rendered as an array<long> literal — KBs,
    folded into the scan stage's codegen'd filter)."""
    m_bits = len(bitset) * 64
    arr = F.array(*[F.lit(w).cast("long") for w in bitset])
    tests = []
    for p in bloom_positions(key, k, m_bits):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        mask = _bit_mask(F.pmod(p, F.lit(64)))
        tests.append(word.bitwiseAND(mask) != 0)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Semi-join ``probe`` to ``build`` with a Bloom prefilter on the
    probe scan. Equals ``probe.join(build, key, "left_semi")`` exactly
    (the exact semi-join removes Bloom false positives); the prefilter
    just discards ~all non-matching probe rows map-side, before the
    join's exchange."""
    bits = bloom_bitset(build, F.col(build_key), m_bits=m_bits, k=k)
    pre = probe.filter(bloom_probe_col(F.col(probe_key), bits, k=k))
    keys = build.select(build_key).distinct()
    return pre.join(keys, pre[probe_key] == keys[build_key], "left_semi")
