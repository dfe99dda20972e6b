#!/usr/bin/env python
"""Heaps-law synthetic corpus grower (r10 verdict #2).

The ×N replica (`tools/scale100.py`) keeps the corpus dup-rate constant
by bijective character substitution, but the base corpus has only ~31
distinct tokens, so every replica-tier vocabulary is an ARTIFACT of the
substitution count, not of scale — two r10 exponent adjudications
(`bpe_token_stats` 1.07→0.75 "replica bijection inflation"; the ×300
"every doc has 2 exact twins" step) hinged on exactly that. This tool
GROWS a corpus instead of replicating one, with the statistical shape
real web-scale text has:

- **Zipf token draw**: tokens are drawn i.i.d. from a rank-frequency
  Zipf(s=1.1) distribution over a ceiling vocabulary sized
  ``ceil(8 · total_tokens^0.55)``; the OBSERVED vocabulary then grows
  ~n^(1/s) with corpus size — Heaps' law emerges from the draw instead
  of being faked by substitution rotations.
- **Controlled duplication**: a seeded fraction of docs are near-copies
  of a template stream (2% token mutation → Jaccard ≈ high-0.8s) and a
  smaller fraction exact copies, so dedup lanes see a scale-invariant
  dup-rate by construction.
- **Deterministic & partition-independent**: every token is a pure
  function of (seed, doc_id, position) via a splitmix64-style counter
  hash — no RNG state, so the same doc_id produces the same text at any
  parallelism, any batch size, any tier.

Docs mirror the testdata `documents` schema (doc_id, text, lang,
source, n_chars) with the same lang/source marginals; lengths are
drawn uniform 10..100 like the sf corpus (mean ~55 tokens).

Usage:
    python tools/growcorpus.py --build --factor 100   # write corpus
    python tools/growcorpus.py --factor 100 q1 q2 ... # time queries

Corpus cached at $GROW_DIR (default /tmp/grow_x{factor}). Timing reuses
`tools/scale100.time_queries` (same noop-sink min-of-runs protocol, same
DuckDB oracle handling), so grown-corpus rows are directly comparable to
the replica rows recorded in BENCH_X100.json.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = np.uint64(0x5EED_CAFE_2026)

#: sf0.1 marginals (measured): 5 langs, 20 sources, uniform-ish lengths
LANGS = ["en", "en", "zh", "es", "fr", "de"]  # en ~2/6 ≈ the 41% measured
N_SOURCES = 20
LEN_MIN, LEN_MAX = 10, 100
BASE_DOCS = 5_000  # sf0.1 documents rows; --factor scales this

#: duplication program: ~1% exact copies + ~3% near-copies (2% token
#: mutation), template pool sized so expected cluster size stays small
EXACT_DUP_FRAC = 0.01
NEAR_DUP_FRAC = 0.03
MUTATION_RATE = 0.02
TEMPLATE_FRAC = 0.01  # templates per corpus → avg cluster ~4 members

ZIPF_S = 1.1


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized counter-based hash. Pure
    function of the input, so (seed ^ doc ^ pos) → token is independent
    of partitioning and batch order."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _hash_u01(*parts: np.ndarray) -> np.ndarray:
    """Uniform [0,1) from hashed parts (vectorized, deterministic)."""
    acc = np.full_like(parts[0], SEED, dtype=np.uint64)
    for i, p in enumerate(parts):
        salt = np.uint64((0x9E3779B97F4A7C15 * (i + 1)) % 2**64)
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash
            acc = _mix64(acc ^ (p.astype(np.uint64) + salt))
    return acc.astype(np.float64) / float(2**64)


def _zipf_cdf(v: int, s: float) -> np.ndarray:
    """Cumulative rank-frequency distribution for Zipf(s) over v ranks."""
    w = 1.0 / np.power(np.arange(1, v + 1, dtype=np.float64), s)
    c = np.cumsum(w)
    return c / c[-1]


def corpus_params(n_docs: int) -> dict:
    total_tokens = n_docs * (LEN_MIN + LEN_MAX) // 2
    vocab = int(math.ceil(8.0 * total_tokens**0.55))
    return {"n_docs": n_docs, "vocab": vocab, "total_tokens": total_tokens}


def _doc_tokens(
    doc_ids: np.ndarray, cdf: np.ndarray, n_docs_total: int
) -> list[str]:
    """Texts for a batch of doc ids (vectorized over the flat token
    grid). Duplication: doc d with dup-draw < EXACT+NEAR copies the
    token stream of template t = hash-pick over the template pool; near
    copies additionally re-draw ~MUTATION_RATE of positions from their
    OWN stream."""
    n = len(doc_ids)
    d = doc_ids.astype(np.uint64)

    lens = (
        LEN_MIN
        + (_hash_u01(d, np.full(n, 1, np.uint64)) * (LEN_MAX - LEN_MIN + 1))
        .astype(np.int64)
    )
    dup_u = _hash_u01(d, np.full(n, 2, np.uint64))
    is_exact = dup_u < EXACT_DUP_FRAC
    is_near = (dup_u >= EXACT_DUP_FRAC) & (dup_u < EXACT_DUP_FRAC + NEAR_DUP_FRAC)
    n_templates = max(1, int(n_docs_total * TEMPLATE_FRAC))
    tmpl = (
        _hash_u01(d, np.full(n, 3, np.uint64)) * n_templates
    ).astype(np.uint64)
    # a duplicate inherits its template's length so copies align
    tlens = (
        LEN_MIN
        + (_hash_u01(tmpl, np.full(n, 1, np.uint64)) * (LEN_MAX - LEN_MIN + 1))
        .astype(np.int64)
    )
    dup = is_exact | is_near
    lens = np.where(dup, tlens, lens)

    # flat (doc, pos) grid
    reps = lens
    flat_doc = np.repeat(d, reps)
    flat_tmpl = np.repeat(np.where(dup, tmpl, d), reps)
    flat_near = np.repeat(is_near, reps)
    pos = np.concatenate([np.arange(k, dtype=np.uint64) for k in reps])

    # stream identity: own id for originals (flat_tmpl == flat_doc
    # there by construction), template id for copies; near copies
    # re-draw mutated positions from their OWN id
    u_mut = _hash_u01(flat_doc, pos, np.full(len(pos), 4, np.uint64))
    mutate = flat_near & (u_mut < MUTATION_RATE)
    stream = np.where(mutate, flat_doc, flat_tmpl)
    u_tok = _hash_u01(stream, pos, np.full(len(pos), 5, np.uint64))
    ranks = np.searchsorted(cdf, u_tok, side="left")

    toks = np.char.add("w", ranks.astype("U7"))
    # split the flat token array back into per-doc texts
    offsets = np.concatenate([[0], np.cumsum(reps)])
    return [
        " ".join(toks[offsets[i]: offsets[i + 1]]) for i in range(n)
    ]


def build(spark, out_dir: str, factor: int) -> None:
    n_docs = BASE_DOCS * factor
    params = corpus_params(n_docs)
    cdf = _zipf_cdf(params["vocab"], ZIPF_S)
    bc_cdf = spark.sparkContext.broadcast(cdf)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = _doc_tokens(ids, bc_cdf.value, n_docs)
            lang_pick = (_hash_u01(ids.astype(np.uint64), np.full(len(ids), 6, np.uint64)) * len(LANGS)).astype(int)
            src_pick = (ids % N_SOURCES).astype(int)
            yield pd.DataFrame({
                "doc_id": ids,
                "text": texts,
                "lang": [LANGS[i] for i in lang_pick],
                "source": [f"src{i}" for i in src_pick],
                "n_chars": [len(t) for t in texts],
            })

    n_part = max(32, factor)
    (
        spark.range(n_docs)
        .repartition(n_part)
        .mapInPandas(
            gen,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )


def main() -> None:
    from tools.scale100 import DUCK_SKIP_ALWAYS, time_queries
    from trading_dashboard_spark.queries import QUERY_REGISTRY
    from trading_dashboard_spark.session import get_spark

    args = sys.argv[1:]
    factor, runs, do_build = 100, 2, False
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--factor":
            factor = int(args[i + 1]); i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--build":
            do_build = True; i += 1
        else:
            names.append(args[i]); i += 1

    out_dir = os.environ.get("GROW_DIR", f"/tmp/grow_x{factor}")
    spark = get_spark("growcorpus")
    if do_build or not os.path.exists(out_dir):
        build(spark, out_dir, factor)
        print(f"built grown x{factor} corpus at {out_dir} "
              f"({corpus_params(BASE_DOCS * factor)})", flush=True)
    if not names:
        return
    result = {
        "factor": factor, "mode": "heaps-grown",
        "params": corpus_params(BASE_DOCS * factor),
        f"x{factor}": time_queries(
            spark, QUERY_REGISTRY, out_dir, names, runs,
            with_duck=True, duck_skip=DUCK_SKIP_ALWAYS,
        ),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
