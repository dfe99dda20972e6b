#!/usr/bin/env python
"""Adversarial discovery sweep for the curation/training compositions
(r10 verdict #4a): the relational/window/streaming families got their
battery in r10 (25 divergences + 2 crashes found and fixed); the
`queries_training.py` compositions — DSIR, NB provenance, budgets,
splits, mixtures, samplers — plus the documents-reading multimodal
lanes have only ever seen the well-behaved sf corpora. Same method:
build SCENARIO corpora of the degenerate classes the family's
semantics imply, run every qualifying query on Spark AND DuckDB, and
report divergences.

Scenario classes (each a standalone documents.parquet):

- ``single_source``  — every doc from one source (mixture plans,
  provenance classifier, per-source fertility collapse to one class)
- ``all_dup``        — one text, 40 ids (100% duplication: removal
  closure keeps exactly one survivor; tie storms in every
  score-ranked lane; budgets oversubscribed by dedup)
- ``uniform_score``  — 40 DISTINCT texts with identical length and
  token multiset (permutations): every quality/length score ties,
  exercising tercile/ntile/quartile boundary arithmetic
- ``empty_eval``     — doc_ids chosen so the house md5 split is 100%
  train (decontamination/split lanes see an EMPTY eval side)
- ``empty_train``    — the reverse (empty train side)
- ``tiny``           — 3 docs (budget ≫ corpus, samplers larger than
  population, quartiles on <4 rows)
- ``single_lang``    — one language (stratified samplers and per-lang
  windows degenerate to one stratum)

Usage: python tools/adversarial_curation.py [scenario ...|query ...]
Writes corpora under $ADV_CUR_DIR (default /tmp/adv_curation) and
prints one line per (scenario, query) plus a summary.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _md5_split_ids(want_train: bool, n: int) -> list[int]:
    """doc_ids whose md5(first 2 hex) lands on the requested side of
    the house 'cd' split boundary."""
    out, i = [], 0
    while len(out) < n:
        h = hashlib.md5(str(i).encode()).hexdigest()[:2]
        if (h < "cd") == want_train:
            out.append(i)
        i += 1
    return out


def _write_documents(out_dir: str, rows: list[tuple]) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source"]
    )
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("lang", pa.string()), ("source", pa.string()),
        ("n_chars", pa.int64()),
    ])
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        f"{out_dir}/documents.parquet",
    )


def _texts(n: int, seed: str, words: int = 40) -> list[str]:
    """n distinct deterministic texts of `words` tokens each."""
    return [
        " ".join(f"{seed}{i}w{k}" for k in range(words)) for i in range(n)
    ]


def build_scenarios(base_dir: str) -> dict[str, str]:
    """Write every scenario corpus; returns {scenario: dir}."""
    langs = ["en", "de", "fr", "es", "zh"]
    srcs = [f"src{i}" for i in range(4)]
    dirs: dict[str, str] = {}

    def reg(name, rows):
        d = os.path.join(base_dir, name)
        _write_documents(d, rows)
        dirs[name] = d

    # single_source: normal-ish corpus, ONE source
    t = _texts(40, "ss")
    reg("single_source", [
        (i, t[i], langs[i % len(langs)], "src0") for i in range(40)
    ])

    # all_dup: one text, 40 ids, sources/langs vary
    one = " ".join(f"dupw{k}" for k in range(40))
    reg("all_dup", [
        (i, one, langs[i % len(langs)], srcs[i % len(srcs)])
        for i in range(40)
    ])

    # uniform_score: permutations of one token multiset — identical
    # length, identical token stats, DISTINCT fingerprints
    base_toks = [f"u{k:02d}" for k in range(40)]
    perms = []
    for i in range(40):
        rot = base_toks[i % 40:] + base_toks[: i % 40]
        perms.append(" ".join(rot))
    reg("uniform_score", [
        (i, perms[i], langs[i % len(langs)], srcs[i % len(srcs)])
        for i in range(40)
    ])

    # empty_eval / empty_train: ids pinned to one side of the md5 split
    tr_ids = _md5_split_ids(True, 40)
    ev_ids = _md5_split_ids(False, 40)
    t2 = _texts(40, "et")
    reg("empty_eval", [
        (tr_ids[i], t2[i], langs[i % len(langs)], srcs[i % len(srcs)])
        for i in range(40)
    ])
    reg("empty_train", [
        (ev_ids[i], t2[i], langs[i % len(langs)], srcs[i % len(srcs)])
        for i in range(40)
    ])

    # tiny: 3 docs — budgets, samplers, quartiles over-ask
    t3 = _texts(3, "tiny", words=12)
    reg("tiny", [(i, t3[i], "en", f"src{i}") for i in range(3)])

    # single_lang
    t4 = _texts(40, "sl")
    reg("single_lang", [
        (i, t4[i], "en", srcs[i % len(srcs)]) for i in range(40)
    ])
    return dirs


def qualifying_queries(registry) -> list[str]:
    """Training-module compositions plus every documents-only oracle in
    the text/multimodal modules (the families this battery targets).
    Embeddings/events-reading and streaming lanes are out of scope —
    their batteries exist (r9 embeddings, r10 relational/streaming)."""
    names = []
    for name, ent in registry.items():
        o = ent.oracle
        if not o or "embeddings" in o or "events" in o:
            continue
        if "documents" not in o:
            continue
        mod = getattr(ent.fn, "__module__", "") or ""
        if mod.endswith((
            "queries_training", "queries_multimodal", "queries_text",
        )):
            names.append(name)
    return sorted(names)


def main() -> None:
    import duckdb

    from trading_dashboard_spark.queries import QUERY_REGISTRY
    from trading_dashboard_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check_oracle import normalize  # noqa: E402

    base = os.environ.get("ADV_CUR_DIR", "/tmp/adv_curation")
    dirs = build_scenarios(base)
    args = sys.argv[1:]
    scenarios = [a for a in args if a in dirs] or list(dirs)
    names = [a for a in args if a in QUERY_REGISTRY] or qualifying_queries(
        QUERY_REGISTRY
    )

    spark = get_spark("adv_curation",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    agree, diverge, errors = [], [], []
    for scen in scenarios:
        d = dirs[scen]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
        )
        for name in names:
            ent = QUERY_REGISTRY[name]
            tag = f"{scen}:{name}"
            try:
                got = normalize(ent.fn(spark, d).toPandas())
                exp = normalize(con.execute(ent.oracle).df())
                if list(got.columns) != list(exp.columns):
                    diverge.append((tag, "columns",
                                    list(got.columns), list(exp.columns)))
                elif len(got) != len(exp):
                    diverge.append((tag, "rowcount", len(got), len(exp)))
                elif not got.equals(exp):
                    neq = (got != exp) & ~(got.isna() & exp.isna())
                    cols = [c for c in got.columns if neq[c].any()]
                    diverge.append((tag, "values", cols,
                                    f"{int(neq.any(axis=1).sum())} rows"))
                else:
                    agree.append(tag)
            except Exception as exc:  # noqa: BLE001 — record, continue
                errors.append((tag, f"{type(exc).__name__}: {exc}"[:300]))
            status = ("ok" if tag in agree else "DIVERGE"
                      if any(x[0] == tag for x in diverge) else "ERROR")
            print(f"{status:8s} {tag}", flush=True)
        con.close()

    print(f"\n{len(agree)} agree, {len(diverge)} diverge, "
          f"{len(errors)} error")
    for x in diverge:
        print("DIVERGE", *x)
    for tag, msg in errors:
        print("ERROR", tag, msg)


if __name__ == "__main__":
    main()
