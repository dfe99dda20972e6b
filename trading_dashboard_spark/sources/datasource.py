"""Python DataSource API form of the REST quote source (S1).

`sources/rest.py` runs the fetch as a `mapInPandas` stage over a symbol
DataFrame; this module exposes the SAME capability through Spark 4's
Python DataSource API, so ingestion reads like any other format:

    spark.dataSource.register(QuoteRestDataSource)
    spark.read.format("rest_quotes")
         .option("symbols", "AAPL,MSFT,...").option("partitions", "8")
         .option("transport", "synthetic").load()

Why both forms exist: the DataSource form is the idiomatic reader-side
integration (catalogs, `format(...)` pipelines, schema inference-free
scans, partition planning owned by the source); the mapInPandas form
composes mid-pipeline (fetch keyed by the OUTPUT of a previous stage).
The reference's loop (full_stock_pipeline.py:83-129) maps to either.

Transports are selected by option, never imported eagerly:
``synthetic`` derives deterministic quotes from the symbol's md5 (the
offline test/bench transport — no network is ever assumed in this
repo); ``http`` GETs ``endpoint`` with ``{symbol}`` substituted using
stdlib urllib at read time inside executors. Partition planning splits
the symbol list round-robin across ``partitions`` input splits, so
aggregate throughput scales with parallelism exactly like the
mapInPandas form.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import RAW_QUOTE


@dataclass
class _SymbolSplit(InputPartition):
    symbols: list[str]


def synthetic_quote(symbol: str, date: str) -> dict:
    """Deterministic offline quote: fields derived from md5(symbol|date).
    Stable across runs/processes — usable as a bench/test transport and
    as the documented shape of a real transport's output."""
    dg = hashlib.md5(f"{symbol}|{date}".encode()).digest()
    base = 20.0 + dg[0] * 2.0 + dg[1] / 13.0
    spread = 0.5 + dg[2] / 51.0
    o = round(base + (dg[3] - 128) / 64.0, 4)
    c = round(base + (dg[4] - 128) / 64.0, 4)
    pc = round(base + (dg[5] - 128) / 64.0, 4)
    return {
        "symbol": symbol,
        "date": date,
        "o": o,
        "h": round(max(o, c) + spread, 4),
        "l": round(min(o, c) - spread, 4),
        "c": c,
        "pc": pc,
        "d": round(c - pc, 4),
        "dp": round((c - pc) / pc * 100.0, 4) if pc else None,
        "v": int.from_bytes(dg[6:9], "big"),
    }


class QuoteRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.symbols = [
            s.strip() for s in (options.get("symbols") or "").split(",") if s.strip()
        ]
        if not self.symbols:
            raise ValueError("rest_quotes: 'symbols' option is required")
        self.n_parts = max(1, int(options.get("partitions", "4")))
        self.transport = options.get("transport", "synthetic")
        self.endpoint = options.get("endpoint")
        self.date = options.get("date", "1970-01-01")
        if self.transport not in ("synthetic", "http"):
            raise ValueError(f"rest_quotes: unknown transport {self.transport!r}")
        if self.transport == "http" and not self.endpoint:
            raise ValueError("rest_quotes: transport=http requires 'endpoint'")

    def partitions(self):
        chunks = [self.symbols[i :: self.n_parts] for i in range(self.n_parts)]
        return [_SymbolSplit(c) for c in chunks if c]

    def read(self, partition: _SymbolSplit):
        cols = [f.name for f in RAW_QUOTE.fields]
        for sym in partition.symbols:
            if self.transport == "synthetic":
                q = synthetic_quote(sym, self.date)
            else:  # http — executed on executors, stdlib only
                import json
                import urllib.request

                with urllib.request.urlopen(
                    self.endpoint.format(symbol=sym), timeout=30
                ) as resp:
                    q = json.load(resp)
                # injected keys LAST: remote JSON must not be able to
                # override the partition's symbol/date identity
                q = {**q, "symbol": sym, "date": self.date}
                missing = [c for c in cols if c not in q]
                if missing:
                    raise ValueError(
                        f"rest_quotes: response for {sym!r} missing required "
                        f"fields {missing} (would become silent NULLs)"
                    )
            yield tuple(q.get(c) for c in cols)


class QuoteRestDataSource(DataSource):
    """`spark.read.format("rest_quotes")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "rest_quotes"

    def schema(self):
        return RAW_QUOTE

    def reader(self, schema) -> QuoteRestReader:
        return QuoteRestReader(self.options)


# --------------------------------------------------------------------------
# Writer side — the Spark 4 Python DataSource COMMIT PROTOCOL, demonstrated
# on the engine's outbound shape (pushing alert/result rows to an external
# service — the reference's "export results" leg, S7/S11-adjacent).
# --------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage  # noqa: E402


@dataclass
class _SinkBatchResult(WriterCommitMessage):
    """Per-task commit message: what this partition sent (or, for the
    ``capture`` transport, the payloads themselves — carried to the
    driver through the commit protocol so the test transport is
    EXACTLY-once: nothing externally visible happens until commit())."""

    n_rows: int
    n_batches: int
    payloads: list  # list[str]; empty for fire-and-forget transports


class AlertSinkWriter(DataSourceWriter):
    """Batched outbound sink. Executors serialize rows into JSON-lines
    payloads of ``batch_size``; the transport option decides delivery:

    - ``capture``: payloads ride back in the commit message and the
      DRIVER writes them to ``path`` at commit() — atomic all-or-nothing
      (task retries cannot double-send because only committed task
      outputs reach commit()). The test/offline transport.
    - ``http``: each batch POSTs to ``endpoint`` from the executor at
      write() time — at-least-once under task retries, the usual webhook
      contract (document idempotency keys on the receiving side).
      Import-free until used; never exercised in tests.

    The split mirrors the engine's exactly-once versioned-parquet sink
    (io/versioned.py): external visibility happens at the commit point
    or not at all.
    """

    def __init__(self, options: dict):
        self.transport = (options.get("transport") or "capture").lower()
        self.path = options.get("path")
        self.endpoint = options.get("endpoint")
        self.batch_size = int(options.get("batch_size") or 100)
        if self.transport == "capture" and not self.path:
            raise ValueError("capture transport needs a 'path' option")
        if self.transport == "http" and not self.endpoint:
            raise ValueError("http transport needs an 'endpoint' option")

    def write(self, iterator) -> _SinkBatchResult:
        import json

        payloads, batch, n = [], [], 0
        for row in iterator:
            batch.append(json.dumps(row.asDict(), default=str, sort_keys=True))
            n += 1
            if len(batch) >= self.batch_size:
                payloads.append("\n".join(batch))
                batch = []
        if batch:
            payloads.append("\n".join(batch))
        if self.transport == "http":
            from urllib.request import Request, urlopen

            for p in payloads:
                req = Request(
                    self.endpoint,
                    data=p.encode(),
                    headers={"Content-Type": "application/x-ndjson"},
                )
                urlopen(req, timeout=30).read()
            return _SinkBatchResult(n_rows=n, n_batches=len(payloads), payloads=[])
        return _SinkBatchResult(n_rows=n, n_batches=len(payloads), payloads=payloads)

    def commit(self, messages) -> None:
        if self.transport != "capture":
            return
        import os
        import tempfile

        total = sum(m.n_rows for m in messages if m)
        lines = []
        for m in messages:
            if m:
                lines.extend(m.payloads)
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".alert_sink_")
        with os.fdopen(fd, "w") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
            fh.write(f'{{"__commit__": {total}}}\n')
        os.replace(tmp, self.path)  # atomic single-file commit

    def abort(self, messages) -> None:  # nothing external to clean up
        return


class AlertWebhookDataSource(DataSource):
    """`df.write.format("webhook_alerts")` — outbound DataSource."""

    @classmethod
    def name(cls) -> str:
        return "webhook_alerts"

    def writer(self, schema, overwrite: bool) -> AlertSinkWriter:
        return AlertSinkWriter(self.options)
