"""trading_dashboard_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (``Ruidozo/trading_dashboard``): batch ETL over price time-series,
window analytics (trends, moving-average crossovers, volatility, technical
indicators), news/text scoring, upsert-style table maintenance, ML
next-value prediction — plus LLM-data-pipeline extensions (dedup,
similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Everything is expressed with the Spark DataFrame / SQL API so Catalyst
plans it (predicate pushdown, column pruning, broadcast joins, AQE).
Python UDFs only appear where semantics genuinely require them
(recursive EMA, VADER-like lexicon scoring), always Arrow-vectorized.

Layout:
    session      SparkSession factory with scale-aware defaults
    schemas      explicit StructTypes for every dataset
    io           readers / writers / merge (upsert) facades
    operators    relational, window, indicator, pattern, as-of operators
    text         tokenization, quality, language-ID, fingerprint, dedup
    similarity   embedding kNN (brute force + LSH bucketed)
    multimodal   opaque binary columns + typed metadata plumbing
    ml           feature windows + linear regression with residual stage
    streaming    Structured Streaming ingest + windowed aggregation
    pipelines    end-to-end derivation pipelines mirroring the reference
"""

__version__ = "0.1.0"
