"""Schema registry — explicit StructTypes for every dataset the engine touches.

The reference fixes serving-side types by Postgres DDL and lets pandas infer
in flight (SURVEY.md §1.2). Here every boundary has an explicit schema so
scans never pay inference and Parquet column projection is exact.

Reference DDL citations:
- tech_companies          dags/tasks/fetch_tech_companies.py:66-76
- staging_stock_data      dags/tasks/full_stock_pipeline.py:301,314-317
- stock_price_history     dags/tasks/full_stock_pipeline.py:377-382
- trading_patterns        dags/tasks/full_stock_pipeline.py:431,475-482
- daily_company_news      dags/tasks/fetch_transform_news.py:184-194
- news_stock_analysis     dags/tasks/analyze_news_stock_patterns.py:49-68
- stock_predictions       dags/tasks/analyze_news_stock_patterns.py:219-231
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Domain tables (reference-shaped)
# --------------------------------------------------------------------------

TECH_COMPANIES = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("market_cap", T.DoubleType(), True),
        T.StructField("price_usd", T.DoubleType(), True),
        T.StructField("country", T.StringType(), True),
    ]
)

#: Raw quote JSON shape (one list of flat objects per (symbol, day) file);
#: fields o,h,l,c,pc,d,dp,v per full_stock_pipeline.py:93-102.
RAW_QUOTE = T.StructType(
    [
        T.StructField("symbol", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("o", T.DoubleType(), True),
        T.StructField("h", T.DoubleType(), True),
        T.StructField("l", T.DoubleType(), True),
        T.StructField("c", T.DoubleType(), True),
        T.StructField("pc", T.DoubleType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("dp", T.DoubleType(), True),
        T.StructField("v", T.LongType(), True),
    ]
)

STAGING_STOCK_DATA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("trade_date", T.DateType(), False),
        T.StructField("opening_price", T.DoubleType(), True),
        T.StructField("highest_price", T.DoubleType(), True),
        T.StructField("lowest_price", T.DoubleType(), True),
        T.StructField("closing_price", T.DoubleType(), True),
        T.StructField("previous_closing_price", T.DoubleType(), True),
        T.StructField("traded_volume", T.LongType(), True),
    ]
)

STOCK_PRICE_HISTORY = T.StructType(
    [
        T.StructField("trade_date", T.DateType(), False),
        T.StructField("market_cap_rank", T.IntegerType(), True),
        T.StructField("company_name", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("opening_price", T.DoubleType(), True),
        T.StructField("highest_price", T.DoubleType(), True),
        T.StructField("lowest_price", T.DoubleType(), True),
        T.StructField("closing_price", T.DoubleType(), True),
        T.StructField("previous_closing_price", T.DoubleType(), True),
        T.StructField("traded_volume", T.LongType(), True),
    ]
)

TRADING_PATTERNS = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("trade_date", T.DateType(), False),
        T.StructField("pattern_category", T.StringType(), False),
        T.StructField("pattern", T.StringType(), False),
        T.StructField("confidence_score", T.DoubleType(), True),
    ]
)

DAILY_COMPANY_NEWS = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("news_date", T.DateType(), False),
        T.StructField("headline", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("sentiment_score", T.DoubleType(), True),
    ]
)

# --------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/ — TESTDATA.md)
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

#: Dimension tables small enough to broadcast at any scale factor
#: (region/nation are bounded; part/supplier/customer scale but remain
#: orders-of-magnitude smaller than the facts — broadcast decision is
#: left to AQE for those, forced only for the bounded ones).
BOUNDED_DIMS = frozenset({"region", "nation"})
