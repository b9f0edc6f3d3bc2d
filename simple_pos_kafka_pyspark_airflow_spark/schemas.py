"""Explicit StructType registry — the engine's DDL.

The reference has no schema system: CSV ``inferSchema`` reads (reference
``POS_spark_dag.py:143-146``), header-only all-string reads
(``POS_spark_dag.py:90``) followed by per-column casts, and implicit pandas
column lists in the consumer (``kafka_consumer.py:91,211,303``). Inferred
schemas re-scan the data and can flip types between files, so this engine
declares every schema statically and never uses inferSchema.

Two schema families:

- POS entity schemas — the reference's 3 warehouse tables + the 9 Kafka
  event payloads (from the upsert DDL at ``POS_spark_dag.py:178-189,
  258-267, 342-350`` and producer payloads ``kafka_producer.py:127-135``).
- Testdata schemas — the TPC-H-ish tables the driver verifies against.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# POS entity schemas (reference parity)
# ---------------------------------------------------------------------------

#: public.sales — reference POS_spark_dag.py:178-189; money kept DOUBLE to
#: stay oracle-friendly (production note: DecimalType(12,2)).
SALES = T.StructType(
    [
        T.StructField("sale_id", T.LongType(), False),
        T.StructField("customer_id", T.LongType(), True),
        T.StructField("product_id", T.StringType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("total_price", T.DoubleType(), True),
        T.StructField("sale_date", T.TimestampType(), True),
        T.StructField("payment_method", T.StringType(), True),
    ]
)

#: public.products — reference POS_spark_dag.py:258-267.
PRODUCTS = T.StructType(
    [
        T.StructField("product_id", T.StringType(), False),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("product_category", T.StringType(), True),
        T.StructField("product_price", T.DoubleType(), True),
        T.StructField("stock_level", T.IntegerType(), True),
    ]
)

#: public.customers — reference POS_spark_dag.py:342-350.
CUSTOMERS = T.StructType(
    [
        T.StructField("customer_id", T.LongType(), False),
        T.StructField("customer_name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("phone", T.StringType(), True),
        T.StructField("membership_level", T.StringType(), True),
    ]
)

#: Kafka event payload: sales events (producer kafka_producer.py:127-135).
SALE_EVENT = T.StructType(
    [
        T.StructField("sale_id", T.LongType(), True),
        T.StructField("customer_id", T.LongType(), True),
        T.StructField("product_id", T.StringType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("total_price", T.DoubleType(), True),
        T.StructField("sale_date", T.StringType(), True),  # "yyyy-MM-dd HH:mm:ss"
        T.StructField("payment_method", T.StringType(), True),
        T.StructField("op", T.StringType(), True),  # add | edit | remove
    ]
)

#: Kafka event payload: product add/edit/remove topics.
PRODUCT_EVENT = T.StructType(
    [
        T.StructField("product_id", T.StringType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("product_category", T.StringType(), True),
        T.StructField("product_price", T.DoubleType(), True),
        T.StructField("stock_level", T.IntegerType(), True),
        T.StructField("op", T.StringType(), True),
    ]
)

#: Kafka event payload: customer add/edit/remove topics.
CUSTOMER_EVENT = T.StructType(
    [
        T.StructField("customer_id", T.LongType(), True),
        T.StructField("customer_name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("phone", T.StringType(), True),
        T.StructField("membership_level", T.StringType(), True),
        T.StructField("op", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Testdata schemas (driver contract tables)
# ---------------------------------------------------------------------------

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

TESTDATA: dict[str, T.StructType] = {
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
