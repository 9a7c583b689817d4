"""kinesis_customer_sample_spark — a PySpark-native analytics engine.

A from-scratch engine with the query / data-processing capabilities of the
reference (`washingtonpost/kinesis-customer-sample`, behavioral spec at
/root/reference/docs/user-guide.md), re-expressed Spark-first:

- batch relational surface (scans, joins, aggregation, windows, set ops,
  scalar function families) over a TPC-H-ish star schema;
- the reference's Kinesis content-operation pipeline (decode → dereference →
  parse → keyed state → publish detection → analytics) as batch + Structured
  Streaming operators (guide:13-145);
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash),
  similarity search over embeddings, multimodal binary columns, text analysis.

Everything is declared via the DataFrame/SQL API so Catalyst + AQE pick the
physical strategy; Python UDFs are quarantined to the decode/fetch edge.
"""

from kinesis_customer_sample_spark.session import get_spark  # noqa: F401
from kinesis_customer_sample_spark.catalog import table, register_views, TABLES  # noqa: F401

__version__ = "0.1.0"
