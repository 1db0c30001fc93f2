"""apache_spark_irs_form_990_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference repo ``ramshabukhari/Apache_SPARK_IRS-Form-990`` (an RDD-based
IRS 990 XML batch framework, see ``/root/reference/IRSSpark.py``),
generalized into a complete DataFrame/SQL analytics engine:

- relational operators (scan/filter/project/join/aggregate/window/sort/set)
- ingestion parity (manifest-of-URIs -> XML flatten -> long-form DataFrame)
- multi-format sinks (parquet/orc/json/csv with compression)
- UDF surface (Arrow pandas_udf, applyInPandas, mapInPandas)
- LLM-data-pipeline operators (dedup exact/minhash/simhash, similarity
  search, text analysis, multimodal binary columns)
- Structured Streaming over the events table

Everything is declared through the DataFrame/SQL API so Catalyst plans it
(predicate pushdown, partial aggregation, broadcast join selection, AQE);
no RDD code anywhere.
"""

from apache_spark_irs_form_990_spark.session import get_session
from apache_spark_irs_form_990_spark.registry import (
    register,
    queries,
    oracle_sql,
)

__all__ = ["get_session", "register", "queries", "oracle_sql"]
__version__ = "0.1.0"
