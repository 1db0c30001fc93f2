"""Shared expression-level building blocks used across operators and
query modules:

- ``vectors`` — integer milli-unit embedding kernels (exact dot /
  norm, Arrow-batched pair scoring) and their DuckDB SQL twin;
- ``text`` — word n-gram shingles;
- ``ranks`` — distributed exact global row_number / running sums /
  NTILE (the scale-safe replacement for unpartitioned windows);
- ``money`` — exact integer-cents aggregation helpers and their SQL
  twins (the oracle-stability convention for double aggregates).
"""

from apache_spark_irs_form_990_spark.functions.money import (  # noqa: F401
    SQL_REVENUE_CENTS,
    cents,
    davg,
    dsum,
    revenue_cents,
    revenue_sum,
    sql_cents,
    sql_davg,
    sql_dsum,
    sql_revenue_sum,
)
from apache_spark_irs_form_990_spark.functions.ranks import (  # noqa: F401
    global_order,
    idiv,
    ntile_from_rn,
)
from apache_spark_irs_form_990_spark.functions.text import (  # noqa: F401
    shingles,
)
from apache_spark_irs_form_990_spark.functions.vectors import (  # noqa: F401
    SQL_COS_AB,
    dot,
    milli_vec,
    pair_dot_udf,
    sq_norm,
)
