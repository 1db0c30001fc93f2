"""Audit every registered query's output schema for driver-unhashable
column types (array/map/struct/binary): the driver canonicalizes by
sorting rows on all columns, which breaks on numpy.ndarray cells.

Run: python scripts/audit_schemas.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from apache_spark_irs_form_990_spark.session import get_session
from apache_spark_irs_form_990_spark import registry


BAD = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="audit", shuffle_partitions=4)
    qs = registry.queries()
    oracles = registry.oracle_sql()
    offenders = []
    no_oracle = []
    errors = []
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            bad_cols = [
                f.name for f in df.schema.fields if isinstance(f.dataType, BAD)
            ]
            if bad_cols:
                offenders.append((name, bad_cols, name in oracles))
            if name not in oracles:
                no_oracle.append(name)
        except Exception:
            errors.append((name, traceback.format_exc(limit=1)))
    print(f"total queries: {len(qs)}  oracled: {len(oracles)}")
    print(f"\n== non-scalar output columns ({len(offenders)}) ==")
    for name, cols, has_oracle in offenders:
        print(f"  {name}: {cols} (oracle={has_oracle})")
    print(f"\n== no oracle ({len(no_oracle)}) ==")
    for name in no_oracle:
        print(f"  {name}")
    print(f"\n== errors ({len(errors)}) ==")
    for name, tb in errors:
        print(f"  {name}: {tb.splitlines()[-1]}")
    spark.stop()


if __name__ == "__main__":
    main()
