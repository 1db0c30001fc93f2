"""SURVEY §2 / registry drift guard.

Rounds 1–2 accumulated 27 registered queries that SURVEY.md never
declared; the declared inventory is the review-and-sampling contract,
so this test fails CI the moment a new query is registered without a
SURVEY §2 row (or a SURVEY row names a query that no longer exists).
"""

from __future__ import annotations

import os
import re

from apache_spark_irs_form_990_spark import registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The B1 sink row lists four roundtrips in shorthand
# (`sink_roundtrip_parquet` / `_orc` / `_json` / `_csv`).
_SHORTHAND = {
    "sink_roundtrip_parquet",
    "sink_roundtrip_orc",
    "sink_roundtrip_json",
    "sink_roundtrip_csv",
}


def _survey_ids() -> set[str]:
    with open(os.path.join(_REPO, "SURVEY.md")) as f:
        text = f.read()
    return set(re.findall(r"`([a-z][a-z0-9_]+)`", text)) | _SHORTHAND


def test_every_registered_query_is_declared_in_survey():
    missing = sorted(set(registry.queries()) - _survey_ids())
    assert not missing, (
        f"{len(missing)} registered queries missing from SURVEY.md §2 "
        f"(add rows before registering): {missing}"
    )


def test_oracle_keys_subset_of_queries():
    qs, osql = set(registry.queries()), set(registry.oracle_sql())
    assert osql <= qs, sorted(osql - qs)
