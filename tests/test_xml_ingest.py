"""Golden + metrics tests for the XML ingestion source (SURVEY.md §5.2
items 2 and 4), mirroring the reference's CitiesCount sample output
(/root/reference/README.md:42-58) on the FIXTURES.md §B fixture."""

from __future__ import annotations

import os

from apache_spark_irs_form_990_spark.sources.xml_ingest import (
    cities_count,
    flatten_xml_file,
    ingest_metrics,
    read_xml_manifest,
    write_fixture,
)


def test_flatten_fixes_reference_bugs(tmp_path):
    """A'1: namespace stripped properly (not char-set strip); A'2:
    container elements ignored, not fatal."""
    manifest = write_fixture(str(tmp_path))
    doc1 = os.path.join(os.path.dirname(manifest), "xml", "doc0001.xml")
    pairs = flatten_xml_file(doc1)
    assert ("CityNm", "Berkeley") in pairs
    assert ("CityNm", "MADISON") in pairs
    assert ("StateAbbreviationCd", "CA") in pairs
    assert ("TotalRevenueAmt", "123456") in pairs
    # no mangled tags like 'F' (what the reference's strip produces for
    # '{ns}Filer') and no container rows at all
    tags = {t for t, _ in pairs}
    assert tags == {"CityNm", "StateAbbreviationCd", "TotalRevenueAmt"}


def test_cities_count_golden(spark, tmp_path):
    manifest = write_fixture(str(tmp_path))
    flattened = read_xml_manifest(
        spark, manifest, base_dir=os.path.dirname(manifest), num_partitions=2
    )
    got = {(r.City, r.Count) for r in cities_count(flattened).collect()}
    # doc1: Berkeley + MADISON; doc2: madison + Berkeley -> lowercased
    assert got == {("berkeley", 2), ("madison", 2)}


def test_badrecord_metrics(spark, tmp_path):
    manifest = write_fixture(str(tmp_path))
    flattened = read_xml_manifest(
        spark, manifest, base_dir=os.path.dirname(manifest)
    )
    m = ingest_metrics(flattened).collect()[0]
    assert m.files_processed == 3
    assert m.files_failed == 1
    # doc1: 4 text-bearing elements, doc2: 3 -> 7 records total
    assert m.records == 7


def test_jsonl_permissive_corrupt_accounting(spark):
    """PERMISSIVE JSON read: 4 good + 2 malformed lines -> corrupt rows
    carry the raw line, good rows aggregate normally."""
    from pyspark.sql import functions as F

    from apache_spark_irs_form_990_spark.sources.xml_ingest import (
        write_jsonl_fixture,
    )

    path = write_jsonl_fixture()
    schema = "id long, city string, amt double, _corrupt_record string"
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()  # required to filter on the corrupt-record column
    )
    n_bad = raw.filter(F.col("_corrupt_record").isNotNull()).count()
    n_good = raw.filter(F.col("_corrupt_record").isNull()).count()
    assert (n_good, n_bad) == (4, 2)

    from apache_spark_irs_form_990_spark import registry

    got = {
        (r["city"], r["cnt"])
        for r in registry.queries()["ingest_jsonl_permissive"](spark, "").collect()
    }
    assert got == {("berkeley", 2), ("madison", 2)}


def test_csv_permissive_accounting(spark):
    """CSV PERMISSIVE: 4 good rows aggregate; the short row and the
    bad-double row are excluded from the clean aggregate (corrupt or
    null-filled), never fatal."""
    from apache_spark_irs_form_990_spark.sources.xml_ingest import (
        ingest_csv_permissive,
    )

    out = {
        r["city"]: (r["cnt"], r["sum_amt"])
        for r in ingest_csv_permissive(spark, "").collect()
    }
    assert out == {
        "berkeley": (2, 117.75),
        "madison": (1, 25.0),
        "austin": (1, 3.1),
    }


def test_read_uri_bytes_scheme_branches(tmp_path):
    """Scheme dispatch (reference IRSSpark.py:193-244 parity): local
    file:/relative reads work; unknown schemes raise (so the pipeline
    accounts them as failures); remote schemes raise OSError when
    unreachable instead of hanging or aborting."""
    import pytest

    from apache_spark_irs_form_990_spark.sources.xml_ingest import read_uri_bytes

    p = tmp_path / "doc.xml"
    p.write_bytes(b"<a>hi</a>")
    assert read_uri_bytes(f"file:{p}") == b"<a>hi</a>"
    assert read_uri_bytes("doc.xml", base_dir=str(tmp_path)) == b"<a>hi</a>"
    with pytest.raises(ValueError, match="unsupported URI scheme"):
        read_uri_bytes("gopher://host/doc.xml")
    # offline sandbox: the s3 client exists (pyarrow) but the bucket is
    # unreachable -> an exception the pipeline converts to a failure row
    with pytest.raises(Exception):
        read_uri_bytes("s3://no-such-bucket-xyz/doc.xml")


def test_remote_uri_failure_rows_accounted(spark, tmp_path):
    """A manifest mixing one good local file with unreachable s3:// and
    hdfs:// URIs processes the local file and counts BOTH remote URIs
    as failed files — per-file accounting, no job abort (reference
    A2-A4 + A15 semantics across every scheme branch)."""
    from apache_spark_irs_form_990_spark.sources.xml_ingest import (
        _DOC1,
        ingest_metrics,
        read_xml_manifest,
    )

    xml = tmp_path / "good.xml"
    xml.write_text(_DOC1)
    manifest = tmp_path / "manifest.txt"
    manifest.write_text(
        f"file:{xml}\n"
        "s3://no-such-bucket-test990/filing.xml\n"
        "hdfs://no-such-namenode:8020/filing.xml\n"
    )
    flattened = read_xml_manifest(spark, str(manifest))
    rows = flattened.collect()
    failed_uris = {r["doc_uri"] for r in rows if not r["ok"]}
    assert failed_uris == {
        "s3://no-such-bucket-test990/filing.xml",
        "hdfs://no-such-namenode:8020/filing.xml",
    }
    m = ingest_metrics(flattened).collect()[0]
    assert m["files_processed"] == 3
    assert m["files_failed"] == 2
    assert m["records"] == 4  # _DOC1's four non-empty leaves
