"""Golden tests for CTB ingestion — every FIXTURES.md §A.2 case,
each asserting the exact reference behavior it cites."""

from __future__ import annotations

import datetime

import pytest

from etl_data_ingestion_spark.ingest import ingest_ctb_file
from etl_data_ingestion_spark.schema import (
    BQ_SCHEMA_MAP,
    BQ_SCHEMA_TYPES,
    canonical_name,
)

RAW_HEADERS = list(BQ_SCHEMA_MAP.keys())  # 21 raw names, file order
CANONICAL = [BQ_SCHEMA_MAP[h] for h in RAW_HEADERS]

GOOD = {
    "ORG_CODE": "ORG1",
    "MASTER_CUST_NAME": "ACME CORP",
    "CUSTOMER_NUMBER": "C-001",
    "ITEM_NUMBER": "I-100",
    "CUST_PART_NUM": "CP-1",
    "ITEM_DESCRIPTION": "widget",
    "DEMAND_DUE_DATE": "2025-07-15",
    "DEMAND_QTY": "120",
    "ONTIME_QTY": "100",
    "AVAILABLE_DATE": "2025-07-10",
    "SUPPLY_SOURCE": "PLANT7",
    "SUPPLY_AVAILABLE_DATE": "2025-07-12",
    "SUPPLY_AVA_QTY": "80",
    "DAYS_LATE": "0",
    "UNIQ_SHORT_QTY": "3",
    "GATING_PART": "G-9",
    "MAKE_BUY": "MAKE",
    "LEAD_TIME": "14",
    "GATING_CUST_PART": "GC-2",
    "CUST_PART_DESCRIPTION": "gating widget",
    "SNAPSHOT_DATE": "2025-07-01",
}


def row(**overrides) -> str:
    vals = dict(GOOD, **overrides)
    return "\t".join(vals[c] for c in CANONICAL)


def write_tsv(tmp_path, name, text):
    p = tmp_path / name
    p.write_bytes(text.encode("utf-8"))
    return str(p)


def header_line(headers=RAW_HEADERS):
    return "\t".join(headers)


def counts(res):
    return res.valid.count(), res.quarantine.count()


def test_clean_file_all_valid(spark, tmp_path):
    path = write_tsv(
        tmp_path, "ctb_clean.tsv", header_line() + "\n" + row() + "\n" + row() + "\n"
    )
    res = ingest_ctb_file(spark, path)
    assert res.ok
    assert counts(res) == (2, 0)
    r = res.valid.collect()[0]
    assert r["DEMAND_QTY"] == 120
    assert r["DEMAND_DUE_DATE"] == datetime.date(2025, 7, 15)
    assert r["ORG_CODE"] == "ORG1"


def test_bom_and_crlf(spark, tmp_path):
    # BOM-prefixed header + \r\n endings parse identically (main.py:349)
    text = "﻿" + header_line() + "\r\n" + row() + "\r\n"
    path = write_tsv(tmp_path, "ctb_bom_crlf.tsv", text)
    res = ingest_ctb_file(spark, path)
    assert res.ok
    assert counts(res) == (1, 0)


def test_alias_renames(spark, tmp_path):
    # Raw headers like 'Avail OnTime' land as canonical ONTIME_QTY
    # (main.py:299-321, 350-351)
    path = write_tsv(tmp_path, "ctb_aliases.tsv", header_line() + "\n" + row() + "\n")
    res = ingest_ctb_file(spark, path)
    assert res.ok
    assert set(res.valid.columns) == set(BQ_SCHEMA_TYPES)


def test_unknown_column_fails_whole_file(spark, tmp_path):
    headers = RAW_HEADERS + ["FOO BAR"]
    text = "\t".join(headers) + "\n" + row() + "\tjunk\n"
    path = write_tsv(tmp_path, "ctb_unknown_col.tsv", text)
    res = ingest_ctb_file(spark, path)
    assert not res.ok
    assert "FOO_BAR" in res.file_error
    assert counts(res) == (0, 0)


def test_short_row_quarantined(spark, tmp_path):
    short = "\t".join([GOOD[c] for c in CANONICAL[:-1]])  # 20 fields
    text = header_line() + "\n" + row() + "\n" + short + "\n"
    path = write_tsv(tmp_path, "ctb_short_row.tsv", text)
    res = ingest_ctb_file(spark, path)
    assert res.ok
    assert counts(res) == (1, 1)
    q = res.quarantine.collect()[0]
    assert any("column count mismatch" in e for e in q["_errors"])


def test_long_row_quarantined(spark, tmp_path):
    long_row = row() + "\textra"  # 22 fields
    text = header_line() + "\n" + long_row + "\n" + row() + "\n"
    path = write_tsv(tmp_path, "ctb_long_row.tsv", text)
    res = ingest_ctb_file(spark, path)
    assert counts(res) == (1, 1)


def test_comma_int_coerced(spark, tmp_path):
    # '1,234' → 1234 (main.py:391-392)
    text = header_line() + "\n" + row(DEMAND_QTY='1,234') + "\n"
    path = write_tsv(tmp_path, "ctb_comma_int.tsv", text)
    res = ingest_ctb_file(spark, path)
    assert counts(res) == (1, 0)
    assert res.valid.collect()[0]["DEMAND_QTY"] == 1234


def test_bad_int_rejects_row(spark, tmp_path):
    # '12x' → row rejected with reason (main.py:393-399, 413)
    text = header_line() + "\n" + row(DEMAND_QTY="12x") + "\n" + row() + "\n"
    path = write_tsv(tmp_path, "ctb_bad_int.tsv", text)
    res = ingest_ctb_file(spark, path)
    assert counts(res) == (1, 1)
    q = res.quarantine.collect()[0]
    assert any("DEMAND_QTY" in e and "INTEGER" in e for e in q["_errors"])


def test_bad_date_rejects_row(spark, tmp_path):
    # '07/15/2025' → row rejected with reason (main.py:404-410, 413)
    text = header_line() + "\n" + row(DEMAND_DUE_DATE="07/15/2025") + "\n"
    path = write_tsv(tmp_path, "ctb_bad_date.tsv", text)
    res = ingest_ctb_file(spark, path)
    assert counts(res) == (0, 1)
    q = res.quarantine.collect()[0]
    assert any("DEMAND_DUE_DATE" in e and "DATE" in e for e in q["_errors"])


def test_lenient_zero_padding_like_strptime(spark, tmp_path):
    # strptime('%Y-%m-%d') accepts '2025-7-5' — so do we (coerce.py DATE_FORMAT)
    text = header_line() + "\n" + row(DEMAND_DUE_DATE="2025-7-5") + "\n"
    res = ingest_ctb_file(spark, write_tsv(tmp_path, "ctb_pad.tsv", text))
    assert counts(res) == (1, 0)
    assert res.valid.collect()[0]["DEMAND_DUE_DATE"] == datetime.date(2025, 7, 5)


def test_invalid_calendar_date_rejected(spark, tmp_path):
    text = header_line() + "\n" + row(DEMAND_DUE_DATE="2025-13-01") + "\n"
    res = ingest_ctb_file(spark, write_tsv(tmp_path, "ctb_cal.tsv", text))
    assert counts(res) == (0, 1)


def test_empty_fields_null_rows_valid(spark, tmp_path):
    # '' → NULL for every type; rows remain valid (main.py:387-388)
    text = (
        header_line()
        + "\n"
        + row(DEMAND_QTY="", DEMAND_DUE_DATE="", ORG_CODE="")
        + "\n"
    )
    path = write_tsv(tmp_path, "ctb_empty_fields.tsv", text)
    res = ingest_ctb_file(spark, path)
    assert counts(res) == (1, 0)
    r = res.valid.collect()[0]
    assert r["DEMAND_QTY"] is None
    assert r["DEMAND_DUE_DATE"] is None
    assert r["ORG_CODE"] is None


def test_whitespace_only_field_is_null(spark, tmp_path):
    # trim happens before the empty check (main.py:382, 387)
    text = header_line() + "\n" + row(ORG_CODE="   ") + "\n"
    res = ingest_ctb_file(spark, write_tsv(tmp_path, "ctb_ws.tsv", text))
    assert counts(res) == (1, 0)
    assert res.valid.collect()[0]["ORG_CODE"] is None


def test_header_only_file_fails(spark, tmp_path):
    path = write_tsv(tmp_path, "ctb_header_only.tsv", header_line() + "\n")
    res = ingest_ctb_file(spark, path)
    assert not res.ok
    assert "no data rows" in res.file_error


def test_empty_file_fails(spark, tmp_path):
    path = write_tsv(tmp_path, "ctb_empty.tsv", "")
    res = ingest_ctb_file(spark, path)
    assert not res.ok


def test_mixed_invariant(spark, tmp_path):
    # valid + quarantined == data lines (FIXTURES.md invariant)
    lines = [
        row(),
        row(DEMAND_QTY="12x"),
        "\t".join([GOOD[c] for c in CANONICAL[:5]]),
        row(DEMAND_DUE_DATE="bad"),
        row(ONTIME_QTY="2,000"),
    ]
    text = header_line() + "\n" + "\n".join(lines) + "\n"
    path = write_tsv(tmp_path, "ctb_mixed.tsv", text)
    res = ingest_ctb_file(spark, path)
    v, q = counts(res)
    assert (v, q) == (2, 3)
    for qrow in res.quarantine.collect():
        assert len(qrow["_errors"]) >= 1


def test_multiple_errors_one_row_all_reported(spark, tmp_path):
    text = header_line() + "\n" + row(DEMAND_QTY="xx", SNAPSHOT_DATE="yy") + "\n"
    res = ingest_ctb_file(spark, write_tsv(tmp_path, "ctb_multi.tsv", text))
    q = res.quarantine.collect()[0]
    assert len(q["_errors"]) == 2


def test_negative_and_plus_ints(spark, tmp_path):
    text = (
        header_line()
        + "\n"
        + row(DAYS_LATE="-5", LEAD_TIME="+3")
        + "\n"
    )
    res = ingest_ctb_file(spark, write_tsv(tmp_path, "ctb_sign.tsv", text))
    assert counts(res) == (1, 0)
    r = res.valid.collect()[0]
    assert r["DAYS_LATE"] == -5 and r["LEAD_TIME"] == 3


def test_canonical_name_examples():
    assert canonical_name("﻿ORG CODE\r") == "ORG_CODE"
    assert canonical_name("Avail OnTime") == "ONTIME_QTY"
    assert canonical_name("GATING M/B") == "MAKE_BUY"
    assert canonical_name("  SNAPSHOT_DATE  ") == "SNAPSHOT_DATE"
    assert canonical_name("weird col") == "WEIRD_COL"
