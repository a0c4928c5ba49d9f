"""Property-based ingestion invariants (SURVEY.md §5.4).

For any generated TSV: valid_rows + quarantined_rows == data_lines,
every quarantined row carries ≥1 reason, and integer/date coercions
round-trip on valid rows.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_data_ingestion_spark.ingest import ingest_ctb_file
from etl_data_ingestion_spark.schema import BQ_SCHEMA_MAP

RAW_HEADERS = list(BQ_SCHEMA_MAP.keys())
CANONICAL = [BQ_SCHEMA_MAP[h] for h in RAW_HEADERS]
TYPES = {
    c: t
    for c, t in zip(
        CANONICAL,
        [
            "STRING", "STRING", "STRING", "STRING", "STRING", "STRING",
            "DATE", "INTEGER", "INTEGER", "DATE", "STRING", "DATE",
            "INTEGER", "INTEGER", "INTEGER", "STRING", "STRING",
            "INTEGER", "STRING", "STRING", "DATE",
        ],
    )
}

good_int = st.integers(-10**9, 10**9).map(str)
comma_int = st.integers(1000, 10**7).map(lambda v: f"{v:,}")
bad_int = st.sampled_from(["12x", "x", "1.5.2", "--3", "1 2"])
good_date = st.dates(datetime.date(1990, 1, 1), datetime.date(2030, 1, 1)).map(
    lambda d: d.isoformat()
)
bad_date = st.sampled_from(["07/15/2025", "2025-13-40", "notadate", "20250701"])
strings = st.text(
    alphabet=st.characters(blacklist_characters="\t\n\r", max_codepoint=0x24F),
    max_size=12,
)
empty = st.just("")


def field_strategy(typ: str):
    if typ == "INTEGER":
        return st.one_of(good_int, comma_int, bad_int, empty)
    if typ == "DATE":
        return st.one_of(good_date, bad_date, empty)
    return st.one_of(strings, empty)


row_strategy = st.tuples(*[field_strategy(TYPES[c]) for c in CANONICAL])


def is_valid_row(vals) -> bool:
    for c, v in zip(CANONICAL, vals):
        v = v.strip()
        if v == "":
            continue
        if TYPES[c] == "INTEGER":
            s = v.replace(",", "")
            if not (s and (s.lstrip("+-").isdigit() and s.count("+") + s.count("-") <= 1 and (s[0] in "+-" or s[0].isdigit()))):
                return False
        elif TYPES[c] == "DATE":
            try:
                y, m, d = v.split("-")
                datetime.date(int(y), int(m), int(d))
                if len(y) != 4:
                    return False
            except Exception:
                return False
    return True


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row_strategy, min_size=1, max_size=8))
def test_conservation_invariant(spark, tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("prop")
    path = str(tmp / "gen.tsv")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\t".join(RAW_HEADERS) + "\n")
        for vals in rows:
            f.write("\t".join(vals) + "\n")

    res = ingest_ctb_file(spark, path)
    assert res.ok
    v, q = res.valid.count(), res.quarantine.count()
    assert v + q == len(rows)

    expected_valid = sum(1 for vals in rows if is_valid_row(vals))
    assert v == expected_valid

    for qrow in res.quarantine.collect():
        assert len(qrow["_errors"]) >= 1
