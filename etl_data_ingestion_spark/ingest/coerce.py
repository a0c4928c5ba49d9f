"""Type coercion with per-row validity and error reasons.

Re-expresses the reference's row loop (main.py:369-414) as pure,
fully-vectorized DataFrame expressions — no Python runs per row, so
the same code that passes the golden tests on 10 rows holds on 100 TB:

- trim every field (main.py:382)
- '' → NULL for every type (main.py:387-388)
- INTEGER: strip thousands-separator commas then parse; a non-integer
  value records a reason and rejects the ROW (main.py:389-399, 413)
- DATE: strict %Y-%m-%d; failure records a reason and rejects the ROW
  (main.py:400-410, 413)
- STRING: trimmed passthrough (main.py:411-412)
- a row with ANY failed coercion goes to quarantine with its reasons;
  coerced-to-NULL *empty* fields do not reject (main.py:387-388)

Deviation from the reference (deliberate, documented): error reasons
carry the source file and raw row instead of a 1-based line number —
a distributed text scan has no global line order, and file+content is
the scale-safe identity. Python's int() also accepts underscores
('1_2') and strptime accepts 2-digit years; we require ^[+-]?digits$
and 4-digit years — strictly tighter, and covered by tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from etl_data_ingestion_spark.schema import BQ_SCHEMA_TYPES

INT_PATTERN = r"^[+-]?[0-9]+$"
# Lenient zero-padding like strptime's %Y-%m-%d (accepts 2025-7-5),
# strict otherwise (CORRECTED time-parser policy → real calendar check).
DATE_FORMAT = "yyyy-M-d"


def _base(col: str) -> Column:
    """Trimmed value with ''→NULL applied — the universal prelude."""
    t = F.trim(F.col(col))
    return F.when(t == "", F.lit(None)).otherwise(t)


def coercion_exprs(
    types: dict[str, str] | None = None,
) -> tuple[dict[str, Column], dict[str, Column], list[Column]]:
    """Build (casted-value, row-validity, error-reason) expressions.

    Returns ``(values, valid_flags, error_exprs)`` keyed/ordered by
    column. Generated from the schema map so adding a column is a
    one-line schema change, mirroring how the reference drives its loop
    from bq_schema_types (main.py:381-385).
    """
    types = types or BQ_SCHEMA_TYPES
    values: dict[str, Column] = {}
    valid: dict[str, Column] = {}
    errors: list[Column] = []

    for name, typ in types.items():
        base = _base(name)
        if typ == "INTEGER":
            cleaned = F.regexp_replace(base, ",", "")
            ok = base.isNull() | cleaned.rlike(INT_PATTERN)
            values[name] = F.when(ok, cleaned.cast("long"))
            valid[name] = ok
            errors.append(
                F.when(
                    ~ok,
                    F.format_string(
                        "Value error for column '%s': could not convert '%s' to INTEGER. Setting to None.",
                        F.lit(name),
                        base,
                    ),
                )
            )
        elif typ == "DATE":
            casted = F.to_date(base, DATE_FORMAT)
            ok = base.isNull() | casted.isNotNull()
            values[name] = casted
            valid[name] = ok
            errors.append(
                F.when(
                    ~ok,
                    F.format_string(
                        "Value error for column '%s': could not convert '%s' to DATE (expected %%Y-%%m-%%d). Setting to None.",
                        F.lit(name),
                        base,
                    ),
                )
            )
        else:  # STRING
            values[name] = base
    return values, valid, errors


def split_valid_quarantine(
    df: DataFrame,
    types: dict[str, str] | None = None,
    corrupt_col: str | None = None,
    source_file_col: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """All-string DataFrame → (typed valid rows, quarantine rows).

    ``corrupt_col`` names the CSV corrupt-record column (malformed
    token counts, reference main.py:372-377); those rows quarantine
    with a column-count reason. One projection computes both outputs —
    Spark evaluates the shared scan once per sink.
    """
    types = types or BQ_SCHEMA_TYPES
    values, valid, error_exprs = coercion_exprs(types)

    malformed = (
        F.col(corrupt_col).isNotNull() if corrupt_col else F.lit(False)
    )
    all_errors = list(error_exprs)
    all_errors.append(
        F.when(
            malformed,
            F.format_string(
                "Malformed row: column count mismatch. Row content: '%s'",
                F.col(corrupt_col) if corrupt_col else F.lit(""),
            ),
        )
    )
    errors_arr = F.array_compact(F.array(*all_errors))
    row_ok = ~malformed
    for flag in valid.values():
        row_ok = row_ok & flag

    annotated = df.withColumn("_errors", errors_arr).withColumn("_row_ok", row_ok)

    valid_df = annotated.filter(F.col("_row_ok")).select(
        *[values[name].alias(name) for name in types]
    )
    src = source_file_col if source_file_col is not None else F.lit(None).cast("string")
    quarantine_df = annotated.filter(~F.col("_row_ok")).select(
        *[F.trim(F.col(name)).alias(name) for name in types],
        (F.col(corrupt_col) if corrupt_col else F.lit(None).cast("string")).alias("_raw"),
        F.col("_errors").alias("_errors"),
        src.alias("_source_file"),
    )
    return valid_df, quarantine_df
