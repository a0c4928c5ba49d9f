"""Mailbox-style source: message documents → CTB attachments.

Spark-first re-expression of the reference's extract stage:
- S2 (list_messages, main.py:158-177): the server-side query-string
  filter becomes source-level pushdown — the caller reads only the
  matching message documents (pathGlobFilter / partition predicate);
  nothing here re-filters client-side.
- S5 (process_part, main.py:514-572): the recursive MIME ``parts``
  walk, the ``filename.startswith('CTB')`` predicate, and the
  first-match-wins-per-message break (main.py:571) become: recursive
  flatten → explode → filter → row_number()==1.
- S4 (get_attachment, main.py:200-219): urlsafe-base64 payloads decode
  JVM-side via translate('-_' → '+/') + unbase64.

Messages arrive as JSON documents (one per line/file — exactly the
Gmail API ``format='full'`` shape). The parts tree has unbounded
depth, which a static Spark schema can't express, so flattening walks
the tree in an Arrow-batched pandas UDF — the one genuinely
non-relational step — and everything after it is plain DataFrame ops.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

PART_SCHEMA = StructType(
    [
        StructField("filename", StringType()),
        StructField("mime_type", StringType()),
        StructField("attachment_id", StringType()),
        StructField("data", StringType()),  # urlsafe-base64 payload
    ]
)

MESSAGE_SCHEMA = StructType(
    [
        StructField("message_id", StringType()),
        StructField("parts", ArrayType(PART_SCHEMA)),
    ]
)


def flatten_message_parts(raw_json: DataFrame, json_col: str = "value") -> DataFrame:
    """DataFrame of raw message-JSON strings → (message_id, parts array).

    Arrow-batched mapInPandas: the tree walk runs vectorized per batch,
    scales with executors, and never materializes messages on the
    driver. The closure is deliberately self-contained (no references
    to module-level symbols) so cloudpickle ships it by value and the
    workers never need this package importable.
    """

    def flatten(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json

        import pandas as _pd

        def walk(payload: dict) -> list[dict]:
            # depth-first part traversal (reference main.py:566-571);
            # reversed → leftmost child explored first, like the recursion
            found: list[dict] = []
            stack = [payload]
            while stack:
                part = stack.pop()
                found.append(
                    {
                        "filename": part.get("filename") or "",
                        "mime_type": part.get("mimeType") or "",
                        "attachment_id": (part.get("body") or {}).get("attachmentId"),
                        "data": (part.get("body") or {}).get("data"),
                    }
                )
                stack.extend(reversed(part.get("parts") or []))
            return found

        for pdf in batches:
            out = []
            for doc in pdf[json_col]:
                msg = _json.loads(doc)
                out.append(
                    {
                        "message_id": msg.get("id"),
                        "parts": walk(msg.get("payload") or {}),
                    }
                )
            yield _pd.DataFrame(out, columns=["message_id", "parts"])

    return raw_json.mapInPandas(flatten, schema=MESSAGE_SCHEMA)


def select_ctb_attachments(
    messages: DataFrame, prefix: str = "CTB"
) -> DataFrame:
    """First matching attachment per message (reference main.py:518-523,
    first-match break at main.py:571).

    explode → filter(startswith) → row_number()==1 per message. The
    window partitions by message_id — no skew risk (a message has few
    parts) and the filter prunes before the shuffle.
    """
    parts = messages.select(
        "message_id", F.posexplode_outer("parts").alias("pos", "part")
    )
    matches = parts.filter(
        F.col("part.filename").startswith(prefix)
        & (
            F.col("part.attachment_id").isNotNull()
            | F.col("part.data").isNotNull()
        )
    )
    w = Window.partitionBy("message_id").orderBy("pos")
    return (
        matches.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "message_id",
            F.col("part.filename").alias("filename"),
            F.col("part.mime_type").alias("mime_type"),
            F.col("part.attachment_id").alias("attachment_id"),
            F.col("part.data").alias("data"),
        )
    )


def decode_attachment_data(df: DataFrame, data_col: str = "data") -> DataFrame:
    """urlsafe-base64 → bytes, JVM-side (reference main.py:214:
    base64.urlsafe_b64decode). translate maps the urlsafe alphabet back
    to standard before unbase64; padding is restored by rpad."""
    std = F.translate(F.col(data_col), "-_", "+/")
    # restore '=' padding to a multiple of 4
    padded = F.rpad(
        std, ((F.length(std) + F.lit(3)) / F.lit(4)).cast("int") * 4, "="
    )
    return df.withColumn("content", F.unbase64(padded))
