"""Explicit StructType schemas for the CDC engine (FIXTURES.md §1-2).

The reference's schema is implicit/convention-based (producer writes a meta
dict, Pydantic re-imposes a contract on read — reference
ETL/batch_ecs/source/document.py:51-61, search_server/src/models/document.py:6-15).
Our engine is schema-first: every table has an explicit StructType and
evolution is additive-only, validated at commit time.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Natural key of a transcript turn. Replaces the reference's Haystack
# content-hash doc id (ETL/batch_ecs/source/document.py:64).
KEY_COLS = ["conv_id", "turn_idx"]

# LSN: global total order of the change feed — the analogue of the
# reference's resumptionToken/date cursor (ETL/glue/arxiv_feed.py:75-82).
LSN_COL = "lsn"
OP_COL = "op"

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), nullable=False),
        T.StructField("op", T.StringType(), nullable=False),  # 'I' | 'U' | 'D'
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("role", T.StringType(), nullable=True),
        T.StructField("text", T.StringType(), nullable=True),  # null for 'D'
        T.StructField("tool", T.StringType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=True),
    ]
)

# Mid-stream additive columns (schema-evolution fixture, FIXTURES.md §1).
EVOLVED_FIELDS = [
    T.StructField("model", T.StringType(), nullable=True),
    T.StructField("tokens", T.IntegerType(), nullable=True),
]

CHANGE_SCHEMA_EVOLVED = T.StructType(list(CHANGE_SCHEMA.fields) + EVOLVED_FIELDS)

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("role", T.StringType(), nullable=True),
        T.StructField("text", T.StringType(), nullable=True),
        T.StructField("tool", T.StringType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=True),
    ]
)

# Table schema for versioned storage (merge-on-read lake tables and the
# streaming sink): payload + lsn/op so readers can resolve LWW and deletes
# persist as tombstones.
VERSIONED_TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Columns carried by the feed but not part of table state.
FEED_ONLY_COLS = [LSN_COL, OP_COL]


def value_columns(schema: T.StructType) -> list[str]:
    """Non-key, non-feed columns of a change batch = the payload columns."""
    return [f.name for f in schema.fields if f.name not in KEY_COLS + FEED_ONLY_COLS]


def additive_diff(table: T.StructType, batch: T.StructType) -> list[T.StructField]:
    """Columns in `batch` missing from `table` — the additive-evolution delta.

    Raises on type conflicts for same-named columns (evolution is additive
    only; type changes are rejected, matching Iceberg's safe-evolution rules).
    """
    table_by_name = {f.name: f for f in table.fields}
    new_fields: list[T.StructField] = []
    for f in batch.fields:
        existing = table_by_name.get(f.name)
        if existing is None:
            new_fields.append(T.StructField(f.name, f.dataType, nullable=True))
        elif existing.dataType != f.dataType:
            raise ValueError(
                f"schema evolution type conflict on column '{f.name}': "
                f"table has {existing.dataType}, batch has {f.dataType}"
            )
    return new_fields


def evolve(table: T.StructType, batch: T.StructType) -> T.StructType:
    """Union-by-name: table schema + batch's new nullable columns appended."""
    return T.StructType(list(table.fields) + additive_diff(table, batch))
