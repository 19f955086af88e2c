"""P1 — semi-structured record parse (SURVEY.md §2.2).

Reference parity: `convert_xml_to_document_list`
(ETL/batch_ecs/source/document.py:17-68) walks `.//oai:record` in an
OAI-PMH harvest payload and extracts 9 fields per record, null-guarding
the 3 optional ones (comments :41-43, license :44-46; the rest raise on
absence), strips the abstract (:37) and builds
``content = title + "\n\n" + abstract`` (:48).

Spark-first mapping: Spark 4's native XML support. A WAL/feed segment that
arrives as raw XML text (one harvest payload = many records) is parsed
JVM-side with ``from_xml`` against an explicit schema — one expression,
whole-stage-codegen'd, no Python in the loop — then fanned out 1→N with
``explode``. Required fields stay nullable in the schema (a malformed
record yields nulls instead of killing the task — at 100 TB a poison
record must never fail a 10^6-row partition) and are split out by
``null_guard``-style filtering downstream if strictness is wanted.

``record_xml`` is the inverse (build the payload from columns) used by the
round-trip driver query + tests: synth XML from a table, parse it back,
and the output must equal the source rows — which makes this operator
oracle-checkable in DuckDB even though DuckDB has no XML reader.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The 9 extracted fields, in the reference's extraction order
# (document.py:33-47). comments/license are the null-guarded optionals;
# identifier/datestamp/title/authors/abstract/categories/submitter are
# required-by-crash in the reference but kept nullable here (see module
# docstring).
RECORD_FIELDS = (
    "identifier",
    "datestamp",
    "title",
    "authors",
    "abstract",
    "categories",
    "comments",
    "license",
    "submitter",
)

# Explicit parse schema: a harvest payload is <harvest><record>…9 fields…
# </record>…</harvest>. Explicit (not schema_of_xml-inferred) so the plan
# is stable regardless of which optional fields the sampled row happened
# to carry.
_RECORD_STRUCT = ", ".join(f"{f}: STRING" for f in RECORD_FIELDS)
HARVEST_SCHEMA = f"STRUCT<record: ARRAY<STRUCT<{_RECORD_STRUCT}>>>"


def xml_escape(col: Column | str) -> Column:
    """Minimal XML text escaping (&, <, > — attribute quotes unused here).
    Order matters: & first, or it re-escapes the entities it just made."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def record_xml(fields: dict[str, Column]) -> Column:
    """One ``<record>…</record>`` element from column values. Fields whose
    column is NULL are OMITTED (not emitted empty) — exactly the shape that
    exercises the reference's conditional extraction (document.py:41-46)."""
    parts = [F.lit("<record>")]
    for name in RECORD_FIELDS:
        if name not in fields:
            continue
        col = fields[name]
        parts.append(
            F.when(col.isNull(), F.lit("")).otherwise(
                F.concat(
                    F.lit(f"<{name}>"), xml_escape(col), F.lit(f"</{name}>")
                )
            )
        )
    parts.append(F.lit("</record>"))
    return F.concat(*parts)


def parse_records(
    df: DataFrame,
    xml_col: str = "payload",
    keep_cols: tuple[str, ...] = (),
    strip_abstract: bool = True,
) -> DataFrame:
    """Parse harvest-payload XML and fan out to one row per <record>.

    Output: ``keep_cols`` + the 9 RECORD_FIELDS + ``content``
    (title + "\\n\\n" + stripped abstract, document.py:37,:48). A payload
    with N records yields N rows; records missing optional elements carry
    NULL there — the null-guarded projection the reference does row-wise
    in Python happens once, declaratively.
    """
    parsed = df.select(
        *keep_cols,
        F.from_xml(F.col(xml_col), F.lit(HARVEST_SCHEMA)).alias("__h"),
    )
    rec = parsed.select(
        *keep_cols, F.explode(F.col("__h.record")).alias("__r")
    )

    def field(f: str) -> Column:
        c = F.col(f"__r.{f}")
        # the reference stores the STRIPPED abstract (document.py:37)
        return F.trim(c) if (f == "abstract" and strip_abstract) else c

    return rec.select(
        *keep_cols,
        *[field(f).alias(f) for f in RECORD_FIELDS],
        F.concat_ws("\n\n", F.col("__r.title"), field("abstract")).alias(
            "content"
        ),
    )


def read_harvest_segments(spark, path: str, keep_file_col: bool = True) -> DataFrame:
    """Raw-WAL angle: read whole XML segment files (one harvest payload per
    file) and return one row per file, ready for :func:`parse_records`.
    ``wholetext`` keeps each payload intact; at scale one file = one task
    input split, so the parse parallelizes per segment."""
    df = spark.read.text(path, wholetext=True).withColumnRenamed("value", "payload")
    if keep_file_col:
        df = df.withColumn("segment", F.input_file_name())
    return df
