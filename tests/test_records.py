"""P1 semi-structured record parse (reference document.py:17-68):
multi-record fan-out, null-guarded optionals, XML escaping round-trip,
whole-file segment reads, and poison-record tolerance."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from transcript_cdc.functions.records import (
    RECORD_FIELDS,
    parse_records,
    read_harvest_segments,
    record_xml,
)


def _payload(records: list[dict]) -> str:
    parts = ["<harvest>"]
    for r in records:
        parts.append("<record>")
        for f in RECORD_FIELDS:
            if r.get(f) is not None:
                parts.append(f"<{f}>{r[f]}</{f}>")
        parts.append("</record>")
    parts.append("</harvest>")
    return "".join(parts)


BASE = {
    "identifier": "oai:x:1",
    "datestamp": "2024-05-01",
    "title": "On Graphs",
    "authors": "A. Author",
    "abstract": "  we study graphs.  ",
    "categories": "cs.DM",
    "comments": "12 pages",
    "license": "http://lic/0",
    "submitter": "alice",
}


def test_multi_record_fanout_and_content(spark):
    xml = _payload([BASE, {**BASE, "identifier": "oai:x:2", "title": "Two"}])
    df = spark.createDataFrame([(xml,)], "payload string")
    out = parse_records(df).orderBy("identifier").collect()
    assert [r["identifier"] for r in out] == ["oai:x:1", "oai:x:2"]
    # abstract is stored STRIPPED (document.py:37) and content is
    # title + "\n\n" + stripped abstract (document.py:48)
    assert out[0]["abstract"] == "we study graphs."
    assert out[0]["content"] == "On Graphs\n\nwe study graphs."
    assert out[1]["title"] == "Two"


def test_optional_fields_null_guarded(spark):
    no_opt = {k: v for k, v in BASE.items() if k not in ("comments", "license")}
    xml = _payload([no_opt, BASE])
    df = spark.createDataFrame([(xml,)], "payload string")
    out = parse_records(df).orderBy(F.col("comments").asc_nulls_first()).collect()
    assert out[0]["comments"] is None and out[0]["license"] is None
    assert out[1]["comments"] == "12 pages"
    # required fields still extracted on the partial record
    assert out[0]["identifier"] == "oai:x:1"


def test_record_xml_roundtrip_with_escaping(spark):
    df = spark.createDataFrame(
        [("a&b <tag> x>y", "t&t")], "abstract string, title string"
    )
    payload = df.select(
        F.concat(
            F.lit("<harvest>"),
            record_xml(
                {
                    "identifier": F.lit("i1"),
                    "title": F.col("title"),
                    "abstract": F.col("abstract"),
                }
            ),
            F.lit("</harvest>"),
        ).alias("payload")
    )
    row = parse_records(payload, strip_abstract=False).first()
    assert row["abstract"] == "a&b <tag> x>y"
    assert row["title"] == "t&t"
    assert row["comments"] is None  # omitted element -> NULL


def test_read_harvest_segments_wholetext(spark, tmp_path):
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    for i in range(3):
        recs = [
            {**BASE, "identifier": f"oai:x:{i}-{j}"} for j in range(i + 1)
        ]
        (seg_dir / f"seg{i}.xml").write_text(_payload(recs))
    df = read_harvest_segments(spark, str(seg_dir))
    out = parse_records(df, keep_cols=("segment",))
    assert out.count() == 6  # 1 + 2 + 3 records fanned out
    per_seg = {
        os.path.basename(r["segment"]): r["n"]
        for r in out.groupBy("segment").agg(F.count("*").alias("n")).collect()
    }
    assert per_seg == {"seg0.xml": 1, "seg1.xml": 2, "seg2.xml": 3}


def test_malformed_payload_yields_nulls_not_failure(spark):
    df = spark.createDataFrame(
        [("<harvest><record><identifier>ok", ), ("not xml at all",)],
        "payload string",
    )
    # must not raise: poison records can't be allowed to kill a partition
    rows = df.select(
        F.from_xml(
            "payload",
            F.lit("STRUCT<record: ARRAY<STRUCT<identifier: STRING>>>"),
        ).alias("h")
    ).collect()
    assert len(rows) == 2
