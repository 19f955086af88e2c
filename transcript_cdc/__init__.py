"""transcript_cdc — a from-scratch PySpark-native CDC / incremental-ingest engine.

Tails a binlog/WAL-style change feed of conversation-transcript mutations keyed on
(conv_id, turn_idx) and applies them as idempotent MERGE-style upserts into an
Iceberg-style lake table (hermetic Parquet-snapshot backend), with LSN-ordered
last-writer-wins dedup, salted shuffle for hot-key skew, additive schema evolution,
an exactly-once checkpointed sink with per-partition commit manifests, and
Arrow-vectorized text normalization.

Capability parity target: SWM-Thlee/linked-paper-search (see /root/repo/SURVEY.md).
Architecture is DataFrame/Catalyst-native — NOT a translation of the reference's
AWS execution fabric.
"""

__version__ = "0.1.0"
