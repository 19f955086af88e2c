from transcript_cdc.operators.dedup import lww_dedup, union_dedup
from transcript_cdc.operators.merge import merge_apply, merge_apply_versioned
from transcript_cdc.operators.sessionize import session_summary, sessionize
from transcript_cdc.operators.skew import heavy_hitter_probe, salted_repartition

__all__ = [
    "lww_dedup",
    "union_dedup",
    "merge_apply",
    "merge_apply_versioned",
    "sessionize",
    "session_summary",
    "heavy_hitter_probe",
    "salted_repartition",
]
