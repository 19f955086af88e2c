from transcript_cdc.operators.dedup import lww_dedup, union_dedup
from transcript_cdc.operators.merge import merge_apply
from transcript_cdc.operators.skew import heavy_hitter_probe, salted_repartition

__all__ = [
    "lww_dedup",
    "union_dedup",
    "merge_apply",
    "heavy_hitter_probe",
    "salted_repartition",
]
