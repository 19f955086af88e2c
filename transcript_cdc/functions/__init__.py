from transcript_cdc.functions.normalize import normalize_text, normalize_text_sql

__all__ = ["normalize_text", "normalize_text_sql"]
