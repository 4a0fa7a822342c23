from .extract import extract_spans, span_stats, salted_repartition

__all__ = ["extract_spans", "span_stats", "salted_repartition"]
