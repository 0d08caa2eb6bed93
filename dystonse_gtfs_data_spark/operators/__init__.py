from . import asof, dedup, gapfill, similarity

__all__ = ["asof", "dedup", "gapfill", "similarity"]
