from . import dedup, multimodal, relational, similarity

__all__ = ["dedup", "multimodal", "relational", "similarity"]
