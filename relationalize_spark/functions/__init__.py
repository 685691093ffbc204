from .vectors import as_double, cosine, dot, l2_distance, norm

__all__ = ["as_double", "cosine", "dot", "l2_distance", "norm"]
