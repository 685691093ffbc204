from .diagnose import shuffle_census, skew_report
from .session import get_spark

__all__ = ["get_spark", "shuffle_census", "skew_report"]
