from . import dedup, enrich, geofence, iqr, kmeans, similarity, text, window_stats

__all__ = [
    "dedup",
    "enrich",
    "geofence",
    "iqr",
    "kmeans",
    "similarity",
    "text",
    "window_stats",
]
