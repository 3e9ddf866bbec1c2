from . import dbscan, gsdmm, knn  # noqa: F401
