from . import build, joins, knn, tiles  # noqa: F401
