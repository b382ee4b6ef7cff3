from . import (  # noqa: F401
    build,
    cluster,
    dedup,
    joins,
    knn,
    multimodal,
    similarity,
    ssimverify,
    text,
    tiles,
    windows,
)
