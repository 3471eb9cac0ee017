from .config import (  # noqa: F401
    NVE,
    Extrusion,
    ExLoad,
    ExUnload,
    Langevin,
    NVELimit,
)
