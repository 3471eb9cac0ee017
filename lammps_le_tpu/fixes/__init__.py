from .config import NVE, Extrusion, ExLoad, ExUnload, Langevin  # noqa: F401
