from .pressure import make_pressure_fn  # noqa: F401
from .contact_map import contact_map_accumulate, make_contact_fn  # noqa: F401
from .profile import profile  # noqa: F401
from .rdf import make_rdf_fn, normalize_rdf  # noqa: F401
