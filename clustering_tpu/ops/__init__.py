from . import density, neighbors, screening, engine, pruning  # noqa: F401
from .density import populations, free_energies  # noqa: F401
from .neighbors import nearest_neighbors  # noqa: F401
from .screening import screening_labels  # noqa: F401
