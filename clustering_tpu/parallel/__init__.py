from .mesh import make_mesh, mesh_size, FRAME_AXIS  # noqa: F401
from . import sharded  # noqa: F401
