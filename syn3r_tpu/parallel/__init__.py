from .mesh import make_mesh, replicated, sharded  # noqa: F401
