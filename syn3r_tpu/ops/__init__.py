from . import grid_sample, warp  # noqa: F401
