from . import se3, camera, image  # noqa: F401
