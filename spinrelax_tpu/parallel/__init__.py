from . import mesh, pipeline  # noqa: F401
