from . import quaternion, geometry, stats  # noqa: F401
