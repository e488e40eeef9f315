from . import corrections, stages  # noqa: F401
