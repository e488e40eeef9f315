from . import lm, expfit  # noqa: F401
