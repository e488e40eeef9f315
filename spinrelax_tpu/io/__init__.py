from . import xvg, fittedct, vectors, experiments, colvar, dx  # noqa: F401
