from . import pdb  # noqa: F401
