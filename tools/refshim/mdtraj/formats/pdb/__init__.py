from . import pdbstructure  # noqa: F401
