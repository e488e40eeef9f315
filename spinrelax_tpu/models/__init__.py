from .ctmodel import CtModelSet  # noqa: F401
from .diffusion import Diffusion  # noqa: F401
