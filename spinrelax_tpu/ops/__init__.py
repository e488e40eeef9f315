from . import jomega, relaxation, autocorr  # noqa: F401
