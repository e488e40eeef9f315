"""Stand-in for the reference's compiled numpy ufunc ``npufunc.Jomega``
(built from /root/reference/Jomega/Jomega.c), used ONLY to *run* the
reference implementation for golden-output generation.  Implements
Jomega(x, y) = x / (x^2 + y^2) with ufunc-style ``outer`` semantics in
float64 numpy.  This is our own code, not a copy.
"""

import numpy as np

_core = np.frompyfunc(lambda x, y: x / (x * x + y * y), 2, 1)


class _Jomega:
    @staticmethod
    def __call__(x, y):
        return np.asarray(_core(x, y), dtype=np.float64)

    @staticmethod
    def outer(x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        xe = x.reshape(x.shape + (1,) * y.ndim)
        return xe / (xe**2 + y**2)


Jomega = _Jomega()
