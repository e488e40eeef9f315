"""numpy-2 compatibility shim for the reference's general_scripts.

The reference's print_xy does ``if dy==[]`` which raises ValueError when
dy is a numpy array under numpy>=1.25 (elementwise comparison against a
list).  This shim loads the real module from /root/reference and replaces
only the printers with array-safe equivalents of the same output format,
so reference scripts can run for golden-data generation.
"""

import importlib.util
import os
import sys

import numpy as _np

# numpy>=1.24 removed the `normed=` kwarg the reference still passes to
# histogramdd (calculate-Ct-from-traj.py:618, calculate-dq-distribution.py:634).
# Patch a tolerant wrapper in before any reference module runs.
_orig_histogramdd = _np.histogramdd


def _histogramdd_compat(sample, *args, **kwargs):
    if "normed" in kwargs:
        normed = kwargs.pop("normed")
        if normed:
            kwargs["density"] = True
    return _orig_histogramdd(sample, *args, **kwargs)


_np.histogramdd = _histogramdd_compat

# numpy>=1.24 also refuses implicit ragged object arrays; the reference
# saves histogram `edges` (a tuple of different-length arrays) straight
# into savez_compressed (calculate-Ct-from-traj.py:629).  Convert such
# ragged sequences into explicit object arrays.
_orig_savez_compressed = _np.savez_compressed


def _savez_compat(file, *args, **kwargs):
    fixed = {}
    for k, v in kwargs.items():
        if isinstance(v, (tuple, list)):
            try:
                v = _np.asarray(v)
            except ValueError:
                arr = _np.empty(len(v), dtype=object)
                for i, item in enumerate(v):
                    arr[i] = item
                v = arr
        fixed[k] = v
    return _orig_savez_compressed(file, *args, **fixed)


_np.savez_compressed = _savez_compat

_REF = "/root/reference"
_spec = importlib.util.spec_from_file_location(
    "_ref_general_scripts", os.path.join(_REF, "general_scripts.py")
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

# Re-export everything from the real module.
globals().update({k: v for k, v in vars(_mod).items() if not k.startswith("__")})


def _is_empty(dy):
    if dy is None:
        return True
    try:
        return len(dy) == 0
    except TypeError:
        return False


def print_xy(fn, x, y, dy=[], header=""):
    fp = open(fn, "w")
    if header != "":
        print(header, file=fp)
    if _is_empty(dy):
        for i in range(len(x)):
            print(x[i], y[i], file=fp)
    else:
        for i in range(len(x)):
            print(x[i], y[i], dy[i], file=fp)
    fp.close()


def print_xydy(fn, x, y, dy, header=""):
    print_xy(fn, x, y, dy, header)
