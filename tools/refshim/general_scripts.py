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
