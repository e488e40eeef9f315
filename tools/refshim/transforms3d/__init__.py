"""Minimal stand-in for the pip package ``transforms3d`` (a dependency of
the reference), providing just the quaternion routines the reference
scripts call.  Used only to run the reference for golden-output
generation; standard textbook formulas, our own code."""

from . import quaternions  # noqa: F401
