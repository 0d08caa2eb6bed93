from .core import (
    Curve,
    average_curves,
    build_curve_set,
    convolve_cdfs,
    curve_set_interpolate,
    make_curve,
    recurse_markers,
    simplify,
    transfer_probability,
    walk_time_curve,
)

__all__ = [
    "Curve",
    "average_curves",
    "build_curve_set",
    "convolve_cdfs",
    "curve_set_interpolate",
    "make_curve",
    "recurse_markers",
    "simplify",
    "transfer_probability",
    "walk_time_curve",
]
