from .stats import (
    CSV_HEADER,
    BenchTimes,
    bytes_moved,
    chip_peak_gbs,
    flops,
    print_statistics,
    roofline_fraction,
)
from .timer import WallTimer, time_chained, time_fn
from .verify import VerifyReport, tolerances_for, verify, verify_y

__all__ = [
    "CSV_HEADER",
    "BenchTimes",
    "bytes_moved",
    "chip_peak_gbs",
    "flops",
    "print_statistics",
    "roofline_fraction",
    "WallTimer",
    "time_fn",
    "time_chained",
    "VerifyReport",
    "tolerances_for",
    "verify",
    "verify_y",
]
