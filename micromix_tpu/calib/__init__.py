"""Calibration: activation statistics -> per-site precision allocation.

TPU re-design of reorder_indices.py: instead of storing every |x| row and
post-processing (get_act_stats, reorder_indices.py:35-131), statistics are
folded into running accumulators inside one jitted tap-instrumented forward,
so calibration streams at full device speed with O(K) memory per site.
"""

from .stats import SiteStats, collect_calibration, init_stats
from .allocate import allocate_site, stats_to_calibration
from .smooth import smooth_params
from .artifacts import load_calibration, save_calibration

__all__ = [
    "SiteStats", "init_stats", "collect_calibration",
    "allocate_site", "stats_to_calibration",
    "smooth_params", "save_calibration", "load_calibration",
]
