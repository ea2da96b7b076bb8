"""Reusable distributed operators.

Library-grade building blocks the query registry composes; each is a pure
DataFrame → DataFrame function designed for the 100 TB execution model
(partial aggregation, broadcast thresholds, no per-group concentration of
full columns).
"""

from .bounded import bounded_window
from .rank import distributed_ntile, group_quantile_tail, topk_per_group

__all__ = ["distributed_ntile", "group_quantile_tail", "topk_per_group"]
