"""S2 cell metrics (quadratic projection).

Port of /root/reference/s2/Metric.ts and Metric_constants.ts. Used to
pick covering/join levels for a target geometric size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

MAX_LEVEL = 30


def _ilogb(x: float) -> float:
    if x != x:
        return math.nan
    if x == 0:
        return -math.inf
    if math.isinf(x):
        return math.inf
    x = abs(x)
    if x < 2.2250738585072014e-308:  # denormals (r1/math.ts:89)
        return -1074
    return math.floor(math.log2(x))


@dataclass(frozen=True)
class Metric:
    dim: int
    deriv: float

    def value(self, level: int) -> float:
        return math.ldexp(self.deriv, -self.dim * level)

    def min_level(self, val: float) -> int:
        """Minimum level where the metric is <= val (Metric.ts:48-54).

        The <=0 guard is the reference's deliberate deviation from Go.
        """
        if val <= 0:
            return MAX_LEVEL
        level = -(int(_ilogb(val / self.deriv)) >> (self.dim - 1))
        return max(0, min(MAX_LEVEL, level))

    def max_level(self, val: float) -> int:
        if val <= 0:
            return MAX_LEVEL
        level = int(_ilogb(self.deriv / val)) >> (self.dim - 1)
        return max(0, min(MAX_LEVEL, level))

    def closest_level(self, val: float) -> int:
        x = 2.0 if self.dim == 2 else math.sqrt(2)
        return self.min_level(x * val)


SQRT2 = math.sqrt(2)

MIN_ANGLE_SPAN_METRIC = Metric(1, 4.0 / 3)
AVG_ANGLE_SPAN_METRIC = Metric(1, math.pi / 2)
MAX_ANGLE_SPAN_METRIC = Metric(1, 1.704897179199218452)

MIN_WIDTH_METRIC = Metric(1, (2 * SQRT2) / 3)
AVG_WIDTH_METRIC = Metric(1, 1.434523672886099389)
MAX_WIDTH_METRIC = Metric(1, MAX_ANGLE_SPAN_METRIC.deriv)

MIN_EDGE_METRIC = Metric(1, (2 * SQRT2) / 3)
AVG_EDGE_METRIC = Metric(1, 1.459213746386106062)
MAX_EDGE_METRIC = Metric(1, MAX_ANGLE_SPAN_METRIC.deriv)

MAX_EDGE_ASPECT = 1.44261527445268292

MIN_AREA_METRIC = Metric(2, (8 * SQRT2) / 9)
AVG_AREA_METRIC = Metric(2, (4 * math.pi) / 6)
MAX_AREA_METRIC = Metric(2, 2.635799256963161491)

MIN_DIAG_METRIC = Metric(1, (8 * SQRT2) / 9)
AVG_DIAG_METRIC = Metric(1, 2.060422738998471683)
MAX_DIAG_METRIC = Metric(1, 2.438654594434021032)

MAX_DIAG_ASPECT = math.sqrt(3)
