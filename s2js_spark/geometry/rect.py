"""Latitude-longitude rectangle region.

Semantics of /root/reference/s2/Rect.ts including the exact
intersectsCell test with curved latitude edges.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .interval import R1Interval, S1Interval
from .latlng import LatLng
from .point import Point
from .edge_crossings import CROSS, crossing_sign

PI = math.pi
VALID_RECT_LAT_RANGE = R1Interval(-PI / 2, PI / 2)


@dataclass
class Rect:
    lat: R1Interval
    lng: S1Interval

    @staticmethod
    def empty() -> "Rect":
        return Rect(R1Interval.empty(), S1Interval.empty())

    @staticmethod
    def full() -> "Rect":
        return Rect(VALID_RECT_LAT_RANGE, S1Interval.full())

    @staticmethod
    def from_latlng(p: LatLng) -> "Rect":
        return Rect(R1Interval(p.lat, p.lat), S1Interval(p.lng, p.lng))

    @staticmethod
    def from_center_size(center: LatLng, size: LatLng) -> "Rect":
        half = LatLng(size.lat / 2, size.lng / 2)
        return Rect.from_latlng(center).expanded(half)

    def equals(self, o: "Rect") -> bool:
        return self.lat.equals(o.lat) and self.lng.equals(o.lng)

    def is_valid(self) -> bool:
        return (
            abs(self.lat.lo) <= PI / 2
            and abs(self.lat.hi) <= PI / 2
            and self.lng.is_valid()
            and self.lat.is_empty() == self.lng.is_empty()
        )

    def is_empty(self) -> bool:
        return self.lat.is_empty()

    def is_full(self) -> bool:
        return self.lat.equals(VALID_RECT_LAT_RANGE) and self.lng.is_full()

    def is_point(self) -> bool:
        return self.lat.lo == self.lat.hi and self.lng.lo == self.lng.hi

    def vertex(self, i: int) -> LatLng:
        if i == 0:
            return LatLng(self.lat.lo, self.lng.lo)
        if i == 1:
            return LatLng(self.lat.lo, self.lng.hi)
        if i == 2:
            return LatLng(self.lat.hi, self.lng.hi)
        return LatLng(self.lat.hi, self.lng.lo)

    def lo(self) -> LatLng:
        return LatLng(self.lat.lo, self.lng.lo)

    def hi(self) -> LatLng:
        return LatLng(self.lat.hi, self.lng.hi)

    def center(self) -> LatLng:
        return LatLng(self.lat.center(), self.lng.center())

    def size(self) -> LatLng:
        return LatLng(self.lat.length(), self.lng.length())

    def area(self) -> float:
        if self.is_empty():
            return 0.0
        cap_diff = abs(math.sin(self.lat.hi) - math.sin(self.lat.lo))
        return self.lng.length() * cap_diff

    def add_point(self, ll: LatLng) -> "Rect":
        if not ll.is_valid():
            return self
        return Rect(self.lat.add_point(ll.lat), self.lng.add_point(ll.lng))

    def expanded(self, margin: LatLng) -> "Rect":
        lat = self.lat.expanded(margin.lat)
        lng = self.lng.expanded(margin.lng)
        if lat.is_empty() or lng.is_empty():
            return Rect.empty()
        return Rect(lat.intersection(VALID_RECT_LAT_RANGE), lng)

    def polar_closure(self) -> "Rect":
        if self.lat.lo == -PI / 2 or self.lat.hi == PI / 2:
            return Rect(self.lat, S1Interval.full())
        return self

    def union(self, other: "Rect") -> "Rect":
        return Rect(self.lat.union(other.lat), self.lng.union(other.lng))

    def intersection(self, other: "Rect") -> "Rect":
        lat = self.lat.intersection(other.lat)
        lng = self.lng.intersection(other.lng)
        if lat.is_empty() or lng.is_empty():
            return Rect.empty()
        return Rect(lat, lng)

    def intersects(self, other: "Rect") -> bool:
        return self.lat.intersects(other.lat) and self.lng.intersects(other.lng)

    def contains(self, other: "Rect") -> bool:
        return self.lat.contains_interval(other.lat) and self.lng.contains_interval(other.lng)

    def contains_latlng(self, ll: LatLng) -> bool:
        if not ll.is_valid():
            return False
        return self.lat.contains(ll.lat) and self.lng.contains(ll.lng)

    def contains_point(self, p: Point) -> bool:
        return self.contains_latlng(LatLng.from_point(p))

    def approx_equal(self, other: "Rect") -> bool:
        return self.lat.approx_equal(other.lat) and self.lng.approx_equal(other.lng)

    def rect_bound(self) -> "Rect":
        return self

    def cap_bound(self):
        """Bounding cap (Rect.ts:241-261)."""
        from .cap import Cap

        if self.is_empty():
            return Cap.empty()

        if self.lat.hi + self.lat.lo < 0:
            pole_z, pole_angle = -1.0, PI / 2 + self.lat.hi
        else:
            pole_z, pole_angle = 1.0, PI / 2 - self.lat.lo
        pole_cap = Cap.from_center_angle(Point(0, 0, pole_z), pole_angle)

        if (
            math.remainder(self.lng.hi - self.lng.lo, 2 * PI) >= 0
            and self.lng.hi - self.lng.lo < 2 * PI
        ):
            mid_cap = (
                Cap.from_point(self.center().to_point())
                .add_point(self.lo().to_point())
                .add_point(self.hi().to_point())
            )
            if mid_cap.height() < pole_cap.height():
                return mid_cap
        return pole_cap

    def cell_union_bound(self) -> list[int]:
        return self.cap_bound().cell_union_bound()

    def contains_cell(self, c) -> bool:
        return self.contains(c.rect_bound())

    def intersects_cell(self, c) -> bool:
        """Exact rect/cell intersection incl. curved lat edges
        (Rect.ts:399-447)."""
        from ..geometry import cellid_scalar as cs

        if self.is_empty():
            return False
        if self.contains_point(Point(*cs.raw_point(c.id))):
            return True
        if c.contains_point(self.center().to_point()):
            return True
        if not self.intersects(c.rect_bound()):
            return False

        vertices: list[Point] = []
        latlngs: list[LatLng] = []
        for i in range(4):
            v = c.vertex(i)
            vertices.append(v)
            ll = LatLng.from_point(v)
            latlngs.append(ll)
            if self.contains_latlng(ll):
                return True
            if c.contains_point(self.vertex(i).to_point()):
                return True

        for i in range(4):
            edge_lng = S1Interval.from_endpoints(latlngs[i].lng, latlngs[(i + 1) & 3].lng)
            if not self.lng.intersects(edge_lng):
                continue
            a = vertices[i]
            b = vertices[(i + 1) & 3]
            if edge_lng.contains(self.lng.lo) and intersects_lng_edge(a, b, self.lat, self.lng.lo):
                return True
            if edge_lng.contains(self.lng.hi) and intersects_lng_edge(a, b, self.lat, self.lng.hi):
                return True
            if intersects_lat_edge(a, b, self.lat.lo, self.lng):
                return True
            if intersects_lat_edge(a, b, self.lat.hi, self.lng):
                return True
        return False

    def centroid(self) -> Point:
        """Area-scaled centroid (Rect.ts:340-394)."""
        if self.is_empty():
            return Point(0.0, 0.0, 0.0)
        z1 = math.sin(self.lat.lo)
        z2 = math.sin(self.lat.hi)
        r1 = math.cos(self.lat.lo)
        r2 = math.cos(self.lat.hi)
        alpha = 0.5 * self.lng.length()
        r0 = math.sin(alpha) * (r2 * z2 - r1 * z1 + self.lat.length())
        lng = self.lng.center()
        z = alpha * (z2 + z1) * (z2 - z1)
        return Point(r0 * math.cos(lng), r0 * math.sin(lng), z)


def intersects_lat_edge(a: Point, b: Point, lat: float, lng: S1Interval) -> bool:
    """Edge AB vs constant-latitude curve (Rect.ts:454-506)."""
    z = a.cross(b).normalize()
    if z.z < 0:
        z = z.mul(-1)
    y = z.cross(Point.from_coords(0, 0, 1)).normalize()
    x = y.cross(z)

    sin_lat = math.sin(lat)
    if abs(sin_lat) >= x.z:
        return False

    cos_theta = sin_lat / x.z
    sin_theta = math.sqrt(1 - cos_theta * cos_theta)
    theta = math.atan2(sin_theta, cos_theta)

    ab_theta = S1Interval.from_point_pair(
        math.atan2(a.dot(y), a.dot(x)),
        math.atan2(b.dot(y), b.dot(x)),
    )

    if ab_theta.contains(theta):
        isect = x.mul(cos_theta).add(y.mul(sin_theta))
        if lng.contains(math.atan2(isect.y, isect.x)):
            return True
    if ab_theta.contains(-theta):
        isect = x.mul(cos_theta).sub(y.mul(sin_theta))
        if lng.contains(math.atan2(isect.y, isect.x)):
            return True
    return False


def intersects_lng_edge(a: Point, b: Point, lat: R1Interval, lng: float) -> bool:
    """Edge AB vs constant-longitude geodesic (Rect.ts:512-517)."""
    return (
        crossing_sign(
            a,
            b,
            LatLng(lat.lo, lng).to_point(),
            LatLng(lat.hi, lng).to_point(),
        )
        == CROSS
    )
