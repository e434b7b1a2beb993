"""Ported RegionCoverer tests (/root/reference/s2/RegionCoverer_test.ts)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2js_spark.geometry import cellid_scalar as cs
from s2js_spark.geometry.cap import Cap
from s2js_spark.geometry.cell import Cell
from s2js_spark.geometry.cellunion import CellUnion
from s2js_spark.geometry.metric import AVG_AREA_METRIC
from s2js_spark.geometry.point import Point
from s2js_spark.geometry.regioncoverer import (
    RegionCoverer,
    simple_region_covering,
)

MAX_LEVEL = 30
RNG = np.random.RandomState(42)


def random_point() -> Point:
    return Point.from_coords(
        RNG.uniform(-1, 1), RNG.uniform(-1, 1), RNG.uniform(-1, 1)
    )


def random_cellid_for_level(level: int) -> int:
    face = int(RNG.randint(0, 6))
    pos = int(RNG.randint(0, 1 << 61, dtype=np.int64))
    return cs.from_face_pos_level(face, pos, level)


def random_cellid() -> int:
    return random_cellid_for_level(int(RNG.randint(0, MAX_LEVEL + 1)))


def random_cap(min_area: float, max_area: float) -> Cap:
    cap_area = max_area * math.pow(min_area / max_area, RNG.uniform())
    return Cap.from_center_area(random_point(), cap_area)


def skewed_int(max_log: int) -> int:
    base = int(RNG.randint(0, max_log + 1))
    return int(RNG.randint(0, 1 << 31)) & ((1 << base) - 1)


def test_random_cells():
    # RegionCoverer_test.ts:14-23 (500 iterations instead of 10000)
    rc = RegionCoverer(max_cells=1)
    for _ in range(200):
        cid = random_cellid()
        covering = rc.covering(Cell.from_cellid(cid))
        assert len(covering) == 1
        assert covering[0] == cid


def check_covering(rc: RegionCoverer, region, covering: CellUnion, interior: bool):
    # RegionCoverer_test.ts:25-68
    min_level_cells: dict[int, int] = {}
    temp_cover = CellUnion()
    for ci in covering:
        level = cs.level(ci)
        assert level >= rc.min_level
        assert level <= rc.max_level
        assert (level - rc.min_level) % rc.level_mod == 0
        temp_cover.append(ci)
        parent = cs.parent(ci, rc.min_level)
        min_level_cells[parent] = min_level_cells.get(parent, 0) + 1
    # NOTE: the Go original asserts that when len(covering) > maxCells no
    # two cells share a minLevel ancestor, but the JS reference's port of
    # that check is dead code (`for...in` over a Map iterates nothing,
    # RegionCoverer_test.ts:50-56) and the algorithm can genuinely
    # violate it (budget-exempt sub-minLevel expansion after a deep
    # candidate was already subdivided). We match the JS behavior.
    if interior:
        for ci in covering:
            assert region.contains_cell(Cell.from_cellid(ci))
    else:
        temp_cover.normalize()
        check_covering_tight(region, temp_cover, True, None)


def check_covering_tight(region, cover: CellUnion, check_tight: bool, cid):
    # RegionCoverer_test.ts:70-94 (iterative to avoid deep recursion)
    stack = [cs.from_face(f) for f in range(6)] if cid is None else [cid]
    while stack:
        cid = stack.pop()
        cell = Cell.from_cellid(cid)
        if not region.intersects_cell(cell):
            if check_tight:
                assert not cover.intersects_cellid(cid)
        elif not cover.contains_cellid(cid):
            assert not region.contains_cell(cell)
            assert not cs.is_leaf(cid)
            child = cs.child_begin(cid)
            end = cs.child_end(cid)
            while child != end:
                stack.append(child)
                child = cs.next_cell(child)


def test_random_caps():
    # RegionCoverer_test.ts:96-122 (40 iterations instead of 1000)
    for _ in range(40):
        rc = RegionCoverer(max_cells=1)
        rc.min_level = int(RNG.randint(0, rc.max_level + 1))
        rc.max_level = int(RNG.randint(0, rc.max_level + 1))
        while rc.min_level > rc.max_level:
            rc.min_level = int(RNG.randint(0, rc.max_level + 1))
            rc.max_level = int(RNG.randint(0, rc.max_level + 1))
        rc.level_mod = 1 + int(RNG.randint(0, 3))
        rc.max_cells = skewed_int(10)

        max_area = min(
            4 * math.pi, (3 * rc.max_cells + 1) * AVG_AREA_METRIC.value(rc.min_level)
        )
        r = random_cap(0.1 * AVG_AREA_METRIC.value(MAX_LEVEL), max_area)

        covering = rc.covering(r)
        check_covering(rc, r, covering, False)
        interior = rc.interior_covering(r)
        check_covering(rc, r, interior, True)

        # The same coverer should produce the same covering (determinism).
        covering2 = rc.covering(r)
        assert list(covering) == list(covering2)

        covering.denormalize(rc.min_level, rc.level_mod)
        check_covering(rc, r, covering, False)


def test_interior_covering():
    # RegionCoverer_test.ts:124-140
    LEVEL = 12
    small_cell = cs.parent(
        cs.from_point(*_pt_coords(random_point())), LEVEL + 2
    )
    large_cell = cs.parent(small_cell, LEVEL)
    diff = CellUnion.from_difference(CellUnion([large_cell]), CellUnion([small_cell]))
    coverer = RegionCoverer(min_level=LEVEL, max_level=LEVEL + 3, max_cells=3)
    interior = coverer.interior_covering(diff)
    assert len(interior) == 3
    for i in range(3):
        assert cs.level(interior[i]) == LEVEL + 1


def _pt_coords(p: Point):
    return p.x, p.y, p.z


def test_simple_region_covering():
    # RegionCoverer_test.ts:142-151 (20 iterations)
    for _ in range(8):
        level = int(RNG.randint(0, MAX_LEVEL + 1))
        max_area = min(4 * math.pi, 1000.0 * AVG_AREA_METRIC.value(level))
        c = random_cap(0.1 * AVG_AREA_METRIC.value(MAX_LEVEL), max_area)
        covering = CellUnion(simple_region_covering(c, c.center, level))
        rc = RegionCoverer(min_level=level, max_level=level, max_cells=1 << 60)
        check_covering(rc, c, covering, False)


def test_is_canonical():
    # RegionCoverer_test.ts:153-277
    cases = [
        (["1/"], RegionCoverer(), True),
        (["invalid"], RegionCoverer(), False),
        (["1/1", "1/3"], RegionCoverer(), True),
        (["1/3", "1/1"], RegionCoverer(), False),
        (["1/2", "1/33"], RegionCoverer(), True),
        (["1/3", "1/33"], RegionCoverer(), False),
        (["1/31"], RegionCoverer(min_level=2), True),
        (["1/3"], RegionCoverer(min_level=2), False),
        (["1/31"], RegionCoverer(max_level=2), True),
        (["1/312"], RegionCoverer(max_level=2), False),
        (["1/31"], RegionCoverer(level_mod=2), True),
        (["1/312"], RegionCoverer(level_mod=2), False),
        (["1/1", "1/3"], RegionCoverer(max_cells=2), True),
        (["1/1", "1/3", "2/"], RegionCoverer(max_cells=2), False),
        (["1/123", "2/1", "3/0122"], RegionCoverer(max_cells=2), True),
        (["1/01", "1/02", "1/03", "1/10", "1/11"], RegionCoverer(), True),
        (["1/00", "1/01", "1/02", "1/03", "1/10"], RegionCoverer(), False),
        (["0/22", "1/01", "1/02", "1/03", "1/10"], RegionCoverer(), True),
        (["0/22", "1/00", "1/01", "1/02", "1/03"], RegionCoverer(), False),
        (
            ["1/1101", "1/1102", "1/1103", "1/1110", "1/1111", "1/1112",
             "1/1113", "1/1120", "1/1121", "1/1122", "1/1123", "1/1130",
             "1/1131", "1/1132", "1/1133", "1/1200"],
            RegionCoverer(level_mod=2, max_cells=20),
            True,
        ),
        (
            ["1/1100", "1/1101", "1/1102", "1/1103", "1/1110", "1/1111",
             "1/1112", "1/1113", "1/1120", "1/1121", "1/1122", "1/1123",
             "1/1130", "1/1131", "1/1132", "1/1133"],
            RegionCoverer(level_mod=2, max_cells=20),
            False,
        ),
    ]
    for cells, cov, want in cases:
        cu = CellUnion(cs.from_string(c) for c in cells)
        assert cov.is_canonical(cu) == want, cells
