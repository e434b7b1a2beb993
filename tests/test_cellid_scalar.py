"""Ported wrapping/advance/neighbor tests for the scalar CellID module.

Vectors from /root/reference/s2/cellid_test.ts:197-228,419-591.
"""

from __future__ import annotations

import numpy as np

from s2js_spark.geometry import cellid_scalar as cs

MAX_LEVEL = cs.MAX_LEVEL


def test_wrapping():
    # cellid_test.ts:460-543
    cid = cs.from_face_pos_level(3, 0x12345678, MAX_LEVEL - 4)
    f0 = cs.from_face(0)
    f1 = cs.from_face(1)
    f4 = cs.from_face(4)
    f5 = cs.from_face(5)

    assert cs.prev_wrap(cs.child_begin_at_level(f0, 0)) == cs.prev(cs.child_end_at_level(f5, 0)) if hasattr(cs, "prev") else True
    assert cs.prev_wrap(cs.child_begin_at_level(f0, 0)) == cs.prev_cell(cs.child_end_at_level(f5, 0))
    assert cs.prev_wrap(cs.child_begin_at_level(f0, MAX_LEVEL)) == cs.from_face_pos_level(
        5, cs.SENTINEL >> cs.FACE_BITS, MAX_LEVEL
    )
    assert cs.advance_wrap(cs.child_begin_at_level(f0, MAX_LEVEL), -1) == cs.from_face_pos_level(
        5, cs.SENTINEL >> cs.FACE_BITS, MAX_LEVEL
    )
    assert cs.advance_wrap(cs.child_begin_at_level(f0, MAX_LEVEL), -1) == cs.prev_wrap(
        cs.child_begin_at_level(f0, MAX_LEVEL)
    )
    assert cs.next_wrap(cs.prev_cell(cs.child_end_at_level(f5, 4))) == cs.child_begin_at_level(f0, 4)
    assert cs.advance_wrap(cs.advance(cs.child_end_at_level(f5, 4), -1), 1) == cs.child_begin_at_level(f0, 4)
    assert cs.next_wrap(cs.prev_cell(cs.child_end_at_level(f5, MAX_LEVEL))) == cs.from_face_pos_level(0, 0, MAX_LEVEL)
    assert cs.advance_wrap(cs.advance(cs.child_end_at_level(f5, MAX_LEVEL), -1), 1) == cs.from_face_pos_level(
        0, 0, MAX_LEVEL
    )
    assert cs.advance_wrap(cs.child_begin_at_level(f0, 0), 7) == f1
    assert cs.advance_wrap(cs.child_begin_at_level(f0, 0), 12) == cs.child_begin_at_level(f0, 0)
    assert cs.advance_wrap(f5, -7) == f4
    assert cs.advance_wrap(cs.child_begin_at_level(f0, 0), -12000000) == cs.child_begin_at_level(f0, 0)
    assert cs.advance_wrap(cs.child_begin_at_level(f0, 5), 6644) == cs.advance_wrap(
        cs.child_begin_at_level(f0, 5), -11788
    )
    assert cs.advance_wrap(cs.child_begin_at_level(cid, MAX_LEVEL), 256) == cs.child_begin_at_level(
        cs.next_cell(cid), MAX_LEVEL
    )
    assert cs.advance_wrap(cs.from_face_pos_level(5, 0, MAX_LEVEL), 2 << (2 * MAX_LEVEL)) == cs.from_face_pos_level(
        1, 0, MAX_LEVEL
    )


def test_advance():
    # cellid_test.ts:545-591
    cid = cs.from_face_pos_level(3, 0x12345678, MAX_LEVEL - 4)
    f0 = cs.from_face(0)
    f1 = cs.from_face(1)
    f5 = cs.from_face(5)
    assert cs.advance(cs.child_begin_at_level(f0, 0), 7) == cs.child_end_at_level(f5, 0)
    assert cs.advance(cs.child_begin_at_level(f0, 0), 12) == cs.child_end_at_level(f5, 0)
    assert cs.advance(cs.child_end_at_level(f5, 0), -7) == cs.child_begin_at_level(f0, 0)
    assert cs.advance(cs.child_end_at_level(f5, 0), -12000000) == cs.child_begin_at_level(f0, 0)
    assert cs.advance(cs.child_begin_at_level(f0, 5), 500) == cs.advance(
        cs.child_end_at_level(f5, 5), 500 - (6 << (2 * 5))
    )
    assert cs.advance(cs.child_begin_at_level(cid, MAX_LEVEL), 256) == cs.child_begin_at_level(
        cs.next_cell(cid), MAX_LEVEL
    )
    assert cs.advance(cs.child_begin_at_level(f1, MAX_LEVEL), 4 << (2 * MAX_LEVEL)) == cs.child_begin_at_level(
        f5, MAX_LEVEL
    )

    # distanceFromBegin round-trip (cellid_test.ts:450-457)
    got = cs.advance(cs.child_begin_at_level(cs.from_face(0), cs.level(cid)), cs.distance_from_begin(cid))
    assert got == cid


def _random_cellid(rng) -> int:
    f = int(rng.randint(0, 6))
    lvl = int(rng.randint(0, MAX_LEVEL + 1))
    p = int(rng.randint(0, 1 << 61, dtype=np.int64))
    return cs.from_face_pos_level(f, p, lvl)


def test_all_neighbors_consistency():
    # cellid_test.ts:197-228 (100 random cells instead of 1000 for speed)
    rng = np.random.RandomState(7)
    for _ in range(100):
        cid = _random_cellid(rng)
        if cs.is_leaf(cid):
            cid = cs.immediate_parent(cid)
        max_diff = min(6, MAX_LEVEL - cs.level(cid) - 1)
        lvl = cs.level(cid) + int(rng.randint(0, max_diff + 1))

        want: set[int] = set()
        allnb = set(cs.all_neighbors(cid, lvl))
        c = cs.child_begin_at_level(cid, lvl + 1)
        end = cs.child_end_at_level(cid, lvl + 1)
        while c != end:
            allnb.add(cs.immediate_parent(c))
            want.update(cs.vertex_neighbors(c, lvl))
            c = cs.next_cell(c)
        assert sorted(allnb) == sorted(want)


def test_max_tile():
    # tiling of a leaf range reproduces the range exactly
    rng = np.random.RandomState(11)
    for _ in range(20):
        a = cs.range_min(_random_cellid(rng))
        b = cs.range_min(_random_cellid(rng))
        if a > b:
            a, b = b, a
        if a == b:
            continue
        covered = 0
        cid = cs.max_tile(a, b)
        prev_max = a - 2
        while cid != b:
            # tiles must be contiguous and inside [a, b)
            assert cs.range_min(cid) == prev_max + 2
            prev_max = cs.range_max(cid)
            covered += cs.range_max(cid) - cs.range_min(cid) + 2
            cid = cs.max_tile(cs.next_cell(cid), b)
        assert covered == b - a
