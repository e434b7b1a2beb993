"""RegionCoverer: approximate a region by at most maxCells cells.

Semantics of /root/reference/s2/RegionCoverer.ts including the exact
priority formula (line 312) and the stable-sorted-array priority queue
(lines 596-628: push appends then stable-sorts ascending; pop takes the
last element, so ties break LIFO among equal priorities). Reproducing
that tie-break is required for bit-identical coverings.
"""

from __future__ import annotations

from . import cellid_scalar as cs
from .cell import Cell
from .cellunion import CellUnion
from .point import Point

MAX_LEVEL = 30


class Candidate:
    __slots__ = ("cell", "terminal", "num_children", "children", "priority")

    def __init__(self, cell: Cell):
        self.cell = cell
        self.terminal = False
        self.num_children = 0
        self.children: list[Candidate] = []
        self.priority = 0


class RegionCoverer:
    def __init__(
        self,
        min_level: int = 0,
        max_level: int = MAX_LEVEL,
        level_mod: int = 1,
        max_cells: int = 8,
    ):
        self.min_level = min_level
        self.max_level = max_level
        self.level_mod = level_mod
        self.max_cells = max_cells

    def _coverer(self) -> "_Coverer":
        return _Coverer(
            max(0, min(MAX_LEVEL, self.min_level)),
            max(0, min(MAX_LEVEL, self.max_level)),
            max(1, min(3, self.level_mod)),
            self.max_cells,
        )

    def covering(self, region) -> CellUnion:
        cu = self.cell_union(region)
        cu.denormalize(
            max(0, min(MAX_LEVEL, self.min_level)), max(1, min(3, self.level_mod))
        )
        return cu

    def interior_covering(self, region) -> CellUnion:
        cu = self.interior_cell_union(region)
        cu.denormalize(
            max(0, min(MAX_LEVEL, self.min_level)), max(1, min(3, self.level_mod))
        )
        return cu

    def cell_union(self, region) -> CellUnion:
        c = self._coverer()
        c.covering_internal(region)
        cu = c.result
        cu.normalize()
        return cu

    def interior_cell_union(self, region) -> CellUnion:
        c = self._coverer()
        c.interior_covering = True
        c.covering_internal(region)
        cu = c.result
        cu.normalize()
        return cu

    def fast_covering(self, region) -> CellUnion:
        c = self._coverer()
        cu = CellUnion(region.cell_union_bound())
        c.normalize_covering(cu)
        return cu

    def is_canonical(self, covering: CellUnion) -> bool:
        return self._coverer().is_canonical(covering)


class _Coverer:
    def __init__(self, min_level: int, max_level: int, level_mod: int, max_cells: int):
        self.min_level = min_level
        self.max_level = max_level
        self.level_mod = level_mod
        self.max_cells = max_cells
        self.region = None
        self.result = CellUnion()
        self.pq: list[Candidate] = []
        self.interior_covering = False

    # --------------------------------------------------------------- queue

    def _pq_push(self, cand: Candidate) -> None:
        # Stable sort after append == reference PriorityQueue.push
        # (RegionCoverer.ts:610-614); pop() takes the max (last).
        self.pq.append(cand)
        self.pq.sort(key=lambda c: c.priority)

    def _pq_pop(self) -> Candidate:
        return self.pq.pop()

    # ----------------------------------------------------------- candidates

    def new_candidate(self, cell: Cell) -> Candidate | None:
        """(RegionCoverer.ts:237-248)."""
        if not self.region.intersects_cell(cell):
            return None
        cand = Candidate(cell)
        level = cell.level
        if level >= self.min_level:
            if self.interior_covering:
                if self.region.contains_cell(cell):
                    cand.terminal = True
                elif level + self.level_mod > self.max_level:
                    return None
            elif level + self.level_mod > self.max_level or self.region.contains_cell(cell):
                cand.terminal = True
        return cand

    def expand_children(self, cand: Candidate, cell: Cell, num_levels: int) -> int:
        """(RegionCoverer.ts:254-274)."""
        num_levels -= 1
        num_terminals = 0
        last = cs.child_end(cell.id)
        ci = cs.child_begin(cell.id)
        while ci != last:
            child_cell = Cell.from_cellid(ci)
            if num_levels > 0:
                if self.region.intersects_cell(child_cell):
                    num_terminals += self.expand_children(cand, child_cell, num_levels)
                ci = cs.next_cell(ci)
                continue
            child = self.new_candidate(child_cell)
            if child is not None:
                cand.children.append(child)
                cand.num_children += 1
                if child.terminal:
                    num_terminals += 1
            ci = cs.next_cell(ci)
        return num_terminals

    def add_candidate(self, cand: Candidate | None) -> None:
        """(RegionCoverer.ts:281-315)."""
        if cand is None:
            return
        if cand.terminal:
            self.result.append(cand.cell.id)
            return

        num_levels = self.level_mod
        level = cand.cell.level
        if level < self.min_level:
            num_levels = 1
        num_terminals = self.expand_children(cand, cand.cell, num_levels)
        max_children_shift = 2 * self.level_mod
        if cand.num_children == 0:
            return
        if (
            not self.interior_covering
            and num_terminals == 1 << max_children_shift
            and level >= self.min_level
        ):
            cand.terminal = True
            self.add_candidate(cand)
        else:
            # Exact reference priority formula (RegionCoverer.ts:312).
            cand.priority = -(
                ((level << max_children_shift) + cand.num_children)
                << (max_children_shift + num_terminals)
            )
            self._pq_push(cand)

    def adjust_level(self, level: int) -> int:
        if self.level_mod > 1 and level > self.min_level:
            level -= (level - self.min_level) % self.level_mod
        return level

    def adjust_cell_levels(self, cells: CellUnion) -> None:
        """(RegionCoverer.ts:332-346)."""
        if self.level_mod == 1:
            return
        out = 0
        for ci in list(cells):
            level = cs.level(ci)
            new_level = self.adjust_level(level)
            if new_level != level:
                ci = cs.parent(ci, new_level)
            if out > 0 and cs.contains(cells[out - 1], ci):
                continue
            while out > 0 and cs.contains(ci, cells[out - 1]):
                out -= 1
            cells[out] = ci
            out += 1
        del cells[out:]

    def initial_candidates(self, region) -> None:
        """(RegionCoverer.ts:349-358)."""
        temp = RegionCoverer()
        temp.max_level = self.max_level
        temp.level_mod = 1
        temp.max_cells = min(4, self.max_cells)
        cells = temp.fast_covering(region)
        self.adjust_cell_levels(cells)
        for ci in cells:
            self.add_candidate(self.new_candidate(Cell.from_cellid(ci)))

    def covering_internal(self, region) -> None:
        """Best-first subdivision (RegionCoverer.ts:376-417)."""
        self.region = region
        self.initial_candidates(region)
        while self.pq and (not self.interior_covering or len(self.result) < self.max_cells):
            cand = self._pq_pop()
            if (
                self.interior_covering
                or cand.cell.level < self.min_level
                or cand.num_children == 1
                or len(self.result) + len(self.pq) + cand.num_children <= self.max_cells
            ):
                for child in cand.children:
                    if not self.interior_covering or len(self.result) < self.max_cells:
                        self.add_candidate(child)
            else:
                cand.terminal = True
                self.add_candidate(cand)

        self.region = None
        self.pq.clear()
        self.result.normalize()
        if self.min_level > 0 or self.level_mod > 1:
            self.result.denormalize(self.min_level, self.level_mod)

    # ---------------------------------------------------- covering hygiene

    def normalize_covering(self, covering: CellUnion) -> None:
        """(RegionCoverer.ts:429-493)."""
        if self.max_level < MAX_LEVEL or self.level_mod > 1:
            for i, cid in enumerate(covering):
                level = cs.level(cid)
                new_level = self.adjust_level(min(level, self.max_level))
                if new_level != level:
                    covering[i] = cs.parent(cid, new_level)

        covering.normalize()
        if self.min_level > 0 or self.level_mod > 1:
            covering.denormalize(self.min_level, self.level_mod)

        excess = len(covering) - self.max_cells
        if excess <= 0 or self.is_canonical(covering):
            return
        if excess * len(covering) > 10000:
            rc = RegionCoverer()
            cov = rc.covering(covering)
            covering[:] = list(cov)
            return

        while len(covering) > self.max_cells:
            best_index = -1
            best_level = -1
            for i in range(len(covering) - 1):
                level, ok = cs.common_ancestor_level(covering[i], covering[i + 1])
                if not ok:
                    continue
                adjusted = self.adjust_level(level)
                if adjusted > best_level:
                    best_level = adjusted
                    best_index = i
            if best_level < self.min_level:
                break
            cid = cs.parent(covering[best_index], best_level)
            covering[:] = self.replace_cells_with_ancestor(covering, cid)
            while best_level > self.min_level:
                best_level -= self.level_mod
                cid = cs.parent(cid, best_level)
                if not self.contains_all_children(covering, cid):
                    break
                covering[:] = self.replace_cells_with_ancestor(covering, cid)

    def is_canonical(self, covering: list[int]) -> bool:
        """(RegionCoverer.ts:496-543)."""
        true_max = self.max_level
        if self.level_mod != 1:
            true_max = self.max_level - ((self.max_level - self.min_level) % self.level_mod)
        too_many_cells = len(covering) > self.max_cells
        same_parent_count = 1
        prev_id = 0
        for cid in covering:
            if not cs.valid(cid):
                return False
            level = cs.level(cid)
            if (
                level < self.min_level
                or level > true_max
                or (self.level_mod > 1 and (level - self.min_level) % self.level_mod != 0)
            ):
                return False
            if prev_id != 0:
                if cs.range_max(prev_id) >= cs.range_min(cid):
                    return False
                lev, ok = cs.common_ancestor_level(cid, prev_id)
                if too_many_cells and ok and lev >= self.min_level:
                    return False
                p_level = level - self.level_mod
                if (
                    p_level < self.min_level
                    or level != cs.level(prev_id)
                    or cs.parent(cid, p_level) != cs.parent(prev_id, p_level)
                ):
                    same_parent_count = 1
                else:
                    same_parent_count += 1
                    if same_parent_count == 1 << (2 * self.level_mod):
                        return False
            prev_id = cid
        return True

    def contains_all_children(self, covering: list[int], cid: int) -> bool:
        pos = next((i for i, c in enumerate(covering) if c >= cs.range_min(cid)), -1)
        level = cs.level(cid) + self.level_mod
        child = cs.child_begin_at_level(cid, level)
        end = cs.child_end_at_level(cid, level)
        while child != end:
            if pos == -1 or pos >= len(covering) or covering[pos] != child:
                return False
            pos += 1
            child = cs.next_cell(child)
        return True

    def replace_cells_with_ancestor(self, covering: list[int], cid: int) -> list[int]:
        rmin = cs.range_min(cid)
        rmax = cs.range_max(cid)
        begin = _binary_search(len(covering), lambda i: covering[i] > rmin)
        end = _binary_search(len(covering), lambda i: covering[i] > rmax)
        return list(covering[:begin]) + [cid] + list(covering[end:])


def _binary_search(n: int, pred) -> int:
    """Smallest i in [0,n) with pred(i) true, else n (s2/util.ts:47-61)."""
    lo, hi = 0, n
    while lo < hi:
        mid = (lo + hi) // 2
        if pred(mid):
            hi = mid
        else:
            lo = mid + 1
    return lo


def simple_region_covering(region, start: Point, level: int) -> list[int]:
    return flood_fill_region_covering(
        region, cs.parent(cs.from_point(start.x, start.y, start.z), level)
    )


def flood_fill_region_covering(region, start: int) -> list[int]:
    """(RegionCoverer.ts:649-668)."""
    output: list[int] = []
    all_seen = {start}
    frontier = [start]
    while frontier:
        cid = frontier.pop()
        if not region.intersects_cell(Cell.from_cellid(cid)):
            continue
        output.append(cid)
        for nbr in cs.edge_neighbors(cid):
            if nbr not in all_seen:
                all_seen.add(nbr)
                frontier.append(nbr)
    return output
