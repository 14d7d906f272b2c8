"""STR-packed static R-tree over polygon bounding boxes (numpy only).

Built once on the driver over the (small, broadcastable) polygon side and
shipped to executors via ``SparkContext.broadcast`` — the spatial analogue of
the reference's in-memory inverted indexes used to probe parent candidates
(reference har2tree.py:331-339). Query = bbox filter via the tree, then the
exact ray-cast test (geometry.points_in_polygon).

Sort-Tile-Recursive packing: leaves are built by sorting boxes by center-x,
slicing into vertical strips, sorting each strip by center-y; internal levels
pack bottom-up with the same fanout.
"""

from __future__ import annotations

import math

import numpy as np

FANOUT = 16


class STRtree:
    def __init__(self, boxes: np.ndarray):
        """boxes: (n, 4) [minx, miny, maxx, maxy]."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.levels: list[np.ndarray] = []  # levels[0] = leaf boxes (sorted)
        self.children: list[np.ndarray] = []  # child start index per node
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            return
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        n_leaves = math.ceil(self.n / FANOUT)
        n_strips = max(1, math.ceil(math.sqrt(n_leaves)))
        per_strip = math.ceil(self.n / n_strips)
        order_x = np.argsort(cx, kind="stable")
        order = np.empty(self.n, dtype=np.int64)
        pos = 0
        for s in range(n_strips):
            strip = order_x[s * per_strip : (s + 1) * per_strip]
            strip = strip[np.argsort(cy[strip], kind="stable")]
            order[pos : pos + len(strip)] = strip
            pos += len(strip)
        self.order = order
        level = boxes[order]
        self.levels.append(level)
        while len(level) > 1:
            m = math.ceil(len(level) / FANOUT)
            nxt = np.empty((m, 4), dtype=np.float64)
            starts = np.arange(m, dtype=np.int64) * FANOUT
            for j in range(m):
                grp = level[j * FANOUT : (j + 1) * FANOUT]
                nxt[j] = [grp[:, 0].min(), grp[:, 1].min(), grp[:, 2].max(), grp[:, 3].max()]
            self.children.append(starts)
            self.levels.append(nxt)
            level = nxt

    def query_point(self, x: float, y: float) -> np.ndarray:
        """Original indices of all boxes containing point (x, y)."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        top = len(self.levels) - 1
        nodes = np.array([0], dtype=np.int64)
        for lvl in range(top, 0, -1):
            boxes = self.levels[lvl]
            hit = nodes[
                (boxes[nodes, 0] <= x) & (x <= boxes[nodes, 2])
                & (boxes[nodes, 1] <= y) & (y <= boxes[nodes, 3])
            ]
            # expand to children at lvl-1
            child_lists = [
                np.arange(h * FANOUT, min((h + 1) * FANOUT, len(self.levels[lvl - 1])))
                for h in hit
            ]
            nodes = (
                np.concatenate(child_lists) if child_lists else np.empty(0, dtype=np.int64)
            )
            if len(nodes) == 0:
                return np.empty(0, dtype=np.int64)
        boxes = self.levels[0]
        hit = nodes[
            (boxes[nodes, 0] <= x) & (x <= boxes[nodes, 2])
            & (boxes[nodes, 1] <= y) & (y <= boxes[nodes, 3])
        ]
        return self.order[hit]

    def query_pairs(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Fully vectorized batch probe: (point_idx, box_idx) arrays of every
        (point, candidate-box) containment pair. One level-synchronous
        frontier of (point, node) pairs descends the tree — no per-point
        Python loop, so an Arrow batch of 10^4 probes costs a handful of
        numpy passes instead of 10^4 tree walks."""
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        npts = len(xs)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        if self.n == 0 or npts == 0:
            return empty
        pt = np.arange(npts, dtype=np.int64)
        nd = np.zeros(npts, dtype=np.int64)
        for lvl in range(len(self.levels) - 1, 0, -1):
            b = self.levels[lvl][nd]
            px, py = xs[pt], ys[pt]
            m = (b[:, 0] <= px) & (px <= b[:, 2]) & (b[:, 1] <= py) & (py <= b[:, 3])
            pt, nd = pt[m], nd[m]
            if len(pt) == 0:
                return empty
            n_child = len(self.levels[lvl - 1])
            cnt = np.minimum((nd + 1) * FANOUT, n_child) - nd * FANOUT
            csum = np.concatenate(([0], np.cumsum(cnt)))
            offs = np.arange(csum[-1], dtype=np.int64) - np.repeat(csum[:-1], cnt)
            pt = np.repeat(pt, cnt)
            nd = np.repeat(nd, cnt) * FANOUT + offs
        b = self.levels[0][nd]
        px, py = xs[pt], ys[pt]
        m = (b[:, 0] <= px) & (px <= b[:, 2]) & (b[:, 1] <= py) & (py <= b[:, 3])
        return pt[m], self.order[nd[m]]

    def query_points(self, xs: np.ndarray, ys: np.ndarray) -> list[np.ndarray]:
        """Batch probe: candidate box indices per point (thin wrapper over
        query_pairs, kept for per-point callers)."""
        pt, box = self.query_pairs(xs, ys)
        out: list[np.ndarray] = [np.empty(0, dtype=np.int64)] * len(np.asarray(xs))
        if len(pt):
            order = np.argsort(pt, kind="stable")
            pt_s, box_s = pt[order], box[order]
            bounds = np.flatnonzero(np.diff(pt_s)) + 1
            for p, grp in zip(
                pt_s[np.concatenate(([0], bounds))], np.split(box_s, bounds)
            ):
                out[int(p)] = grp
        return out
