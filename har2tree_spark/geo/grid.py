"""Hierarchical grid-cell index (H3-style, integer quadtree).

The reference groups URL nodes by hostname level-by-level to build the
hostname tree (reference har2tree.py:680-708); our re-grounding replaces the
hostname key with a hierarchical spatial cell id. We implement the index
from first principles (no external geo lib): a feature key hashes to a
deterministic point on the [-180,180)x[-90,90) plane via two multiplicative
integer hashes, and the cell at resolution ``r`` is the quadtree square
containing it.

Every function here exists in THREE synchronized forms:
  * numpy (vectorized, used by the Python oracle and pandas UDFs),
  * pyspark Column expressions (JVM-side, whole-stage-codegen — the hot path),
  * a SQL-text builder (DuckDB dialect, for the driver's oracle cross-check).

Cell id layout (resolution <= 16):
    cell = (ix * 2^16 + iy) * 32 + r        (< 2^37)
where ix = hx >> (32 - r), iy = hy >> (32 - r) and
    hx = (key_num * HX_MULT) mod 2^32,  hy = (key_num * HY_MULT) mod 2^32.
Pure multiply/floor arithmetic so Spark, DuckDB and numpy agree bit-for-bit;
values stay far below 2^53 so a null-induced Arrow->pandas float64 round
trip cannot corrupt them.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

HX_MULT = 2654435761  # Knuth multiplicative hash
HY_MULT = 2246822519  # xxhash prime 2
MOD32 = 1 << 32

FINE_RES = 12  # per-feature cell resolution (hostname analogue)
COARSE_RES = 5  # fallback_host grouping resolution (registrable-domain analogue)
TILE_LEVELS = (3, 6, 9, 12)  # hostname-tree levels analogue (har2tree.py:680-708)

_IY = 1 << 16  # ix multiplier
_RB = 32  # resolution field width


# ---------------------------------------------------------------- numpy ----
def np_hashes(key_num: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = np.asarray(key_num).astype(np.uint64)
    hx = (k * np.uint64(HX_MULT)) % np.uint64(MOD32)
    hy = (k * np.uint64(HY_MULT)) % np.uint64(MOD32)
    return hx.astype(np.int64), hy.astype(np.int64)


def np_point(key_num: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    hx, hy = np_hashes(key_num)
    lon = hx / MOD32 * 360.0 - 180.0
    lat = hy / MOD32 * 180.0 - 90.0
    return lon, lat


def np_cell(key_num: np.ndarray, res: int = FINE_RES) -> np.ndarray:
    hx, hy = np_hashes(key_num)
    ix = hx >> (32 - res)
    iy = hy >> (32 - res)
    return (ix * _IY + iy) * _RB + res


def cell_res(cell: int) -> int:
    return int(cell) % _RB


def np_cell_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = cell % _RB
    rest = cell // _RB
    return res, rest // _IY, rest % _IY


def make_cell(res, ix, iy):
    return (np.asarray(ix, dtype=np.int64) * _IY + np.asarray(iy, dtype=np.int64)) * _RB + res


def np_cell_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Re-index a cell at a coarser resolution (H3 cellToParent analogue)."""
    res, ix, iy = np_cell_xy(cell)
    shift = res - parent_res
    return ((ix >> shift) * _IY + (iy >> shift)) * _RB + parent_res


_RING_OFFSETS: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _ring_offsets(r: int) -> tuple[np.ndarray, np.ndarray]:
    if r not in _RING_OFFSETS:
        offs = [
            (dx, dy)
            for dx in range(-r, r + 1)
            for dy in range(-r, r + 1)
            if max(abs(dx), abs(dy)) == r
        ]
        arr = np.asarray(offs, dtype=np.int64)
        _RING_OFFSETS[r] = (arr[:, 0], arr[:, 1])
    return _RING_OFFSETS[r]


def np_ring(cell: int, radius: int) -> np.ndarray:
    """All cells at exactly Chebyshev distance ``radius`` from ``cell``
    (H3 kRing hollow-ring analogue), toroidal wrap at the grid edge so
    every cell has a full ring — keeps the kNN expansion deterministic.
    Offsets are cached and the ring is built in one vectorized shot."""
    cell = int(cell)
    res = cell % _RB
    rest = cell // _RB
    ix, iy = rest // _IY, rest % _IY
    if radius == 0:
        return np.asarray([cell], dtype=np.int64)
    n = 1 << res
    dx, dy = _ring_offsets(radius)
    return (((ix + dx) % n) * _IY + ((iy + dy) % n)) * _RB + res


def np_disk(cell: np.ndarray, radius: int) -> np.ndarray:
    """(len(cell), (2r+1)^2) matrix of all cells within Chebyshev distance
    radius — vectorized gridDisk for batch kNN probes."""
    res, ix, iy = np_cell_xy(np.asarray(cell, dtype=np.int64))
    n = (np.int64(1) << res).astype(np.int64)
    offs = np.arange(-radius, radius + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    dx = dx.ravel()[None, :]
    dy = dy.ravel()[None, :]
    nix = (ix[:, None] + dx) % n[:, None]
    niy = (iy[:, None] + dy) % n[:, None]
    return (nix * _IY + niy) * _RB + res[:, None]


def np_cover_bbox(
    min_lon: float, min_lat: float, max_lon: float, max_lat: float,
    max_cells: int = 64, max_res: int = FINE_RES,
) -> np.ndarray:
    """S2-style covering: the set of cells covering a bbox, refined to the
    finest resolution that stays within ``max_cells``, then compacted
    (complete 4-child quartets promoted to their parent). Used to turn a
    polygon/region into an indexable cell set for pruning joins."""
    min_lon = max(min_lon, -180.0)
    min_lat = max(min_lat, -90.0)
    max_lon = min(max_lon, 180.0 - 1e-9)
    max_lat = min(max_lat, 90.0 - 1e-9)
    chosen = None
    for res in range(max_res, -1, -1):
        n = 1 << res
        x0 = int((min_lon + 180.0) / 360.0 * n)
        x1 = int((max_lon + 180.0) / 360.0 * n)
        y0 = int((min_lat + 90.0) / 180.0 * n)
        y1 = int((max_lat + 90.0) / 180.0 * n)
        if (x1 - x0 + 1) * (y1 - y0 + 1) <= max_cells:
            xs = np.arange(x0, x1 + 1, dtype=np.int64)
            ys = np.arange(y0, y1 + 1, dtype=np.int64)
            gx, gy = np.meshgrid(xs, ys, indexing="ij")
            chosen = make_cell(res, gx.ravel(), gy.ravel())
            break
    assert chosen is not None
    return np_compact(chosen)


def np_compact(cells: np.ndarray) -> np.ndarray:
    """Compact a cell set: any parent whose 4 children are all present
    replaces them; repeated up the hierarchy (H3 compactCells)."""
    out: list[int] = []
    cur = np.unique(np.asarray(cells, dtype=np.int64))
    while len(cur) > 0:
        res = int(cur[0] % _RB)
        if res == 0:
            out.extend(cur.tolist())
            break
        parents = np_cell_parent(cur, res - 1)
        uniq, counts = np.unique(parents, return_counts=True)
        promote = set(uniq[counts == 4].tolist())
        keep = np.asarray(
            [c for c, p in zip(cur.tolist(), parents.tolist()) if p not in promote],
            dtype=np.int64,
        )
        out.extend(keep.tolist())
        cur = np.asarray(sorted(promote), dtype=np.int64)
    return np.asarray(sorted(out), dtype=np.int64)


# ------------------------------------------------------- Spark columns ----
def col_key_num(key: Column) -> Column:
    """'k123' -> 123; null-safe."""
    return F.substring(key, 2, 18).cast("long")


def col_hashes(key_num: Column) -> tuple[Column, Column]:
    """(k * MULT) mod 2^32 with every int64 intermediate < 2^48: k is split
    into 16-bit halves so no multiply can overflow under ANSI mode even for
    the 15-digit keys the key grammar admits. Only bits 0-31 of k influence
    the result (higher bits are ≡ 0 mod 2^32), matching numpy's uint64 wrap
    and the DuckDB builder below bit-for-bit."""
    lo = F.pmod(key_num, F.lit(1 << 16))
    hi = F.pmod(F.floor(key_num / F.lit(1 << 16)).cast("long"), F.lit(1 << 16))

    def h(mult: int) -> Column:
        return F.pmod(
            F.pmod(lo * F.lit(mult), F.lit(MOD32))
            + F.pmod(hi * F.lit(mult), F.lit(1 << 16)) * F.lit(1 << 16),
            F.lit(MOD32),
        )

    return h(HX_MULT), h(HY_MULT)


def col_point(key_num: Column) -> tuple[Column, Column]:
    hx, hy = col_hashes(key_num)
    return hx / MOD32 * 360.0 - 180.0, hy / MOD32 * 180.0 - 90.0


def col_cell_lonlat(lon: Column, lat: Column, res: int) -> Column:
    """Cell id from lon/lat columns (consistent with np_cell for points
    produced by np_point: the float math floors to the same integer grid)."""
    n = 1 << res
    ix = F.floor((lon + 180.0) / 360.0 * n)
    iy = F.floor((lat + 90.0) / 180.0 * n)
    return ((ix * F.lit(_IY) + iy) * F.lit(_RB) + F.lit(res)).cast("long")


def col_cell(key_num: Column, res: int = FINE_RES) -> Column:
    hx, hy = col_hashes(key_num)
    ix = F.floor(hx / F.lit(1 << (32 - res)))
    iy = F.floor(hy / F.lit(1 << (32 - res)))
    return ((ix * F.lit(_IY) + iy) * F.lit(_RB) + F.lit(res)).cast("long")


def col_cell_parent(cell: Column, res: int, parent_res: int) -> Column:
    """Coarsen a resolution-``res`` cell column to ``parent_res``."""
    rest = F.floor(cell / F.lit(_RB))
    ix = F.floor(rest / F.lit(_IY))
    iy = F.pmod(rest, F.lit(_IY))
    shift = 1 << (res - parent_res)
    return (
        (F.floor(ix / F.lit(shift)) * F.lit(_IY) + F.floor(iy / F.lit(shift)))
        * F.lit(_RB)
        + F.lit(parent_res)
    ).cast("long")


# ------------------------------------------------------------ SQL text ----
def sql_hash(key_num_expr: str, mult: int) -> str:
    """DuckDB/ANSI text for (k * mult) mod 2^32 via the same 16-bit-half
    split as col_hashes — avoids BIGINT overflow for keys > ~3.47e9."""
    lo = f"(({key_num_expr}) % 65536)"
    hi = f"(CAST(FLOOR(({key_num_expr}) / 65536) AS BIGINT) % 65536)"
    return (
        f"((({lo} * {mult}) % {MOD32} + (({hi} * {mult}) % 65536) * 65536) % {MOD32})"
    )


def sql_cell(key_num_expr: str, res: int = FINE_RES) -> str:
    """DuckDB/ANSI SQL text computing the same cell id (oracle side)."""
    hx = sql_hash(key_num_expr, HX_MULT)
    hy = sql_hash(key_num_expr, HY_MULT)
    ix = f"CAST(FLOOR(({hx}) / {1 << (32 - res)}) AS BIGINT)"
    iy = f"CAST(FLOOR(({hy}) / {1 << (32 - res)}) AS BIGINT)"
    return f"((({ix}) * {_IY} + ({iy})) * {_RB} + {res})"


def sql_cell_parent(cell_expr: str, res: int, parent_res: int) -> str:
    shift = 1 << (res - parent_res)
    rest = f"CAST(FLOOR(({cell_expr}) / {_RB}) AS BIGINT)"
    ix = f"CAST(FLOOR(({rest}) / {_IY}) AS BIGINT)"
    iy = f"(({rest}) % {_IY})"
    return (
        f"((CAST(FLOOR(({ix}) / {shift}) AS BIGINT) * {_IY} "
        f"+ CAST(FLOOR(({iy}) / {shift}) AS BIGINT)) * {_RB} + {parent_res})"
    )
