"""Per-document cascade kernel for ``applyInPandas`` (exact mode).

Runs the reference-parity consume-once DFS (reference har2tree.py:879-1014)
plus the spatial fallback cascade (har2tree.py:770-853) on one document's
feature rows. Candidate lookup structures are built with pandas/numpy per
Arrow batch; the DFS itself is an explicit traversal (inherently sequential
per doc — exactly like the reference — but embarrassingly parallel across
docs, which is where the 10^12-doc parallelism lives).

Float-sensitive geometry (point-in-region ray casting) calls the shared
kernels in geo/geometry.py with the same operand order as the oracle, so
results are bit-identical.
"""

from __future__ import annotations

import sys
from collections import defaultdict

import numpy as np
import pandas as pd

from har2tree_spark.geo import grid
from har2tree_spark.geo.geometry import REGION_RADIUS_DEG, hex_polygon, points_in_polygon
from har2tree_spark.schema import PRIORITY

MAX_RING = 4
DANGLING_CAP = 1000

_STAGES = ("redirect", "frame", "initiator", "referer", "resource")


def cascade_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    if len(pdf) == 0:
        return _empty()
    pdf = pdf.sort_values(["offset", "span_idx"], kind="stable").reset_index(drop=True)
    n = len(pdf)
    doc_id = pdf["doc_id"].iloc[0]
    span_idx = pdf["span_idx"].to_numpy()
    kind = pdf["kind"].to_numpy()
    media = pdf["media_ref"].to_numpy()
    key = pdf["key"].to_numpy()  # object; None where absent
    valid = pdf["valid"].to_numpy()
    lon = pdf["lon"].to_numpy(dtype=np.float64, na_value=np.nan)
    lat = pdf["lat"].to_numpy(dtype=np.float64, na_value=np.nan)
    cell = pdf["cell"].to_numpy(dtype=np.float64, na_value=np.nan)
    coarse = pdf["coarse_cell"].to_numpy(dtype=np.float64, na_value=np.nan)
    ref_tokens = pdf["ref_tokens"].tolist()

    # positional candidate indexes (inverted hash indexes, the
    # all_url_requests / all_referer analogue of har2tree.py:331-339)
    key_pos: dict[str, list[int]] = defaultdict(list)
    media_js: dict[str, list[int]] = defaultdict(list)
    media_other: dict[str, list[int]] = defaultdict(list)
    for i in range(n):
        if key[i] is not None:
            key_pos[key[i]].append(i)
        if media[i]:
            (media_js if kind[i] == "js" else media_other)[media[i]].append(i)

    consumed = np.zeros(n, dtype=bool)
    depth = np.zeros(n, dtype=np.int64)
    attach_seq = np.zeros(n, dtype=np.int64)
    out_child: list[int] = []
    out_parent: list[int] = []
    out_stage: list[str] = []
    seq = [1]

    def attach(c: int, p: int, stage: str) -> None:
        consumed[c] = True
        attach_seq[c] = seq[0]
        seq[0] += 1
        depth[c] = depth[p] + 1 if p >= 0 else 0
        out_child.append(c)
        out_parent.append(p)
        out_stage.append(stage)

    def stage_children(p: int, stage: str) -> list[int]:
        if stage == "redirect":
            if kind[p] != "redirect" or not media[p]:
                return []
            cands = [
                c
                for c in key_pos.get(media[p], ())
                if c != p and not consumed[c] and key[c] != key[p]
            ]
            prefix: list[int] = []
            for c in cands:
                prefix.append(c)
                if valid[c]:
                    break
            return prefix
        if stage == "frame":
            if kind[p] != "iframe":
                return []
            hits = {
                c
                for t in ref_tokens[p]
                for c in key_pos.get(t, ())
                if c != p and not consumed[c]
            }
            return sorted(hits)
        if stage == "initiator":
            if key[p] is None:
                return []
            return [c for c in media_js.get(key[p], ()) if c != p and not consumed[c]]
        if stage == "referer":
            if key[p] is None:
                return []
            return [c for c in media_other.get(key[p], ()) if c != p and not consumed[c]]
        # resource
        if kind[p] not in ("html", "css", "js"):
            return []
        hits = {
            c
            for t in ref_tokens[p]
            for c in key_pos.get(t, ())
            if c != p and not consumed[c] and not media[c]
        }
        return sorted(hits)

    limit = max(sys.getrecursionlimit(), 4 * n + 1000)
    sys.setrecursionlimit(limit)

    def make_subtree(p: int) -> None:
        for stage in _STAGES:
            for c in stage_children(p, stage):
                if consumed[c]:
                    continue
                attach(c, p, stage)
                make_subtree(c)

    root = 0
    attach(root, -1, "root")
    attach_seq[root] = 0
    seq[0] = 1
    make_subtree(root)

    processed = 0
    while processed < DANGLING_CAP:
        rem = np.flatnonzero(~consumed)
        if len(rem) == 0:
            break
        d = int(rem[0])
        processed += 1
        stage, p = _fallback(
            d, consumed, depth, attach_seq, kind, lon, lat, cell, coarse, root
        )
        attach(d, p, stage)
        make_subtree(d)

    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "span_idx": span_idx[out_child].astype(np.int32),
            "parent_idx": np.asarray(
                [span_idx[p] if p >= 0 else -1 for p in out_parent], dtype=np.int32
            ),
            "join_kind": out_stage,
            "priority": np.asarray([PRIORITY[s] for s in out_stage], dtype=np.int32),
        }
    )


def _fallback(d, consumed, depth, attach_seq, kind, lon, lat, cell, coarse, root):
    att = np.flatnonzero(consumed)
    # fallback_host (J10): same coarse cell, html/deepest/latest preference
    if not np.isnan(coarse[d]):
        cands = att[coarse[att] == coarse[d]]
        if len(cands) == 1:
            return "fallback_host", int(cands[0])
        if len(cands) > 1:
            order = np.lexsort(
                (-attach_seq[cands], -depth[cands], kind[cands] != "html")
            )
            return "fallback_host", int(cands[order[0]])
    # fallback_pip (J11/J12): containment in an attached page-root's region
    if not np.isnan(lon[d]):
        pages = att[(kind[att] == "html") & ~np.isnan(lon[att])]
        hits = []
        for a in pages:
            poly = hex_polygon(float(lon[a]), float(lat[a]), REGION_RADIUS_DEG)
            if bool(
                points_in_polygon(
                    np.asarray([lon[d]]), np.asarray([lat[d]]), poly
                )[0]
            ):
                hits.append(int(a))
        if hits:
            hits_arr = np.asarray(hits)
            d2 = _grid_d2(cell, hits_arr, d)
            order = np.lexsort((hits_arr, d2))  # offsets == positional order
            return "fallback_pip", int(hits_arr[order[0]])
    # fallback_knn (J13): ring expansion over attached cells
    if not np.isnan(cell[d]):
        have = att[~np.isnan(cell[att])]
        have = have[have != d]
        if len(have) > 0:
            cell_of = defaultdict(list)
            for a in have:
                cell_of[int(cell[a])].append(int(a))
            for r in range(0, MAX_RING + 1):
                ring = grid.np_ring(int(cell[d]), r)
                found = [a for c in ring for a in cell_of.get(int(c), ())]
                if found:
                    f_arr = np.asarray(sorted(set(found)))
                    d2 = _grid_d2(cell, f_arr, d)
                    order = np.lexsort((f_arr, d2))
                    return "fallback_knn", int(f_arr[order[0]])
    return "fallback_root", root


def _grid_d2(cell: np.ndarray, cands: np.ndarray, d: int) -> np.ndarray:
    _, ax, ay = grid.np_cell_xy(cell[cands].astype(np.int64))
    _, dx, dy = grid.np_cell_xy(np.asarray([int(cell[d])], dtype=np.int64))
    return (ax - dx[0]) ** 2 + (ay - dy[0]) ** 2


def _empty() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="object"),
            "span_idx": pd.Series(dtype="int32"),
            "parent_idx": pd.Series(dtype="int32"),
            "join_kind": pd.Series(dtype="object"),
            "priority": pd.Series(dtype="int32"),
        }
    )
