"""Pure-Python oracle of the consume-once cascade — the semantics contract.

A deliberately straightforward (dicts + loops, single-doc) re-expression of
the reference's tree construction so the distributed engine can be tested
against it exactly:

  * parse + filters: empty-URL drop (reference har2tree.py:330-331) and the
    status-0 duplicate dedup (har2tree.py:575-603);
  * DFS consume-once cascade `_make_subtree` (har2tree.py:879-1014) with the
    per-parent stage order redirect > frame > initiator > referer > resource
    and the redirect "prefix up to first valid" multi-match rule
    (har2tree.py:914-923);
  * dangling loop with the 1000-node cap (har2tree.py:722-732) and the
    fallback cascade (har2tree.py:770-853), re-grounded spatially:
    coarse-cell match (fallback_host, J10), point-in-region containment
    (fallback_pip, J11/J12), ring-expansion kNN (fallback_knn, J13),
    root attach (fallback_root).

This module is NOT on any hot path — it exists only as the test oracle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

from har2tree_spark.geo import grid
from har2tree_spark.geo.geometry import REGION_RADIUS_DEG, hex_polygon, points_in_polygon
from har2tree_spark.schema import PRIORITY

KEY_RE = re.compile(r"^k(0|[1-9][0-9]{0,14})\Z")  # canonical form only (matches the engine, \z-anchored)
MAX_RING = 4
DANGLING_CAP = 1000


@dataclass
class Span:
    span_idx: int
    kind: str
    text: str
    media_ref: str
    offset: int
    key: str | None = None
    key_num: int | None = None
    lon: float | None = None
    lat: float | None = None
    cell: int | None = None  # FINE_RES
    coarse_cell: int | None = None  # COARSE_RES
    valid: bool = True
    suppressed: bool = False
    dropped: bool = False
    ref_tokens: list[str] = field(default_factory=list)


def _resolve_media(m: str) -> str:
    """F21 initiator stack walk (reference nodes.py:643-649): first token
    of the first non-empty '|'-separated level of a 'stack:...' pointer,
    or '' when every level is empty. Mirrors parse._resolve_media."""
    if not m.startswith("stack:"):
        return m
    for level in m[len("stack:"):].split("|"):
        if level != "":
            return level.split(" ")[0]
    return ""


def parse_doc(spans_raw: list[dict]) -> list[Span]:
    """Parse-pass semantics (SURVEY.md §2.3 F1-F2 analogue)."""
    spans: list[Span] = []
    for i, s in enumerate(spans_raw or []):
        text = s.get("text") or ""
        toks = text.split(" ") if text else []
        key = toks[0] if toks and KEY_RE.match(toks[0]) else None
        sp = Span(
            span_idx=i,
            kind=s.get("kind") or "",
            text=text,
            media_ref=_resolve_media(s.get("media_ref") or ""),
            offset=s.get("offset") if s.get("offset") is not None else i,
            key=key,
        )
        sp.valid = sp.kind != "empty"
        sp.ref_tokens = [t for t in toks if KEY_RE.match(t) and t != key]
        if key is not None:
            sp.key_num = int(key[1:])
            kn = np.asarray([sp.key_num], dtype=np.int64)
            lon, lat = grid.np_point(kn)
            sp.lon, sp.lat = float(lon[0]), float(lat[0])
            sp.cell = int(grid.np_cell(kn, grid.FINE_RES)[0])
            sp.coarse_cell = int(grid.np_cell(kn, grid.COARSE_RES)[0])
        spans.append(sp)

    # P2: status-0 dedup — invalid span whose key also belongs to a valid span
    valid_keys = {s.key for s in spans if s.valid and s.key}
    for s in spans:
        if not s.valid and s.key in valid_keys:
            s.suppressed = True
    # P1: featureless spans (no key, no pointer, no text) never join
    for s in spans:
        s.dropped = s.suppressed or (s.key is None and s.media_ref == "" and s.text == "")
    return spans


def _stage_children(parent: Span, candidates: list[Span], stage: str) -> list[Span]:
    """Unconsumed candidates claimable by ``parent`` via ``stage``,
    in (offset, span_idx) order."""
    out = []
    for c in candidates:
        if c.span_idx == parent.span_idx:
            continue
        if stage == "redirect":
            ok = (
                parent.kind == "redirect"
                and parent.media_ref != ""
                and c.key is not None
                and c.key == parent.media_ref
                and c.key != parent.key
            )
        elif stage == "frame":
            ok = parent.kind == "iframe" and c.key is not None and c.key in parent.ref_tokens
        elif stage == "initiator":
            ok = (
                c.kind == "js"
                and c.media_ref != ""
                and parent.key is not None
                and c.media_ref == parent.key
            )
        elif stage == "referer":
            ok = (
                c.kind != "js"
                and c.media_ref != ""
                and parent.key is not None
                and c.media_ref == parent.key
            )
        elif stage == "resource":
            ok = (
                parent.kind in ("html", "css", "js")
                and c.key is not None
                and c.key in parent.ref_tokens
                and c.media_ref == ""
            )
        else:  # pragma: no cover
            raise ValueError(stage)
        if ok:
            out.append(c)
    out.sort(key=lambda s: (s.offset, s.span_idx))
    if stage == "redirect" and out:
        # multi-match: keep the prefix up to & including the first valid
        # entry (har2tree.py:914-923); if none valid, keep all
        prefix = []
        for c in out:
            prefix.append(c)
            if c.valid:
                break
        out = prefix
    return out


def cascade_doc(spans_raw: list[dict]) -> list[dict]:
    """Full per-doc cascade. Returns join_result rows
    (span_idx, parent_idx, join_kind, priority); empty list for an
    empty/quarantined doc."""
    spans = parse_doc(spans_raw)
    live = [s for s in spans if not s.dropped]
    if not live:
        return []
    live.sort(key=lambda s: (s.offset, s.span_idx))
    root = live[0]

    consumed: dict[int, Span] = {root.span_idx: root}
    attach_seq: dict[int, int] = {root.span_idx: 0}
    depth: dict[int, int] = {root.span_idx: 0}
    rows = [
        {
            "span_idx": root.span_idx,
            "parent_idx": -1,
            "join_kind": "root",
            "priority": PRIORITY["root"],
            "depth": 0,
        }
    ]
    seq = [1]  # attach counter

    def unconsumed() -> list[Span]:
        return [s for s in live if s.span_idx not in consumed]

    def attach(child: Span, parent: Span, stage: str) -> None:
        consumed[child.span_idx] = child
        attach_seq[child.span_idx] = seq[0]
        seq[0] += 1
        depth[child.span_idx] = depth[parent.span_idx] + 1
        rows.append(
            {
                "span_idx": child.span_idx,
                "parent_idx": parent.span_idx,
                "join_kind": stage,
                "priority": PRIORITY[stage],
                "depth": depth[child.span_idx],
            }
        )

    def make_subtree(parent: Span) -> None:
        for stage in ("redirect", "frame", "initiator", "referer", "resource"):
            for child in _stage_children(parent, unconsumed(), stage):
                if child.span_idx in consumed:
                    continue
                attach(child, parent, stage)
                make_subtree(child)

    make_subtree(root)

    # dangling loop with cap (har2tree.py:722-732)
    processed = 0
    while True:
        dangling = unconsumed()
        if not dangling:
            break
        if processed >= DANGLING_CAP:
            break  # broken doc: remaining spans get no join rows
        d = dangling[0]
        processed += 1
        stage, parent = _fallback_parent(d, consumed, attach_seq, depth, root)
        attach(d, parent, stage)
        make_subtree(d)
    return rows


def _fallback_parent(
    d: Span,
    consumed: dict[int, Span],
    attach_seq: dict[int, int],
    depth: dict[int, int],
    root: Span,
) -> tuple[str, Span]:
    att = list(consumed.values())
    # fallback_host (J10): same coarse cell; single match wins, else prefer
    # html then deepest then most-recently attached (har2tree.py:759-799)
    if d.coarse_cell is not None:
        cands = [a for a in att if a.coarse_cell == d.coarse_cell]
        if len(cands) == 1:
            return "fallback_host", cands[0]
        if cands:
            cands.sort(
                key=lambda a: (
                    a.kind != "html",
                    -depth[a.span_idx],
                    -attach_seq[a.span_idx],
                )
            )
            return "fallback_host", cands[0]
    # fallback_pip (J11/J12): inside an attached page-root's hex region
    if d.lon is not None:
        pages = [a for a in att if a.kind == "html" and a.lon is not None]
        hits = []
        for a in pages:
            poly = hex_polygon(a.lon, a.lat, REGION_RADIUS_DEG)
            if bool(points_in_polygon(np.asarray([d.lon]), np.asarray([d.lat]), poly)[0]):
                hits.append(a)
        if hits:
            # nearest center on the integer grid, tie by offset then idx
            _, dix, diy = grid.np_cell_xy(np.asarray([d.cell], dtype=np.int64))
            def grid_d2(a):
                _, ax, ay = grid.np_cell_xy(np.asarray([a.cell], dtype=np.int64))
                return int((ax[0] - dix[0]) ** 2 + (ay[0] - diy[0]) ** 2)
            hits.sort(key=lambda a: (grid_d2(a), a.offset, a.span_idx))
            return "fallback_pip", hits[0]
    # fallback_knn (J13): ring expansion over attached cells
    if d.cell is not None:
        cells = {}
        for a in att:
            if a.cell is not None:
                cells.setdefault(a.cell, []).append(a)
        _, dix, diy = grid.np_cell_xy(np.asarray([d.cell], dtype=np.int64))
        for r in range(0, MAX_RING + 1):
            ring = grid.np_ring(d.cell, r)
            found = []
            for c in ring:
                for a in cells.get(int(c), []):
                    if a.span_idx != d.span_idx:
                        found.append(a)
            if found:
                def grid_d2(a):
                    _, ax, ay = grid.np_cell_xy(np.asarray([a.cell], dtype=np.int64))
                    return int((ax[0] - dix[0]) ** 2 + (ay[0] - diy[0]) ** 2)
                found.sort(key=lambda a: (grid_d2(a), a.offset, a.span_idx))
                return "fallback_knn", found[0]
    return "fallback_root", root


def cascade_docs(docs: list[dict]) -> list[dict]:
    """Oracle over a list of {doc_id, spans} rows -> flat join_result rows."""
    out = []
    for doc in docs:
        for row in cascade_doc(doc["spans"]):
            out.append({"doc_id": doc["doc_id"], **row})
    return out


def doc_stats(docs: list[dict]) -> list[dict]:
    """Golden per-doc stats (A4 analogue of tests/simple_test.py:63-75)."""
    out = []
    for doc in docs:
        spans = parse_doc(doc["spans"])
        rows = cascade_doc(doc["spans"])
        depth: dict[int, int] = {}
        parent = {r["span_idx"]: r["parent_idx"] for r in rows}
        def d_of(i: int) -> int:
            if i == -1:
                return -1
            if i not in depth:
                depth[i] = d_of(parent[i]) + 1
            return depth[i]
        for r in rows:
            d_of(r["span_idx"])
        live = [s for s in spans if not s.dropped]
        chain = sum(1 for r in rows if r["join_kind"] == "redirect")
        out.append(
            {
                "doc_id": doc["doc_id"],
                "total_spans": len(live),
                "unique_keys": len({s.key for s in live if s.key}),
                "total_cells": sum(1 for s in live if s.cell is not None),
                "unique_cells": len({s.cell for s in live if s.cell is not None}),
                "tree_depth": (max(depth.values()) + 1) if depth else 0,
                "total_chain": chain,
                "total_bytes": sum(len(s.text.encode()) for s in live),
            }
        )
    return out
