"""Rendered-frame attach (J12's real-capture path): frames.json sidecar ->
per-span iframe markers + rendered-frame content digests.

The reference walks the Playwright frame tree recursively against the URL
tree (``CrawledTree._load_iframes``, reference har2tree.py:438-485 with the
entry loop at 749-754): starting at the *rendered node*, each frame with
content either (a) names a URL -- resolved ``unquote_plus`` with a
fragment-stripped fallback, skipped entirely when local-only
(about:/data:/blob:/chrome-error, har2tree.py:431-437) -- and attaches to
the FIRST node in the current node's subtree with that name (ete3
``traverse()`` default = level-order), or (b) has no usable URL and
attaches to the current node itself; either way the node is marked
``iframe`` and the frame's children recurse with that node as the new
current.  A URL frame whose node cannot be found logs and stops its branch
(har2tree.py:470-474).

Re-grounded: span "names" are canonical URL keys (sources/har_source.url_key
over the unquoted URL), the subtree relation is the cascade's consume-once
tree (join_result parent_idx), and frame content lands as sha256 hex
digests per the media digest contract (media/multimodal.py) instead of
inline BytesIO blobs.

Scale shape: ONE hash exchange on doc_id (the same partitioning every
per-doc stage uses) brings a doc's tree rows and its frames_json together;
the recursive walk is per-document Python over an Arrow batch -- bounded by
the capture's own frame tree, parallel across docs, zero cross-doc state.
"""

from __future__ import annotations

import hashlib
import json
from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from har2tree_spark.sources.har_source import url_key

ATTACH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("iframe", T.BooleanType(), False),
        T.StructField("n_rendered_frames", T.IntegerType(), False),
        T.StructField("frames_hex_sha256", T.ArrayType(T.StringType()), False),
    ]
)


def _local_only(url) -> bool:
    """The reference's _url_to_local_only_content (har2tree.py:431-437);
    a non-string url reads as local-only (totality)."""
    if url is None or not isinstance(url, str):
        return True
    return (
        url in ("about:blank", "about:srcdoc", "")
        or url.startswith("data")
        or url.startswith("chrome-error")
        or url.startswith("blob")
    )


def _walk_frames(
    frames: dict,
    rendered_idx: int | None,
    keys: dict[int, str | None],
    children: dict[int, list[int]],
) -> dict[int, list[str]]:
    """Pure-Python per-document walk; returns span_idx -> frame digests."""
    from urllib.parse import unquote_plus  # noqa: PLC0415

    out: dict[int, list[str]] = {}
    # no rendered node, or a rendered node with no tree row (quarantined
    # doc): the reference cannot reach _load_iframes without a tree
    if rendered_idx is None or rendered_idx not in keys or not isinstance(frames, dict):
        return out

    def subtree_levelorder(root: int):
        # ete3 traverse() default strategy is level-order, root included
        q = deque([root])
        while q:
            n = q.popleft()
            yield n
            q.extend(children.get(n, ()))

    def load(current: int, frame: dict, depth: int = 0) -> None:
        if depth >= 64:
            return  # hostile/corrupt nesting: stop the branch (the same
            # 64-level guard the initiator stack walk uses, _stack_levels)
        if not isinstance(frame, dict) or not frame.get("content"):
            return  # contentless frame: debug-only in the reference
        url = frame.get("url")
        digest = hashlib.sha256(str(frame["content"]).encode()).hexdigest()
        if url and not _local_only(url):
            u = unquote_plus(str(url))
            names = {url_key(u), url_key(u.split("#", 1)[0])}
            for node in subtree_levelorder(current):
                if keys.get(node) in names:
                    out.setdefault(node, []).append(digest)
                    for child in frame.get("children") or ():
                        load(node, child, depth + 1)
                    break
            else:
                return  # node not found: warn-and-stop branch
        else:
            out.setdefault(current, []).append(digest)
            for child in frame.get("children") or ():
                load(current, child, depth + 1)

    for f_child in frames.get("children") or ():
        load(rendered_idx, f_child)
    return out


def attach_frames(captures: DataFrame, features: DataFrame, tree: DataFrame) -> DataFrame:
    """(doc_id, span_idx, iframe, n_rendered_frames, frames_hex_sha256):
    one row per span that received rendered-frame content.

    ``captures``: read_har_captures output (needs doc_id, rendered_span_idx,
    frames_json).  ``features``: parse output (doc_id, span_idx, key).
    ``tree``: the exact cascade's join_result (doc_id, span_idx, parent_idx).
    """
    import pandas as pd  # noqa: PLC0415

    caps = captures.filter(F.col("frames_json").isNotNull()).select(
        "doc_id", "rendered_span_idx", "frames_json"
    )
    spans = (
        features.select("doc_id", "span_idx", "key")
        .join(tree.select("doc_id", "span_idx", "parent_idx"), ["doc_id", "span_idx"])
        .join(caps.select("doc_id"), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_idx", "key", "parent_idx")).alias("nodes")
        )
    )
    # one doc per row after the join -> rows are independent, so a narrow
    # mapInPandas suffices (no grouping exchange on top of the join's)
    grouped = caps.join(spans, "doc_id", "left")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        # column-wise zip, not iterrows: ~an order of magnitude less
        # per-row overhead if rendered-frame captures ever dominate a batch
        for doc_id, ridx, frames_json, nodes in zip(
            pdf["doc_id"].tolist(),
            pdf["rendered_span_idx"].tolist(),
            pdf["frames_json"].tolist(),
            pdf["nodes"].tolist(),
        ):
            keys: dict[int, str | None] = {}
            children: dict[int, list[int]] = {}
            for n in sorted(nodes if nodes is not None else [], key=lambda n: n["span_idx"]):
                keys[n["span_idx"]] = n["key"]
                if n["parent_idx"] is not None and n["parent_idx"] >= 0:
                    children.setdefault(n["parent_idx"], []).append(n["span_idx"])
            try:
                frames = json.loads(frames_json)
            except (ValueError, TypeError, RecursionError):
                # RecursionError: a hostile frames.json can out-nest the
                # JSON decoder itself, not just the walk
                continue
            attached = _walk_frames(
                frames, None if pd.isna(ridx) else int(ridx), keys, children
            )
            rows.extend(
                {
                    "doc_id": doc_id,
                    "span_idx": idx,
                    "iframe": True,
                    "n_rendered_frames": len(digests),
                    "frames_hex_sha256": digests,
                }
                for idx, digests in sorted(attached.items())
            )
        cols = [f.name for f in ATTACH_SCHEMA.fields]
        return pd.DataFrame(rows, columns=cols)

    return grouped.mapInPandas(lambda it: (build(pdf) for pdf in it), schema=ATTACH_SCHEMA)
