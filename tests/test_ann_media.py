"""ANN similarity search + multimodal plumbing."""

import numpy as np
import pytest

from har2tree_spark.ann import knn
from har2tree_spark.media import multimodal


def _emb(spark, n=60, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((6, dim))
    rows = []
    for i in range(n):
        v = base[i % 6] + 0.05 * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_cosine_topk_bruteforce(spark):
    df, rows = _emb(spark)
    qs = df.filter("vec_id < 3")
    got = knn.cosine_topk(df, qs, k=3).toPandas()
    assert set(got.query_id) == {0, 1, 2}
    assert (got.groupby("query_id").size() == 3).all()
    # verify against numpy for query 0
    v = np.asarray([r[1] for r in rows])
    sims = (v @ v[0]) / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    sims[0] = -np.inf
    want_top = int(np.argmax(sims))
    got0 = got[(got.query_id == 0) & (got.rk == 1)]
    assert int(got0.neighbor_id.iloc[0]) == want_top


def test_lsh_topk_recall(spark):
    df, _ = _emb(spark, n=120)
    qs = df.filter("vec_id < 5")
    exact = knn.cosine_topk(df, qs, k=1).toPandas()
    approx = knn.lsh_cosine_topk(df, qs, dim=8, k=1, bits=6, tables=6).toPandas()
    e = exact.set_index("query_id").neighbor_id
    a = approx.set_index("query_id").neighbor_id
    # clustered data: LSH must recover the exact nearest for most queries
    hits = sum(int(e.get(q, -1) == a.get(q, -2)) for q in e.index)
    assert hits >= 4


def test_ivf_topk_recall_and_laws(spark):
    from har2tree_spark.ann import ivf

    df, _ = _emb(spark, n=120)
    qs = df.filter("vec_id < 5")
    exact = knn.cosine_topk(df, qs, k=1).toPandas()
    approx = ivf.ivf_topk(df, qs, k=1, n_centroids=12, nprobe=4).toPandas()
    e = exact.set_index("query_id").neighbor_id
    a = approx.set_index("query_id").neighbor_id
    # clustered data: probing 4 of 12 lists must recover most exact-1NN
    hits = sum(int(e.get(q, -1) == a.get(q, -2)) for q in e.index)
    assert hits >= 4
    full = ivf.ivf_topk(df, qs, k=3, n_centroids=12, nprobe=4).toPandas()
    # per-query ranks are 1..n without gaps, no self matches
    for q, g in full.groupby("query_id"):
        assert list(g.sort_values("rk").rk) == list(range(1, len(g) + 1))
        assert (g.neighbor_id != q).all()
    # deterministic
    again = ivf.ivf_topk(df, qs, k=3, n_centroids=12, nprobe=4).toPandas()
    assert full.sort_values(["query_id", "rk"]).values.tolist() == \
        again.sort_values(["query_id", "rk"]).values.tolist()


def test_embedding_neardup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = knn.embedding_neardup_pairs(df, dim=4, tau=0.99, bits=4, tables=8).toPandas()
    assert {(0, 1)} == set(map(tuple, got[["id_a", "id_b"]].to_numpy()))


def test_embedding_neardup_exact_duplicates_kept_by_default(spark):
    # the degenerate all-identical corpus: with the (opt-in) bucket cap
    # disabled by default, every pair must be reported, not silently dropped
    n = 12
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = knn.embedding_neardup_pairs(df, dim=4, tau=0.99, bits=4, tables=2)
    assert got.count() == n * (n - 1) // 2
    # opting into a cap smaller than the bucket drops the group entirely
    capped = knn.embedding_neardup_pairs(
        df, dim=4, tau=0.99, bits=4, tables=2, max_bucket=4
    )
    assert capped.count() == 0


def test_ann_on_driver_embeddings(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = df.limit(3)
    got = knn.cosine_topk(df, qs, k=5)
    assert got.count() == 15


def test_media_plumbing(spark):
    m = multimodal.synthesize_media(spark, 48)
    assert m.count() == 48
    f = multimodal.extract_features(m).toPandas()
    assert len(f) == 48
    assert all(len(v) == multimodal.FEATURE_DIM for v in f.feature)
    # deterministic: same id -> same feature
    f2 = multimodal.extract_features(multimodal.synthesize_media(spark, 48)).toPandas()
    a = [list(v) for v in f.sort_values("media_id").feature]
    b = [list(v) for v in f2.sort_values("media_id").feature]
    assert a == b
    frames = multimodal.sample_frames(m).toPandas()
    assert (frames.frame_ms % 5000 == 0).all()
    dd = multimodal.media_dedup(m)
    assert dd.count() == 48  # all payloads distinct


def test_media_decode_non_image_raises(spark):
    # synthesize_media payloads are md5-chain bytes, not PPM/BMP — the
    # real decoder (r6) rejects them as a codec failure would
    m = multimodal.synthesize_media(spark, 4)
    with pytest.raises(Exception, match="ValueError|unsupported image"):
        multimodal.extract_features(m, stub=False).collect()


# ---- real pure-numpy image decode (r5 VERDICT #5) -------------------------

def test_decode_image_ppm_roundtrip():
    import numpy as np

    from har2tree_spark.media import multimodal as mm

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert (mm.decode_image(mm.encode_ppm(px)) == px).all()
    # comment + multi-whitespace header grammar
    body = b"P6 # c\n# full comment line\n 3\t2\n255\n" + bytes(range(18))
    got = mm.decode_image(body)
    assert got.shape == (2, 3, 3) and got.reshape(-1).tolist() == list(range(18))
    import pytest as _pytest

    for bad in (b"", b"P6", b"P6\n3 2\n255\n" + b"\x00" * 17,
                b"P6\n0 2\n255\n", b"P6\nx 2\n255\n", b"P5\n1 1\n255\n\x00",
                b"\x89PNG\r\n\x1a\n"):
        with _pytest.raises(ValueError):
            mm.decode_image(bad)


def test_decode_image_bmp():
    import struct

    import numpy as np

    from har2tree_spark.media import multimodal as mm

    # hand-built 3x2 24-bit bottom-up BMP (stride 12 = 9 data + 3 pad)
    w, h = 3, 2
    stride = (w * 3 + 3) & ~3
    # pixel rows in FILE order = bottom row first, BGR
    top = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]  # RGB of the top row
    bot = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
    def row(px):
        return b"".join(bytes((b, g, r)) for r, g, b in px) + b"\x00" * (stride - 3 * w)
    pixdata = row(bot) + row(top)
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixdata), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixdata), 2835, 2835, 0, 0)
    got = mm.decode_image(header + dib + pixdata)
    assert got.shape == (2, 3, 3)
    assert [tuple(p) for p in got[0]] == top
    assert [tuple(p) for p in got[1]] == bot
    import pytest as _pytest

    # compressed (BI_RLE8 = 1) rejected
    dib_rle = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, 0, 0, 0, 0, 0)
    with _pytest.raises(ValueError):
        mm.decode_image(header + dib_rle + pixdata)


def test_extract_features_non_stub_end_to_end(spark):
    """stub=False really decodes: features are the pixel histogram of the
    decoded PPM, not the raw-payload histogram (header bytes excluded —
    asserted by constructing pixels whose histogram differs from the
    payload's)."""
    import numpy as np

    from har2tree_spark.media import multimodal as mm

    rng = np.random.default_rng(11)
    rows = []
    pixel_hists = {}
    for i in range(6):
        px = rng.integers(0, 256, size=(4 + i, 3, 3), dtype=np.uint8)
        payload = mm.encode_ppm(px)
        hist, _ = np.histogram(px.reshape(-1), bins=mm.FEATURE_DIM, range=(0, 256))
        pixel_hists[f"m{i}"] = hist.tolist()
        rows.append(("m" + str(i), "image", payload))
    df = spark.createDataFrame(
        rows, "media_id string, media_type string, payload binary"
    )
    got = {r.media_id: r for r in mm.extract_features(df, stub=False).collect()}
    for mid, want in pixel_hists.items():
        assert got[mid].hist == want
        v = np.array(got[mid].feature)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-6
    # and the stub path on the same frame differs (header bytes included)
    stub = {r.media_id: r for r in mm.extract_features(df, stub=True).collect()}
    assert any(stub[m].hist != pixel_hists[m] for m in pixel_hists)
