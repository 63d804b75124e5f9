"""Tests: read API (§3.2), multimodal plumbing, per-triplet clustering (M6)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from imgfact_spark.api import ImgFactDataset
from imgfact_spark.multimodal import extract_features, sample_frames, synth_media
from imgfact_spark.operators.clustering import cluster_representatives


def _groundings(spark):
    rows = [
        ("A", "rel1", "B", "img://x/rel1/A B/0.jpg", 0.9, 1),
        ("A", "rel1", "B", "img://x/rel1/A B/1.jpg", 0.8, 2),
        ("A", "rel2", "C", "img://x/rel2/A C/0.jpg", 0.7, 1),
        ("D", "rel1", "B", "img://x/rel1/D B/0.jpg", 0.6, 1),
    ]
    return spark.createDataFrame(
        rows, "s string, p string, o string, media_ref string, score double, rank int"
    )


def test_api_vocab_and_retrievals(spark):
    ds = ImgFactDataset(_groundings(spark))
    ents = {r["entity"] for r in ds.load_entities().collect()}
    assert ents == {"A", "B", "C", "D"}
    rels = {r["p"] for r in ds.load_relations().collect()}
    assert rels == {"rel1", "rel2"}

    by_head = ds.retrieve_img_from_entity(head="A").collect()
    assert len(by_head) == 3
    by_pair = ds.retrieve_img_from_entity(head="A", tail="B").collect()
    assert len(by_pair) == 2
    by_rel = ds.retrieve_img_from_relation("rel1").collect()
    assert len(by_rel) == 3
    exact = ds.retrieve_img_from_triplet("A", "rel1", "B").collect()
    assert {r["media_ref"] for r in exact} == {
        "img://x/rel1/A B/0.jpg",
        "img://x/rel1/A B/1.jpg",
    }
    counts = {
        (r["s"], r["p"], r["o"]): r["n_images"]
        for r in ds.triplet_image_counts().collect()
    }
    assert counts[("A", "rel1", "B")] == 2


def test_multimodal_feature_extraction(spark):
    refs = _groundings(spark).select("media_ref").distinct()
    media = synth_media(spark, refs)
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 4
    for r in rows:
        assert len(r["features"]) == 16
    # deterministic across invocations
    again = {r["media_ref"]: r["features"] for r in extract_features(media, dim=16).collect()}
    for r in rows:
        assert again[r["media_ref"]] == r["features"]


def test_multimodal_frame_sampling(spark):
    refs = spark.createDataFrame([("v1",)], "media_ref string")
    media = synth_media(spark, refs).withColumn(
        "meta",
        F.struct(
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.lit(10).alias("n_frames"), F.lit(0).alias("sample_rate"),
        ),
    )
    frames = sample_frames(media, every_n=3).collect()
    assert sorted(r["frame_no"] for r in frames) == [0, 3, 6, 9]


def test_cluster_representatives(spark):
    # triplet T: 4 images — two visual clusters (two near-identical pairs)
    base_a = np.ones(8)
    base_b = np.concatenate([np.ones(4) * -1, np.ones(4)])
    feats = {
        "i0": base_a, "i1": base_a * 1.01,           # cluster 1
        "i2": base_b, "i3": base_b * 0.99,           # cluster 2
    }
    g = spark.createDataFrame(
        [("A", "r", "B", k, 1.0 - 0.1 * i) for i, k in enumerate(["i0", "i1", "i2", "i3"])],
        "s string, p string, o string, media_ref string, score double",
    )
    f = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in feats.items()],
        "media_ref string, features array<float>",
    )
    kept = cluster_representatives(g, f, eps=0.25).collect()
    # one representative per cluster, best score first
    refs = sorted(r["media_ref"] for r in kept)
    assert refs == ["i0", "i2"]
    for r in kept:
        assert r["cluster_size"] == 2


def test_cluster_diagnostics_silhouette_and_deleted(spark):
    """A10: n_clusters / n_deleted / silhouette vs an independent
    brute-force silhouette oracle (cluster.py:115-124,169-182)."""
    base_a = np.ones(8)
    base_b = np.concatenate([np.ones(4) * -1, np.ones(4)])
    feats = {
        "i0": base_a, "i1": base_a * 1.01,
        "i2": base_b, "i3": base_b * 0.99,
        "i4": base_b * 1.02,
    }
    g = spark.createDataFrame(
        [("A", "r", "B", k, 1.0 - 0.1 * i) for i, k in enumerate(sorted(feats))],
        "s string, p string, o string, media_ref string, score double",
    )
    f = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in feats.items()],
        "media_ref string, features array<float>",
    )
    kept = cluster_representatives(g, f, eps=0.25).collect()
    assert all(r["n_clusters"] == 2 for r in kept)
    assert all(r["n_deleted"] == 5 - 2 for r in kept)

    # independent silhouette oracle: euclidean, size-1 clusters score 0
    order = sorted(feats, key=lambda k: (-round(1.0 - 0.1 * sorted(feats).index(k), 9), k))
    # features are stored as array<float> → quantize through float32 first
    X = np.vstack([feats[k] for k in order]).astype("float32").astype("float64")
    labels = np.array([0 if k in ("i0", "i1") else 1 for k in order])
    import itertools

    def d(a, b):
        return float(np.linalg.norm(X[a] - X[b]))

    svals = []
    for i in range(len(order)):
        same = [j for j in range(len(order)) if labels[j] == labels[i] and j != i]
        if not same:
            svals.append(0.0)
            continue
        a = sum(d(i, j) for j in same) / len(same)
        b = min(
            sum(d(i, j) for j in range(len(order)) if labels[j] == c)
            / sum(1 for j in range(len(order)) if labels[j] == c)
            for c in set(labels) - {labels[i]}
        )
        svals.append((b - a) / max(a, b))
    expected = sum(svals) / len(svals)
    got = kept[0]["silhouette"]
    assert abs(got - expected) < 1e-9


def test_cluster_diagnostics_degenerate_silhouette_nan(spark):
    """One cluster (all identical) → silhouette is NaN, matching the
    reference's guard that skips silhouette_score."""
    g = spark.createDataFrame(
        [("A", "r", "B", f"m{i}", 1.0) for i in range(3)],
        "s string, p string, o string, media_ref string, score double",
    )
    f = spark.createDataFrame(
        [(f"m{i}", [1.0] * 4) for i in range(3)],
        "media_ref string, features array<float>",
    )
    kept = cluster_representatives(g, f, eps=0.25).collect()
    assert len(kept) == 1 and kept[0]["n_clusters"] == 1
    # pandas NaN converts to SQL NULL on the Arrow boundary
    assert kept[0]["silhouette"] is None


def test_cluster_representatives_partition_invariant(spark):
    rng = np.random.RandomState(3)
    feats = rng.standard_normal((12, 8))
    g = spark.createDataFrame(
        [("A", "r", "B", f"m{i}", float(rng.rand())) for i in range(12)],
        "s string, p string, o string, media_ref string, score double",
    )
    f = spark.createDataFrame(
        [(f"m{i}", [float(x) for x in feats[i]]) for i in range(12)],
        "media_ref string, features array<float>",
    )
    a = sorted(map(tuple, cluster_representatives(g, f, eps=0.4).collect()))
    b = sorted(
        map(tuple, cluster_representatives(g.repartition(5), f.repartition(3), eps=0.4).collect())
    )
    assert a == b


def test_alias_map_lsh_merges_near_dup_names(spark):
    """LSH alias path (canonicalize.alias_map with_lsh=True): typo/qualifier
    variants that survive normalization cluster into one component."""
    from imgfact_spark.pipeline.canonicalize import alias_map

    ents = spark.createDataFrame(
        [
            ("Barcelona_Football_Club",),
            ("Barcelona_Football_Club_(es)",),   # normalization edge
            ("Barcelona_Footbal_Club",),         # typo → LSH edge only
            ("Completely_Different_Entity",),
        ],
        "entity string",
    )
    am = {r["entity"]: r["canonical"] for r in alias_map(ents, with_lsh=True).collect()}
    assert (
        am["Barcelona_Football_Club"]
        == am["Barcelona_Football_Club_(es)"]
        == am["Barcelona_Footbal_Club"]
    )
    assert am["Completely_Different_Entity"] != am["Barcelona_Football_Club"]


def test_pipeline_lsh_alias_mode_runs(spark, tmp_path):
    """use_lsh_aliases=True end-to-end still produces the same triples on a
    corpus whose aliases are all normalization-resolvable."""
    from imgfact_spark import synth
    from imgfact_spark.io import TableStore
    from imgfact_spark.pipeline.runner import PipelineConfig, run_pipeline

    docs = synth.synth_documents(spark, 60)
    kb = synth.kb_df(spark)
    ents = kb.selectExpr("s as entity").union(kb.selectExpr("o as entity")).distinct()
    r2d = synth.rel2desc_df(spark)
    base = run_pipeline(
        spark, docs, r2d, ents, TableStore(str(tmp_path / "a")),
        PipelineConfig(checkpoint="final"), input_fingerprint="lsh:60",
    )
    lsh = run_pipeline(
        spark, docs, r2d, ents, TableStore(str(tmp_path / "b")),
        PipelineConfig(checkpoint="final", use_lsh_aliases=True),
        input_fingerprint="lsh:60",
    )
    a = sorted(map(tuple, base.kg_triples.select("s", "p", "o").collect()))
    b = sorted(map(tuple, lsh.kg_triples.select("s", "p", "o").collect()))
    assert a == b


# ---------------------------------------------------------------------------
# decoder injection: a REAL format (binary PPM) through the same plumbing
# ---------------------------------------------------------------------------


def _ppm_bytes(w: int, h: int, seed: int) -> bytes:
    import numpy as np

    raster = np.random.RandomState(seed).randint(
        0, 256, size=w * h * 3, dtype=np.uint16
    ).astype(np.uint8)
    return b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + raster.tobytes()


def test_decode_ppm_roundtrip_and_corruption():
    import numpy as np
    import pytest

    from imgfact_spark.multimodal import decode_ppm

    payload = _ppm_bytes(5, 3, seed=1)
    img = decode_ppm(payload)
    assert img.shape == (3, 5, 3) and img.dtype == np.uint8
    assert img.tobytes() == payload[-45:]
    for bad in (
        None, b"JFIF....", payload[:-1],
        b"P6\n5 3\n70000\n" + b"x" * 45,
        b"P6\n0 0\n255\n",  # zero-size header must fail here, not later
    ):
        with pytest.raises(ValueError):
            decode_ppm(bad)


def test_extract_features_with_injected_ppm_decoder(spark):
    """A caller-supplied REAL decoder (pure-numpy PPM) runs end-to-end
    through the same mapInPandas plumbing, matching a driver-side numpy
    twin of decode→fit→project — the Pillow swap point, proven without
    Pillow."""
    import numpy as np

    from imgfact_spark.multimodal import (
        MEDIA_SCHEMA,
        _to_model_input,
        decode_ppm,
        extract_features,
    )

    rows = [
        (f"ppm/{i}", "image", _ppm_bytes(16 + i, 12 + i, seed=i),
         {"width": 16 + i, "height": 12 + i, "n_frames": 1, "sample_rate": 0})
        for i in range(6)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_ref"]: np.array(r["features"], dtype="float32")
        for r in extract_features(media, dim=16, decode_fn=decode_ppm).collect()
    }
    planes = np.random.RandomState(42).standard_normal((8 * 8 * 3, 16))
    for ref, _, payload, _ in rows:
        fit = _to_model_input(decode_ppm(payload))
        assert fit.shape == (8, 8, 3)
        want = (fit.reshape(-1).astype("float64") / 255.0) @ planes
        assert np.allclose(got[ref], want.astype("float32"), rtol=1e-6)


def test_stub_decode_passthrough_unchanged(spark):
    """The 8×8×3 stub output passes _to_model_input byte-identically, so
    injecting nothing keeps the md5-oracle features bit-for-bit (the
    mm_extract_features driver contract)."""
    import numpy as np

    from imgfact_spark.multimodal import _stub_decode, _to_model_input

    payload = b"0123456789abcdef" * 8
    img = _stub_decode(payload)
    assert _to_model_input(img).tobytes() == img.tobytes()
