"""Planted-edge tests for the session-10 op batch: events_late_arrivals
(watermark/out-of-order census), BPE pair census + distributed merge
training, quantized k-means training, perceptual-hash media near-dup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(dirpath, name, table: pa.Table):
    pq.write_table(table, str(dirpath / f"{name}.parquet"))
    return str(dirpath)


def _ts(us):
    return pa.array(np.asarray(us, dtype=np.int64), pa.timestamp("us"))


class TestEventsLateArrivals:
    def test_planted_disorder(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import events_late_arrivals

        # user 1 arrival order (event_id): ts 100, 50, 500, 400 (seconds)
        #   e2: wm=100s, disorder 50s  -> disordered, NOT late (<=300s)
        #   e3: wm=100s, in order
        #   e4: wm=500s, disorder 100s -> disordered, not late
        # user 2: ts 1000, 100 -> disorder 900s -> late (>300s)
        # user 3: single event -> never disordered
        # NULL ts row and NULL user row excluded
        s = 1_000_000
        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 9], pa.int64()),
                "ts": _ts([100 * s, 50 * s, 500 * s, 400 * s, 1000 * s, 100 * s, 7 * s, 0, 8 * s]),
                "user_id": pa.array([1, 1, 1, 1, 2, 2, 3, 1, None], pa.int64()),
                "event_type": pa.array(["x"] * 9),
                "value": pa.array([1.0] * 9),
                "props": pa.array(["{}"] * 9),
            }
        )
        # null out the ts of event 8 (user 1) -> excluded
        ts = t.column("ts").to_pylist()
        ts[7] = None
        t = t.set_column(1, "ts", pa.array(ts, pa.timestamp("us")))
        sf = _write(tmp_path, "events", t)
        got = events_late_arrivals(sf).to_pandas().sort_values("user_id").set_index("user_id")
        assert got.loc[1].tolist() == [4, 2, 0, 100 * s]
        assert got.loc[2].tolist() == [2, 1, 1, 900 * s]
        assert got.loc[3].tolist() == [1, 0, 0, 0]


class TestBpe:
    def test_pair_census_closed_form(self, tmp_path, ray_session):
        from ocr_ray.ops.bpe import bpe_pair_census

        # corpus: "aa ab aa" + "ab" -> words: aa x2, ab x2
        # pairs: (a,a) x2, (a,b) x2 -> tie broken by pair asc: "aa" first
        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["aa ab aa", "ab"], pa.string()),
                "lang": pa.array(["en", "en"]),
                "source": pa.array(["s", "s"]),
                "n_chars": pa.array([8, 2], pa.int64()),
            }
        )
        sf = _write(tmp_path, "documents", t)
        got = bpe_pair_census(sf).to_pandas()
        assert got.iloc[0].tolist() == ["aa", 2]
        assert got.iloc[1].tolist() == ["ab", 2]

    def test_merges_match_reference(self, tmp_path, ray_session):
        from ocr_ray.ops.bpe import bpe_train_merges
        from tests.ref_bpe import ref_bpe_merges

        texts = [
            "the theme there then the",
            "other brother the mother",
            "aaa aaaa aa the",  # overlap runs: (a,a) merges left-to-right
            "ééé ééz the the",  # non-ASCII codepoints
            "",  # empty doc
        ]
        t = pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        )
        sf = _write(tmp_path, "documents", t)
        got = bpe_train_merges(sf, n_merges=8).to_pandas()
        want = ref_bpe_merges(" ".join(texts).split(), n_merges=8)
        assert [tuple(r) for r in got[["left", "right", "n"]].itertuples(index=False)] == want

    def test_merge_overlap_left_to_right(self, tmp_path, ray_session):
        from ocr_ray.ops.bpe import bpe_train_merges
        from tests.ref_bpe import ref_bpe_merges

        # "aaaaa": after merging (a,a) left-to-right -> [aa, aa, a]
        # next census must see (aa,aa)=1 and (aa,a)=1, NOT 4 overlapping
        t = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["aaaaa aaaaa"], pa.string()),
                "lang": pa.array(["en"]),
                "source": pa.array(["s"]),
                "n_chars": pa.array([11], pa.int64()),
            }
        )
        sf = _write(tmp_path, "documents", t)
        got = bpe_train_merges(sf, n_merges=3).to_pandas()
        want = ref_bpe_merges(["aaaaa", "aaaaa"], n_merges=3)
        assert [tuple(r) for r in got[["left", "right", "n"]].itertuples(index=False)] == want


class TestKmeans:
    def test_matches_reference_exactly(self, tmp_path, ray_session):
        from ocr_ray.ops.ann import embedding_kmeans_train
        from tests.ref_kmeans import ref_kmeans

        rng = np.random.RandomState(7)
        # three separated blobs in 8-d
        centers = np.array([[5, 0, 0, 0, 0, 0, 0, 0], [0, 5, 0, 0, 0, 0, 0, 0], [0, 0, 5, 0, 0, 0, 0, 0]], dtype=np.float64)
        pts = np.vstack([c + rng.randn(40, 8) * 0.3 for c in centers])
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(len(pts)), pa.int64()),
                "embedding": pa.array([r.astype(np.float32) for r in pts], pa.list_(pa.float32())),
                "label": pa.array(np.zeros(len(pts), dtype=np.int32), pa.int32()),
            }
        )
        sf = _write(tmp_path, "embeddings", t)
        got = (
            embedding_kmeans_train(sf, k=3, iters=4)
            .to_pandas()
            .sort_values("cluster_id")
            .reset_index(drop=True)
        )
        want = ref_kmeans(pts, k=3, iters=4)
        assert got["cluster_id"].tolist() == sorted(want.keys())
        for cid, (n, inertia) in want.items():
            row = got[got["cluster_id"] == cid].iloc[0]
            assert row["n_points"] == n
            assert row["inertia_e6"] == inertia

    def test_null_and_ragged_vectors_excluded(self, tmp_path, ray_session):
        from ocr_ray.ops.ann import embedding_kmeans_train

        t = pa.table(
            {
                "vec_id": pa.array([1, 2, 3, 4, None], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [0.9, 0.1], None, [0.0], [1.0, 0.0]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * 5, pa.int32()),
            }
        )
        sf = _write(tmp_path, "embeddings", t)
        got = embedding_kmeans_train(sf, k=1, iters=2).to_pandas()
        # only vec 1 and 2 qualify (NULL id / NULL vec / wrong-dim dropped;
        # dim = first VALID vector's length = 2)
        assert int(got["n_points"].sum()) == 2


class TestMediaPhash:
    def test_planted_similar_grids(self, ray_session):
        import ray.data as rd

        from ocr_ray.ops.multimodal import phash_cluster_over

        rng = np.random.RandomState(3)
        base = rng.randint(0, 256, size=(8, 8)).astype(np.uint8)
        near = base.copy()
        near[0, 0] = np.clip(int(near[0, 0]) + 4, 0, 255)  # tiny perturbation
        far = 255 - base  # inverted -> opposite hash
        rows = [
            {"media_id": 1, "pixels": base.ravel().tobytes(), "w": 8, "h": 8},
            {"media_id": 2, "pixels": near.ravel().tobytes(), "w": 8, "h": 8},
            {"media_id": 3, "pixels": far.ravel().tobytes(), "w": 8, "h": 8},
        ]
        ds = rd.from_items(rows)
        got = phash_cluster_over(ds).to_pandas().sort_values("media_id")
        g = dict(zip(got["media_id"], got["group_id"]))
        assert g[1] == g[2]  # near-identical grids cluster together
        assert g[3] != g[1]  # inverted image stays apart

    def test_full_op_runs(self, ray_session):
        from ocr_ray.ops.multimodal import media_phash_near_dup

        got = media_phash_near_dup("/root/testdata/sf0.001").to_pandas()
        assert {"media_id", "group_id", "is_canonical"} <= set(got.columns)
        assert len(got) > 0
