"""ANN operator tests: brute-force exactness and IVF recall."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestAnn:
    @pytest.fixture(scope="class")
    def emb(self):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/embeddings.parquet")
        ids = np.asarray(t.column("vec_id").to_pylist())
        mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return ids, mat

    def _truth_topk(self, emb, k=10):
        ids, mat = emb
        q = mat[list(ids).index(0)]
        cos = mat @ q
        order = np.lexsort((ids, -cos))
        return [int(ids[i]) for i in order[:k]]

    def test_brute_force_matches_numpy(self, emb):
        from vigil_ray.sources.readers import read_table
        from vigil_ray.stages.ann import brute_force_topk

        ids, mat = emb
        q = mat[list(ids).index(0)]
        ds = read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        out = brute_force_topk(ds, q, k=10).to_pandas()
        assert out["vec_id"].tolist() == self._truth_topk(emb)

    def test_ivf_recall(self, emb):
        from vigil_ray.sources.readers import read_table
        from vigil_ray.stages.ann import ivf_topk

        ids, mat = emb
        q = mat[list(ids).index(0)]
        ds = read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        out = ivf_topk(ds, q, k=10, n_cells=16, n_probe=4).to_pandas()
        truth = set(self._truth_topk(emb))
        recall = len(truth & set(out["vec_id"])) / len(truth)
        assert recall >= 0.7, recall

    def test_ivf_deterministic(self, emb):
        from vigil_ray.sources.readers import read_table
        from vigil_ray.stages.ann import ivf_topk

        ids, mat = emb
        q = mat[list(ids).index(0)]
        runs = []
        for _ in range(2):
            ds = read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
            runs.append(ivf_topk(ds, q, k=10).to_pandas()["vec_id"].tolist())
        assert runs[0] == runs[1]

    def test_kmeans_deterministic(self, emb):
        from vigil_ray.stages.ann import kmeans_fit

        _, mat = emb
        a = kmeans_fit(mat[:200], 8)
        b = kmeans_fit(mat[:200], 8)
        assert np.array_equal(a, b)


class TestPersistedIVF:
    def test_build_query_recall_and_reuse(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from vigil_ray.stages.ann import brute_force_topk, ivf_build, ivf_query

        sf = "/root/testdata/sf0.001"
        emb = pq.read_table(f"{sf}/embeddings.parquet")
        q = np.asarray(emb.column("embedding")[0].as_py(), dtype=np.float64)
        idx_dir = str(tmp_path / "ivf")

        ds = rd.read_parquet(f"{sf}/embeddings.parquet")
        ivf_build(ds, idx_dir, n_cells=16)
        got = set(ivf_query(idx_dir, q, k=10, n_probe=4).to_pandas()["vec_id"])
        truth = set(
            brute_force_topk(rd.read_parquet(f"{sf}/embeddings.parquet"), q, k=10)
            .to_pandas()["vec_id"]
        )
        recall = len(got & truth) / len(truth)
        assert recall >= 0.7, recall

        # reuse: second build call is a no-op (idempotent), second query
        # returns identical ids
        ivf_build(ds, idx_dir, n_cells=16)
        again = set(ivf_query(idx_dir, q, k=10, n_probe=4).to_pandas()["vec_id"])
        assert again == got

    def test_build_compacts_cells(self, ray_session, tmp_path):
        """Each cell partition holds 1-2 files regardless of how many write
        tasks fed the build: the pre-write cell sort co-locates each cell's
        rows (unsorted, every write-task × cell combination emits its own
        tiny file and per-file open overhead erases the IO-pruning win —
        measured in BASELINE.md's ANN scale probe)."""
        import os
        import ray.data as rd

        from vigil_ray.stages.ann import ivf_build

        sf = "/root/testdata/sf0.001"
        idx_dir = str(tmp_path / "ivf")
        # many input blocks → many write tasks without the sort
        ds = rd.read_parquet(f"{sf}/embeddings.parquet", override_num_blocks=16)
        ivf_build(ds, idx_dir, n_cells=8)
        cell_dirs = [d for d in os.listdir(idx_dir) if d.startswith("cell=")]
        assert cell_dirs
        for d in cell_dirs:
            files = [
                f
                for f in os.listdir(os.path.join(idx_dir, d))
                if f.endswith(".parquet")
            ]
            assert 1 <= len(files) <= 2, (d, files)

    def test_fingerprint_invalidates_stale_index(self, ray_session, tmp_path):
        """Regenerated source data (different fingerprint) forces a rebuild
        instead of silently serving the stale cached index."""
        import os
        import ray.data as rd

        from vigil_ray.stages.ann import ivf_build

        sf = "/root/testdata/sf0.001"
        idx_dir = str(tmp_path / "ivf")
        ds = rd.read_parquet(f"{sf}/embeddings.parquet")
        ivf_build(ds, idx_dir, n_cells=16, fingerprint="fp_v1")
        done = os.path.join(idx_dir, "_DONE")
        first_mtime = os.stat(done).st_mtime_ns
        # same fingerprint → reuse (marker untouched)
        ivf_build(ds, idx_dir, n_cells=16, fingerprint="fp_v1")
        assert os.stat(done).st_mtime_ns == first_mtime
        # changed fingerprint → rebuild (marker rewritten with the new stamp)
        ivf_build(ds, idx_dir, n_cells=16, fingerprint="fp_v2")
        with open(done) as f:
            assert f.read() == "fp_v2"

    def test_query_skips_empty_cells(self, ray_session, tmp_path):
        """An empty probed cell must not shrink the probe budget or crash:
        ivf_query probes the nearest NON-EMPTY cells."""
        import numpy as np
        import os
        import shutil
        import pyarrow.parquet as pq
        import ray.data as rd

        from vigil_ray.stages.ann import ivf_build, ivf_query

        sf = "/root/testdata/sf0.001"
        emb = pq.read_table(f"{sf}/embeddings.parquet")
        q = np.asarray(emb.column("embedding")[0].as_py(), dtype=np.float64)
        idx_dir = str(tmp_path / "ivf")
        ivf_build(rd.read_parquet(f"{sf}/embeddings.parquet"), idx_dir, n_cells=16)
        # empty out the query's nearest cell and verify the query still
        # returns k rows (probing the next-nearest populated cells)
        from vigil_ray.stages.ann import _load_centroids

        cents = _load_centroids(idx_dir)
        qn = q / np.linalg.norm(q)
        nearest = int(np.argmax(cents @ qn))
        target = os.path.join(idx_dir, f"cell={nearest}")
        if os.path.isdir(target):
            shutil.rmtree(target)
        out = ivf_query(idx_dir, q, k=10, n_probe=4).to_pandas()
        assert len(out) == 10

    def test_index_if_valid_probe(self, ray_session, tmp_path):
        """ivf_index_if_valid is a pure existence+stamp probe: False when
        absent or stale, True after a matching build — and it never builds."""
        import os
        import ray.data as rd

        from vigil_ray.stages.ann import ivf_build, ivf_index_if_valid

        idx_dir = str(tmp_path / "ivf")
        assert not ivf_index_if_valid(idx_dir, "fp_v1")
        assert not os.path.exists(idx_dir)  # probing must not create anything
        sf = "/root/testdata/sf0.001"
        ivf_build(
            rd.read_parquet(f"{sf}/embeddings.parquet"), idx_dir,
            n_cells=8, fingerprint="fp_v1",
        )
        assert ivf_index_if_valid(idx_dir, "fp_v1")
        assert not ivf_index_if_valid(idx_dir, "fp_v2")  # stale stamp

    def test_q_ann_ivf_top10_routes_through_persisted_index(
        self, ray_session, tmp_path, monkeypatch
    ):
        """Routing contract: cold (no valid index) serves via the in-flight
        scan WITHOUT building; once a persisted index exists for the corpus
        fingerprint, the same query reads through ivf_query instead."""
        import vigil_ray.queries as Q
        import vigil_ray.stages.ann as ann

        sf = "/root/testdata/sf0.001"
        monkeypatch.setattr(Q, "_ivf_index_dir", lambda _sf: str(tmp_path / "ivf"))
        calls = []
        real_topk, real_query = ann.ivf_topk, ann.ivf_query

        monkeypatch.setattr(
            ann, "ivf_topk",
            lambda *a, **k: (calls.append("cold"), real_topk(*a, **k))[1],
        )
        monkeypatch.setattr(
            ann, "ivf_query",
            lambda *a, **k: (calls.append("warm"), real_query(*a, **k))[1],
        )
        out = Q.q_ann_ivf_top10(sf).to_pandas()
        assert calls == ["cold"] and bool(out["recall_ok"][0])
        import os

        assert not os.path.exists(str(tmp_path / "ivf"))  # cold path: no build
        Q._persisted_ivf(sf)  # the indexing job (uses the patched dir)
        calls.clear()
        out2 = Q.q_ann_ivf_top10(sf).to_pandas()
        assert calls == ["warm"] and bool(out2["recall_ok"][0])

    def test_query_raises_when_no_cells(self, ray_session, tmp_path):
        import numpy as np
        import os
        import shutil
        import ray.data as rd
        import pytest as _pytest

        from vigil_ray.stages.ann import ivf_build, ivf_query

        sf = "/root/testdata/sf0.001"
        idx_dir = str(tmp_path / "ivf")
        ivf_build(rd.read_parquet(f"{sf}/embeddings.parquet"), idx_dir, n_cells=8)
        for d in os.listdir(idx_dir):
            if d.startswith("cell="):
                shutil.rmtree(os.path.join(idx_dir, d))
        with _pytest.raises(FileNotFoundError):
            ivf_query(idx_dir, np.ones(64), k=10, n_probe=4)

    def test_query_reads_only_probed_partitions(self, ray_session, tmp_path):
        """The scale property: probed-cell dirs only, not the whole index."""
        import numpy as np
        import os
        import pyarrow.parquet as pq
        import ray.data as rd

        from vigil_ray.stages.ann import _load_centroids, ivf_build

        sf = "/root/testdata/sf0.001"
        idx_dir = str(tmp_path / "ivf")
        ivf_build(rd.read_parquet(f"{sf}/embeddings.parquet"), idx_dir, n_cells=16)
        cells = [d for d in os.listdir(idx_dir) if d.startswith("cell=")]
        assert len(cells) > 4  # partitioned layout exists
        cents = _load_centroids(idx_dir)
        assert cents.shape[0] == 16
