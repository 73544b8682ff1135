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
