"""JSON sidecar extraction stage (stages/semistructured.py)."""

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
class TestJsonPathExtract:
    def _ds(self):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                    "props": [
                        '{"k": 7, "tag": "a"}',
                        '{"k": -3}',
                        None,
                        '{"other": 1}',
                        "not json at all",
                    ],
                }
            )
        )

    def test_int_extraction_null_safe(self):
        from vigil_ray.stages.semistructured import json_path_extract

        out = json_path_extract(self._ds(), "props", "$.k", "k", pa.int64())
        rows = {r["id"]: r["k"] for r in out.take_all()}
        assert rows == {0: 7, 1: -3, 2: None, 3: None, 4: None}
        assert dict(zip(out.schema().names, out.schema().types))["k"] == pa.int64()

    def test_string_extraction(self):
        from vigil_ray.stages.semistructured import json_path_extract

        out = json_path_extract(self._ds(), "props", "$.tag", "tag", None)
        rows = {r["id"]: r["tag"] for r in out.take_all()}
        assert rows[0] == "a" and rows[1] is None and rows[4] is None

    def test_rejects_non_numeric_dtype(self):
        from vigil_ray.stages.semistructured import json_path_extract

        with pytest.raises(ValueError):
            json_path_extract(self._ds(), "props", "$.k", "k", pa.list_(pa.int64()))
