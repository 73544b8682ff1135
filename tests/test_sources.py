"""Source tests: tolerant CSV/JSON readers, pages synthesis invariants,
byte-sized parquet reads."""

import json

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestTextSources:
    def test_csv_utf8(self, tmp_path):
        from vigil_ray.sources.textfiles import read_csv_tolerant

        p = tmp_path / "docs.csv"
        p.write_text("id,texto\n1,José da Conceição\n2,plain\n", encoding="utf-8")
        ds = read_csv_tolerant(str(p))
        rows = ds.take_all()
        assert rows[0]["texto"] == "José da Conceição"

    def test_csv_latin1_fallback(self, tmp_path):
        from vigil_ray.sources.textfiles import read_csv_tolerant

        p = tmp_path / "legacy.csv"
        p.write_bytes("id,texto\n1,José\n".encode("latin-1"))
        ds = read_csv_tolerant(str(p))
        assert ds.take_all()[0]["texto"] == "José"

    def test_json_shapes(self, tmp_path):
        from vigil_ray.sources.textfiles import read_json_records

        arr = tmp_path / "a.json"
        arr.write_text(json.dumps([{"ID": 1, "texto": "x"}]))
        assert read_json_records(str(arr)).count() == 1

        for key in ("registros", "data", "resultados"):
            p = tmp_path / f"k_{key}.json"
            p.write_text(json.dumps({key: [{"ID": 1}, {"ID": 2}]}))
            assert read_json_records(str(p)).count() == 2

    def test_json_bad_shape(self, tmp_path):
        from vigil_ray.sources.textfiles import read_json_records

        p = tmp_path / "bad.json"
        p.write_text(json.dumps({"other": 1}))
        with pytest.raises(ValueError, match="unsupported JSON shape"):
            read_json_records(str(p))


class TestPagesSynthesis:
    def test_deterministic(self):
        from vigil_ray.sources.pages import synthesize_pages

        a = synthesize_pages(SF)
        b = synthesize_pages(SF)
        assert a.equals(b)

    def test_idempotent_cache(self, tmp_path):
        from vigil_ray.sources.pages import synthesize_pages

        out = str(tmp_path / "pages.parquet")
        a = synthesize_pages(SF, out_path=out)
        b = synthesize_pages(SF, out_path=out)  # second call reads the file
        assert a.equals(b)

    def test_stale_cache_rebuilt_on_stamp_mismatch(self, tmp_path):
        """A same-path cache from a DIFFERENT synthesis input (here: another
        multiplier — same effect as a regenerated documents.parquet) must be
        rebuilt: validity lives in the file's embedded source stamp, not in
        the caller's path naming."""
        from vigil_ray.sources.pages import synthesize_pages

        out = str(tmp_path / "pages.parquet")
        synthesize_pages(SF, multiplier=2, out_path=out)
        fresh = synthesize_pages(SF, multiplier=1, out_path=out)
        assert fresh.num_rows == 500  # not the stale 1000-row cache
        again = synthesize_pages(SF, multiplier=1, out_path=out)
        assert fresh.equals(again)  # and the rebuilt cache is served warm

    def test_multiplier_distinct_keys(self):
        from vigil_ray.sources.pages import synthesize_pages

        t = synthesize_pages(SF, multiplier=3)
        urls = t.column("url").to_pylist()
        assert len(urls) == len(set(urls)) == 1500

    def test_row_groups_enable_parallel_reads(self, tmp_path):
        import pyarrow.parquet as pq

        from vigil_ray.sources.pages import synthesize_pages

        out = str(tmp_path / "pages.parquet")
        synthesize_pages(SF, multiplier=20, out_path=out)
        meta = pq.read_metadata(out)
        assert meta.num_row_groups >= 2  # single-row-group file = serial read


@pytest.mark.usefixtures("ray_session")
def test_read_table_small_file_one_block():
    from vigil_ray.sources.readers import read_table

    ds = read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    # 65 KB file → 1 block: downstream shuffles stay trivial
    assert ds.materialize().num_blocks() == 1


def test_read_xlsx_gated_on_engine():
    """S1 shim: with no xlsx engine installed the error names the dependency;
    with one installed the reader delegates to pandas.read_excel."""
    import pytest

    from vigil_ray.sources.textfiles import read_xlsx

    try:
        import openpyxl  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="openpyxl"):
            read_xlsx("/tmp/nonexistent.xlsx")
    else:  # pragma: no cover - env-dependent
        with pytest.raises(FileNotFoundError):
            read_xlsx("/tmp/nonexistent.xlsx")


def test_ner_stage_resource_plumbing():
    """cfg.ner_num_gpus/ner_num_cpus must reach map_batches (SURVEY §2.4 T1)."""
    from vigil_ray.config import PipelineConfig
    from vigil_ray.stages.ner import ner_detect_stage

    class FakeDS:
        kw = None

        def map_batches(self, *a, **kw):
            self.kw = kw
            return self

    ds = FakeDS()
    ner_detect_stage(ds, PipelineConfig(use_ner=True, ner_num_gpus=0.25, ner_num_cpus=2.0))
    assert ds.kw["num_gpus"] == 0.25
    assert ds.kw["num_cpus"] == 2.0

    ds2 = FakeDS()
    ner_detect_stage(ds2, PipelineConfig(use_ner=True))
    assert "num_gpus" not in ds2.kw and ds2.kw["num_cpus"] == 1.0
