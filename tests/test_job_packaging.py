"""spark-submit packaging: the --py-files zip must mirror the package
source exactly — a stale archive means executors unpickle UDFs against
old module bytes (or hit ModuleNotFoundError for new modules)."""

import zipfile
from pathlib import Path

import job


def test_make_zip_matches_package_source(tmp_path):
    out = tmp_path / "pkg.zip"
    job.make_zip(str(out))
    pkg = Path(job.REPO) / "pii_redaction_pipeline_spark"
    src = {str(p.relative_to(job.REPO)): p for p in pkg.rglob("*.py")}
    with zipfile.ZipFile(out) as z:
        names = set(z.namelist())
        assert names == set(src), (
            f"zip/source drift: only-in-zip={names - set(src)}, "
            f"missing-from-zip={set(src) - names}")
        for name, p in src.items():
            assert z.read(name) == p.read_bytes(), f"stale bytes: {name}"


def test_zip_contains_all_imported_modules(tmp_path):
    """Every module the pipeline imports at run time must be in the
    archive (the round-1 stale zip was missing functions/langid.py)."""
    out = tmp_path / "pkg.zip"
    job.make_zip(str(out))
    with zipfile.ZipFile(out) as z:
        names = set(z.namelist())
    for mod in [
        "pii_redaction_pipeline_spark/core.py",
        "pii_redaction_pipeline_spark/pipeline.py",
        "pii_redaction_pipeline_spark/queries.py",
        "pii_redaction_pipeline_spark/functions/langid.py",
        "pii_redaction_pipeline_spark/functions/fuzzy_sql.py",
        "pii_redaction_pipeline_spark/sources/audio_dir.py",
    ]:
        assert mod in names, f"missing from --py-files zip: {mod}"


def test_stale_zip_refused_and_rebuilt(tmp_path, monkeypatch):
    """Submit-time guard: a doctored (stale) archive makes job.py refuse
    the run BEFORE any Spark work and rebuild the archive in place, so
    the next submit ships fresh bytes. A fresh archive passes silently."""
    import shutil

    import pytest

    shutil.copytree(Path(job.REPO) / "pii_redaction_pipeline_spark",
                    tmp_path / "pii_redaction_pipeline_spark")
    monkeypatch.setattr(job, "REPO", tmp_path)
    zp = tmp_path / job.PKG_ZIP
    job.make_zip(str(zp))
    assert job.zip_matches_source(str(zp))
    job.ensure_fresh_py_files(str(zp))  # fresh → no-op

    # doctor one module (round-1-style drift)
    victim = "pii_redaction_pipeline_spark/core.py"
    entries = {}
    with zipfile.ZipFile(zp) as z:
        for n in z.namelist():
            entries[n] = z.read(n)
    entries[victim] = b"# stale round-1 bytes\n"
    with zipfile.ZipFile(zp, "w") as z:
        for n, b in entries.items():
            z.writestr(n, b)
    assert not job.zip_matches_source(str(zp))

    with pytest.raises(SystemExit, match="stale --py-files"):
        job.ensure_fresh_py_files(str(zp))
    assert job.zip_matches_source(str(zp))  # rebuilt in place

    # main() refuses before touching Spark when the default zip is stale
    with zipfile.ZipFile(zp, "w") as z:
        for n, b in entries.items():
            z.writestr(n, b)
    with pytest.raises(SystemExit, match="stale --py-files"):
        job.main(["--input", "/nope", "--output", str(tmp_path / "o")])
    assert job.zip_matches_source(str(zp))


def test_bench_covers_whole_registry():
    """bench.py must time EVERY registry query (round-4 contract: the
    driver's BENCH_r{N}.json carries all 30 names), so a rename or an
    unbenched addition in queries.py fails here, not in the per-round
    bench run."""
    import bench

    from pii_redaction_pipeline_spark.queries import QUERIES

    assert set(bench.query_names()) == set(QUERIES)
    assert len(QUERIES) >= 30
