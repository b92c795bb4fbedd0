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
