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


def test_py_files_uri_authority_forms(tmp_path, monkeypatch):
    """RFC 8089 file:// URIs: an empty or 'localhost' authority is THIS
    host — the guard must resolve the path and catch a stale archive
    (round-4 ADVICE: file://localhost/p/x.zip was rewritten to
    /localhost/p/x.zip, failed exists(), and silently BYPASSED the
    guard). Any other authority is remote → loud unverifiable warning,
    not a silent skip."""
    import shutil
    import warnings

    import pytest

    shutil.copytree(Path(job.REPO) / "pii_redaction_pipeline_spark",
                    tmp_path / "pii_redaction_pipeline_spark")
    monkeypatch.setattr(job, "REPO", tmp_path)
    zp = tmp_path / job.PKG_ZIP
    job.make_zip(str(zp))
    # doctor the archive stale
    entries = {}
    with zipfile.ZipFile(zp) as z:
        for n in z.namelist():
            entries[n] = z.read(n)
    entries["pii_redaction_pipeline_spark/core.py"] = b"# stale\n"
    with zipfile.ZipFile(zp, "w") as z:
        for n, b in entries.items():
            z.writestr(n, b)

    for uri in (f"file://{zp}", f"file://localhost{zp}"):
        with pytest.raises(SystemExit, match="stale --py-files"):
            job.ensure_fresh_py_files(uri)
        # the guard rebuilt it — re-doctor for the next form
        with zipfile.ZipFile(zp, "w") as z:
            for n, b in entries.items():
                z.writestr(n, b)

    # non-local authority → unverifiable warning, no exists()-bypass
    # (zip rebuilt fresh so the default-path check stays silent and the
    # warning is attributable to the URI entry alone)
    job.make_zip(str(zp))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        job.ensure_fresh_py_files(f"file://otherhost{zp}")
    assert any("cannot be verified" in str(x.message)
               and "otherhost" in str(x.message) for x in w)


def test_bench_covers_whole_registry():
    """bench.py must time EVERY registry query (round-4 contract: the
    driver's BENCH_r{N}.json carries all 30 names), so a rename or an
    unbenched addition in queries.py fails here, not in the per-round
    bench run."""
    import bench

    from pii_redaction_pipeline_spark.queries import QUERIES

    assert set(bench.query_names()) == set(QUERIES)
    assert len(QUERIES) >= 30


def test_bench_compact_summary_fits_driver_tail():
    """Round-5 contract: the driver keeps only a 2,000-char stdout TAIL,
    and round 4's all-inclusive JSON line overflowed it (BENCH_r04.json
    "parsed": null). The compact summary — built with the REAL registry
    names and worst-case-width walls — must parse and stay under the
    budget, and must point at the raw record file."""
    import json

    import bench

    from pii_redaction_pipeline_spark.queries import QUERIES

    names = sorted(QUERIES) + ["pipeline_full_text", "pipeline_with_audio",
                               "minhash_signatures_xxh"]
    record = {
        "metric": "filter_scrub_pipeline_wall",
        "value": 123.456,
        "unit": "sec",
        "queries": {n: 123.456 for n in names},
        "raw": {n: [123.456] * 3 for n in names},  # must NOT leak through
        "canary": {"start": {"jvm_sum": 0.345, "parquet_scan": 0.321},
                   "end": {"jvm_sum": 0.345, "parquet_scan": 0.321},
                   "nominal_idle": bench.CANARY_NOMINAL,
                   "ratio_vs_nominal": 12.34},
        "sf": "/root/testdata/sf0.1",
        "n_clips": 100000,
        "clips_per_sec": 69252.1,
        "cpus": 32,
        "stamp": "20260817-000000",
        "raw_record": "BENCH/bench-20260817-000000.json",
    }
    line = bench.compact_summary(record)
    assert len(line) < bench.SUMMARY_MAX_CHARS
    parsed = json.loads(line)
    assert parsed["metric"] == "filter_scrub_pipeline_wall"
    assert parsed["value"] == 123.456
    assert parsed["clips_per_sec"] == 69252.1
    assert "raw" not in parsed  # raw arrays live only in the file
    assert set(parsed["queries"]) == set(names)
    assert parsed["raw_record"].startswith("BENCH/bench-")
    assert parsed["canary"]["nominal_idle"] == bench.CANARY_NOMINAL
