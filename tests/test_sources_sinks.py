"""Directory audio source (S1), deid JSON sink shape (S4/S5), and the
flag-gated bleep operator end-to-end."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from pii_redaction_pipeline_spark import datagen
from pii_redaction_pipeline_spark.functions.audio import (
    decode_wav_bytes,
    with_bleeped_audio,
)
from pii_redaction_pipeline_spark.pipeline import (
    PipelineConfig,
    apply_pipeline,
    deid_json_df,
)
from pii_redaction_pipeline_spark.sources.audio_dir import read_audio_dir


def test_read_audio_dir(spark, tmp_path):
    pdf = datagen.clips_pandas(12, seed=4)
    for row in pdf.itertuples():
        if row.codec == "wav":
            (tmp_path / f"{row.clip_id}.wav").write_bytes(row.bytes)
    # a non-audio file that must be ignored
    (tmp_path / "notes.txt").write_text("ignore me")
    transcripts = spark.createDataFrame(
        pdf[["clip_id", "transcript"]])
    clips = read_audio_dir(spark, str(tmp_path), transcripts)
    rows = {r["clip_id"]: r for r in clips.collect()}
    expected = {r.clip_id for r in pdf.itertuples() if r.codec == "wav"}
    assert set(rows) == expected
    for row in pdf.itertuples():
        if row.codec != "wav":
            continue
        r = rows[row.clip_id]
        assert r["sr_hz"] == row.sr_hz
        assert abs(r["dur_ms"] - row.dur_ms) <= 1
        assert r["codec"] == "wav"
        assert r["transcript"] == row.transcript
        assert bytes(r["bytes"]) == bytes(row.bytes)


def test_deid_json_sink(spark):
    clips = datagen.clips_df(spark, 30, seed=6, partitions=2,
                             with_audio=False)
    res = apply_pipeline(clips, PipelineConfig(with_audio_verify=False,
                                               with_ppl=False))
    rows = deid_json_df(res).collect()
    assert len(rows) == 30
    doc = json.loads(rows[0]["deid_json"])
    assert {"conversation_id", "original_text", "redacted_text",
            "pii_count"} <= set(doc)


def test_bleep_operator_end_to_end(spark):
    clips = datagen.clips_df(spark, 60, seed=8, partitions=2)
    clips = clips.where("codec = 'wav' AND dur_ms > 1200").limit(8)
    spans = F.array(F.struct(F.lit(0.2).alias("start_s"),
                             F.lit(0.5).alias("end_s")))
    df = with_bleeped_audio(clips.withColumn("bleep_spans", spans))
    rows = df.select("clip_id", "bytes", "bleeped_bytes", "sr_hz").collect()
    assert rows
    for r in rows:
        assert bytes(r["bleeped_bytes"]) != bytes(r["bytes"])
        pcm, sr = decode_wav_bytes(bytes(r["bleeped_bytes"]))
        orig, _ = decode_wav_bytes(bytes(r["bytes"]))
        assert len(pcm) == len(orig)
        # 1 kHz tone occupies the padded span [0.05, 0.65]
        seg = pcm[int(0.2 * sr):int(0.5 * sr)]
        assert np.max(np.abs(seg)) > 0.3
        # far outside the padded+min-bleep region the audio is unchanged
        tail = slice(int(0.9 * sr), len(orig))
        assert np.allclose(pcm[tail], orig[tail], atol=1e-4)


def test_bleep_passthrough_without_spans(spark):
    clips = datagen.clips_df(spark, 6, seed=8, partitions=2)
    df = with_bleeped_audio(
        clips.withColumn(
            "bleep_spans",
            F.expr("CAST(array() AS array<struct<start_s:double,end_s:double>>)")))
    for r in df.select("bytes", "bleeped_bytes").collect():
        assert bytes(r["bleeped_bytes"]) == bytes(r["bytes"])


def test_ascii_report(spark):
    """Visualizer analog (reference scripts/visualize_results.py): report
    renders from the results table with status + category charts."""
    from pii_redaction_pipeline_spark.pipeline import PipelineConfig, apply_pipeline
    from pii_redaction_pipeline_spark.report import processing_report, transcript_view

    clips = datagen.clips_df(spark, 80, seed=21, partitions=4, with_audio=False)
    results = apply_pipeline(clips, PipelineConfig(with_audio_verify=False,
                                                   with_ppl=False))
    rep = processing_report(results)
    assert "VERIFICATION STATUS" in rep and "PII BY CATEGORY" in rep
    assert "Total clips:      80" in rep
    row = results.where("pii_count > 0").limit(1).collect()[0]
    view = transcript_view(row)
    assert row["clip_id"] in view and "Redacted:" in view
