"""Directory-of-audio-files source (reference S1: main.py:32-44).

The reference globs `.wav/.mp3/.flac/.m4a/.ogg`, dedupes and sorts; here
that is `spark.read.format("binaryFile")` with a path glob — a real
distributed scan (file listing parallelized by the driver, contents read
executor-side) — mapped into the clips table shape. Sample rate/duration
are parsed from the WAV header without decoding the payload.
"""

from __future__ import annotations

import io
import struct
import wave as wave_mod

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUDIO_EXTENSIONS = ["wav", "mp3", "flac", "m4a", "ogg"]


def read_audio_dir(spark: SparkSession, input_dir: str,
                   transcripts: DataFrame | None = None) -> DataFrame:
    """Recursive scan → clips(clip_id, bytes, sr_hz, dur_ms, codec,
    transcript). `transcripts` (clip_id, transcript) is joined if given
    (reference pairs files with transcript text by stem —
    scripts/calculate_accuracy.py:46-58)."""
    glob = "*.{" + ",".join(AUDIO_EXTENSIONS) + "}"
    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", glob)
           .option("recursiveFileLookup", "true")
           .load(input_dir))

    meta_schema = T.StructType([
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
    ])

    @F.pandas_udf(meta_schema)
    def wav_meta(content: pd.Series) -> pd.DataFrame:
        out = {"sr_hz": [], "dur_ms": []}
        for payload in content:
            sr, dur = 0, 0
            try:
                with wave_mod.open(io.BytesIO(bytes(payload)), "rb") as w:
                    sr = w.getframerate()
                    dur = int(w.getnframes() * 1000 / sr)
            except Exception:
                pass
            out["sr_hz"].append(sr)
            out["dur_ms"].append(dur)
        return pd.DataFrame(out)

    stem = F.regexp_extract(F.col("path"), r"([^/]+)\.[A-Za-z0-9]+$", 1)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    clips = (raw
             .withColumn("clip_id", stem)
             .withColumn("codec", ext)
             .withColumn("_m", wav_meta(F.col("content")))
             .select("clip_id", F.col("content").alias("bytes"),
                     F.col("_m.sr_hz").alias("sr_hz"),
                     F.col("_m.dur_ms").alias("dur_ms"), "codec")
             .dropDuplicates(["clip_id"])          # main.py:43 sorted(set())
             )
    if transcripts is not None:
        clips = clips.join(transcripts, "clip_id", "left")
    else:
        clips = clips.withColumn("transcript", F.lit(None).cast("string"))
    return clips.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                        "transcript")
