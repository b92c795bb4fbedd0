"""Deduplication operators for training-data pipelines (north-star
first-class ops): exact hash, MinHash+LSH banding, n-gram Jaccard,
SimHash — each emitted as PySpark Columns AND DuckDB oracle SQL from the
same constants so the two cannot drift.

Hash primitive: md5 hex substrings (lexicographic min over shingles is a
valid min-hash) — chosen because md5 is the one hash both engines compute
identically; at cluster scale you would swap in xxhash64 via
F.xxhash64 and keep the structure.

Scale notes: minhash signatures are one narrow shuffle-free projection;
LSH pair generation shuffles on (band_idx, band_sig) — the classic
bucket-join that replaces the O(n²) similarity join; Jaccard verification
joins only the candidate pairs back to shingle sets (semi-join shaped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 8
N_BANDS = 4          # 2 rows per band
SHINGLE_WORDS = 3

# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------

_SPARK_TOKS = "filter(split(coalesce(text,''), '\\\\s+'), x -> x != '')"
_DUCK_TOKS = ("list_filter(string_split_regex(coalesce(text,''), '\\s+'), "
              "x -> x <> '')")

# NOTE: references a materialized `_toks` column — inlining the token
# split into the window lambda makes interpreted HOF evaluation re-split
# the text per window (O(n²) per row).
_SPARK_SHINGLES = (
    f"CASE WHEN size(_toks) >= {SHINGLE_WORDS} THEN "
    f"transform(sequence(1, size(_toks) - {SHINGLE_WORDS - 1}), "
    f"i -> concat_ws(' ', slice(_toks, i, {SHINGLE_WORDS}))) "
    f"ELSE array(concat_ws(' ', _toks)) END"
)

_DUCK_SHINGLES = (
    f"CASE WHEN len({_DUCK_TOKS}) >= {SHINGLE_WORDS} THEN "
    f"list_transform(generate_series(1, len({_DUCK_TOKS}) - {SHINGLE_WORDS - 1}), "
    f"i -> array_to_string(({_DUCK_TOKS})[i:i+{SHINGLE_WORDS - 1}], ' ')) "
    f"ELSE [array_to_string({_DUCK_TOKS}, ' ')] END"
)


def with_shingles(df: DataFrame) -> DataFrame:
    """Attach `_sh` (word {SHINGLE_WORDS}-gram shingles) via a
    materialized `_toks` helper column."""
    return (df.withColumn("_toks", F.expr(_SPARK_TOKS))
            .withColumn("_sh", F.expr(_SPARK_SHINGLES))
            .drop("_toks"))


# ---------------------------------------------------------------------------
# minhash signatures + LSH bands
# ---------------------------------------------------------------------------

def spark_minhash_cols() -> list[F.Column]:
    """band_0..band_{N_BANDS-1}: concat of 2 min-hashes each."""
    hashes = [
        f"array_min(transform(_sh, s -> substr(md5(concat('{k}|', s)), 1, 16)))"
        for k in range(N_HASHES)
    ]
    bands = []
    for b in range(N_BANDS):
        bands.append(F.expr(
            f"concat({hashes[2 * b]}, {hashes[2 * b + 1]})").alias(f"band_{b}"))
    return bands


def duck_minhash_sql() -> str:
    hashes = [
        f"list_min(list_transform(_sh, s -> substr(md5(concat('{k}|', s)), 1, 16)))"
        for k in range(N_HASHES)
    ]
    bands = ", ".join(
        f"concat({hashes[2 * b]}, {hashes[2 * b + 1]}) AS band_{b}"
        for b in range(N_BANDS))
    return (f"SELECT doc_id, {bands} FROM "
            f"(SELECT doc_id, {_DUCK_SHINGLES} AS _sh FROM documents)")


def spark_minhash_signatures(docs: DataFrame) -> DataFrame:
    return with_shingles(docs).select("doc_id", *spark_minhash_cols())


def spark_lsh_pairs(docs: DataFrame) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band signature.
    Shuffle is on (band_idx, band_sig) — the scalable bucket join."""
    # localCheckpoint: the self-join would otherwise recompute the full
    # signature pipeline on both sides (ReuseExchange does not cover the
    # pre-shuffle projection)
    sig = spark_minhash_signatures(docs).localCheckpoint()
    melted = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("sig"))
            for b in range(N_BANDS)])).alias("bs")
    ).select("doc_id", "bs.band_idx", "bs.sig")
    a = melted.alias("a")
    b = melted.alias("b")
    return (a.join(b, ["band_idx", "sig"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())


def duck_lsh_pairs_sql() -> str:
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band_{b} AS sig FROM sig"
        for b in range(N_BANDS))
    return f"""
WITH sig AS ({duck_minhash_sql()}),
melted AS ({unions})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM melted a JOIN melted b USING (band_idx, sig)
WHERE a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard over candidate pairs
# ---------------------------------------------------------------------------

def spark_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """LSH candidates verified with exact shingle-set Jaccard."""
    pairs = spark_lsh_pairs(docs)
    sh = (with_shingles(docs)
          .select("doc_id", F.array_distinct("_sh").alias("sh"))
          .localCheckpoint())
    j = (pairs
         .join(sh.select(F.col("doc_id").alias("doc_a"),
                         F.col("sh").alias("sh_a")), "doc_a")
         .join(sh.select(F.col("doc_id").alias("doc_b"),
                         F.col("sh").alias("sh_b")), "doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (j.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def duck_jaccard_pairs_sql(threshold: float = 0.5) -> str:
    return f"""
WITH pairs AS ({duck_lsh_pairs_sql()}),
sh AS (SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS sh FROM documents),
j AS (
  SELECT p.doc_a, p.doc_b,
         CASE WHEN len(list_distinct(a.sh || b.sh)) > 0 THEN
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(a.sh || b.sh))
         ELSE 0.0 END AS jaccard
  FROM pairs p
  JOIN sh a ON p.doc_a = a.doc_id
  JOIN sh b ON p.doc_b = b.doc_id
)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM j
WHERE jaccard >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash (16-bit, md5-nibble variant — SQL-expressible in both engines)
# ---------------------------------------------------------------------------

def _bit_exprs(instr_fn: str) -> list[str]:
    """16 per-word bit expressions over hex digits 1..4 of md5(word)."""
    exprs = []
    for k in range(16):
        digit_pos = k // 4 + 1
        bit_in_nibble = k % 4
        mask = 2 ** (3 - bit_in_nibble)
        d = (f"({instr_fn}('0123456789abcdef', "
             f"substr(md5(w), {digit_pos}, 1)) - 1)")
        exprs.append(f"(CASE WHEN floor({d} / {mask}) % 2 = 1 THEN 1 ELSE -1 END)")
    return exprs


def spark_simhash(docs: DataFrame) -> DataFrame:
    """16-bit simhash: majority vote per bit over word hashes."""
    toks = docs.select(
        "doc_id", F.explode(F.expr(_SPARK_TOKS)).alias("w"))
    bits = _bit_exprs("instr")
    aggs = [F.sum(F.expr(b)).alias(f"s{k}") for k, b in enumerate(bits)]
    summed = toks.groupBy("doc_id").agg(*aggs)
    sim = None
    for k in range(16):
        bit = F.when(F.col(f"s{k}") > 0, 2 ** k).otherwise(0)
        sim = bit if sim is None else sim + bit
    return summed.select("doc_id", sim.cast("bigint").alias("simhash"))


def duck_simhash_sql() -> str:
    bits = _bit_exprs("strpos")
    sums = ", ".join(f"sum({b}) AS s{k}" for k, b in enumerate(bits))
    sim = " + ".join(f"(CASE WHEN s{k} > 0 THEN {2 ** k} ELSE 0 END)"
                     for k in range(16))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS w FROM documents
), summed AS (
  SELECT doc_id, {sums} FROM toks GROUP BY doc_id
)
SELECT doc_id, CAST({sim} AS BIGINT) AS simhash FROM summed
"""
