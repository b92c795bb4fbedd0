"""DuckDB twin of the FULL word-path pipeline — exact trie + fuzzy layer
+ redaction — closing the last rows-only registry row (round-5 verdict
item 4).

core.detect_words is a greedy left-to-right longest-first scanner over
whitespace tokens (reference src/pii_detector.py:173-241): at each
cursor position try the longest phrase (≤3 words in this lexicon), on a
match consume its words and jump past them, else advance one token; then
the fuzzy layer (src/pii_detector.py:243-353) runs over the tokens the
exact layer left unmatched. That sequential scan IS relationally
expressible: precompute the would-be match length at EVERY position
(three broadcast-shaped joins against 1/2/3-word phrase tables — the
phrase trie, flattened), then drive a recursive CTE whose state is just
(clip_id, cursor) — each recursion step advances every clip's cursor by
one match-or-token, exactly the core loop. The interaction the round-4
verdict asked about (matched-index consumption) needs NO set-valued
state: matches are contiguous and the cursor jumps past them, so the
consumed set is implied by the cursor path (core.exact_match checks
`i in matched` only for cursor positions, which the jump already
skips).

Two semantics simplifications are NOT taken here but FALL OUT of the
lexicon: (a) the "may" month gate is dead — "may" is not in
PHRASE_TO_CATEGORY at all (bug-compat with the reference, see
core.is_may_month docstring), so no gate appears in the SQL; (b)
per-start longest-first needs no tie-break beyond length — a phrase is
a unique trie key (PHRASE_TO_CATEGORY is a dict; "new york" resolves to
one category there, same as the trie build).

The fuzzy half reuses the gates proven green by the fuzzy_vocab oracle
row (functions/fuzzy_sql.py), applied per UNMATCHED POSITION instead of
per distinct vocabulary word (same result; the vocab dedup is the scale
optimization, not a semantic).

Everything downstream of the word scrub (regex extension passes,
verification rescan, quality / langid / grade / keep, char-bigram
perplexity, deterministic audio columns) is emitted from the same
constants as the Spark side, mirroring _sql_pipeline_exact_only.

Oracle-side encoding constraint (same as the wer oracle's): the fuzzy
layer's DuckDB levenshtein() is BYTE-based while core/Spark levenshtein
is CODEPOINT-based — they agree exactly when tokens and candidate terms
are single-byte (ASCII) text. The candidate lexicon is ASCII by
construction and the driver corpora are printable ASCII; a non-ASCII
corpus would diverge on the ORACLE side only (the Spark engine itself
is codepoint-correct). If the testdata ever grows non-ASCII tokens,
encode both join sides to one codepoint per word first, as
_sql_wer_scrub_effect does.
"""

from __future__ import annotations

from .. import core
from .. import lexicon as lx
from . import text as tx
from .fuzzy_sql import CANDIDATES, norm_sql


def assert_single_byte_tokens(texts, source: str = "corpus") -> None:
    """Loud guard for the encoding constraint documented above (round-6
    verdict item 5): the wordpath/wer DuckDB oracles assume every token
    is single-byte ASCII, because DuckDB's levenshtein counts BYTES
    while core/Spark count CODEPOINTS. A future corpus change that
    introduces non-ASCII tokens must fail here with the remedy, not
    silently diverge oracle hashes. Cheap: one C-level isascii() per
    text. tests/test_queries_oracle.py runs it over every driver SF and
    pins that a non-ASCII token trips it."""
    for t in texts:
        if t and not t.isascii():
            bad = next((w for w in t.split() if not w.isascii()), t[:40])
            raise AssertionError(
                f"non-ASCII token {bad!r} in {source}: the wordpath/wer "
                f"DuckDB oracles are byte-based (Spark is "
                f"codepoint-based) and would silently diverge. Either "
                f"keep the corpus ASCII or encode both levenshtein "
                f"sides to one codepoint per word first, as "
                f"_sql_wer_scrub_effect does.")

_DUCK_TOKS_E = ("list_filter(string_split_regex(etext, '\\s+'), "
                "x -> x <> '')")


def _q(w: str) -> str:
    return "'" + w.replace("'", "''") + "'"


def _phrase_values(n_words: int) -> str:
    rows = []
    for phrase, category in lx.PHRASE_TO_CATEGORY.items():
        ws = phrase.split()
        if len(ws) == n_words:
            rows.append("(" + ", ".join(_q(x) for x in ws)
                        + f", {_q(category)})")
    return ", ".join(rows)


def _label_case(cat_expr: str) -> str:
    branches = " ".join(
        f"WHEN {_q(c)} THEN {_q(l)}"
        for c, l in lx.CATEGORY_LABELS.items())
    return f"CASE {cat_expr} {branches} END"


def _ext_scrub_chain(inner: str) -> tuple[str, dict[str, str]]:
    """(final scrubbed expr, per-category count exprs) for the regex
    extension passes email→ssn→phone→toxic applied AFTER word-path
    redaction (core.regex_scrub runs on the redacted text; counts taken
    on the progressively-scrubbed string, same as tx.step_count_cols)."""
    steps = tx.scrub_steps()[5:]  # the 4 regex passes after the 5 lexicon ones
    cats = ["email", "ssn", "phone", "toxic"]
    counts: dict[str, str] = {}
    out = inner
    for cat, (pat, rep) in zip(cats, steps):
        counts[cat] = (f"CAST(len(regexp_extract_all({out}, "
                       f"{tx._sql_quote(pat)})) AS BIGINT)")
        out = f"regexp_replace({out}, {tx._sql_quote(pat)}, '{rep}', 'g')"
    return out, counts


def _ppl_values() -> str:
    """The char-bigram log-prob table (core._PPL_TABLE) as VALUES rows —
    full float precision via repr so DuckDB reads the exact doubles."""
    return ", ".join(
        f"({_q(a)}, {_q(b)}, {lp!r})"
        for (a, b), lp in sorted(core._PPL_TABLE.items()))


def _langid_quality_cols() -> tuple[str, str, str]:
    """(score column SQL list, best-score expr, lang pick expr) — same
    emission as queries._sql_pipeline_grade_cols, over a list column
    named `toks`."""
    score_cols = []
    for lang in lx.LANG_PRIORITY:
        lits = ", ".join("'" + w + "'" for w in lx.LANG_STOPWORDS[lang])
        score_cols.append(
            f"CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, "
            f"x -> list_contains([{lits}], lower(x)))) AS DOUBLE) / len(toks) "
            f"ELSE 0.0 END AS s_{lang}")
    best = "greatest(" + ", ".join(f"s_{l}" for l in lx.LANG_PRIORITY) + ")"
    pick = f"CASE WHEN {best} < {lx.LANGID_MIN_CONFIDENCE} THEN 'und' "
    for lang in lx.LANG_PRIORITY:
        pick += f"WHEN s_{lang} = {best} THEN '{lang}' "
    pick += "END"
    return ", ".join(score_cols), best, pick


def duck_pipeline_full_sql(enrich_sql: str) -> str:
    blacklist = ", ".join(_q(w) for w in sorted(lx.FUZZY_BLACKLIST))
    cand_values = ", ".join(
        f"({_q(t)}, {_q(c)}, {i})" for t, c, i in CANDIDATES)
    scrubbed, ext_counts = _ext_scrub_chain("ws.wtext")
    ext_sum = " + ".join(ext_counts[c]
                         for c in ["email", "ssn", "phone", "toxic"])
    score_cols, best, pick = _langid_quality_cols()
    oov = repr(core._PPL_OOV)
    v = float(len(core._PPL_VOCAB))

    return f"""
WITH RECURSIVE
clips AS (
  SELECT printf('clip_%08d', doc_id) AS clip_id, doc_id,
         {enrich_sql} AS etext
  FROM documents
),
tl AS (
  SELECT clip_id, etext, {_DUCK_TOKS_E} AS toks FROM clips
),
nt AS (SELECT clip_id, len(toks) AS n FROM tl),
toks AS (
  SELECT clip_id,
         unnest(generate_series(1, len(toks))) AS pos,
         unnest(toks) AS tok
  FROM tl
),
ntoks AS (
  SELECT clip_id, pos, tok, {norm_sql('tok')} AS norm FROM toks
),
p1(w, category) AS (VALUES {_phrase_values(1)}),
p2(w1, w2, category) AS (VALUES {_phrase_values(2)}),
p3(w1, w2, w3, category) AS (VALUES {_phrase_values(3)}),
mlen AS (
  SELECT t1.clip_id, t1.pos,
         CASE WHEN p3.category IS NOT NULL THEN 3
              WHEN p2.category IS NOT NULL THEN 2
              WHEN p1.category IS NOT NULL THEN 1
              ELSE 0 END AS mlen,
         coalesce(p3.category, p2.category, p1.category) AS category
  FROM ntoks t1
  LEFT JOIN ntoks t2 ON t2.clip_id = t1.clip_id AND t2.pos = t1.pos + 1
  LEFT JOIN ntoks t3 ON t3.clip_id = t1.clip_id AND t3.pos = t1.pos + 2
  LEFT JOIN p3 ON p3.w1 = t1.norm AND p3.w2 = t2.norm AND p3.w3 = t3.norm
  LEFT JOIN p2 ON p2.w1 = t1.norm AND p2.w2 = t2.norm
  LEFT JOIN p1 ON p1.w = t1.norm
),
scan AS (
  SELECT clip_id, 1 AS pos FROM nt WHERE n >= 1
  UNION ALL
  SELECT s.clip_id, s.pos + greatest(m.mlen, 1)
  FROM scan s
  JOIN mlen m ON m.clip_id = s.clip_id AND m.pos = s.pos
  JOIN nt ON nt.clip_id = s.clip_id
  WHERE s.pos + greatest(m.mlen, 1) <= nt.n
),
exact AS (
  SELECT s.clip_id, s.pos AS mstart, m.mlen, m.category
  FROM scan s
  JOIN mlen m ON m.clip_id = s.clip_id AND m.pos = s.pos
  WHERE m.mlen > 0
),
interior AS (
  SELECT clip_id, mstart + unnest(generate_series(1, mlen - 1)) AS pos
  FROM exact WHERE mlen >= 2
),
free AS (
  SELECT t.clip_id, t.pos, t.norm
  FROM ntoks t
  LEFT JOIN exact e ON e.clip_id = t.clip_id AND e.mstart = t.pos
  LEFT JOIN interior i ON i.clip_id = t.clip_id AND i.pos = t.pos
  WHERE e.mstart IS NULL AND i.pos IS NULL
),
cand(term, category, ord) AS (VALUES {cand_values}),
fj AS (
  SELECT f.clip_id, f.pos, c.category, c.ord, c.term, f.norm AS token,
         levenshtein(f.norm, c.term) AS distance
  FROM free f
  JOIN cand c ON abs(length(f.norm) - length(c.term)) <= 2
  WHERE length(f.norm) >= 5 AND f.norm NOT IN ({blacklist})
),
ff AS (
  SELECT *,
         row_number() OVER (PARTITION BY clip_id, pos
                            ORDER BY distance, ord) AS rn
  FROM fj
  WHERE distance BETWEEN 1 AND 2
    AND NOT (distance = 2 AND length(token) < 7)
    AND CAST(distance AS DOUBLE) / greatest(length(token), length(term))
        <= 0.25
),
fuzzy AS (
  SELECT clip_id, pos, category FROM ff
  WHERE rn = 1
    AND 1.0 - CAST(distance AS DOUBLE)
        / greatest(length(token), length(term))
        >= {lx.FUZZY_MIN_CONFIDENCE}
),
pieces AS (
  SELECT t.clip_id, t.pos,
         CASE WHEN e.category IS NOT NULL THEN {_label_case('e.category')}
              WHEN i.pos IS NOT NULL THEN NULL
              WHEN f.category IS NOT NULL THEN {_label_case('f.category')}
              ELSE t.tok END AS piece
  FROM toks t
  LEFT JOIN exact e ON e.clip_id = t.clip_id AND e.mstart = t.pos
  LEFT JOIN interior i ON i.clip_id = t.clip_id AND i.pos = t.pos
  LEFT JOIN fuzzy f ON f.clip_id = t.clip_id AND f.pos = t.pos
),
wscrub AS (
  SELECT c.clip_id,
         coalesce(p.wtext, '') AS wtext,
         coalesce(ne.n_exact, 0) AS n_exact,
         coalesce(nf.n_fuzzy, 0) AS n_fuzzy
  FROM clips c
  LEFT JOIN (SELECT clip_id, string_agg(piece, ' ' ORDER BY pos) AS wtext
             FROM pieces GROUP BY clip_id) p ON p.clip_id = c.clip_id
  LEFT JOIN (SELECT clip_id, count(*) AS n_exact FROM exact
             GROUP BY clip_id) ne ON ne.clip_id = c.clip_id
  LEFT JOIN (SELECT clip_id, count(*) AS n_fuzzy FROM fuzzy
             GROUP BY clip_id) nf ON nf.clip_id = c.clip_id
),
scrubbed AS (
  SELECT ws.clip_id,
         {scrubbed} AS scrubbed_text,
         CAST(ws.n_exact AS BIGINT) AS n_exact,
         CAST(ws.n_fuzzy AS BIGINT) AS n_fuzzy,
         CAST(ws.n_exact + ws.n_fuzzy + {ext_sum} AS BIGINT) AS pii_count
  FROM wscrub ws
),
ppl_s AS (
  SELECT clip_id, regexp_replace(lower(etext), '\\s+', ' ', 'g') AS s
  FROM clips
),
ppl_bi AS (
  SELECT clip_id,
         unnest(list_transform(generate_series(1, len(s) - 1),
                               i -> s[i])) AS a,
         unnest(list_transform(generate_series(1, len(s) - 1),
                               i -> s[i + 1])) AS b
  FROM ppl_s WHERE len(s) >= 2
),
ppl_tab(a, b, lp) AS (VALUES {_ppl_values()}),
ppl AS (
  SELECT p.clip_id,
         CASE WHEN n.s IS NULL OR len(n.s) < 2 THEN {v!r}
              ELSE exp(-p.m) END AS ppl
  FROM (SELECT bi.clip_id, avg(coalesce(t.lp, {oov})) AS m
        FROM ppl_bi bi
        LEFT JOIN ppl_tab t ON t.a = bi.a AND t.b = bi.b
        GROUP BY bi.clip_id) p
  JOIN ppl_s n ON n.clip_id = p.clip_id
),
qm AS (
  SELECT t.clip_id, t.etext,
         CAST(len(toks) AS BIGINT) AS word_cnt,
         CASE WHEN len(toks) > 0 THEN
           CAST(len(list_distinct(list_transform(toks, x -> lower(x))))
                AS DOUBLE) / len(toks) ELSE 0.0 END AS distinct_ratio,
         CASE WHEN len(etext) > 0 THEN
           CAST(len(regexp_replace(etext, '[A-Za-z0-9\\s]', '', 'g'))
                AS DOUBLE) / len(etext) ELSE 0.0 END AS symbol_density,
         {score_cols}
  FROM tl t
),
qm2 AS (
  -- lang_ok on the UNROUNDED best score (the Spark keep compares raw
  -- lang_conf; rounding first could flip a boundary row)
  SELECT *, ({best} >= {lx.LANGID_MIN_CONFIDENCE}) AS lang_ok FROM qm
),
graded AS (
  SELECT c.clip_id, c.etext AS transcript, c.doc_id,
         s.scrubbed_text, s.n_exact, s.n_fuzzy, s.pii_count,
         {tx.duck_rescan_count_sql('s.scrubbed_text')} AS verify_pii_count,
         q.word_cnt,
         (q.word_cnt >= {lx.QUALITY_MIN_WORDS}
          AND q.word_cnt <= {lx.QUALITY_MAX_WORDS}
          AND (q.word_cnt < {lx.QUALITY_DISTINCT_RATIO_MIN_WORDS}
               OR q.distinct_ratio >= {lx.QUALITY_MIN_DISTINCT_RATIO})
          AND q.symbol_density <= {lx.QUALITY_MAX_SYMBOL_DENSITY})
            AS quality_ok,
         q.lang_ok,
         {pick} AS lang,
         round({best}, 6) AS lang_conf,
         round(coalesce(p.ppl, {v!r}), 6) AS ppl
  FROM clips c
  JOIN scrubbed s ON s.clip_id = c.clip_id
  JOIN qm2 q ON q.clip_id = c.clip_id
  LEFT JOIN ppl p ON p.clip_id = c.clip_id
)
SELECT clip_id, transcript, scrubbed_text, pii_count, n_exact, n_fuzzy,
       verify_pii_count,
       CASE WHEN verify_pii_count = 0 THEN 'PASS'
            WHEN verify_pii_count <= {lx.VERIFY_REVIEW_THRESHOLD}
              THEN 'REVIEW_REQUIRED'
            ELSE 'FAIL' END AS qa_status,
       (quality_ok AND lang_ok AND verify_pii_count = 0) AS keep,
       lang, lang_conf, word_cnt, ppl,
       TRUE AS decode_ok,
       CAST((((doc_id * 97) % 1500) + 300) * 16 AS BIGINT) AS n_samples
FROM graded
"""
