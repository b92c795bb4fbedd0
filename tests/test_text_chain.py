"""Direct proof of the claim in functions/text.py: the 5-pass
per-category scrub chain (cities→states→days→months→colors, terms
longest-first inside each pass, sequential replacement) is equivalent to
the reference's GLOBAL longest-first char-offset detector
(core.detect_in_text ≡ reference src/pii_detector.py:355-406) followed
by positional label substitution — for this lexicon, where every
cross-category overlapping term pair is a city-beats-state prefix pair
that both orders resolve identically.

The chain is evaluated here with Python `re` using the exact pattern
strings the Spark/DuckDB emitters use, so the test pins the *semantics*;
engine-level agreement on those same patterns is pinned separately by
the driver oracle (regexp_replace vs regexp_replace)."""

import re

from pii_redaction_pipeline_spark import core
from pii_redaction_pipeline_spark import lexicon as lx
from pii_redaction_pipeline_spark.functions import text as tx

from tests.test_reference_parity import corpus

_LEXICON_CATEGORIES = ["city", "state", "day", "month", "color"]


def scrub_via_chain(text: str) -> str:
    """The 5 lexicon passes of the chain (email/ssn/phone/toxic regex
    steps are disjoint extensions detect_in_text does not cover)."""
    for cat in _LEXICON_CATEGORIES:
        text = re.sub(tx.category_pattern(cat), lx.CATEGORY_LABELS[cat], text)
    return text


def scrub_via_detect(text: str) -> str:
    """Global longest-first detection + positional label substitution."""
    out, last = [], 0
    for m in core.detect_in_text(text):  # sorted by start, non-overlapping
        out.append(text[last:m["start"]])
        out.append(lx.CATEGORY_LABELS[m["category"]])
        last = m["end"]
    out.append(text[last:])
    return "".join(out)


def _texts():
    yield from corpus()
    # adversarial overlap/boundary cases beyond the parity corpus
    yield from [
        "new york city new york new hampshire",
        "salt lake city lake city city",
        "virginia west virginia washington west virginia beach",
        "kansas city kansas arkansas city",
        "the [CITY] label should not rematch as a term",
        "greenville GREENVILLE GrEeNvIlLe",
        "columbia district of columbia british columbia",
        "long beach virginia beach beach",
        "",
        "   ",
        "orange orange orange",  # color vs city-ish repeats
    ]


def test_chain_equals_global_longest_first():
    n = 0
    for text in _texts():
        assert scrub_via_chain(text) == scrub_via_detect(text), repr(text)
        n += 1
    assert n > 100  # the parity corpus is the bulk of the cases


def test_rescan_count_equals_filtered_detect():
    """The residual-PII rescan (one global longest-first alternation,
    RESCAN_PATTERN) counts exactly the label-filtered detect_in_text
    matches on scrubbed text — i.e. rescan_count_col computes
    core.verify_counts (reference src/verifier.py:144-156)."""
    rescan = re.compile(tx.RESCAN_PATTERN)
    n_nonzero = 0
    for text in _texts():
        scrubbed = scrub_via_chain(text)
        want, _ = core.verify_counts(scrubbed)
        got = len(rescan.findall(scrubbed))
        assert got == want, repr(text)
        n_nonzero += want
    # residuals exist in the corpus only if scrubbing missed something;
    # the chain is complete for this lexicon, so expect zero everywhere
    assert n_nonzero == 0


def test_rescan_counts_leftovers():
    """On text where a term survives scrubbing (simulated by injecting
    one after), the rescan must count it via both routes."""
    rescan = re.compile(tx.RESCAN_PATTERN)
    for injected in ["houston", "new york city", "monday", "crimson"]:
        scrubbed = scrub_via_chain("we met in Greenville on monday") + " " + injected
        want, _ = core.verify_counts(scrubbed)
        assert want >= 1, injected
        assert len(rescan.findall(scrubbed)) == want, injected


def test_exact_word_path_equals_chain_on_clean_term_tokens():
    """The equivalence the pipeline_exact_only ORACLE row rests on:
    scrub_row(with_fuzzy=False) (word-path trie over whitespace tokens +
    regex scrub) equals the char-path chain whenever lexicon terms occur
    as bare whitespace-delimited tokens — the EXACT_ENRICH_SQL corpus
    contract. (Outside that domain they legitimately diverge: the word
    path tokenizes on whitespace, the chain matches \\b-bounded
    substrings — "Houston-Texas", "houston's", "foo,houston".)
    Randomized mix of every lexicon phrase (incl. overlapping multi-word
    city/state prefixes), soup words, fuzzy-bait typos (must survive
    BOTH paths with fuzzy off), and regex-scrub targets."""
    import random

    random.seed(23)
    terms = [t for t, _ in lx.SORTED_TERMS]
    junk = ["spark", "agg", "xyzzy", "value", "row",
            "jane.doe@example.com", "(555)", "123-4567", "123-45-6789",
            "huston", "febuary", "phenix", "idiot", "42", "I", "it"]

    def full_chain(text: str) -> str:
        for pat, rep in tx.scrub_steps():
            text = re.sub(pat, rep, text)
        return text

    pool = terms + junk
    n_checked = 0
    for _ in range(300):
        k = random.randint(0, 14)
        toks = [random.choice(pool) for _ in range(k)]
        # random casing — normalize/(?i) must agree across paths
        toks = [t.upper() if random.random() < 0.2 else
                t.title() if random.random() < 0.2 else t for t in toks]
        text = " ".join(toks)
        got = core.scrub_row(text, with_fuzzy=False)["scrubbed_text"]
        want = full_chain(text)
        assert got == want, repr(text)
        n_checked += 1
    assert n_checked == 300


def test_trie_patterns_match_flat_spans():
    """Round-7: the Spark emitters run trie-factored alternations
    (tx.spark_scrub_steps / tx.SPARK_RESCAN_PATTERN) while the DuckDB
    emitters keep the flat longest-first patterns. Under backtracking
    semantics (Python `re` here ≡ Java regex for literal alternations,
    greedy (?:...)?, \\b, (?i)) the two must match span-for-span: two
    distinct terms can only co-match at a position when one prefixes the
    other, the flat order prefers the longer, and the trie's greedy
    optional suffixes also try deeper-first."""
    flat_steps = tx.scrub_steps()
    trie_steps = tx.spark_scrub_steps()
    assert len(flat_steps) == len(trie_steps)
    adversarial = [
        "sundays sun sunday sundae",
        "new york cityx new york city new yorks newark",
        "st petersburgh st petersburg st paulx st pa",
        "may mayor dismay maying",
        "tan tank tangerine tans",
        "greenville green greens greenvil",
        "district of columbia district of columbi",
        "kansas city kansas  city kansascity",
        "washington's washington, wash",
        "orange! orange? orangeade",
    ]
    texts = list(_texts()) + adversarial
    for (fp, fr), (tp, tr) in zip(flat_steps, trie_steps):
        assert fr == tr
        f, t = re.compile(fp), re.compile(tp)
        for text in texts:
            assert ([m.span() for m in f.finditer(text)]
                    == [m.span() for m in t.finditer(text)]), (fp[:40], text)
    f = re.compile(tx.RESCAN_PATTERN)
    t = re.compile(tx.SPARK_RESCAN_PATTERN)
    for text in texts:
        assert ([m.span() for m in f.finditer(text)]
                == [m.span() for m in t.finditer(text)]), text
    # and the full replacement chains agree end-to-end
    for text in texts:
        a, b = text, text
        for (fp, fr), (tp, tr) in zip(flat_steps, trie_steps):
            a = re.sub(fp, fr, a)
            b = re.sub(tp, tr, b)
        assert a == b, text
