"""Differential parity tests: our core vs the actual reference implementation.

Imports the reference package read-only (stubbing its faster_whisper
dependency) and compares word-path detection+redaction and char-path
detection on a seeded stress corpus. Skipped if the reference checkout is
absent.
"""

import random
import sys
import types
from pathlib import Path

import pytest

from pii_redaction_pipeline_spark import core

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not present")


@pytest.fixture(scope="module")
def ref_modules():
    if "faster_whisper" not in sys.modules:
        fw = types.ModuleType("faster_whisper")
        fw.WhisperModel = object
        sys.modules["faster_whisper"] = fw
    sys.path.insert(0, str(REF))
    try:
        from src.config import WordTimestamp
        from src.pii_detector import PIIDetector
        from src.text_redactor import TextRedactor
        yield PIIDetector(), TextRedactor(), WordTimestamp
    finally:
        sys.path.remove(str(REF))


def make_transcript(text, WordTimestamp):
    """Minimal duck-typed stand-in for the reference TranscriptionResult."""
    toks = text.split()
    words = [WordTimestamp(word=w, start=float(i), end=float(i) + 0.5)
             for i, w in enumerate(toks)]

    class Seg:
        pass

    seg = Seg()
    seg.text, seg.start, seg.end, seg.words = text, 0.0, 1.0, words

    class T:
        conversation_id = "t"
        segments = [seg]

        def get_all_words(self):
            return words

        def get_full_text(self):
            return " ".join(w.word for w in words)

    return T()


def corpus():
    random.seed(42)
    pools = [
        "I visited Houston on Monday", "you may proceed carefully",
        "in May we celebrate spring", "May 15th is the date",
        "May of 2024 was great", "she moved to Greenville last Tuesday",
        "the sky is blue and the grass is green",
        "Salt Lake City and New York City and New York",
        "Monday's weather was nice", "Mondays are hard",
        'HoUsToN, Texas? "blue"', "I went back home like always",
        "the salon was busy", "I remember that day",
        "huston is a typo and febuary another and phenix too",
        "New Hampshire borders Vermont", "district of columbia is not a state",
        "corpus christi round rock college station",
        "texture mixture fixture gallon talon",
        "burgundy chartreuse periwinkle vermillion",
        "dress bus atlas mass", "Brownsville is south",
        "st louis st paul st petersburg", "lavendar turquois crimzon",
        "it may rain tomorrow", "avocado may actually be a berry",
        "Tuesdays and Wednesdays", "sapphire scarlet sienna slate taupe topaz",
        "montains and vermot and teksas misspelled",
    ]
    filler = ("so then we talked about things and stuff for quite a while "
              "you know really").split()
    cases = []
    for _ in range(600):
        parts = []
        for _ in range(random.randint(0, 5)):
            parts.append(random.choice(pools))
            parts.extend(random.sample(filler, random.randint(0, 4)))
        cases.append(" ".join(parts))
    cases += ["", "   ", "Monday", "may", "in may", "May 3", "!!!", "a",
              "new york city new york", "Houston-Texas is hyphenated",
              "it's Monday's, comma", "'quoted' \"words\" here.",
              "Monday’s smart quote"]
    return cases


def test_word_path_parity(ref_modules):
    detector, redactor, WordTimestamp = ref_modules
    for text in corpus():
        t = make_transcript(text, WordTimestamp)
        ref_matches = sorted(detector.detect(t), key=lambda m: m.word_indices[0])
        ref_scrubbed = redactor.redact(t, ref_matches).redacted_text
        toks, my_matches = core.detect_words(text)
        my_scrubbed = core.redact_tokens(toks, my_matches)
        assert my_scrubbed == ref_scrubbed, text
        assert [(m.text, m.category, round(m.confidence, 9), m.is_fuzzy)
                for m in my_matches] == \
               [(m.text, m.category, round(m.confidence, 9), m.is_fuzzy)
                for m in ref_matches], text


def test_char_path_parity(ref_modules):
    detector, _, _ = ref_modules
    for text in corpus():
        assert core.detect_in_text(text) == detector.detect_in_text(text), text


def test_normalize_parity(ref_modules):
    sys.path.insert(0, str(REF))
    from src.pii_detector import levenshtein_distance, normalize_word
    sys.path.remove(str(REF))
    words = ["MONDAY", "Monday's", "Houston,", "Texas?", '"Houston"',
             "Mondays", "dress", "bus", "back", "salon", "monday’s", "St.",
             "it's", "''x''", "s", "ss", "'s", "mass", "atlases"]
    for w in words:
        assert normalize_word(w) == core.normalize_word(w), w
    pairs = [("monday", "munday"), ("houston", "huston"),
             ("remember", "december"), ("back", "black"), ("salon", "salmon"),
             ("", "abc"), ("abc", ""), ("kitten", "sitting")]
    for a, b in pairs:
        assert levenshtein_distance(a, b) == core.levenshtein(a, b)
