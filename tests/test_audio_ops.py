"""Bleep operator semantics — port of the reference's audio redactor test
assertions (reference tests/test_audio_redactor.py) against our numpy
implementation, plus splice checks."""

import numpy as np

from pii_redaction_pipeline_spark.functions.audio import (
    MIN_BLEEP_DURATION_MS,
    PADDING_S,
    apply_bleeps,
    generate_bleep_tone,
    merge_regions,
)


class TestRegionMerging:
    def test_overlapping_merged(self):
        merged = merge_regions([(1.0, 1.5), (1.4, 2.0)])
        assert merged == [(1.0, 2.0)]

    def test_adjacent_within_gap_merged(self):
        merged = merge_regions([(1.0, 1.5), (1.55, 2.0)], min_gap_s=0.1)
        assert len(merged) == 1

    def test_distant_not_merged(self):
        merged = merge_regions([(1.0, 1.5), (3.0, 3.5)], min_gap_s=0.1)
        assert len(merged) == 2

    def test_unsorted_input(self):
        merged = merge_regions([(3.0, 3.5), (1.0, 1.5)])
        assert merged == [(1.0, 1.5), (3.0, 3.5)]


class TestBleepTone:
    def test_duration(self):
        bleep = generate_bleep_tone(0.4, 16000)
        assert len(bleep) == int(0.4 * 16000)

    def test_amplitude(self):
        bleep = generate_bleep_tone(0.4, 16000, amplitude=0.5)
        assert 0.45 <= np.max(np.abs(bleep)) <= 0.55

    def test_float32(self):
        assert generate_bleep_tone(0.4, 16000).dtype == np.float32

    def test_fades(self):
        bleep = generate_bleep_tone(0.4, 16000)
        fade = int(0.01 * 16000)
        assert abs(bleep[0]) < 0.01          # faded in
        assert abs(bleep[-1]) < 0.01         # faded out
        assert np.max(np.abs(bleep[fade:-fade])) > 0.4


class TestApplyBleeps:
    def test_short_word_padded_span(self):
        sr = 16000
        pcm = np.zeros(sr * 10, dtype=np.float32)
        out = apply_bleeps(pcm, sr, [(1.0, 1.2)])
        # padded span [0.85, 1.35] carries the tone
        assert np.max(np.abs(out[int(0.9 * sr):int(1.3 * sr)])) > 0.3
        # outside the padded span untouched
        assert np.all(out[:int(0.8 * sr)] == 0)
        assert np.all(out[int(1.4 * sr):] == 0)

    def test_multiword_single_region(self):
        sr = 16000
        pcm = np.zeros(sr * 10, dtype=np.float32)
        out = apply_bleeps(pcm, sr, [(1.0, 1.3), (1.35, 1.8)])
        # merged into one continuous bleep: no silent gap inside
        seg = out[int((1.0 + 0.02) * sr):int((1.8 - 0.02) * sr)]
        window = int(0.05 * sr)
        mins = [np.max(np.abs(seg[i:i + window]))
                for i in range(0, len(seg) - window, window)]
        assert min(mins) > 0.1

    def test_min_bleep_duration_respected(self):
        assert MIN_BLEEP_DURATION_MS == 400
        assert PADDING_S == 0.150
