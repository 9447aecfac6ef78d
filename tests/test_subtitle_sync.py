"""SubtitleTimeSync + SubtitleEnhancer (reference subtitles.py:904,1103):
SRT round-trip, drift estimation against detected events / audio
onsets, OCR text cleanup."""

import numpy as np

from framewright_tpu.processors.subtitles import (
    SubtitleEnhancer,
    SubtitleEvent,
    SubtitleLine,
    SubtitleTimeSync,
    SubtitleTrack,
    format_srt,
    parse_srt,
    speech_onsets,
)

FPS = 25.0


def _track(starts, dur=1.8, texts=None):
    return SubtitleTrack(lines=[
        SubtitleLine(i + 1, s, s + dur,
                     (texts[i] if texts else f"line {i + 1}"))
        for i, s in enumerate(starts)])


class TestSrtRoundTrip:
    def test_parse_format_roundtrip(self):
        t = _track([1.04, 5.2, 9.879], texts=["Hello there.",
                                              "Two\nlines", "Bye!"])
        out = parse_srt(format_srt(t))
        assert len(out.lines) == 3
        for a, b in zip(t.lines, out.lines):
            assert abs(a.start - b.start) < 0.001
            assert abs(a.end - b.end) < 0.001
            assert a.text == b.text

    def test_parse_tolerates_crlf_and_dots(self):
        srt = ("1\r\n00:00:01.500 --> 00:00:03.000\r\nHi\r\n\r\n"
               "2\r\n00:01:00,000 --> 00:01:02,250\r\nYo\r\n")
        t = parse_srt(srt)
        assert len(t.lines) == 2
        assert abs(t.lines[0].start - 1.5) < 1e-6
        assert abs(t.lines[1].end - 62.25) < 1e-6


class TestTimeSync:
    def test_offset_and_duration(self):
        t = _track([2.0, 10.0])
        t2 = SubtitleTimeSync.apply_offset(t, 1.5)
        assert abs(t2.lines[0].start - 3.5) < 1e-9
        t3 = SubtitleTimeSync.adjust_for_duration_change(t, 100.0, 104.0)
        assert abs(t3.lines[1].start - 10.4) < 1e-9
        t4 = SubtitleTimeSync.adjust_for_speed_change(t, 2.0)
        assert abs(t4.lines[1].start - 5.0) < 1e-9

    def test_injected_drift_corrected_under_one_frame(self):
        # the VERDICT acceptance: injected offset+rate drift corrected
        # to < 1 frame at 25 fps against detected events
        rng = np.random.default_rng(0)
        true_starts = np.sort(rng.uniform(2.0, 110.0, 24))
        # keep events at least 2.5s apart for unambiguous matching
        true_starts = np.asarray(
            [s for i, s in enumerate(true_starts)
             if i == 0 or s - true_starts[i - 1] > 2.5])
        # video events = truth (+ detection jitter of up to ~1/2 frame)
        events = [SubtitleEvent(i + 1,
                                int(round(s * FPS)),
                                int(round((s + 1.6) * FPS)))
                  for i, s in enumerate(true_starts)]
        # subtitle track drifted: 1.8s offset + 0.8%/s rate drift
        a_true, b_true = 1.008, -1.8
        sub_starts = (true_starts - b_true) / a_true
        track = _track(list(sub_starts))
        fixed = SubtitleTimeSync.sync_to_events(track, events, FPS)
        err = np.abs([l.start for l in fixed.lines] - true_starts)
        assert err.max() < 1.0 / FPS, err.max()

    def test_drift_with_missing_and_spurious_events(self):
        # irregular (realistic) spacing: perfectly periodic events make
        # the offset ambiguous up to one period for ANY estimator
        rng = np.random.default_rng(1)
        gaps = rng.uniform(2.5, 7.5, 22)
        true_starts = 3.0 + np.cumsum(gaps)
        sub_starts = (true_starts - 2.5) / 1.01   # drifted track
        events = [SubtitleEvent(i + 1, int(s * FPS), int((s + 1.5) * FPS))
                  for i, s in enumerate(true_starts)]
        events = events[::2]  # half the events missed by detection
        # spurious detections
        for j, s in enumerate(rng.uniform(0, 90, 5)):
            events.append(SubtitleEvent(100 + j, int(s * FPS),
                                        int((s + 1) * FPS)))
        track = _track(list(sub_starts))
        fixed = SubtitleTimeSync.sync_to_events(track, events, FPS)
        err = np.abs([l.start for l in fixed.lines] - true_starts)
        assert np.median(err) < 1.5 / FPS, np.median(err)

    def test_too_few_matches_leaves_track_unchanged(self):
        t = _track([5.0])
        fixed = SubtitleTimeSync.sync_to_events(t, [], FPS)
        assert fixed.lines[0].start == 5.0

    def test_audio_onset_sync(self):
        sr = 8000
        true_starts = [2.0, 7.0, 13.5, 20.0, 26.0]
        n = int(30 * sr)
        rng = np.random.default_rng(2)
        audio = rng.normal(0, 0.005, n).astype(np.float32)
        for s in true_starts:
            i0 = int(s * sr)
            audio[i0:i0 + sr] += (0.3 * np.sin(
                2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        onsets = speech_onsets(audio, sr)
        assert len(onsets) >= len(true_starts)
        track = _track([s - 1.2 for s in true_starts])  # 1.2s early
        fixed = SubtitleTimeSync.sync_to_audio(track, audio, sr)
        err = np.abs([l.start for l in fixed.lines]
                     - np.asarray(true_starts))
        assert err.max() < 0.15, err


class TestEnhancer:
    def test_clean_ocr_artifacts(self):
        t = _track([1.0, 3.0, 5.0], texts=[
            "Hello ,  world !", "He said ,,quote'' x j", "   "])
        out = SubtitleEnhancer.clean_ocr_artifacts(t)
        assert out.lines[0].text == "Hello, world!"
        assert '"quote"' in out.lines[1].text
        # isolated noise letters dropped, 'a/i/o' kept
        assert " x" not in out.lines[1].text
        assert len(out.lines) == 2  # empty line removed

    def test_standardize(self):
        t = _track([1.0], texts=["...wait... no.. it's you"])
        out = SubtitleEnhancer.standardize_formatting(t)
        assert out.lines[0].text.startswith("...")
        assert ".." not in out.lines[0].text.replace("...", "")

    def test_position_scale(self):
        t = SubtitleTrack(lines=[SubtitleLine(1, 0, 1, "x",
                                              position=(100, 200))])
        out = SubtitleEnhancer.adjust_positions_for_scale(t, 2.0)
        assert out.lines[0].position == (200, 400)
