"""Steady-median drift guard (bench.adjudicate_drift; VERDICT r13
item 6).

The >1.3x bench notes adjudicate against the steady-state MEDIAN of
recent driver-round mins, which by design follows the recent regime —
a run of consecutively degraded rounds ratchets the median up and the
flag quietly stops firing. The guard anchors to the min-ever best
instead: a load-normalized min >1.5x best sustained for 2+ consecutive
driver rounds flags even when the median has followed the regression.

Pure-function tests, no Spark session.
"""

from __future__ import annotations

import bench


BEST = {"q_fast": 1.0, "q_slow": 2.0}


def test_ratchet_scenario_flags() -> None:
    # The exact scenario the guard exists for: three consecutive
    # degraded rounds pushed the steady median up to ~1.7 (so the
    # median-relative 1.3x note no longer fires at 1.7/1.7 = 1.0x),
    # but 1.7 is still 1.7x the min-ever best — two rounds in a row.
    hist_norm = {"q_fast": [1.0, 1.6, 1.7]}
    notes = bench.adjudicate_drift({"q_fast": 1.7}, BEST, hist_norm)
    assert len(notes) == 1
    assert "q_fast" in notes[0]
    assert "drift guard" in notes[0]
    assert "2+ consecutive" in notes[0]


def test_single_degraded_round_stays_silent() -> None:
    # One bad day does not flag: the single-round load-normalized
    # machinery already adjudicates it, and a lone burst is noise.
    hist_norm = {"q_fast": [1.0, 1.05]}  # previous round was fine
    notes = bench.adjudicate_drift({"q_fast": 1.8}, BEST, hist_norm)
    assert notes == []


def test_recovered_round_stays_silent() -> None:
    # Previous round was degraded but this run is back under the bar.
    hist_norm = {"q_fast": [1.0, 1.8]}
    notes = bench.adjudicate_drift({"q_fast": 1.2}, BEST, hist_norm)
    assert notes == []


def test_first_round_with_no_history_stays_silent() -> None:
    notes = bench.adjudicate_drift({"q_fast": 9.9}, BEST, {})
    assert notes == []
    notes = bench.adjudicate_drift({"q_fast": 9.9}, BEST, {"q_fast": []})
    assert notes == []


def test_unknown_best_is_skipped() -> None:
    hist_norm = {"q_new": [5.0, 5.0]}
    notes = bench.adjudicate_drift({"q_new": 5.0}, {}, hist_norm)
    assert notes == []
    notes = bench.adjudicate_drift({"q_new": 5.0}, {"q_new": 0.0}, hist_norm)
    assert notes == []


def test_none_normalized_is_empty() -> None:
    assert bench.adjudicate_drift(None, BEST, {"q_fast": [2.0]}) == []


def test_threshold_is_strict_and_per_query() -> None:
    # Exactly 1.5x does not flag (strict >); only the offending query
    # appears when several are measured.
    hist_norm = {"q_fast": [1.0, 1.51], "q_slow": [3.2, 3.2]}
    notes = bench.adjudicate_drift(
        {"q_fast": 1.5, "q_slow": 3.2}, BEST, hist_norm)
    assert len(notes) == 1
    assert notes[0].startswith("q_slow")


def test_printed_notes_are_capped() -> None:
    # The printed contract line caps notes at 8 + a pointer; the full
    # list stays in the artifact (bench_last_full.json).
    notes = [f"q{i}: flagged" for i in range(20)]
    capped = bench.cap_notes(notes)
    assert len(capped) == 9
    assert capped[:8] == notes[:8]
    assert capped[-1] == "(+12 more notes — see full_artifact)"
    # short lists pass through untouched (identity, not a copy quirk)
    assert bench.cap_notes(notes[:8]) == notes[:8]
    assert bench.cap_notes([]) == []
