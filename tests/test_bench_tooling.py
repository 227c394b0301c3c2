"""Bench-tooling hygiene (VERDICT r05 'What's wrong #2'): the scaling
report writer must round-trip foreign top-level keys — the five-attempt
scaling disclosure (``attempts_r05`` etc.) in BENCH_SCALING.json must
survive a fresh ``bench.py --scaling`` run, not need manual re-adding."""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def test_write_report_preserving_roundtrips_foreign_keys(tmp_path):
    from bench import write_report_preserving

    path = str(tmp_path / "BENCH_SCALING.json")
    prior = {
        "raw_efficiency": 0.70,
        "attempts_r05": [{"raw": 0.781, "ceiling": 0.791}],
        "protocol_conclusion_r05": "host-bound",
    }
    with open(path, "w") as fh:
        json.dump(prior, fh)

    fresh = {"raw_efficiency": 0.75, "normalized_efficiency": 1.02}
    merged = write_report_preserving(path, fresh)

    with open(path) as fh:
        on_disk = json.load(fh)
    assert on_disk == merged
    # fresh run wins on keys it produces...
    assert on_disk["raw_efficiency"] == 0.75
    assert on_disk["normalized_efficiency"] == 1.02
    # ...foreign disclosure keys survive untouched
    assert on_disk["attempts_r05"] == prior["attempts_r05"]
    assert on_disk["protocol_conclusion_r05"] == "host-bound"


def test_write_report_preserving_handles_missing_and_corrupt(tmp_path):
    from bench import write_report_preserving

    # no prior file: plain write
    p1 = str(tmp_path / "new.json")
    write_report_preserving(p1, {"a": 1})
    assert json.load(open(p1)) == {"a": 1}

    # corrupt prior: fresh report still lands (no crash, no partial state)
    p2 = str(tmp_path / "corrupt.json")
    with open(p2, "w") as fh:
        fh.write("{not json")
    write_report_preserving(p2, {"b": 2})
    assert json.load(open(p2)) == {"b": 2}

    # prior is a non-dict JSON value: ignored rather than merged
    p3 = str(tmp_path / "list.json")
    with open(p3, "w") as fh:
        json.dump([1, 2], fh)
    write_report_preserving(p3, {"c": 3})
    assert json.load(open(p3)) == {"c": 3}
