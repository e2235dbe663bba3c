"""Pure-Python parity: the fused per-document processor must agree with the
independent oracle on every field, for every document class the generator
produces — no Spark session needed, so this is the fastest full-semantics
regression."""

from __future__ import annotations

import math

from pii_detector_spark.config import QualityThresholds
from pii_detector_spark.operators.fused import process_document
from pii_detector_spark.sources.datagen import generate_rows
from tests.oracle import oracle_decide, oracle_scrub


def test_fused_matches_oracle_on_generated_corpus():
    t = QualityThresholds()
    n_checked = 0
    for url, _ts, _html, text, _lang in generate_rows(400, seed=7):
        got = process_document(url, text, t)
        want = oracle_decide(url, text, t)
        assert got["keep"] == want.keep, url
        assert got["drop_reason"] == want.drop_reason, url
        assert got["lang_pred"] == want.lang_pred, url
        assert got["is_phi"] == want.is_phi, url
        assert got["scrubbed_text"] == want.scrubbed_text, url
        for k, v in want.metrics.items():
            g = got[k]
            if isinstance(v, float):
                assert math.isclose(g, v, rel_tol=1e-12), (url, k, g, v)
            else:
                assert g == v, (url, k, g, v)
        n_checked += 1
    assert n_checked == 400


def test_fused_findings_match_oracle_scrub():
    t = QualityThresholds()
    for url, _ts, _html, text, _lang in generate_rows(150, seed=11):
        got = process_document(url, text, t)
        if not got["keep"]:
            assert got["findings"] is None
            continue
        _scrubbed, want = oracle_scrub(text)
        assert len(got["findings"]) == len(want)
        for g, w in zip(
            sorted(got["findings"], key=lambda f: (f["start"], f["end"], f["pii_type"])),
            sorted(want, key=lambda f: (f["start"], f["end"], f["pii_type"])),
        ):
            assert g["pii_type"] == w["pii_type"]
            assert g["pii_data"] == w["pii_masked"]
            assert g["pii_hash"] == w["pii_hash"]
            assert (g["start"], g["end"]) == (w["start"], w["end"])


def test_empty_and_edge_documents():
    t = QualityThresholds()
    for text, reason in [("", "empty"), ("   ", "empty"), ("one two", "too_short")]:
        got = process_document("u", text, t)
        assert got["keep"] is False
        assert got["drop_reason"] == reason
        assert got["scrubbed_text"] is None
