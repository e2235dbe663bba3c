"""Detection + scrub parity: engine pure functions vs the independent
oracle, per planted category and property-based on fuzzed text."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pii_detector_spark.operators.scrub import (
    build_findings,
    detect,
    is_phi,
    scrub_text,
)
from pii_detector_spark.sources.datagen import pii_plants
from tests.oracle import oracle_detect, oracle_is_phi, oracle_scrub


def _norm(matches):
    return sorted((m[1], m[2], m[3], m[4]) for m in matches)


def test_every_planted_category_fires():
    rng = random.Random(7)
    for _ in range(25):
        for cat, line in pii_plants(rng):
            names = {m[1] for m in detect(line)}
            if cat == "__DECOY__":
                assert "AWS_CREDENTIALS" not in names, line
            else:
                assert cat in names, (cat, line, names)


def test_detect_matches_oracle_on_planted_docs():
    rng = random.Random(13)
    for _ in range(40):
        lines = [line for _, line in pii_plants(rng)]
        rng.shuffle(lines)
        doc = "\n".join(lines)
        assert _norm(detect(doc)) == _norm(oracle_detect(doc))
        assert scrub_text(doc) == oracle_scrub(doc)[0]


def test_findings_fields():
    text = "Contact jwhite@domain.com, SSN 172-32-1176."
    fs = build_findings("https://h.com/x.html", detect(text))
    by_type = {f["pii_type"]: f for f in fs}
    email = by_type["EMAIL_ADDRESS"]
    assert email["pii_data"] == "j*****@******.com"
    assert email["pii_region"] == "All"
    assert email["score"] == 0.8
    assert email["is_custom_regex"] is False
    assert len(email["pii_hash"]) == 96
    ssn = by_type["US_SSN"]
    assert ssn["pii_region"] == "USA"
    assert ssn["pii_data"] == "17*-**-**76"


def test_scrub_leaves_clean_text_untouched():
    text = "the quiet streets of the old town were empty that morning"
    assert detect(text) == []
    assert scrub_text(text) == text


def test_secret_exclude_suppression():
    # span contains '= get…' → suppressed (hyperscan_service.py:57-60)
    doc = "aws = getAAAABBBBCCCCDDDDEEEEFFFFGGGG12345"
    assert all(m[1] != "AWS_CREDENTIALS" for m in detect(doc))


def test_phi_flag():
    assert is_phi("https://h.com/medical/records.html", "hello")
    assert is_phi("https://h.com/a.html", "the patient was discharged")
    assert is_phi("https://h.com/a.html", "MRN 2362324")
    assert not is_phi("https://h.com/a.html", "the sopranos are great")
    for url, text in [
        ("https://h.com/medical/x.html", "a"),
        ("https://h.com/a.html", "insurance claim"),
        ("https://h.com/a.html", "plain text"),
    ]:
        assert is_phi(url, text) == oracle_is_phi(url, text)


@settings(max_examples=150, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", categories=("L", "N", "P", "S", "Z")
        ),
        max_size=400,
    )
)
def test_property_engine_equals_oracle(text):
    assert _norm(detect(text)) == _norm(oracle_detect(text))
    assert scrub_text(text) == oracle_scrub(text)[0]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from([ln for _, ln in pii_plants(random.Random(3))] + [
    "plain filler line with the usual words",
    "192.168.1.1 and 10.0.0.1",
    "aws = getZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZ",
]), min_size=1, max_size=12))
def test_property_planted_lines(lines):
    doc = " ".join(lines)
    assert _norm(detect(doc)) == _norm(oracle_detect(doc))
    assert scrub_text(doc) == oracle_scrub(doc)[0]
