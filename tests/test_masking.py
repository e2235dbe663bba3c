"""Masking / hashing / region golden tests vs reference semantics
(data_analysis_service.py:68-153) and vs the independent oracle."""

from __future__ import annotations

import hashlib

import pytest

from pii_detector_spark.functions.masking import hash_value, mask_value, region_of
from tests.oracle import oracle_mask


GOLDENS = [
    # system email: first char + stars + TLD (reference :133-137)
    ("EMAIL_ADDRESS", "jwhite@domain.com", "j*****@******.com"),
    # custom email-ish entity: 2 chars + stars + full domain (:138-139)
    ("MY_EMAIL", "jwhite@domain.com", "jw****@domain.com"),
    # SSN tiers (:140-147)
    ("US_SSN", "123", "1**"),
    ("US_SSN", "12345", "12***"),
    ("US_SSN", "172-32-1176", "17*-**-**76"),
    ("PERSON", "John Smith", "Jo** ***th"),
    # default: star all alnum, keep separators (:148-150)
    ("CREDIT_CARD", "5270-4267-6450-5516", "****-****-****-****"),
    ("IP_ADDRESSES", "192.168.1.10", "***.***.*.**"),
    # empty → empty (:128-129)
    ("US_SSN", "", ""),
    # multi-@ email: reference raises internally and returns input (:151-153)
    ("EMAIL_ADDRESS", "a@b@c.com", "a@b@c.com"),
]


@pytest.mark.parametrize("entity,value,expected", GOLDENS)
def test_mask_goldens(entity, value, expected):
    assert mask_value(entity, value) == expected
    assert oracle_mask(entity, value) == expected


def test_engine_vs_oracle_mask_adversarial():
    values = [
        "a@b.c",
        "x@y",
        "weird@@double.com",
        "UPPER@CASE.ORG",
        "no-at-sign",
        "1234",
        "12345",
        "123456",
        "1234567",
        "ssn-with-text-12",
        "ab",
        "a",
        "@leading.com",
        "trailing@",
    ]
    for entity in ("EMAIL_ADDRESS", "CUSTOM_EMAIL", "US_SSN", "PERSON", "CRYPTO"):
        for v in values:
            assert mask_value(entity, v) == oracle_mask(entity, v), (entity, v)


def test_hash_is_sha384():
    v = "172-32-1176"
    assert hash_value(v) == hashlib.sha384(v.encode()).hexdigest()
    assert len(hash_value(v)) == 96


def test_region_prefixes():
    assert region_of("US_SSN") == "USA"
    assert region_of("IN_PAN") == "India"
    # reference quirk: INsurance → India (prefix rule, :79-83)
    assert region_of("INSURANCE_INFORMATION") == "India"
    assert region_of("EMAIL_ADDRESS") == "All"
    assert region_of("IBAN_CODE") == "All"
