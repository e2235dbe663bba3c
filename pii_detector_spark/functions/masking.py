"""Masking / hashing / region-tagging semantics for PII findings.

Behavioral parity with the reference post-processing
(``app/services/data_analysis_service.py``):

* ``mask_value``  — masking tiers, incl. the EMAIL first-char/TLD rule and
  the US_SSN/PERSON length tiers (:115-153). One deliberate parity quirk:
  when an "EMAIL" value contains more than one ``@`` the reference's
  ``str.split`` raises and the value is returned **unmasked** (:151-153);
  we reproduce that.
* ``hash_value``  — SHA-384 hex of the raw value (:102-113).
* ``region_of``   — 2-char prefix mapping US→USA / IN→India / else All
  (:68-84). Note INSURANCE_INFORMATION therefore tags "India" — a
  reference quirk kept for parity.
* ``is_custom_entity`` — membership vs the system battery (:214).
* ``DEFAULT_SCORE`` — regex engines carry no score; the reference defaults
  to 0.8 (:207).
"""

from __future__ import annotations

import hashlib
import re

from pii_detector_spark.patterns import SYSTEM_ENTITIES

DEFAULT_SCORE = 0.8

_ALNUM = re.compile(r"[A-Za-z0-9]")


def _star(s: str) -> str:
    return _ALNUM.sub("*", s)


def mask_value(entity: str, value: str) -> str:
    """Mask one detected PII value according to its entity type."""
    if not value:
        return ""
    if "EMAIL" in entity and "@" in value:
        parts = value.split("@")
        if len(parts) != 2:
            # reference: ValueError swallowed → original value returned
            return value
        _username, domain = parts
        if entity == "EMAIL_ADDRESS":
            # system email: keep 1st char + the TLD
            tld = domain.split(".")[-1]
            return value[:1] + _star(value[1 : len(value) - len(tld)]) + tld
        # custom email entity: keep 2 chars + the whole domain
        return value[:2] + _star(value[2 : len(value) - len(domain)]) + domain
    if entity in ("US_SSN", "PERSON"):
        n = len(value)
        if n <= 4:
            return value[:1] + _star(value[1:])
        if n <= 6:
            return value[:2] + _star(value[2:])
        return value[:2] + _star(value[2:-2]) + value[-2:]
    return _star(value)


def hash_value(value: str) -> str:
    """SHA-384 hex digest of the raw (pre-mask) value."""
    return hashlib.sha384(value.encode("utf-8")).hexdigest()


def region_of(entity: str) -> str:
    prefix = entity[:2]
    if prefix == "US":
        return "USA"
    if prefix == "IN":
        return "India"
    return "All"


def is_custom_entity(entity: str) -> bool:
    return entity not in SYSTEM_ENTITIES
