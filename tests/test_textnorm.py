"""HTML → text extraction: round-trip byte-identity invariant."""

from __future__ import annotations

from pii_detector_spark.functions.textnorm import (
    extract_text_from_html,
    normalize_text,
    render_html,
)
from pii_detector_spark.sources.datagen import generate_rows


def test_round_trip_simple():
    text = "First paragraph line one.\nLine two.\n\nSecond paragraph."
    html = render_html(text, title="T", host="h.com")
    assert extract_text_from_html(html) == normalize_text(text)


def test_chrome_is_stripped():
    html = render_html("Body only.", title="SecretTitle", host="navhost.com")
    out = extract_text_from_html(html)
    assert "SecretTitle" not in out
    assert "navhost" not in out
    assert "home" not in out  # nav link text
    assert out == "Body only."


def test_entities_and_specials():
    text = "Tom & Jerry say 1 < 2 and 3 > 2."
    html = render_html(text)
    assert extract_text_from_html(html) == text


def test_normalize_idempotent():
    samples = [
        "a\n\n\n\nb",
        "  leading spaces\nand\ttabs  ",
        "\n\nonly\n\n",
        "",
        "x",
    ]
    for s in samples:
        n = normalize_text(s)
        assert normalize_text(n) == n


def test_generated_corpus_round_trips():
    for url, ts, html, text, lang in generate_rows(300, seed=42):
        assert extract_text_from_html(html) == text, url


def test_generator_is_deterministic():
    a = list(generate_rows(50, seed=42))
    b = list(generate_rows(50, seed=42))
    assert a == b
