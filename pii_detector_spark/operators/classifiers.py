"""User-defined classifiers — the reference's extensibility surface.

Reproduces the DataClassifiers model (``app/schemas/data_classifiers.py:91-164``)
Spark-first:

* **custom content patterns** extend the detection battery at runtime: a
  ``CustomClassifier`` carries named regexes, a sensitivity level, and
  labels. The reference routes them to Hyperscan/RE2/re per classifier
  (``base_scan_service.py:93-149``); we compile everything into the single
  per-executor battery pass, and findings report
  ``is_custom_regex = name not in system entities``
  (``data_analysis_service.py:214``).
* **filename include/exclude classifiers** (``base_scan_service.py:565-619``):
  regex lists over the object name; exclude wins; include attaches labels.
  Expressed as plain ``rlike`` predicates + a label array column so Catalyst
  pushes the filters into the scan.
* **classification include sets** (``base_scan_service.py:541-563``): url
  allowlists → ``isin`` / broadcast semi-join.

Sensitivity weights mirror ``data_classifiers.py:20-23``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pii_detector_spark.operators.scrub import (
    SCRUB_RESULT_TYPE,
    Match,
    build_findings,
    compiled_secret_exclude,
    is_phi,
    scrub_text,
)
from pii_detector_spark.patterns import ALL_PATTERNS, PatternSpec

# reference sensitivity weights (data_classifiers.py:20-23)
SENSITIVITY_WEIGHTS = {"low": 1, "medium": 2, "high": 3, "critical": 4}


@dataclass(frozen=True)
class CustomClassifier:
    """One user-defined content classifier (DataClassifiers analogue)."""

    name: str
    patterns: tuple[str, ...]
    sensitivity: str = "medium"  # low | medium | high | critical
    labels: tuple[str, ...] = field(default=())
    is_credential: bool = False  # route through SECRET_EXCLUDE suppression


def extended_battery(
    customs: tuple[CustomClassifier, ...]
) -> tuple[tuple[PatternSpec, "re.Pattern[str]"], ...]:
    """System battery + compiled custom classifiers, in canonical order
    (system categories first — same tie-break rule as scrub span selection)."""
    battery = [(spec, re.compile(spec.regex)) for spec in ALL_PATTERNS]
    for c in customs:
        for i, p in enumerate(c.patterns):
            spec = PatternSpec(
                name=c.name,
                regex=p,
                kind="credential" if c.is_credential else "pii",
            )
            battery.append((spec, re.compile(p)))
    return tuple(battery)


def detect_with_customs(
    text: str, battery: tuple[tuple[PatternSpec, "re.Pattern[str]"], ...]
) -> list[Match]:
    """Battery pass over system + custom patterns (guards intentionally not
    applied to customs: user patterns carry no guard metadata)."""
    if not text:
        return []
    out: list[Match] = []
    exclude = compiled_secret_exclude()
    lowered = text.lower()
    has_digit = any(ch.isdigit() for ch in text)
    has_upper = any(ch.isupper() for ch in text)
    for idx, (spec, rx) in enumerate(battery):
        if spec.needs_digit and not has_digit:
            continue
        if spec.needs_digit_or_upper and not (has_digit or has_upper):
            continue
        if spec.guards_all and not all(g in lowered for g in spec.guards_all):
            continue
        if spec.guards and not any(g in lowered for g in spec.guards):
            continue
        is_cred = spec.kind == "credential"
        for m in rx.finditer(text):
            value = m.group()
            if not value:
                continue
            if is_cred and exclude.search(value):
                continue
            out.append((idx, spec.name, m.start(), m.end(), value))
    return out


def with_custom_scrub(
    df: DataFrame,
    customs: tuple[CustomClassifier, ...],
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Scrub with the battery extended by custom classifiers. The extended
    battery compiles once per executor (closure capture; lazy init)."""
    state: dict = {}

    def _batch(urls: pd.Series, texts: pd.Series) -> pd.DataFrame:
        if "battery" not in state:
            state["battery"] = extended_battery(customs)
        battery = state["battery"]
        scrubbed, findings, phi = [], [], []
        for url, text in zip(urls, texts):
            t = text or ""
            matches = detect_with_customs(t, battery)
            scrubbed.append(scrub_text(t, matches))
            findings.append(build_findings(url or "", matches))
            phi.append(is_phi(url or "", t))
        return pd.DataFrame(
            {"scrubbed_text": scrubbed, "findings": findings, "is_phi": phi}
        )

    udf = F.pandas_udf(_batch, returnType=SCRUB_RESULT_TYPE).asNondeterministic()
    res = udf(F.col(url_col), F.col(text_col))
    return (
        df.withColumn("_scrub", res)
        .withColumn("scrubbed_text", F.col("_scrub.scrubbed_text"))
        .withColumn("findings", F.col("_scrub.findings"))
        .withColumn("is_phi", F.col("_scrub.is_phi"))
        .drop("_scrub")
    )


# --- filename include/exclude classifiers (F3) ------------------------------

@dataclass(frozen=True)
class FilenameClassifier:
    """Regex lists over the object name; exclude wins; include attaches
    labels (``base_scan_service.py:565-619``)."""

    include: tuple[str, ...] = field(default=())
    exclude: tuple[str, ...] = field(default=())
    labels: tuple[str, ...] = field(default=())


def _any_rlike(col: Column, patterns: tuple[str, ...]) -> Column:
    out = F.lit(False)
    for p in patterns:
        out = out | col.rlike(p)
    return out


def apply_filename_classifiers(
    df: DataFrame,
    classifiers: tuple[FilenameClassifier, ...],
    url_col: str = "url",
) -> DataFrame:
    """Drop excluded urls; attach a ``labels`` array from matching includes.
    Exclude wins over include (reference semantics). Pure predicates —
    pushed into the scan."""
    url = F.col(url_col)
    for c in classifiers:
        if c.exclude:
            df = df.filter(~_any_rlike(url, c.exclude))
    label_arrays = [
        F.when(
            _any_rlike(url, c.include),
            F.array(*[F.lit(x) for x in c.labels]),
        ).otherwise(F.array().cast("array<string>"))
        for c in classifiers
        if c.include
    ]
    if label_arrays:
        labels = label_arrays[0]
        for arr in label_arrays[1:]:
            labels = F.concat(labels, arr)
        df = df.withColumn("labels", F.array_distinct(labels))
    else:
        df = df.withColumn("labels", F.array().cast("array<string>"))
    return df


def apply_include_set(
    df: DataFrame, allowed: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Classification include set (F4): broadcast LEFT SEMI join against the
    allowlist (``base_scan_service.py:541-563``)."""
    return df.join(
        F.broadcast(allowed.select(F.col(allowed.columns[0]).alias(url_col))),
        on=url_col,
        how="left_semi",
    )
