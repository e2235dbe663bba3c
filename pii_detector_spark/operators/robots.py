"""robots.txt compliance filtering: parse per-host rule sets, filter a
url corpus by longest-match Allow/Disallow precedence.

Crawl-derived corpora carry an obligation the reference engine (an
S3/DB scanner) never faces: pages a host's ``robots.txt`` disallows
should not enter the training set.  The public REP semantics
(RFC 9309 / the original Google spec) implemented here:

* rules are grouped by ``User-agent``; a group applies to the given
  agent token (case-insensitive substring product token) or to ``*``;
  the MOST SPECIFIC group wins (an agent-named group shadows ``*``).
* within the applicable group, the rule with the LONGEST matching path
  prefix wins; on equal length, ``Allow`` wins.  No matching rule →
  allowed.  Empty ``Disallow:`` means allow-all (the classic idiom).
* ``$`` anchors end-of-path and ``*`` wildcards inside paths are
  matched (translated to an anchored regex); plain prefixes take the
  fast literal path.

Spark shapes:

* ``parse_robots`` — one pandas UDF pass over the (host, robots_txt)
  relation (robots files are small; the corpus of HOSTS is ~10^7-10^8
  at web scale — metadata-sized next to 10^12 documents) → an exploded
  (host, agent, allow, pattern) rule relation.
* ``filter_disallowed`` — the url corpus joins the rule relation on
  host (rules BROADCAST when they fit — the usual case; set
  ``broadcast_rules=False`` to let AQE/sort-merge handle a giant rule
  set), evaluates matches JVM-side (``startswith`` for literal
  prefixes, ``rlike`` for wildcard rules), and resolves precedence with
  one ``max_by`` aggregation over (match_len, allow) — no window, no
  Python in the per-url path.

No reference analogue (SURVEY.md §2.2's filters are object-metadata
level); part of the beyond-reference web-crawl toolkit next to
[[urls]] and the F1/F2 prefilters.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULE_SCHEMA = (
    "host string, agent string, allow boolean, pattern string, "
    "is_literal boolean, pat_len int"
)


def _parse_one(host: str, txt: str) -> list[tuple]:
    rows: list[tuple] = []
    agents: list[str] = []
    group_open = False  # collecting user-agent lines for the next rules
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not group_open:
                agents = []
                group_open = True
            # an empty 'User-agent:' value would become token '' which
            # F.lit(agent).contains('') matches for EVERY crawler,
            # silently shadowing the host's '*' group — skip it (the
            # group stays open; rules under only-empty agents are ignored)
            if value:
                agents.append(value.lower())
        elif field in ("allow", "disallow"):
            group_open = False
            if not agents:
                continue  # rules before any user-agent line: ignored
            if not value:
                if field == "disallow":
                    # "Disallow:" (empty) = allow everything
                    for a in agents:
                        rows.append((host, a, True, "/", True, 0))
                continue
            is_literal = "*" not in value and not value.endswith("$")
            for a in agents:
                rows.append(
                    (host, a, field == "allow", value, is_literal,
                     len(value))
                )
        else:
            # sitemap / crawl-delay / unknown fields end nothing
            continue
    return rows


def parse_robots(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → exploded rule relation (RULE_SCHEMA)."""

    def explode(pdf_iter):
        for pdf in pdf_iter:
            out: list[tuple] = []
            for host, txt in zip(pdf[host_col], pdf[txt_col]):
                out.extend(_parse_one(host, txt))
            yield pd.DataFrame(
                out,
                columns=[
                    "host", "agent", "allow", "pattern", "is_literal",
                    "pat_len",
                ],
            )

    return df.select(host_col, txt_col).mapInPandas(
        explode, schema=RULE_SCHEMA
    )


def _pattern_regex(pattern: str) -> str:
    """REP wildcard pattern → anchored Python regex ('*' = any run, '$' =
    end of path). NOT used by ``filter_disallowed`` (which builds the
    equivalent translation JVM-side); kept as the independent reference
    implementation that ``tests/test_robots.py`` pins the JVM
    regexp_replace chain against, so the two cannot silently drift."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(
        ".*" if c == "*" else re.escape(c) for c in body
    )
    return "^" + rx + ("$" if anchored else "")


def filter_disallowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    broadcast_rules: bool = True,
    broadcast_max_rules: int | None = 2_000_000,
) -> DataFrame:
    """Adds ``robots_allowed`` (boolean) per url.

    Precedence JVM-side: join candidate rules on host, keep matching
    ones, ``max_by`` on (pat_len, allow) — longest match wins, Allow
    wins ties.  Hosts with no rules (or no matching rule) are allowed.
    Group selection: rules whose agent token is contained in ``agent``
    (lowercased) shadow the ``*`` group when any exist for the host."""
    a = agent.lower()
    scheme = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"
    host = F.lower(
        F.regexp_extract(F.col(url_col), scheme + r"([^/?#]+)", 1)
    )
    path = F.regexp_extract(F.col(url_col), scheme + r"[^/?#]+([^#]*)", 1)
    u = urls.withColumn("_host", F.regexp_replace(host, r":\d+$", "")) \
            .withColumn("_path", F.when(path == "", "/").otherwise(path))

    r = rules.withColumn("_agent_match", F.lit(a).contains(F.col("agent")))
    r = r.filter(F.col("_agent_match") | (F.col("agent") == "*"))
    # named-group shadowing: if the host has any agent-matched rules,
    # drop its * rules (tiny relation → aggregate + rejoin is cheap)
    named = r.filter(F.col("_agent_match") & (F.col("agent") != "*")) \
             .select(F.col("host").alias("_nh")).distinct()
    r = (
        r.join(named, r["host"] == named["_nh"], "left")
        .filter(
            (F.col("agent") != "*") | F.col("_nh").isNull()
        )
        .select("host", "allow", "pattern", "is_literal", "pat_len")
    )
    if broadcast_rules:
        # size gate: a full-crawl host relation is ~10^8 hosts and its
        # rule relation can exceed executor memory — broadcast only when
        # the (ordinarily metadata-sized) relation is provably small.
        # One cheap count aggregation decides; above the threshold the
        # join falls back to a plain host-keyed shuffle. Pass
        # broadcast_max_rules=None to force the hint unconditionally.
        if broadcast_max_rules is None or r.count() <= broadcast_max_rules:
            r = F.broadcast(r)

    joined = u.join(r, u["_host"] == r["host"], "left")
    # wildcard rules: REP pattern → anchored regex, built JVM-side.
    # Escape every regex metachar INCLUDING '$' (a mid-pattern '$' is a
    # literal per the spec), then '*' → '.*', then re-anchor a TRAILING
    # escaped '\$' back to the end-of-path anchor.
    rx = F.concat(
        F.lit("^"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("pattern"),
                    r"([.\^\$\+\?\(\)\[\]\{\}\|\\])",
                    r"\\$1",
                ),
                r"\*",
                ".*",
            ),
            r"\\\$$",
            "\\$",
        ),
    )
    matched = joined.withColumn("_rx", rx).withColumn(
        "_m",
        F.when(F.col("pattern").isNull(), F.lit(False))
        .when(
            F.col("is_literal"),
            F.col("_path").startswith(F.col("pattern")),
        )
        .otherwise(F.expr("_path rlike _rx")),
    )
    verdict = (
        matched.groupBy(url_col)
        .agg(
            F.max_by(
                F.col("allow"),
                F.when(
                    F.col("_m"),
                    F.col("pat_len") * 2 + F.col("allow").cast("int"),
                ),
            ).alias("_best")
        )
        .select(
            url_col,
            F.coalesce(F.col("_best"), F.lit(True)).alias("robots_allowed"),
        )
    )
    return urls.join(verdict, url_col, "left")
