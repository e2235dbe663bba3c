"""Toxicity word-list (north-star component; public-method analogue of the
C4 'bad words' filter). Matching semantics: a document is toxic when any
lowercased whitespace token equals a listed word — token membership, not
substring, so 'class' or 'assess' never fire. The Spark operator uses
``arrays_overlap`` on the token array; the oracle uses set intersection —
identical semantics by construction."""

from __future__ import annotations

TOXIC_WORDS: tuple[str, ...] = (
    "arse",
    "arsehole",
    "asshole",
    "bastard",
    "bitch",
    "bollocks",
    "bullshit",
    "cock",
    "crap",
    "cunt",
    "dick",
    "dickhead",
    "dumbass",
    "fuck",
    "fucker",
    "fucking",
    "jackass",
    "motherfucker",
    "nigger",
    "piss",
    "prick",
    "pussy",
    "shit",
    "shithead",
    "slut",
    "twat",
    "wanker",
    "whore",
)

TOXIC_SET = frozenset(TOXIC_WORDS)
