"""String-cleaning functions F8-F10 as Column-expression builders.

Reference: utils/clean.go (CleanText, CleanString) and the
kennygrant/sanitize.BaseName error sanitizer used by the dead-letter sink
(main.go:76,92,143). All pure built-in expressions — no Python in the path.

Divergence note (documented): the reference measures length in *bytes*
(Go ``len``); we measure in characters, the natural Spark/SQL semantic.
For the ASCII-dominant inputs in the testdata the two coincide.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


# Char map from reference utils/clean.go:26-81, split into:
#  - multi-char outputs (string replaces, applied first)
#  - 1:1 substitutions + deletions (one translate() pass)
_MULTI_REPLACEMENTS: list[tuple[str, str]] = [
    ("&", "and"),   # ampersand
    ("…", "..."),   # horizontal ellipsis
]

_SUBSTITUTIONS: list[tuple[str, str]] = [
    ("ẽ", "e"),     # e with tilde
    ("​", " "),     # zero-width space
    ("‎", " "),     # LTR mark
    ("‐", "-"),
    ("–", "-"),
    ("—", "-"),
    ("•", "-"),     # bullet
    ("″", '"'),
    ("‴", '"'),
    ("‵", "'"),
    ("‶", '"'),
    ("‷", '"'),
    ("‸", "."),
    ("⁄", "/"),
    ("‚", ","),
    ("‛", "'"),
    ("“", '"'),
    ("”", '"'),
    ("„", '"'),
    ("‟", '"'),
    ("➢", ">"),
    (" ", " "),     # nbsp
    ("ü", "u"),     # u-umlaut
]

_DELETIONS: str = "".join(
    [
        "′",  # prime
        "'",
        "|",
        "‘",
        "’",
        " ",  # line separator
        "™",  # (TM)
        "☀",
        "☺",
        "⛺",
        "️",
        "¢",
        "®",
        "½",
        "Þ",
        "â",
        "é",
        "\U0001f44c",
        "\U0001f44d",
        "\U0001f642",
        "\U0001f601",
        "\U0001f690",
        "\U0001f334",
        "\U0001f3dd",
        "\U0001f3fd",
        "\U0001f3d6",
        "\U0001f3a3",
        "\U0001f525",
        "\U0001f60a",
    ]
)


def _apply_char_map(col: Column) -> Column:
    for needle, repl in _MULTI_REPLACEMENTS:
        col = F.replace(col, F.lit(needle), F.lit(repl))
    matching = "".join(src for src, _ in _SUBSTITUTIONS) + _DELETIONS
    replace = "".join(dst for _, dst in _SUBSTITUTIONS)  # shorter => tail deleted
    return F.translate(col, matching, replace)


def clean_text(s: ColumnOrName, max_length: int) -> Column:
    """F8 — ``CleanText`` (reference: utils/clean.go:9-102).

    Semantics, in reference order:
    1. strings shorter than 5 chars → ``""``
    2. newline handling: keep the first line, then append further lines
       (space-joined) only while the accumulated text is still shorter than
       ``max_length``
    3. unicode punctuation/emoji normalization via the char map
    4. if longer than ``max_length``: truncate to ``max_length-3`` + ``"..."``
    """
    col = _col(s)
    sections = F.split(col, "\n")
    joined = F.aggregate(
        F.slice(sections, 2, F.greatest(F.size(sections) - 1, F.lit(0))),
        F.element_at(sections, 1),
        lambda acc, part: F.when(F.length(acc) < max_length, F.concat(acc, F.lit(" "), part)).otherwise(acc),
    )
    mapped = _apply_char_map(joined)
    truncated = F.when(
        F.length(mapped) > max_length,
        F.concat(F.substring(mapped, 1, max_length - 3), F.lit("...")),
    ).otherwise(mapped)
    return F.when(F.length(col) < 5, F.lit("")).otherwise(truncated)


def clean_string(s: ColumnOrName) -> Column:
    """F9 — strip every non-alphanumeric character
    (reference: utils/clean.go:105-111, pattern ``[^a-zA-Z0-9]+``)."""
    return F.regexp_replace(_col(s), "[^a-zA-Z0-9]+", "")


def sanitize_basename(s: ColumnOrName) -> Column:
    """F10 — path-safe error text for the dead-letter sink, approximating
    kennygrant/sanitize.BaseName (used at reference main.go:76,92,143):
    runs of characters outside ``[a-zA-Z0-9-]`` collapse to a single ``-``."""
    return F.regexp_replace(_col(s), "[^a-zA-Z0-9-]+", "-")
