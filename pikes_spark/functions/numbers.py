"""Spelled-number parsing — contract of the reference's NumberSpeller
(pikes-resources NumberSpeller, used by NAFFilter.java:625-665 for
CARDINAL/ORDINAL/PERCENT/MONEY value normalization)."""

from __future__ import annotations

import re
from typing import List, Optional

_UNITS = {"zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
          "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10,
          "eleven": 11, "twelve": 12, "thirteen": 13, "fourteen": 14,
          "fifteen": 15, "sixteen": 16, "seventeen": 17, "eighteen": 18,
          "nineteen": 19}
_TENS = {"twenty": 20, "thirty": 30, "forty": 40, "fifty": 50, "sixty": 60,
         "seventy": 70, "eighty": 80, "ninety": 90}
_SCALES = {"hundred": 100, "thousand": 1_000, "million": 1_000_000,
           "billion": 1_000_000_000, "trillion": 1_000_000_000_000}
_ORDINAL_UNITS = {"first": 1, "second": 2, "third": 3, "fourth": 4,
                  "fifth": 5, "sixth": 6, "seventh": 7, "eighth": 8,
                  "ninth": 9, "tenth": 10, "eleventh": 11, "twelfth": 12,
                  "twentieth": 20, "thirtieth": 30, "hundredth": 100}


def parse_spelled_number(words: List[str]) -> Optional[float]:
    """Parse a spelled (or mixed digit/spelled) number sequence:
    ["five", "billion"] -> 5e9; ["3.5", "million"] -> 3.5e6;
    ["twenty-three"] -> 23. Returns None if unparseable."""
    total = 0.0
    current = 0.0
    saw_any = False
    for raw in words:
        for word in raw.lower().replace(",", "").split("-"):
            if not word:
                continue
            if re.fullmatch(r"\d+(?:\.\d+)?", word):
                current += float(word)
                saw_any = True
            elif word in _UNITS:
                current += _UNITS[word]
                saw_any = True
            elif word in _TENS:
                current += _TENS[word]
                saw_any = True
            elif word == "hundred":
                current = (current or 1) * 100
                saw_any = True
            elif word in _SCALES and word != "hundred":
                total += (current or 1) * _SCALES[word]
                current = 0.0
                saw_any = True
            elif word in _ORDINAL_UNITS:
                current += _ORDINAL_UNITS[word]
                saw_any = True
            elif word == "and":
                continue
            else:
                return None
    if not saw_any:
        return None
    return total + current


def ordinal_rank(word: str) -> Optional[int]:
    """'third' -> 3, '5th' -> 5."""
    low = word.lower()
    if low in _ORDINAL_UNITS:
        return _ORDINAL_UNITS[low]
    m = re.fullmatch(r"(\d+)(?:st|nd|rd|th)", low)
    return int(m.group(1)) if m else None
