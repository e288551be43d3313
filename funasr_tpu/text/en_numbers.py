"""English spoken-number ITN rules (counterpart of FunASR
``fun_text_processing/inverse_text_normalization/en/``)."""

from __future__ import annotations

import re

ONES = {"zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
        "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
        "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
        "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19}
TENS = {"twenty": 20, "thirty": 30, "forty": 40, "fifty": 50, "sixty": 60,
        "seventy": 70, "eighty": 80, "ninety": 90}
SCALES = {"hundred": 100, "thousand": 1000, "million": 10 ** 6,
          "billion": 10 ** 9}
NUM_WORDS = set(ONES) | set(TENS) | set(SCALES) | {"and"}


def parse_en_number(words):
    """List of number words -> int, or None."""
    total = 0
    current = 0
    seen = False
    for w in words:
        w = w.lower()
        if w in ONES:
            current += ONES[w]
            seen = True
        elif w in TENS:
            current += TENS[w]
            seen = True
        elif w == "hundred":
            current = max(current, 1) * 100
            seen = True
        elif w in SCALES:
            total += max(current, 1) * SCALES[w]
            current = 0
            seen = True
        elif w == "and":
            continue
        else:
            return None
    return total + current if seen else None


def inverse_normalize_en(text: str) -> str:
    """Spoken en -> written numbers/percent ("twenty five percent" -> "25%")."""
    words = text.split()
    out = []
    i = 0
    while i < len(words):
        w = re.sub(r"[^\w']", "", words[i]).lower()
        if w in NUM_WORDS and w != "and":
            j = i
            while j < len(words):
                wj = re.sub(r"[^\w']", "", words[j]).lower()
                if wj == "and":
                    # "and" joins a number only after a scale word ("hundred and")
                    prev = re.sub(r"[^\w']", "", words[j - 1]).lower()
                    nxt = (re.sub(r"[^\w']", "", words[j + 1]).lower()
                           if j + 1 < len(words) else "")
                    if prev in SCALES and nxt in NUM_WORDS and nxt != "and":
                        j += 1
                        continue
                    break
                if wj in NUM_WORDS:
                    j += 1
                else:
                    break
            val = parse_en_number(
                [re.sub(r"[^\w']", "", x) for x in words[i:j]])
            if val is not None:
                if j < len(words) and words[j].lower().startswith("percent"):
                    out.append(f"{val}%")
                    j += 1
                else:
                    out.append(str(val))
                i = j
                continue
        out.append(words[i])
        i += 1
    return " ".join(out)
