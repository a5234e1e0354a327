"""Korean L/R word splitter (LTokenizer-style).

Dictionary-driven left-stem split: for each whitespace word longer than two
characters, pick the longest prefix (>= 2 chars) found in the dictionary and
split the word into (prefix, remainder). Mirrors forced_aligner.cpp:1485-1562.
"""

from __future__ import annotations


def load_korean_dict(path: str) -> set[str]:
    """Load 'word freq tag' lines; only the word column is used
    (forced_aligner.cpp:1543-1562)."""
    words: set[str] = set()
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            word = line.split(" ", 1)[0]
            if word:
                words.add(word)
    return words


def tokenize_korean(text: str, ko_dict: set[str]) -> list[str]:
    """Split each whitespace word into L+R with the best dictionary hit.

    Scoring matches the reference (forced_aligner.cpp:1505-1538): a
    dictionary hit scores 1, otherwise 0; ties prefer the LONGEST left part
    (the loop takes `e` ascending and replaces on score == best with e >
    best_left_len).
    """
    result: list[str] = []
    for word in text.split():
        chars = list(word)
        length = len(chars)
        if length <= 2:
            result.append(word)
            continue
        best_score = -1e9
        best_left_len = 0
        best_left = ""
        best_right = ""
        for e in range(2, length + 1):
            left = "".join(chars[:e])
            right = "".join(chars[e:])
            score = 1.0 if left in ko_dict else 0.0
            if score > best_score or (score == best_score and e > best_left_len):
                best_score = score
                best_left_len = e
                best_left = left
                best_right = right
        result.append(best_left)
        if best_right:
            result.append(best_right)
    return result
