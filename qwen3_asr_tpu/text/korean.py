"""Korean L/R word splitter (LTokenizer-style).

Dictionary-driven left-stem split: for each whitespace word longer than two
characters, pick the longest prefix (>= 2 chars) found in the dictionary and
split the word into (prefix, remainder). Mirrors forced_aligner.cpp:1485-1562.
"""

from __future__ import annotations

import os

# Asset filenames accepted, in preference order: the vendored words-only
# snapshot (assets/korean_words.txt, regenerable via
# tools/make_korean_dict.py) and the reference's jieba-format name.
_DICT_NAMES = ("korean_words.txt", "korean_dict_jieba.dict")

# repo/package-level assets dir (…/qwen3_asr_tpu/../assets)
_PKG_ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets",
)


def find_korean_dict(model_path: str = "") -> str:
    """Locate the Korean dictionary: next to the model, in ./assets, then in
    the package's vendored assets (search order mirrors main.cpp:275-292,
    extended with the vendored snapshot so it works from any CWD)."""
    dirs = []
    if model_path:
        d = os.path.dirname(model_path) or "."
        dirs += [os.path.join(d, "..", "assets"), os.path.join(d, "assets")]
    dirs += ["assets", _PKG_ASSETS]
    for directory in dirs:
        for name in _DICT_NAMES:
            cand = os.path.join(directory, name)
            if os.path.isfile(cand):
                return cand
    return ""


def load_korean_dict(path: str) -> set[str]:
    """Load dictionary words. Accepts both the jieba 'word freq tag' format
    (only the word column is used, forced_aligner.cpp:1543-1562) and the
    vendored words-only format (one word per line)."""
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
