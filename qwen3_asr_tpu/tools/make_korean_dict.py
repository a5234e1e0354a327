#!/usr/bin/env python3
"""Derive the vendored Korean word list (assets/korean_words.txt) from a
jieba-format dictionary.

The aligner's LTokenizer uses only the word column of the reference's
`assets/korean_dict_jieba.dict` ("word freq tag" lines; the loader at
forced_aligner.cpp:1543-1562 discards freq/tag — in the shipped asset they
are the constants "10 x"). This tool extracts, dedups, and sorts that
column into the words-only snapshot this repo ships, so the asset can be
regenerated from any jieba-style dictionary:

    python -m qwen3_asr_tpu.tools.make_korean_dict SRC.dict assets/korean_words.txt
"""

from __future__ import annotations

import sys


def derive_word_list(src_path: str) -> list[str]:
    words = set()
    with open(src_path, "r", encoding="utf-8") as f:
        for line in f:
            cols = line.split()
            if cols:
                words.add(cols[0])
    return sorted(words)


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    words = derive_word_list(argv[1])
    with open(argv[2], "w", encoding="utf-8") as f:
        f.write("\n".join(words) + "\n")
    print(f"wrote {len(words)} words to {argv[2]}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
