"""Subtitle rendering (SRT / WebVTT) from word-level alignments.

The reference emits alignment only as JSON (main.cpp:255-273); subtitle
files are the most common downstream use of word timestamps, so this repo
renders them directly. Words come from `ForcedAligner.align` (word, start,
end in seconds); cues are built by greedy line-filling with readability
bounds (line length, cue duration, and silence gaps split cues).

Works with any word objects exposing `.word`, `.start`, `.end` (or
3-tuples / dicts with those keys).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Cue:
    start: float
    end: float
    text: str


def _as_triples(words) -> list[tuple[str, float, float]]:
    out = []
    for w in words:
        if isinstance(w, dict):
            out.append((w["word"], float(w["start"]), float(w["end"])))
        elif isinstance(w, (tuple, list)):
            out.append((str(w[0]), float(w[1]), float(w[2])))
        else:
            out.append((w.word, float(w.start), float(w.end)))
    return out


def group_words_into_cues(
    words,
    max_chars: int = 42,
    max_duration: float = 5.0,
    max_gap: float = 1.0,
) -> list[Cue]:
    """Greedy cue builder: a cue closes when adding the next word would
    exceed `max_chars` (one subtitle line at standard broadcast width),
    push the cue past `max_duration` seconds, or when a silence longer
    than `max_gap` separates consecutive words (a natural phrase break).
    Zero-length cues get a 10 ms floor so players render them."""
    triples = _as_triples(words)
    cues: list[Cue] = []
    cur: list[tuple[str, float, float]] = []

    def flush():
        if not cur:
            return
        start = cur[0][1]
        end = max(cur[-1][2], start + 0.01)
        cues.append(Cue(start, end, " ".join(w for w, _, _ in cur)))
        cur.clear()

    for word, start, end in triples:
        if cur:
            text_len = len(" ".join(w for w, _, _ in cur)) + 1 + len(word)
            gap = start - cur[-1][2]
            if (text_len > max_chars
                    or end - cur[0][1] > max_duration
                    or gap > max_gap):
                flush()
        cur.append((word, start, end))
    flush()
    return cues


def _timecode(seconds: float, sep: str) -> str:
    if seconds < 0:
        seconds = 0.0
    ms = int(round(seconds * 1000))
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, ms = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{ms:03d}"


def words_to_srt(words, **cue_opts) -> str:
    """SubRip: 1-indexed cues, `HH:MM:SS,mmm --> HH:MM:SS,mmm`."""
    lines = []
    for i, cue in enumerate(group_words_into_cues(words, **cue_opts), 1):
        lines.append(str(i))
        lines.append(f"{_timecode(cue.start, ',')} --> "
                     f"{_timecode(cue.end, ',')}")
        lines.append(cue.text)
        lines.append("")
    return "\n".join(lines)


def words_to_vtt(words, **cue_opts) -> str:
    """WebVTT: `WEBVTT` header, `HH:MM:SS.mmm --> HH:MM:SS.mmm`."""
    lines = ["WEBVTT", ""]
    for cue in group_words_into_cues(words, **cue_opts):
        lines.append(f"{_timecode(cue.start, '.')} --> "
                     f"{_timecode(cue.end, '.')}")
        lines.append(cue.text)
        lines.append("")
    return "\n".join(lines)
