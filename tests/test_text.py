"""Text layer tests: BPE, prompts, Korean splitter, LIS repair."""

import numpy as np
import pytest

from qwen3_asr_tpu.config import DecoderConfig
from qwen3_asr_tpu.text import (
    BPETokenizer,
    build_aligner_prompt,
    build_asr_prompt,
    classes_to_timestamps,
    detect_language,
    extract_transcript,
    fix_timestamp_classes,
    get_feat_extract_output_lengths,
    pair_words,
    tokenize_korean,
)
from qwen3_asr_tpu.text.bpe import (
    _byte_to_unicode,
    bpe_string_to_bytes,
    bytes_to_bpe_string,
)
from qwen3_asr_tpu.text.prompt import audio_start_pos


# -- byte tables -------------------------------------------------------------

def test_byte_unicode_table_bijection():
    table = _byte_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256
    # printable ascii maps to itself
    assert table[ord("A")] == "A"
    assert table[ord("!")] == "!"
    # space and control bytes map to >= 256
    assert ord(table[ord(" ")]) >= 256
    assert ord(table[0]) >= 256
    # GPT-2 convention: space = U+0120 (Ġ)
    assert table[ord(" ")] == "Ġ"
    # roundtrip arbitrary bytes
    raw = bytes(range(256))
    assert bpe_string_to_bytes(bytes_to_bpe_string(raw)) == raw


# -- BPE ----------------------------------------------------------------------

def make_toy_tokenizer():
    # vocab over bytes 'h','e','l','o',' '(=Ġ) plus merges
    g = "Ġ"  # byte-level space
    vocab = ["h", "e", "l", "o", g, "he", "ll", "hell", "hello", g + "h",
             "<|endoftext|>", "[PAD11]"]
    merges = ["h e", "l l", "he ll", "hell o", g + " h"]
    return BPETokenizer(vocab, merges)


def test_bpe_encode_greedy_lowest_rank():
    tok = make_toy_tokenizer()
    # "hello" -> h e l l o -> (h e) -> he l l o -> (l l) -> he ll o
    # -> (he ll) -> hell o -> (hell o) -> hello
    assert tok.encode("hello") == [tok.token_to_id["hello"]]
    # unknown subwords are silently dropped (reference behavior)
    assert tok.encode("hezo") == [tok.token_to_id["he"], tok.token_to_id["o"]]


def test_bpe_space_prefix_on_non_first_words():
    tok = make_toy_tokenizer()
    ids = tok.encode("hello hello")
    # second word becomes " hello"; "h e" (rank 0) merges before "Ġ h"
    # (rank 4), so the word collapses to "hello" leaving a lone "Ġ"
    assert ids == [
        tok.token_to_id["hello"],
        tok.token_to_id["Ġ"],
        tok.token_to_id["hello"],
    ]


def test_bpe_decode_skips_specials():
    tok = make_toy_tokenizer()
    ids = [tok.token_to_id["hello"], 10, 11]  # <|endoftext|>, [PAD11]
    assert tok.decode(ids) == "hello"


def test_bpe_decode_utf8():
    # vocab containing byte-level pieces of a UTF-8 Korean string
    raw = "안녕".encode("utf-8")
    piece = bytes_to_bpe_string(raw)
    tok = BPETokenizer([piece], [])
    assert tok.decode([0]) == "안녕"


def test_bpe_roundtrip_bytes_vocab():
    # byte-level base vocab (256 single-char tokens) can encode anything
    table = _byte_to_unicode()
    vocab = [table[b] for b in range(256)]
    tok = BPETokenizer(vocab, [])
    text = "The quick brown fox! 123"
    ids = tok.encode(text)
    # whitespace collapses to single spaces (reference pre-split semantics)
    assert tok.decode(ids) == "The quick brown fox! 123"


# -- prompts ------------------------------------------------------------------

def test_asr_prompt_structure():
    cfg = DecoderConfig()
    toks = build_asr_prompt(3, cfg)
    assert toks[:3] == [151644, 8948, 198]
    assert toks.count(cfg.audio_pad_token_id) == 3
    i = audio_start_pos(toks, cfg)
    assert toks[i - 1] == cfg.audio_start_token_id
    assert toks[i + 3] == cfg.audio_end_token_id
    assert toks[-2:] == [77091, 198]


def test_aligner_prompt_structure():
    cfg = DecoderConfig()
    toks = build_aligner_prompt([7, 8, 9], 2, cfg)
    assert toks == [
        cfg.audio_start_token_id,
        cfg.audio_pad_token_id,
        cfg.audio_pad_token_id,
        cfg.audio_end_token_id,
        7, 8, 9,
    ]


def test_language_detection():
    assert detect_language("language Korean 안녕하세요") == "korean"
    assert detect_language("language English hello") == "english"
    assert detect_language("hello world") == ""
    assert detect_language("language korean x") == ""  # must be capitalized
    assert extract_transcript("language Korean 안녕") == "안녕"
    assert extract_transcript("no prefix here") == "no prefix here"
    assert extract_transcript("language English  spaced") == "spaced"


# -- korean splitter ----------------------------------------------------------

def test_korean_splitter():
    ko = {"안녕하", "먹었"}
    # <=2 chars pass through
    assert tokenize_korean("집 갔다", ko) == ["집", "갔다"]
    # dictionary hit picks the longest matching prefix
    assert tokenize_korean("안녕하세요", ko) == ["안녕하", "세요"]
    # no dictionary hit: longest left (whole word, e==length wins ties)
    assert tokenize_korean("가나다라", ko) == ["가나다라"]


def test_korean_vendored_dict():
    """find -> load -> tokenize through the vendored words-only asset."""
    from qwen3_asr_tpu.text.korean import find_korean_dict, load_korean_dict

    path = find_korean_dict()
    assert path.endswith("korean_words.txt")
    ko = load_korean_dict(path)
    assert len(ko) > 15000
    assert "힙합" in ko  # real dictionary content, not a placeholder
    # pick a 2-char dictionary word whose 3-char extension is NOT a dict
    # word: the splitter must cut exactly after the dictionary hit
    word = next(w for w in sorted(ko)
                if len(w) == 2 and "가" <= w[0] <= "힣"
                and (w + "게") not in ko)
    assert tokenize_korean(word + "게", ko) == [word, "게"]


# -- timestamps ---------------------------------------------------------------

def test_feat_extract_output_lengths():
    # 100 mel frames -> 13 pads; formula from forced_aligner.cpp:1171-1178
    assert get_feat_extract_output_lengths(100) == 13
    # matches chunk math for multiples
    assert get_feat_extract_output_lengths(200) == 26
    # 92s clip ~ 9200 frames
    assert get_feat_extract_output_lengths(9200) == 13 * 92


def chunk_output_len(n):
    for _ in range(3):
        n = (n - 1) // 2 + 1
    return n


def test_feat_lengths_match_chunk_math():
    # pad count must equal the encoder's actual total output length
    # (chunks of 100, last partial) for injection to line up
    for n_frames in [1, 7, 99, 100, 101, 205, 999, 1000, 9206]:
        total = 0
        pos = 0
        while pos < n_frames:
            clen = min(100, n_frames - pos)
            total += chunk_output_len(clen)
            pos += 100
        assert get_feat_extract_output_lengths(n_frames) == total, n_frames


def test_lis_repair_identity_on_sorted():
    data = [1, 2, 3, 5, 8, 8, 9]
    assert fix_timestamp_classes(data) == data


def test_lis_repair_short_anomaly_snaps_to_neighbor():
    # 100 is anomalous; snaps to nearer valid neighbor (tie -> left)
    assert fix_timestamp_classes([1, 2, 100, 3, 4]) == [1, 2, 2, 3, 4]


def test_lis_repair_long_run_interpolates():
    data = [10, 90, 80, 70, 20, 30]
    # LIS = [10, 20, 30]; anomalies 90,80,70 (run of 3) interpolate 10..20
    # with step (20-10)/4 = 2.5, truncated toward zero
    assert fix_timestamp_classes(data) == [10, 12, 15, 17, 20, 30]


def test_lis_repair_run_with_no_right_anchor():
    # LIS picks the FIRST maximal chain: [10, 90]; the trailing run of 3
    # anomalies has no right anchor and copies the left value (reference
    # forced_aligner.cpp:1251-1252)
    data = [10, 90, 80, 70, 20]
    assert fix_timestamp_classes(data) == [10, 90, 90, 90, 90]


def test_lis_repair_empty_and_single():
    assert fix_timestamp_classes([]) == []
    assert fix_timestamp_classes([5]) == [5]


def test_classes_to_timestamps_and_pairing():
    ts = classes_to_timestamps([0, 10, 20, 1000], 80)
    assert ts == [0.0, 0.8, 1.6, 80.0]
    words = pair_words(["a", "b"], [0.0, 0.8, 1.6, 80.0], audio_duration=2.0)
    assert words[0] == {"word": "a", "start": 0.0, "end": 0.8}
    # clamped to duration
    assert words[1] == {"word": "b", "start": 1.6, "end": 2.0}
    # missing timestamps default to (0, duration)
    words = pair_words(["a", "b"], [0.0, 0.5], audio_duration=3.0)
    assert words[1] == {"word": "b", "start": 0.0, "end": 3.0}


# ---------------------------------------------------------------------------
# Subtitle rendering (text/subtitles.py)
# ---------------------------------------------------------------------------

def test_subtitle_cue_grouping():
    from qwen3_asr_tpu.text.subtitles import group_words_into_cues

    # 42-char line limit splits; a >1 s gap splits; duration cap splits
    words = [("alpha", 0.0, 0.4), ("beta", 0.5, 0.9),
             ("gamma", 2.5, 2.9),                      # 1.6 s gap -> new cue
             ("delta", 3.0, 3.4)]
    cues = group_words_into_cues(words)
    assert [c.text for c in cues] == ["alpha beta", "gamma delta"]
    assert cues[0].start == 0.0 and cues[0].end == 0.9
    assert cues[1].start == 2.5 and cues[1].end == 3.4

    # line-length split: words that would exceed max_chars start a new cue
    longw = [(f"word{i:02d}", i * 0.2, i * 0.2 + 0.1) for i in range(12)]
    cues = group_words_into_cues(longw, max_chars=20)
    assert all(len(c.text) <= 20 for c in cues)
    assert " ".join(c.text for c in cues) == " ".join(w for w, _, _ in longw)

    # duration split
    slow = [("a", 0.0, 2.0), ("b", 2.0, 4.0), ("c", 4.0, 6.0)]
    cues = group_words_into_cues(slow, max_duration=4.0, max_gap=10.0)
    assert len(cues) == 2

    # zero-length words get a renderable floor
    cues = group_words_into_cues([("x", 1.0, 1.0)])
    assert cues[0].end > cues[0].start


def test_srt_and_vtt_format():
    from qwen3_asr_tpu.text.subtitles import words_to_srt, words_to_vtt

    words = [("hello", 0.0, 0.5), ("world", 0.6, 1.25),
             ("again", 3661.5, 3662.0)]  # past the hour mark
    srt = words_to_srt(words)
    lines = srt.split("\n")
    assert lines[0] == "1"
    assert lines[1] == "00:00:00,000 --> 00:00:01,250"
    assert lines[2] == "hello world"
    assert "2" in lines and "01:01:01,500 --> 01:01:02,000" in lines

    vtt = words_to_vtt(words)
    vlines = vtt.split("\n")
    assert vlines[0] == "WEBVTT"
    assert "00:00:00.000 --> 00:00:01.250" in vlines
    assert "01:01:01.500 --> 01:01:02.000" in vlines

    # dict and object inputs render identically to tuples
    class W:  # noqa: D401 - tiny stand-in
        def __init__(self, w, s, e):
            self.word, self.start, self.end = w, s, e
    as_dicts = [{"word": w, "start": s, "end": e} for w, s, e in words]
    as_objs = [W(w, s, e) for w, s, e in words]
    assert words_to_srt(as_dicts) == srt
    assert words_to_srt(as_objs) == srt
