"""Timestamp post-processing for the forced aligner (host side, tiny).

- `get_feat_extract_output_lengths`: audio_pad count from mel frame count
  (HF formula, forced_aligner.cpp:1171-1178),
- `fix_timestamp_classes`: LIS-based anomaly repair with the reference's
  exact tie-breaking (forced_aligner.cpp:1183-1265),
- `classes_to_timestamps` / `pair_words`: class -> seconds and word
  (start, end) pairing (forced_aligner.cpp:1267-1278, 1696-1714).
"""

from __future__ import annotations


def get_feat_extract_output_lengths(input_lengths: int) -> int:
    leave = input_lengths % 100
    feat = (leave - 1) // 2 + 1
    return ((feat - 1) // 2 + 1 - 1) // 2 + 1 + (input_lengths // 100) * 13


def fix_timestamp_classes(data: list[int]) -> list[int]:
    """Longest-increasing-subsequence repair, O(n^2) DP.

    Values on the LIS are kept; runs of anomalies of length <= 2 snap to the
    nearer valid neighbor (ties toward the left), longer runs are linearly
    interpolated. Exact port of forced_aligner.cpp:1183-1265. Uses the
    native C++ implementation when built (native/qwen3_host.cpp).
    """
    if len(data) == 0:
        return []
    try:
        from qwen3_asr_tpu.runtime import native

        if native.available():
            out = native.lis_repair(list(data))
            if out is not None:
                return out
    except Exception:
        pass
    return fix_timestamp_classes_py(data)


def fix_timestamp_classes_py(data: list[int]) -> list[int]:
    """Pure-Python LIS repair (oracle for the native version)."""
    n = len(data)
    if n == 0:
        return []

    dp = [1] * n
    parent = [-1] * n
    for i in range(1, n):
        for j in range(i):
            if data[j] <= data[i] and dp[j] + 1 > dp[i]:
                dp[i] = dp[j] + 1
                parent[i] = j

    max_idx = max(range(n), key=lambda i: dp[i])
    # note: `max` with key returns the FIRST maximal index, matching the
    # reference's strict `dp[i] > max_len` scan.

    is_normal = [False] * n
    idx = max_idx
    while idx != -1:
        is_normal[idx] = True
        idx = parent[idx]

    result = list(data)
    i = 0
    while i < n:
        if is_normal[i]:
            i += 1
            continue
        j = i
        while j < n and not is_normal[j]:
            j += 1
        count = j - i

        left_val = -1
        for k in range(i - 1, -1, -1):
            if is_normal[k]:
                left_val = result[k]
                break
        right_val = -1
        for k in range(j, n):
            if is_normal[k]:
                right_val = result[k]
                break

        if count <= 2:
            for k in range(i, j):
                if left_val < 0:
                    result[k] = right_val
                elif right_val < 0:
                    result[k] = left_val
                else:
                    # distance to left anchor (i-1) vs right anchor (j)
                    result[k] = left_val if (k - (i - 1)) <= (j - k) else right_val
        else:
            if left_val >= 0 and right_val >= 0:
                step = (right_val - left_val) / (count + 1)
                for k in range(i, j):
                    result[k] = int(left_val + step * (k - i + 1))
            elif left_val >= 0:
                for k in range(i, j):
                    result[k] = left_val
            elif right_val >= 0:
                for k in range(i, j):
                    result[k] = right_val
        i = j

    return result


def classes_to_timestamps(
    classes: list[int], segment_time_ms: int = 80
) -> list[float]:
    seg = segment_time_ms / 1000.0
    return [c * seg for c in classes]


def pair_words(
    words: list[str], timestamps: list[float], audio_duration: float
) -> list[dict]:
    """2 timestamps per word: ts[2i]=start, ts[2i+1]=end; clamp to duration
    and default missing entries (forced_aligner.cpp:1696-1714)."""
    ts = [min(t, audio_duration) for t in timestamps]
    out = []
    for i, word in enumerate(words):
        start = ts[2 * i] if 2 * i < len(ts) else 0.0
        end = ts[2 * i + 1] if 2 * i + 1 < len(ts) else audio_duration
        out.append({"word": word, "start": start, "end": end})
    return out
