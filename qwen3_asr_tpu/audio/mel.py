"""Log-mel spectrogram frontend.

Semantics match the reference (mel_spectrogram.cpp:484-628) and, transitively,
HuggingFace's WhisperFeatureExtractor as used by Qwen3-ASR:

  reflect-pad n_fft/2 each side -> Hann(400, periodic) window, hop 160
  -> real DFT power spectrum (201 bins) -> HTK mel filterbank (Slaney norm)
  -> log10 -> global clamp to (max - 8) -> (x + 4) / 4

The device path computes the DFT as two [N,400]x[400,201] matmuls (MXU) over
all frames at once instead of the reference's per-frame host loop
(mel_spectrogram.cpp:547-600), and fuses the window/power/filterbank/log into
one jitted XLA program. `log_mel_spectrogram_ref` is a float64 numpy oracle
used by the tests (mirrors the portable f64 path, mel_spectrogram.cpp:569-600).
"""

from __future__ import annotations

import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import HOP_LENGTH, N_FFT, N_MELS, SAMPLE_RATE

# device-resident transposed filterbanks, uploaded once per distinct host
# array: on a network-attached chip the per-call ~100 KB upload costs a
# full host-link round trip per file. Keyed by id() with a weakref guard
# against id reuse after gc; filterbanks are long-lived pipeline state.
_FILTERS_T_DEV: dict[int, tuple] = {}


def filters_t_device(filters) -> jax.Array:
    """[n_mels, 201] host filterbank -> cached [201, n_mels] device array.
    A jax.Array passes through; it may arrive in either orientation (the
    public mel entry points historically accepted a device-resident
    [n_mels, 201] bank), disambiguated by shape (201 != n_mels)."""
    if isinstance(filters, jax.Array):
        if filters.shape[0] != N_FFT // 2 + 1:  # [n_mels, 201] -> transpose
            return filters.T
        return filters
    key = id(filters)
    hit = _FILTERS_T_DEV.get(key)
    if hit is not None and hit[0]() is filters:
        return hit[1]
    dev = jnp.asarray(np.ascontiguousarray(filters.T))
    if len(_FILTERS_T_DEV) >= 8:  # bound growth (tests create many)
        _FILTERS_T_DEV.clear()
    _FILTERS_T_DEV[key] = (weakref.ref(filters), dev)
    return dev

_LOG_FLOOR = 1e-10


# ---------------------------------------------------------------------------
# Mel filterbank (host, numpy) — reference: mel_spectrogram.cpp:361-415
# ---------------------------------------------------------------------------

def _hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def _mel_to_hz(mel):
    return 700.0 * (np.power(10.0, np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def generate_mel_filters(
    n_mels: int = N_MELS, n_fft: int = N_FFT, sample_rate: int = SAMPLE_RATE
) -> np.ndarray:
    """HTK-scale triangular filterbank with Slaney normalization.

    Returns float32 [n_mels, n_fft//2 + 1].
    """
    n_bins = 1 + n_fft // 2
    fmax = sample_rate / 2.0
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    # float (fractional) FFT-bin positions, reference: mel_spectrogram.cpp:386-389
    bin_pts = (n_fft + 1) * hz_pts / sample_rate

    k = np.arange(n_bins, dtype=np.float64)[None, :]          # [1, n_bins]
    left = bin_pts[:-2][:, None]                                # [n_mels, 1]
    center = bin_pts[1:-1][:, None]
    right = bin_pts[2:][:, None]

    up = (k - left) / (center - left)
    down = (right - k) / (right - center)
    weights = np.where((k >= left) & (k <= center), up, 0.0)
    weights = np.where((k >= center) & (k <= right), down, weights)
    weights = np.maximum(weights, 0.0)

    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def load_mel_filters_npy(path: str) -> np.ndarray:
    """Load a HuggingFace-exported mel filterbank .npy ([n_fft_bins, n_mels],
    float32/float64) and transpose to this stack's [n_mels, n_fft_bins]
    layout — same contract as the reference's load_mel_filters_npy
    (mel_spectrogram.cpp:292-347)."""
    arr = np.load(path)
    if arr.ndim != 2:
        raise ValueError(f"expected 2D mel filterbank, got shape {arr.shape}")
    return np.ascontiguousarray(arr.T, dtype=np.float32)


def _hann_window(n_fft: int = N_FFT) -> np.ndarray:
    """Periodic Hann window, float64 (reference: mel_spectrogram.cpp:50-55)."""
    i = np.arange(n_fft, dtype=np.float64)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * i / n_fft))


def reflect_pad(samples: np.ndarray, pad: int = N_FFT // 2) -> np.ndarray:
    """Reflect padding with zero fill past the signal edge.

    Matches the reference exactly (mel_spectrogram.cpp:492-515): mirror
    without repeating the edge sample, but out-of-range reflections become 0
    (numpy's mode='reflect' would raise for signals shorter than the pad).
    """
    n = len(samples)
    out = np.zeros(n + 2 * pad, dtype=samples.dtype)
    out[pad : pad + n] = samples
    left_src = pad - np.arange(pad)           # samples[pad - i]
    valid = left_src < n
    out[:pad][valid] = samples[left_src[valid]]
    right_src = n - 2 - np.arange(pad)        # samples[n - 2 - i]
    valid = right_src >= 0
    out[pad + n :][valid] = samples[right_src[valid]]
    return out


def num_mel_frames(n_samples: int) -> int:
    """Number of output mel frames for a raw sample count.

    total_frames - 1, with total_frames over the padded signal
    (reference: mel_spectrogram.cpp:517-521).
    """
    padded = n_samples + 2 * (N_FFT // 2)
    total = (padded - N_FFT) // HOP_LENGTH + 1
    return total - 1


# ---------------------------------------------------------------------------
# Numpy float64 oracle — mirrors the reference portable path
# ---------------------------------------------------------------------------

def log_mel_spectrogram_ref(
    samples: np.ndarray, filters: np.ndarray | None = None
) -> np.ndarray:
    """Float64 oracle. Returns float32 [n_mels, n_frames]."""
    if filters is None:
        filters = generate_mel_filters()
    samples = np.asarray(samples, dtype=np.float32)
    padded = reflect_pad(samples).astype(np.float64)
    n_frames = num_mel_frames(len(samples))
    if n_frames <= 0:
        return np.zeros((filters.shape[0], 0), dtype=np.float32)

    hann = _hann_window()
    idx = np.arange(n_frames)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    frames = padded[idx] * hann[None, :]                      # [N, 400] f64

    k = np.arange(1 + N_FFT // 2, dtype=np.float64)
    n = np.arange(N_FFT, dtype=np.float64)
    angle = 2.0 * np.pi * np.outer(n, k) / N_FFT              # [400, 201]
    re = frames @ np.cos(angle)
    im = -(frames @ np.sin(angle))
    power = re * re + im * im                                 # [N, 201]

    mel = power @ filters.astype(np.float64).T                # [N, n_mels]
    logmel = np.log10(np.maximum(mel, _LOG_FLOOR))

    mmax = logmel.max() - 8.0
    logmel = (np.maximum(logmel, mmax) + 4.0) / 4.0
    return logmel.T.astype(np.float32)                        # [n_mels, N]


# ---------------------------------------------------------------------------
# JAX device path
# ---------------------------------------------------------------------------

@functools.cache
def _dft_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hann[400], cos[400,201], sin[400,201]) as float32 host constants."""
    k = np.arange(1 + N_FFT // 2, dtype=np.float64)
    n = np.arange(N_FFT, dtype=np.float64)
    angle = 2.0 * np.pi * np.outer(n, k) / N_FFT
    return (
        _hann_window().astype(np.float32),
        np.cos(angle).astype(np.float32),
        np.sin(angle).astype(np.float32),
    )


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _mel_device(padded, filters_t, n_frames: int, n_valid=None):
    """`padded` must have length (n_frames + 2) * HOP_LENGTH (zero-filled),
    either float32 or int16 (int16/32768 is converted on device — WAV is
    16-bit PCM, so shipping int16 halves the host->device transfer).

    Framing uses reshape+slice+concat (HOP=160 rows; a 400-sample frame is
    rows [i, i+1] plus half of row [i+2]) instead of a gather — gathers are
    slow on TPU.

    `n_valid` (dynamic scalar, bucketed path): frames >= n_valid are forced
    to exactly 0.0 — the zero-fill the encoder's chunk padding expects
    (without it, padding frames hold the normalized log floor, which the
    last chunk's conv receptive field would read as non-silence).
    """
    hann, cos_t, sin_t = _dft_tables()
    hann = jnp.asarray(hann)
    if padded.dtype == jnp.int16:
        padded = padded.astype(jnp.float32) / 32768.0
    rows = padded.reshape(n_frames + 2, HOP_LENGTH)
    frames = jnp.concatenate(
        [
            rows[:n_frames],
            rows[1 : n_frames + 1],
            rows[2 : n_frames + 2, : N_FFT - 2 * HOP_LENGTH],
        ],
        axis=1,
    )
    frames = frames * hann[None, :]
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, jnp.asarray(cos_t), precision=hi)
    im = jnp.dot(frames, jnp.asarray(sin_t), precision=hi)
    power = re * re + im * im
    mel = jnp.dot(power, filters_t, precision=hi)
    logmel = jnp.log10(jnp.maximum(mel, _LOG_FLOOR))
    mmax = jnp.max(logmel) - 8.0
    out = (jnp.maximum(logmel, mmax) + 4.0) / 4.0             # [N, n_mels]
    if n_valid is not None:
        out = jnp.where(jnp.arange(n_frames)[:, None] < n_valid, out, 0.0)
    return out


def log_mel_spectrogram(
    samples: np.ndarray,
    filters: np.ndarray | None = None,
    bucket: int = 0,
    as_numpy: bool = True,
):
    """Device log-mel spectrogram -> float32 [n_mels, n_frames].

    `bucket`: optional frame-count rounding (pad-and-truncate) to bound the
    number of compiled shapes when streaming many files; 0 = exact shape.
    `as_numpy=False` keeps the result on device (feed it straight into the
    encoder; avoids a device->host->device round trip of the spectrogram).
    """
    if filters is None:
        filters = generate_mel_filters()
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        # int16 PCM is shipped as-is and scaled on device (half the
        # host->device transfer); anything else goes as float32
        samples = samples.astype(np.float32)
    n_frames = num_mel_frames(len(samples))
    if n_frames <= 0:
        return np.zeros((filters.shape[0], 0), dtype=np.float32)

    padded = reflect_pad(samples)
    need = (n_frames - 1) * HOP_LENGTH + N_FFT
    dev_frames = -(-n_frames // bucket) * bucket if bucket > 0 else n_frames
    buf = np.zeros((dev_frames + 2) * HOP_LENGTH, dtype=samples.dtype)
    # copy only the samples the valid frames can see: extra bucketed frames
    # must be all-zero so they cannot perturb the global max (the reference
    # computes the max over n_len frames only, mel_spectrogram.cpp:603-612)
    n_copy = min(need, len(padded), len(buf))
    buf[:n_copy] = padded[:n_copy]
    out = _mel_device(jnp.asarray(buf), filters_t_device(filters), dev_frames)
    out = out[:n_frames].T  # [n_mels, n_frames]
    return np.asarray(out) if as_numpy else out


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _mel_device_batch(padded_b, filters_t, n_frames: int, n_valid):
    """Batched _mel_device: padded_b [B, (n_frames+2)*HOP], n_valid [B]."""
    return jax.vmap(
        lambda p, nv: _mel_device(p, filters_t, n_frames, nv)
    )(padded_b, n_valid)


def log_mel_spectrogram_padded_batch(
    samples_list, filters: np.ndarray, bucket: int
) -> tuple[jax.Array, list[int]]:
    """Batched bucketed log-mel -> ([B, n_mels, F_b] on device, true frame
    counts). F_b = the largest item's frame count rounded up to `bucket`;
    ONE device dispatch for the whole batch (serving: same-bucket files
    share the mel program instead of B sequential round trips)."""
    prepped = []
    for samples in samples_list:
        samples = np.asarray(samples)
        if samples.dtype != np.int16:
            samples = samples.astype(np.float32)
        prepped.append(samples)
    n_frames = [num_mel_frames(len(s)) for s in prepped]
    if min(n_frames) <= 0 or bucket <= 0:
        raise ValueError(f"need n_frames > 0 and bucket > 0 "
                         f"(got {n_frames}, {bucket})")
    F_b = -(-max(n_frames) // bucket) * bucket
    dt = (np.int16 if all(s.dtype == np.int16 for s in prepped)
          else np.float32)
    buf = np.zeros((len(prepped), (F_b + 2) * HOP_LENGTH), dtype=dt)
    for b, (samples, nf) in enumerate(zip(prepped, n_frames)):
        if samples.dtype == np.int16 and dt == np.float32:
            samples = samples.astype(np.float32) / 32768.0  # mixed batch
        padded = reflect_pad(samples.astype(dt))
        need = (nf - 1) * HOP_LENGTH + N_FFT
        n_copy = min(need, len(padded), buf.shape[1])
        buf[b, :n_copy] = padded[:n_copy]
    out = _mel_device_batch(jnp.asarray(buf), filters_t_device(filters), F_b,
                            jnp.asarray(np.asarray(n_frames, np.int32)))
    return jnp.transpose(out, (0, 2, 1)), n_frames  # [B, n_mels, F_b]


def log_mel_spectrogram_padded(
    samples: np.ndarray, filters: np.ndarray, bucket: int
) -> tuple[jax.Array, int]:
    """Bucketed device log-mel -> (padded [n_mels, F_b] on device, true
    n_frames). F_b = n_frames rounded up to `bucket`; padding frames are
    exactly 0.0 (the zero-fill the encoder's chunk conv expects). Unlike
    `log_mel_spectrogram(bucket=...)`, the result is NOT sliced to the true
    frame count — the padded shape is the point: every distinct audio
    length within a bucket reuses ONE compiled program end-to-end
    (mel/encoder/decode), instead of recompiling per length."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        samples = samples.astype(np.float32)
    n_frames = num_mel_frames(len(samples))
    if n_frames <= 0 or bucket <= 0:
        raise ValueError(f"need n_frames > 0 and bucket > 0 "
                         f"(got {n_frames}, {bucket})")
    dev_frames = -(-n_frames // bucket) * bucket
    padded = reflect_pad(samples)
    need = (n_frames - 1) * HOP_LENGTH + N_FFT
    buf = np.zeros((dev_frames + 2) * HOP_LENGTH, dtype=samples.dtype)
    n_copy = min(need, len(padded), len(buf))
    buf[:n_copy] = padded[:n_copy]
    out = _mel_device(jnp.asarray(buf), filters_t_device(filters), dev_frames,
                      jnp.int32(n_frames))
    return out.T, n_frames  # [n_mels, F_b]
