"""Audio-injection utilities: splice encoder features over audio_pad tokens.

Mirror of the reference's standalone audio_injection module
(audio_injection.cpp:8-140): position finding, token embedding, masked
overwrite, and validation helpers — with a pure-numpy reference
implementation used by tests. The production path does the same splice on
device inside the decoder (models/decoder.py::embed_with_audio; the
reference likewise splices inside its graph, text_decoder.cpp:431-459).
"""

from __future__ import annotations

import numpy as np


def find_audio_positions(tokens: np.ndarray, audio_pad_token_id: int) -> np.ndarray:
    """Indices of all audio_pad tokens (audio_injection.cpp:8-23)."""
    tokens = np.asarray(tokens)
    return np.flatnonzero(tokens == audio_pad_token_id)


def embed_tokens(token_embd: np.ndarray, tokens: np.ndarray) -> np.ndarray:
    """Row gather from the [vocab, hidden] embedding table
    (audio_injection.cpp:25-45)."""
    return np.asarray(token_embd)[np.asarray(tokens)]


def inject_audio_embeddings(
    embeddings: np.ndarray,
    audio_features: np.ndarray,
    positions: np.ndarray,
) -> np.ndarray:
    """Overwrite rows at `positions` with audio features
    (audio_injection.cpp:47-72). Returns a new array."""
    positions = np.asarray(positions)
    if len(positions) != len(audio_features):
        raise ValueError(
            f"position count {len(positions)} != audio frames "
            f"{len(audio_features)}"
        )
    out = np.array(embeddings, copy=True)
    out[positions] = audio_features
    return out


def inject_audio(
    token_embd: np.ndarray,
    tokens: np.ndarray,
    audio_features: np.ndarray,
    audio_pad_token_id: int,
) -> np.ndarray:
    """embed + find + inject in one call (audio_injection.cpp:74-122)."""
    emb = embed_tokens(token_embd, tokens)
    pos = find_audio_positions(tokens, audio_pad_token_id)
    return inject_audio_embeddings(emb, audio_features, pos)


def validate_audio_injection(
    injected: np.ndarray,
    audio_features: np.ndarray,
    positions: np.ndarray,
    atol: float = 1e-6,
) -> bool:
    """Check the audio rows really hold the audio features
    (audio_injection.cpp:124-140)."""
    return bool(
        np.allclose(injected[np.asarray(positions)], audio_features, atol=atol)
    )
