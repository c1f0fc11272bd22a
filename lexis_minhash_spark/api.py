"""Single-document convenience API — the reference's Engine/Signature
surface for driver-side use (parity: engine.cr public methods).

These are NOT the dataflow path (that's ops.py); they exist so a user of
the reference library can port call sites 1:1:

    Engine.compute_signature(text)          -> compute_signature(text)
    Engine.compute_signature(text, weights) -> compute_signature(text, weights=...)
    Engine.compute_signature_from_hashes    -> compute_signature_from_hashes
    Engine.similarity(s1, s2)               -> similarity
    Engine.generate_bands(sig)              -> generate_bands
    Engine.overlap_coefficient              -> kernels.overlap_coefficient
    Engine.detection_probability            -> detection_probability
    Engine.compare(doc1, doc2)              -> compare   (spec'd helper,
        openspec/specs/document-comparison-helper/spec.md:6-16)
    Signature#to_blob / from_blob           -> kernels.signature_to_bytes /
                                               bytes_to_signature
    Engine.prehash_weights                  -> prehash_weights
"""

from __future__ import annotations

import numpy as np

from lexis_minhash_spark.config import (
    DEFAULT_CONFIG,
    EngineConfig,
    configure,  # re-exported porting shims (engine/config.cr:73-91)
    current_config,
    reset_config,
)
from lexis_minhash_spark import kernels as K


def _apply_stop_words(normalized: str, cfg: EngineConfig) -> str:
    sw = getattr(cfg, "stop_words", None)
    if not sw:
        return normalized
    toks = [t for t in normalized.split(" ") if t not in sw]
    return " ".join(toks)


def compute_signature(
    text: str,
    weights: dict[str, float] | None = None,
    cfg: EngineConfig | None = None,
) -> np.ndarray:
    """Signature of one text (engine.cr:107-115 / 203-228) → uint32 array."""
    cfg = cfg or current_config()
    a, b = cfg.coefficients
    norm = _apply_stop_words(K.normalize_text(text), cfg)
    if not K.passes_gates(norm, cfg.min_words, cfg.shingle_size):
        return K.zero_signature(cfg.signature_size)
    h = K.shingle_hashes_text(norm, cfg.shingle_size)
    if weights is None:
        return K.minhash_from_hashes(h, a, b)
    data = norm.encode("utf-8")
    w = np.array(
        [
            weights.get(
                data[i : i + cfg.shingle_size].decode("utf-8", "surrogateescape"),
                cfg.default_weight,
            )
            for i in range(len(h))
        ],
        dtype=np.float64,
    )
    return K.minhash_batch(h, np.array([len(h)]), a, b, weights_concat=w)[0]


def compute_signature_from_hashes(
    hashes,
    weights=None,
    cfg: EngineConfig | None = None,
) -> np.ndarray:
    """engine/signature.cr:33-71 — caller-supplied uint64 hash stream."""
    cfg = cfg or current_config()
    a, b = cfg.coefficients
    h = np.asarray(hashes, dtype=np.uint64)
    if weights is None:
        return K.minhash_from_hashes(h, a, b)
    w = np.asarray(weights, dtype=np.float64)
    # Crystal's hashes.zip(weights) truncates to the shorter iterable
    n = min(h.size, w.size)
    h, w = h[:n], w[:n]
    return K.minhash_batch(h, np.array([n]), a, b, weights_concat=w)[0]


def similarity(sig1, sig2) -> float:
    """engine.cr:365-375."""
    return K.signature_similarity(
        np.asarray(sig1, dtype=np.uint32), np.asarray(sig2, dtype=np.uint32)
    )


def generate_bands(
    signature, bands: int | None = None, cfg: EngineConfig | None = None
) -> list[tuple[int, int]]:
    """engine.cr:426-456 — incl. the quirk: a ``bands`` override keeps
    rows_per_band from the config (only the first bands*rows slots hash)."""
    cfg = cfg or current_config()
    nb = bands if bands is not None else cfg.num_bands
    sig = np.asarray(signature, dtype=np.uint32)
    bh = K.band_hashes_batch(sig[None, :], nb, cfg.rows_per_band)[0]
    return [(i, int(bh[i])) for i in range(nb)]


def detection_probability(s: float, cfg: EngineConfig | None = None) -> float:
    """engine.cr:460-464."""
    cfg = cfg or current_config()
    return K.detection_probability(s, cfg.num_bands, cfg.rows_per_band)


def compare(doc1: str, doc2: str, cfg: EngineConfig | None = None) -> float:
    """Spec'd one-shot comparison helper
    (openspec/specs/document-comparison-helper/spec.md:6-16):
    compute both signatures and return their similarity."""
    return similarity(compute_signature(doc1, cfg=cfg), compute_signature(doc2, cfg=cfg))


def prehash_weights(weights: dict[str, float]) -> dict[int, float]:
    """engine.cr:282-289 — string-keyed → rolling-hash-keyed weights."""
    return {K.shingle_hash_for(k): v for k, v in weights.items()}


def exact_jaccard(doc1: str, doc2: str, cfg: EngineConfig | None = None) -> float:
    """Spec'd exact Jaccard over distinct shingle-hash sets
    (openspec/specs/jaccard-similarity/spec.md:6-23)."""
    cfg = cfg or current_config()
    s1 = set(
        K.shingle_hashes_text(K.normalize_text(doc1), cfg.shingle_size).tolist()
    )
    s2 = set(
        K.shingle_hashes_text(K.normalize_text(doc2), cfg.shingle_size).tolist()
    )
    union = len(s1 | s2)
    return (len(s1 & s2) / union) if union else 0.0
