"""Deterministic synthetic clips corpus (audio + transcript pairs).

Generates the input table shape from BASELINE.json input_hint —
(clip_id:string, bytes:binary, sr_hz:int, dur_ms:int, codec:string,
transcript:string) — with planted near-duplicate clusters and recorded
ground truth, entirely from a seed.  No external data, no wall clock.

Duplicate structure (FIXTURES.md §1): clusters of size 1-8; within a
cluster transcripts are the seed sentence with ≤15% token substitutions;
duplicate audio is the original PCM plus a small perturbation that keeps
SNR ≥ ~40 dB (so the per-row invariant 'decoded-PCM allclose at SNR≥30dB'
holds within clusters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lexis_minhash_spark.sources.audio import pcm16_to_wav

def _build_vocab(n_words: int = 50_000) -> tuple[str, ...]:
    """Deterministic synthetic vocabulary (~50k words). A realistic corpus
    has tens of thousands of distinct tokens; a small vocabulary makes
    5-gram shingles collide across UNRELATED documents, which degenerates
    LSH buckets super-linearly with corpus size (round 1: a 56-word vocab
    blew up the 250k bench; round 2: the 3,360-word single-syllable vocab
    saturated around 1M clips — candidate volume turned super-linear and
    the scaling measurement measured the corpus, not the engine).

    Single-syllable words first, then two-syllable compounds paired by the
    bijection p → (p mod m, (p//m + p) mod m) so consecutive words differ
    in BOTH syllables (no long prefix-sharing runs that would re-create
    hot shingles)."""
    onsets = ["b", "br", "c", "ch", "d", "dr", "f", "fl", "g", "gr", "h", "j",
              "k", "kl", "l", "m", "n", "p", "pr", "qu", "r", "s", "st", "t",
              "tr", "v", "w", "z"]
    nuclei = ["a", "e", "i", "o", "u", "ai", "ea", "io", "ou", "ae"]
    codas = ["", "n", "r", "l", "s", "t", "m", "nd", "rk", "st", "x", "ph"]
    singles = [o + nu + c for o in onsets for nu in nuclei for c in codas]
    words = list(singles[:n_words])
    # distinctness guard (round-3 advice): two-syllable compounds CAN
    # collide as strings ('ba'+'sta' == 'bas'+'ta'); skip any compound
    # already seen so the vocabulary is exactly n_words DISTINCT tokens.
    # At the default n_words=50,000 no collision occurs in the generated
    # range (verified by test_vocab_distinct), so the produced vocabulary —
    # and every corpus derived from it — is byte-identical to round 3's.
    seen = set(words)
    m = len(singles)
    # p sweeps the full m*m bijection domain exactly once; past that every
    # compound repeats, so an unreachable n_words must fail, not spin
    # (round-4 advice: the unbounded loop hangs for pathological n_words).
    # Fast-fail upfront on the loose upper bound (singles + all compounds).
    if n_words > m + m * m:
        raise ValueError(
            f"n_words={n_words} exceeds the {m + m * m} tokens reachable "
            f"from {m} syllables"
        )
    p = 0
    while len(words) < n_words:
        if p >= m * m:
            raise ValueError(
                f"vocabulary exhausted: only {len(words)} distinct tokens "
                f"reachable (requested {n_words}, {m} syllables)"
            )
        a = p % m
        b = (p // m + p) % m
        w = singles[a] + singles[b]
        if w not in seen:
            words.append(w)
            seen.add(w)
        p += 1
    return tuple(words)


VOCAB = _build_vocab()


def _sentence(rng: np.random.Generator, n_words: int) -> list[str]:
    return [VOCAB[i] for i in rng.integers(0, len(VOCAB), n_words)]


def _mutate(rng: np.random.Generator, words: list[str], rate: float) -> list[str]:
    out = list(words)
    n_mut = int(len(out) * rate)
    for _ in range(n_mut):
        op = rng.integers(0, 3)
        idx = int(rng.integers(0, len(out)))
        if op == 0 and len(out) > 5:
            out.pop(idx)
        elif op == 1:
            out[idx] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        else:
            out.insert(idx, VOCAB[int(rng.integers(0, len(VOCAB)))])
    return out


def _tone(rng: np.random.Generator, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Seeded sum-of-sines with slow amplitude modulation + noise, float64
    in [-1, 1).  The AM envelope (0.5–4 Hz) gives each clip the temporal
    energy structure real audio has — a bare stationary tone's flat
    envelope makes envelope-based fingerprints degenerate (every frame in
    one quantization bin)."""
    n = int(sr_hz * dur_ms / 1000)
    t = np.arange(n, dtype=np.float64) / sr_hz
    sig = np.zeros(n)
    for _ in range(3):
        f = float(rng.uniform(80.0, 2000.0))
        amp = float(rng.uniform(0.1, 0.3))
        phase = float(rng.uniform(0, 2 * np.pi))
        sig += amp * np.sin(2 * np.pi * f * t + phase)
    f_am = float(rng.uniform(0.5, 4.0))
    ph_am = float(rng.uniform(0, 2 * np.pi))
    sig *= 0.55 + 0.45 * np.sin(2 * np.pi * f_am * t + ph_am)
    sig += rng.normal(0, 0.01, n)
    return np.clip(sig, -0.99, 0.99)


def generate_clips(
    n_clips: int = 500,
    seed: int = 42,
    dup_fraction: float = 0.3,
    mutation_rate: float = 0.10,
    with_audio: bool = True,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (clips, truth_clusters) pandas frames.

    clips: clip_id, bytes (WAV), sr_hz, dur_ms, codec, transcript
    truth_clusters: clip_id, cluster_id (planted ground truth; singletons
    included with cluster_id = own clip index)
    """
    rng = np.random.default_rng(seed)
    rows = []
    truth = []
    i = 0
    cluster_seq = 0
    while i < n_clips:
        is_cluster = rng.random() < dup_fraction
        size = int(rng.integers(2, 9)) if is_cluster else 1
        size = min(size, n_clips - i)
        base_words = _sentence(rng, int(rng.integers(8, 40)))
        sr_hz = int(rng.choice([16000, 16000, 16000, 8000, 44100]))
        dur_ms = int(rng.integers(500, 3000))
        base_pcm = _tone(rng, sr_hz, dur_ms) if with_audio else None
        cluster_id = f"cluster_{cluster_seq:06d}"
        cluster_seq += 1
        for j in range(size):
            clip_id = f"clip_{i:08d}"
            if j == 0:
                words = base_words
                pcm = base_pcm
            else:
                words = _mutate(rng, base_words, mutation_rate)
                if with_audio:
                    # perturb audio at ~46 dB SNR (well above the 30 dB invariant)
                    noise = rng.normal(0, 0.005, base_pcm.shape[0]) * np.abs(base_pcm).mean()
                    pcm = np.clip(base_pcm + noise, -0.99, 0.99)
            blob = (
                pcm16_to_wav((pcm * 32767.0).astype(np.int16), sr_hz)
                if with_audio
                else b""
            )
            rows.append(
                {
                    "clip_id": clip_id,
                    "bytes": blob,
                    "sr_hz": sr_hz,
                    "dur_ms": dur_ms,
                    "codec": "pcm_s16le",
                    "transcript": " ".join(words),
                }
            )
            truth.append({"clip_id": clip_id, "cluster_id": cluster_id})
            i += 1
    # edge-case rows (FIXTURES.md §6): overwrite a few transcripts, keep audio
    edge = {
        1: "",
        3: "   ",
        5: "one two three",  # < min_words
        7: "ab cd",  # < min_words and short
    }
    for idx, txt in edge.items():
        if idx < len(rows):
            rows[idx]["transcript"] = txt
    clips = pd.DataFrame(rows)
    truth_df = pd.DataFrame(truth)
    return clips, truth_df


def clips_spark_df(spark, n_clips: int = 500, seed: int = 42, **kw):
    """Clips as a Spark DataFrame with the contract schema."""
    clips, truth = generate_clips(n_clips=n_clips, seed=seed, **kw)
    schema = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string"
    )
    sdf = spark.createDataFrame(clips, schema=schema)
    tdf = spark.createDataFrame(truth, schema="clip_id string, cluster_id string")
    return sdf, tdf
