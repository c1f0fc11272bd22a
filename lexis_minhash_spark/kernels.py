"""Pure-NumPy compute kernels (no Spark imports) — unit-testable standalone.

These re-express the reference's per-shingle scalar loops
(kritoke/lexis-minhash, Crystal) as batched NumPy array programs.  All uint64
arithmetic wraps mod 2**64 exactly like Crystal's ``&*``/``&+`` operators
(NumPy C-semantics overflow, warnings suppressed).

Parity citations (semantics only — the vectorized formulation is new):
- rolling k-shingle polynomial hash: engine/rolling.cr:44-62 (P=31, mod 2^64)
- multiply-shift MinHash min-reduce: engine/signature.cr:7-30
- weighted MinHash update: engine.cr:170-186, 203-256
- LSH band fold: engine.cr:426-456 (``combined = (combined << 7) ^ value``)
- little-endian signature blobs: engine/serialize.cr:5-41
- zero-signature gates: engine/signature.cr:12-16
- detection probability: engine.cr:460-464

Batch layout convention: a batch of N documents is represented as
``(hashes_concat: uint64[total], counts: int64[N])`` — the concatenation of
each document's shingle-hash stream plus per-document counts.  This feeds a
single blocked ``minimum.reduceat`` min-reduce instead of N Python loops.
"""

from __future__ import annotations

import math
import os
import re

import numpy as np

P = np.uint64(31)
U32_MAX_F = 4294967295.0  # Float64.new(UInt32::MAX), engine.cr:181
_U32_FULL = np.uint32(0xFFFFFFFF)
_WS_RE = re.compile(r"\s+")

# Max elements in one (shingles x signature_size) block during min-reduce;
# bounds peak scratch to ~BLOCK_ELEMS * 8 B per buffer.  The carry chain
# re-reads the block ~8x after the GEMMs, so the block must be CACHE
# resident: the round-4 value (1M elems = 8 MB/buffer, several buffers)
# spilled every pass to L3/DRAM.  A round-5 sweep
# (scripts/kernel_block_sweep.py, checksum-gated) measured 48k elems
# (384 KB/buffer, ~1.5 MB working set = L2-resident) at +10-25% docs/s
# over 1M, with a wide flat plateau 16k-64k (any L2-ish size works; 2M =
# 16 MB/buffer measured 2x SLOWER).  Blocks never split a document, so
# the effective floor is one doc (~200 shingles x S).
BLOCK_ELEMS = 48_000


# ---------------------------------------------------------------------------
# normalization + gates (engine/signature.cr:12-16)
# ---------------------------------------------------------------------------

def normalize_text(text: str) -> str:
    """``text.downcase.strip`` (engine/signature.cr:12).

    Python ``str.lower``/``str.strip`` use Unicode default casing/whitespace,
    matching Crystal's for ASCII and the vast majority of Unicode; parity
    fixtures are ASCII-only by design (FIXTURES.md §6).
    """
    return text.lower().strip()


def passes_gates(normalized: str, min_words: int, shingle_size: int) -> bool:
    """False → zero signature.  Mirrors engine/signature.cr:13-16:
    empty / word-count < min_words / codepoint-length < shingle_size.
    NOTE: the length gate counts *codepoints*; shingling iterates *bytes*.
    """
    if not normalized:
        return False
    if len(_WS_RE.split(normalized)) < min_words:
        return False
    if len(normalized) < shingle_size:
        return False
    return True


# ---------------------------------------------------------------------------
# shingle hashing (engine/rolling.cr:44-62)
# ---------------------------------------------------------------------------

def shingle_hashes_bytes(data: np.ndarray, k: int) -> np.ndarray:
    """uint64 polynomial hashes of every k-byte window of ``data`` (uint8[n]).

    h(w) = sum(w[j] * 31^(k-1-j)) mod 2^64 — identical values to the
    reference's incremental rolling form (rolling.cr:44-62), computed as k
    fused vector Horner steps.

    Perf note: NumPy uint64 ``*`` throughput is HOST-DEPENDENT — earlier
    sandbox hosts measured it ~100x slower than float64 ``*`` (no SIMD
    64-bit multiply), which motivated the 32-bit-limb float64 Horner fast
    path below; the current host runs u64 multiply at float64 parity,
    where the direct u64 Horner (2 passes/step vs the limbs' 8) measured
    40x FASTER.  ``_pick_rolling_backend`` times both once per process
    and routes accordingly (override: LEXIS_ROLLING_BACKEND=u64|limb).
    Both are bit-identical by construction and property-cross-checked.
    """
    n = int(data.shape[0]) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    if _pick_rolling_backend(k) == "u64":
        return _shingle_hashes_bytes_u64(data, k)
    return _shingle_hashes_bytes_limb(data, k)


def _shingle_hashes_bytes_limb(data: np.ndarray, k: int) -> np.ndarray:
    """32-bit-limb float64 Horner (exact: every intermediate < 2^38 <<
    2^53) — the fast path on hosts where u64 multiply is crippled."""
    n = int(data.shape[0]) - k + 1
    two32 = 4294967296.0  # 2^32
    lo = np.zeros(n, dtype=np.float64)
    hi = np.zeros(n, dtype=np.float64)
    t = np.empty(n, dtype=np.float64)
    carry = np.empty(n, dtype=np.float64)
    for j in range(k):
        # (hi*2^32 + lo) * 31 + byte, carried mod 2^64; all in-place
        np.multiply(lo, 31.0, out=t)
        np.add(t, data[j : j + n], out=t)      # <= 31*(2^32-1) + 255 < 2^37
        np.multiply(t, 1.0 / two32, out=carry)
        np.floor(carry, out=carry)
        np.multiply(carry, two32, out=lo)
        np.subtract(t, lo, out=lo)             # t mod 2^32
        np.multiply(hi, 31.0, out=hi)
        np.add(hi, carry, out=hi)
        np.fmod(hi, two32, out=hi)             # drop bits >= 64
    return lo.astype(np.uint64) + (hi.astype(np.uint64) << np.uint64(32))


def _shingle_hashes_bytes_u64(data: np.ndarray, k: int) -> np.ndarray:
    """Direct u64 Horner (in-place): 1 multiply + 1 add per step, exact
    mod-2^64 by C unsigned wraparound.  The calibrated fast path on hosts
    with full-rate u64 multiply; also the cross-check twin for the limb
    path."""
    n = int(data.shape[0]) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    d = data.astype(np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        np.multiply(h, P, out=h)
        np.add(h, d[j : j + n], out=h)
    return h


_ROLLING_BACKEND: str | None = None


def _pick_rolling_backend(k: int) -> str:
    """One-time per-process calibration of the rolling-hash Horner backend
    (direct u64 vs 32-bit float64 limbs) — same host-dependence story as
    _pick_mulshift_backend; measured 40x either way across host classes."""
    global _ROLLING_BACKEND
    env = os.environ.get("LEXIS_ROLLING_BACKEND")
    if env in ("u64", "limb"):
        return env
    if _ROLLING_BACKEND is not None:
        return _ROLLING_BACKEND
    import time as _time

    data = (np.arange(65536, dtype=np.uint32) % 251).astype(np.uint8)
    kk = max(2, min(int(k), 16))
    best = {}
    for name in ("u64", "limb"):
        t_best = None
        for _ in range(3):
            t0 = _time.perf_counter()
            if name == "u64":
                _shingle_hashes_bytes_u64(data, kk)
            else:
                _shingle_hashes_bytes_limb(data, kk)
            dt = _time.perf_counter() - t0
            t_best = dt if t_best is None else min(t_best, dt)
        best[name] = t_best
    _ROLLING_BACKEND = "u64" if best["u64"] <= best["limb"] else "limb"
    return _ROLLING_BACKEND


def shingle_hashes_text(text: str, k: int) -> np.ndarray:
    """Shingle hashes of a (already normalized) text's UTF-8 bytes."""
    return shingle_hashes_bytes(
        np.frombuffer(text.encode("utf-8"), dtype=np.uint8), k
    )


def shingle_hash_for(shingle: str) -> int:
    """Polynomial hash of a whole key string (engine.cr:264-273):
    window size = byte length, i.e. plain poly hash of all bytes."""
    b = shingle.encode("utf-8")
    h = shingle_hashes_bytes(np.frombuffer(b, dtype=np.uint8), len(b))
    return int(h[0]) if h.size else 0


def batch_shingle_hashes(
    texts: list[str], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized shingle hashing for a batch of normalized texts.

    Concatenates all UTF-8 byte streams, hashes every window of the big
    array once, then drops windows that straddle document boundaries.
    Returns ``(hashes_concat: uint64[total], counts: int64[len(texts)])``.
    """
    n_docs = len(texts)
    counts = np.zeros(n_docs, dtype=np.int64)
    if n_docs == 0:
        return np.empty(0, dtype=np.uint64), counts
    chunks = []
    lens = np.zeros(n_docs, dtype=np.int64)
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        lens[i] = len(b)
        chunks.append(b)
    big = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    counts = np.maximum(lens - (k - 1), 0)
    total_windows = int(big.shape[0]) - k + 1
    if total_windows <= 0:
        return np.empty(0, dtype=np.uint64), counts
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    if (
        os.environ.get("LEXIS_ROLLING_BACKEND") in (None, "", "native")
        and _native_fused_available()
    ):
        # incremental per-doc rolling hash in C: O(1) per window (vs the
        # Horner's k passes over the whole concat array) and no
        # cross-boundary windows to mask out afterwards.  Bit-identical
        # (mod-2^64 unsigned arithmetic; parity-tested cross-backend).
        from lexis_minhash_spark import kernels_native as KN

        return KN.rolling_hashes_multi(big, starts, lens, k)
    h_all = shingle_hashes_bytes(big, k)
    # keep windows fully inside one document
    keep = np.zeros(h_all.shape[0], dtype=bool)
    for i in range(n_docs):
        if counts[i] > 0:
            keep[starts[i] : starts[i] + counts[i]] = True
    return h_all[keep], counts


# ---------------------------------------------------------------------------
# MinHash min-reduce (engine/signature.cr:7-30; weighted engine.cr:170-186)
# ---------------------------------------------------------------------------

def _u64_limbs16(x: np.ndarray, axis_new: int) -> np.ndarray:
    """Split uint64 array into four 16-bit limbs as float64 (exact)."""
    sh = (np.arange(4, dtype=np.uint64) * np.uint64(16))
    if axis_new == 0:
        out = ((x[None, :] >> sh[:, None]) & np.uint64(0xFFFF)).astype(np.float64)
    else:
        out = ((x[:, None] >> sh[None, :]) & np.uint64(0xFFFF)).astype(np.float64)
    return out


def _prep_coeff_limbs(a: np.ndarray, b: np.ndarray):
    """Precompute the fused coefficient matrices for _mulshift_high32.

    Derivation (see _mulshift_high32): with 16-bit limbs a_j / h_i / b_m and
    column sums L_k = Σ_{i+j=k} h_i a_j + b_k, the high 32 bits of
    (a*h + b) mod 2^64 are

        H = (L2 + 2^16·L3 + floor((L0 + 2^16·L1) / 2^32)) mod 2^32

    and both L0 + 2^16·L1 and L2 + 2^16·L3 are single matmuls against
    fixed coefficient matrices:

        L0 + 2^16·L1 = [h0, 2^16·h1] @ [[a0 + 2^16·a1], [a0]] + (b0 + 2^16·b1)
        L2 + 2^16·L3 = [h0, h1, h2, 2^16·h3]
                        @ [[a2 + 2^16·a3], [a1 + 2^16·a2], [a0 + 2^16·a1], [a0]]
                        + (b2 + 2^16·b3)

    Every partial sum stays < 2^51 << 2^53 → float64-exact.

    The returned matrices are PRESCALED by 2^-32: multiplying a coefficient
    by a power of two scales every product and every partial sum by that
    power exactly (float64 rounding commutes with power-of-two scaling), so
    the matmul yields Y·2^-32 / Z·2^-32 bit-exactly while saving one full
    (n × S) elementwise pass in the carry chain (measured ~9%; the fused
    single-GEMM and fmod variants both measured SLOWER — see BENCH.md).
    """
    al = _u64_limbs16(a, 0)  # (4, S)
    bl = _u64_limbs16(b, 0)
    two16 = 65536.0
    inv32 = 2.0**-32
    # bias rows are FOLDED into the coefficient matrices (the input matrices
    # carry a constant ones column), saving one full elementwise pass per
    # matmul: Y = [h0, 2^16·h1, 1] @ caY ; Z = [h0, h1, h2, 2^16·h3, 1] @ caZ
    ca = np.vstack([al[0] + two16 * al[1], al[0], bl[0] + two16 * bl[1]]) * inv32
    cz = (
        np.vstack(
            [
                al[2] + two16 * al[3],
                al[1] + two16 * al[2],
                al[0] + two16 * al[1],
                al[0],
                bl[2] + two16 * bl[3],
            ]
        )
        * inv32
    )  # (5, S)
    return ca, cz


# Coefficient-limb cache: _prep_coeff_limbs is pure in (a, b), and the
# pandas UDFs call minhash_batch once per Arrow batch with the SAME config
# coefficients — uncached, the limb split + two vstacks rerun per batch
# (round-3 verdict item #5).  Keyed on the raw coefficient bytes (S=100 →
# 1.6 KB per key, a few configs per process); bounded like _SCRATCH_CACHE.
_COEFF_CACHE: dict[bytes, tuple[np.ndarray, np.ndarray]] = {}


def _coeff_limbs_cached(a: np.ndarray, b: np.ndarray):
    key = a.tobytes() + b.tobytes()
    c = _COEFF_CACHE.get(key)
    if c is None:
        if len(_COEFF_CACHE) >= 8:
            _COEFF_CACHE.clear()
        c = _prep_coeff_limbs(a, b)
        _COEFF_CACHE[key] = c
    return c


class _MulShiftScratch:
    """Reusable block buffers.  Fresh 64 MB allocations page-fault heavily on
    microVM hosts (measured ~30x slower than ``out=`` reuse), so every
    elementwise pass below writes into preallocated scratch."""

    def __init__(self, max_rows: int, s: int):
        self.max_rows = max_rows
        self.h_lim = np.empty((max_rows, 4), dtype=np.float64)
        self.XY = np.empty((max_rows, 3), dtype=np.float64)
        self.XY[:, 2] = 1.0  # constant ones column (bias fold)
        self.XZ = np.empty((max_rows, 5), dtype=np.float64)
        self.XZ[:, 4] = 1.0
        self.Y = np.empty((max_rows, s), dtype=np.float64)
        self.Z = np.empty((max_rows, s), dtype=np.float64)
        self.m32 = np.empty((max_rows, s), dtype=np.uint32)
        self.fw = np.empty((max_rows, s), dtype=np.float64)


# One cached scratch per (rows, s) shape, keyed on last use.  The pandas
# UDFs call minhash_batch once per Arrow batch; without the cache every
# batch re-allocates ~50 MB of scratch, which page-faults on this host
# class (BENCH.md).  Python workers are single-threaded, and the buffers
# are fully overwritten per call, so reuse across calls is safe.
_SCRATCH_CACHE: dict[tuple[int, int], _MulShiftScratch] = {}


def _get_scratch(max_rows: int, s: int) -> _MulShiftScratch:
    key = (max_rows, s)
    sc = _SCRATCH_CACHE.get(key)
    if sc is None:
        if len(_SCRATCH_CACHE) >= 4:  # bounded RSS across shapes
            _SCRATCH_CACHE.clear()
        sc = _MulShiftScratch(max_rows, s)
        _SCRATCH_CACHE[key] = sc
    return sc


class _U64Scratch:
    def __init__(self, max_rows: int, s: int):
        self.max_rows = max_rows
        self.m = np.empty((max_rows, s), dtype=np.uint64)


_U64_SCRATCH_CACHE: dict[int, _U64Scratch] = {}


def _get_u64_scratch(max_rows: int, s: int) -> _U64Scratch:
    sc = _U64_SCRATCH_CACHE.get(s)
    if sc is None or sc.max_rows < max_rows:
        _U64_SCRATCH_CACHE.clear()  # bounded RSS
        sc = _U64Scratch(max_rows, s)
        _U64_SCRATCH_CACHE[s] = sc
    return sc


_U64_SHIFT32 = np.uint64(32)


def _mulshift_high32_u64(
    h: np.ndarray, a: np.ndarray, b: np.ndarray,
    scratch: _U64Scratch | None = None,
    shift: bool = True,
) -> np.ndarray:
    """``((a*h + b) mod 2^64) >> 32`` via direct uint64 wraparound →
    uint64[n, S] view into ``scratch``.  Three elementwise passes
    (mul, add, shift) versus the limb-GEMM path's 2 GEMMs + 6
    carry/mod passes — bit-identical by construction (C unsigned
    wraparound IS mod 2^64).

    ``shift=False`` returns the full 64-bit ``(a*h + b) mod 2^64``:
    ``>> 32`` is monotone non-decreasing, so it commutes with the
    min-reduce — the caller shifts only the REDUCED (docs × S) block,
    saving one full-size pass (same deferral family as the GEMM path's
    scale_out=False).

    Which path is faster is HOST-DEPENDENT: earlier sandbox hosts ran
    NumPy's u64 ``*`` ~100× slower than float64 (the measurement that
    motivated the limb-GEMM formulation); the current host runs u64
    multiply at float64 parity, making this path ~2.5× faster
    end-to-end.  ``_pick_mulshift_backend`` measures both once per
    process and picks the winner (override: LEXIS_MULSHIFT_BACKEND)."""
    n = int(h.shape[0])
    s = int(a.shape[0])
    if scratch is None or scratch.max_rows < n:
        scratch = _get_u64_scratch(n, s)
    m = scratch.m[:n]
    np.multiply(h[:, None], a[None, :], out=m)
    m += b[None, :]
    if shift:
        np.right_shift(m, _U64_SHIFT32, out=m)
    return m


_MULSHIFT_BACKEND: str | None = None


def _native_fused_available() -> bool:
    """True when the fused C kernel (kernels_native) compiled + loaded."""
    try:
        from lexis_minhash_spark import kernels_native as KN

        return KN.load() is not None
    except Exception:  # pragma: no cover — any import/build issue → NumPy
        return False


def _pick_mulshift_backend(s: int) -> str:
    """One-time per-process calibration: time one block through each
    backend on synthetic data and keep the fastest (ties → fewer
    passes).  ~10 ms once; env LEXIS_MULSHIFT_BACKEND=native|u64|gemm
    pins it (tests use this to assert cross-backend parity).  The
    ``native`` candidate is the fused one-pass C kernel
    (kernels_native.py) and only competes when it compiled+loaded on
    this host; it is bit-identical to the NumPy backends by construction
    (C unsigned arithmetic IS mod 2^64; the >>32 commutes with min)."""
    global _MULSHIFT_BACKEND
    env = os.environ.get("LEXIS_MULSHIFT_BACKEND")
    if env in ("u64", "gemm"):
        return env
    if env == "native" and _native_fused_available():
        return "native"
    if _MULSHIFT_BACKEND is not None:
        return _MULSHIFT_BACKEND
    import time as _time

    n = max(256, BLOCK_ELEMS // max(s, 1))
    h = (np.arange(1, n + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    a = (np.arange(1, s + 1, dtype=np.uint64) * np.uint64(0xBF58476D1CE4E5B9)) | np.uint64(1)
    b = np.arange(s, dtype=np.uint64) * np.uint64(0x94D049BB133111EB)
    coeffs = _prep_coeff_limbs(a, b)
    candidates = ["u64", "gemm"]
    if _native_fused_available():
        from lexis_minhash_spark import kernels_native as KN

        starts = np.zeros(1, dtype=np.int64)
        counts = np.array([n], dtype=np.int64)
        candidates.append("native")
    best = {}
    for name in candidates:
        t_best = None
        for _ in range(3):
            t0 = _time.perf_counter()
            if name == "u64":
                _mulshift_high32_u64(h, a, b)
            elif name == "gemm":
                _mulshift_high32(h, coeffs, scale_out=False)
            else:
                KN.minhash_fused(h, starts, counts, a, b)
            dt = _time.perf_counter() - t0
            t_best = dt if t_best is None else min(t_best, dt)
        best[name] = t_best
    _MULSHIFT_BACKEND = min(best, key=lambda k: best[k])
    return _MULSHIFT_BACKEND


def _mulshift_high32(
    h: np.ndarray,
    coeffs,
    scratch: _MulShiftScratch | None = None,
    scale_out: bool = True,
) -> np.ndarray:
    """``((a*h + b) mod 2^64) >> 32`` for all (shingle, hash-fn) pairs →
    float64[n, S] with integer values in [0, 2^32).  Returns a view into
    ``scratch`` when provided — consume before the next call.

    ``scale_out=False`` returns H·2^-32 (values in [0, 1), exact — a
    power-of-two scale of the same integers), skipping the final (n × S)
    multiply pass.  min-reduce commutes with a positive scale, so the
    unweighted caller rescales the small REDUCED (docs × S) matrix
    instead; the weighted caller folds the 2^32 into its per-shingle
    divisor (one 1-D pass) — round-3 verdict item #5.

    Exact 16-bit-limb float64 arithmetic (see _prep_coeff_limbs for the
    fused two-matmul derivation; every intermediate < 2^51 << 2^53, all
    divisions by powers of two → exact).  Replaces the naive uint64 path
    because x86 lacks SIMD 64-bit multiply and NumPy's u64 ``*`` is ~100x
    slower than float64 on the target hosts; bit-identical values
    (cross-checked against the u64 path and the scalar oracle in tests).

    Pass census per (shingle × S) element: 2 GEMMs (biases folded via ones
    columns, coefficients prescaled by 2^-32 — see _prep_coeff_limbs) +
    6 carry/mod passes.  Negative results kept on record (BENCH.md): fmod
    measured ~5× slower than the floor chain; fusing both GEMMs into one
    (n×6)·(6×2S) block matmul measured ~2× slower (1.5× FLOPs + larger
    output churn)."""
    ca, cz = coeffs
    n = int(h.shape[0])
    s = ca.shape[1]
    if scratch is None or scratch.max_rows < n:
        scratch = _get_scratch(n, s)
    two16, inv32, two32 = 65536.0, 2.0**-32, 4294967296.0
    # 16-bit limbs via zero-copy little-endian view
    h_lim = scratch.h_lim[:n]
    np.copyto(h_lim, np.ascontiguousarray(h).view(np.uint16).reshape(n, 4))
    XY, XZ = scratch.XY[:n], scratch.XZ[:n]
    XY[:, 0] = h_lim[:, 0]
    np.multiply(h_lim[:, 1], two16, out=XY[:, 1])
    XZ[:, 0] = h_lim[:, 0]
    XZ[:, 1] = h_lim[:, 1]
    XZ[:, 2] = h_lim[:, 2]
    np.multiply(h_lim[:, 3], two16, out=XZ[:, 3])
    Y, Z = scratch.Y[:n], scratch.Z[:n]
    # Y' = (L0 + 2^16*L1 + by)·2^-32 exactly (prescaled coefficients);
    # the carry into bit 32 is floor(Y')
    np.matmul(XY, ca, out=Y)
    np.floor(Y, out=Y)            # c2 (integer value)
    np.multiply(Y, inv32, out=Y)  # c2·2^-32
    # Z' = (L2 + 2^16*L3 + bz)·2^-32 + c2·2^-32 ; H = frac(Z')·2^32
    np.matmul(XZ, cz, out=Z)
    Z += Y
    np.floor(Z, out=Y)
    np.subtract(Z, Y, out=Z)      # H·2^-32
    if scale_out:
        np.multiply(Z, two32, out=Z)  # H
    return Z


def minhash_from_hashes(
    h64: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Unweighted signature of one hash stream → uint32[signature_size].
    ``((a[i]*h + b[i]) mod 2^64) >> 32`` min-reduced over shingles
    (engine/signature.cr:22-27). Empty stream → all UInt32::MAX
    (init value, engine/signature.cr:18)."""
    s = a.shape[0]
    if h64.size == 0:
        return np.full(s, _U32_FULL, dtype=np.uint32)
    coeffs = _coeff_limbs_cached(a, b)
    m = _mulshift_high32(h64.astype(np.uint64), coeffs)
    return m.min(axis=0).astype(np.uint32)


def minhash_batch(
    hashes_concat: np.ndarray,
    counts: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    weights_concat: np.ndarray | None = None,
) -> np.ndarray:
    """Signatures for a whole batch → uint32[n_docs, signature_size].

    One blocked ``(shingles × signature_size)`` multiply-shift followed by
    ``np.minimum.reduceat`` at document boundaries — the vectorized
    equivalent of the reference's nested per-shingle/per-hash loops.

    ``weights_concat`` (float64, parallel to ``hashes_concat``) switches to
    the weighted update (engine.cr:170-186): effective weight = max(w,0),
    w<=0 shingles skipped, divisor = log(1+w) if w<1 else w, value =
    fmod(h32/divisor, 4294967295.0) truncated to uint32.

    Documents with zero shingles yield the UInt32::MAX-filled init vector —
    callers apply the zero-signature gates *before* building the batch.
    """
    s = int(a.shape[0])
    n_docs = int(counts.shape[0])
    out = np.full((n_docs, s), _U32_FULL, dtype=np.uint32)
    if hashes_concat.size == 0:
        return out

    h = hashes_concat
    w = weights_concat
    eff_counts = counts.astype(np.int64)
    backend = _pick_mulshift_backend(s) if w is None else "gemm"
    if w is None and backend == "native":
        # fused one-pass C kernel: multiply-shift + >>32 + u32 min-reduce
        # per doc in a single streaming pass (no (shingles × S) scratch at
        # all — the accumulator row stays in L1).  Duplicate shingles are
        # just re-minimized, like the u64 backend.  Bit-identical to the
        # NumPy backends (cross-backend parity tests); measured 0.893 s →
        # 0.156 s for 4.1M shingles × 100 slots single-thread.
        from lexis_minhash_spark import kernels_native as KN

        starts_all = np.concatenate(([0], np.cumsum(eff_counts)[:-1]))
        return KN.minhash_fused(
            h.astype(np.uint64, copy=False), starts_all, eff_counts, a, b
        )
    use_u64 = w is None and backend == "u64"
    if w is None and h.size and not use_u64:
        # min-reduce is idempotent in the unweighted path (the slot value is
        # a pure function of the shingle hash), so duplicate shingles within
        # a document are dropped before the expensive multiply-shift.
        # Repetitive corpora measure up to ~30% duplicates.  GEMM backend
        # only: there the lexsort is ~2% of kernel time; on the u64 backend
        # the multiply-shift got cheap enough that the lexsort costs MORE
        # than the duplicate work it saves (measured ~1.2 s sort vs ~0.4 s
        # saved at 4.1M shingles), so duplicates are just re-minimized.
        # NOT valid for the weighted paths: a caller
        # may supply different weights for equal hashes (from-hashes API).
        doc_ids = np.repeat(np.arange(n_docs), eff_counts)
        order = np.lexsort((h, doc_ids))
        h_s, d_s = h[order], doc_ids[order]
        uniq = np.empty(h_s.shape[0], dtype=bool)
        uniq[0] = True
        np.logical_or(h_s[1:] != h_s[:-1], d_s[1:] != d_s[:-1], out=uniq[1:])
        h = h_s[uniq]
        eff_counts = np.bincount(d_s[uniq], minlength=n_docs).astype(np.int64)
    if w is not None:
        # drop non-positive weights (engine.cr:175-177)
        w_eff = np.maximum(w, 0.0)
        keep = w_eff > 0.0
        if not keep.all():
            doc_ids = np.repeat(np.arange(n_docs), eff_counts)
            h = h[keep]
            kept_docs = doc_ids[keep]
            eff_counts = np.bincount(kept_docs, minlength=n_docs).astype(np.int64)
            w_eff = w_eff[keep]
        # NB: the reference computes Math.log(1.0 + w) (engine.cr:179) — NOT
        # log1p — and the two differ in the last ulp for general w; mirror it.
        divisor = np.where(w_eff < 1.0, np.log(1.0 + w_eff), w_eff)
        # fold the deferred 2^32 output scale into the divisor (see
        # _mulshift_high32 scale_out=False): (H·2^-32)/(divisor·2^-32) is
        # bit-identical to H/divisor — numerator and denominator are both
        # exact power-of-two scalings, so the rounded quotient is of the
        # same real value.  One 1-D pass here replaces a (shingles × S)
        # multiply pass per block.
        divisor = divisor * 2.0**-32
    if h.size == 0:
        return out

    nonempty = eff_counts > 0
    starts_all = np.concatenate(([0], np.cumsum(eff_counts)[:-1]))
    ne_idx = np.nonzero(nonempty)[0]
    ne_starts = starts_all[ne_idx]
    ne_counts = eff_counts[ne_idx]

    # block over documents so the (shingles x S) intermediate stays
    # bounded; each block is one multiply-shift pass + reduceat.  The
    # unweighted path picks the calibrated multiply-shift backend (direct
    # uint64 vs limb-GEMM — host-dependent, see _pick_mulshift_backend);
    # the weighted path stays on the limb-GEMM (its divisor fold consumes
    # the H·2^-32 float form directly).
    coeffs = None if use_u64 else _coeff_limbs_cached(a, b)
    rows_per_block = max(1, BLOCK_ELEMS // s)
    # precompute block boundaries (consecutive docs until budget exceeded)
    block_bounds = [0]
    rows = 0
    for idx in range(ne_idx.shape[0]):
        cnt = int(ne_counts[idx])
        if rows > 0 and rows + cnt > rows_per_block:
            block_bounds.append(idx)
            rows = 0
        rows += cnt
    block_bounds.append(ne_idx.shape[0])
    max_rows = min(rows_per_block, int(h.shape[0]))
    if len(block_bounds) > 2:
        max_rows = max(
            int(
                (ne_starts[block_bounds[i + 1] - 1] + ne_counts[block_bounds[i + 1] - 1])
                - ne_starts[block_bounds[i]]
            )
            for i in range(len(block_bounds) - 1)
            if block_bounds[i] < block_bounds[i + 1]
        )
    scratch = _get_u64_scratch(max_rows, s) if use_u64 else _get_scratch(max_rows, s)
    for bi in range(len(block_bounds) - 1):
        doc_pos, end = block_bounds[bi], block_bounds[bi + 1]
        if doc_pos >= end:
            continue
        lo = int(ne_starts[doc_pos])
        hi = int(ne_starts[end - 1] + ne_counts[end - 1])
        n_rows = hi - lo
        if n_rows > scratch.max_rows:  # lone doc larger than the block budget
            scratch = _get_u64_scratch(n_rows, s) if use_u64 else _get_scratch(n_rows, s)
        local_starts = (ne_starts[doc_pos:end] - lo).astype(np.intp)
        if use_u64:
            # exact uint64 wraparound; min-reduce on the FULL 64-bit
            # values (>>32 is monotone, so it commutes with min) and
            # shift+downcast only the reduced (docs × S) block
            mu = _mulshift_high32_u64(h[lo:hi], a, b, scratch, shift=False)
            reduced_u = np.minimum.reduceat(mu, local_starts, axis=0)
            np.right_shift(reduced_u, _U64_SHIFT32, out=reduced_u)
            out[ne_idx[doc_pos:end]] = reduced_u.astype(np.uint32)
            continue
        # H·2^-32 units: the final ×2^32 pass is deferred past the reduce
        # (unweighted) or folded into the divisor (weighted)
        m = _mulshift_high32(h[lo:hi], coeffs, scratch, scale_out=False)
        if w is not None:
            dv = divisor[lo:hi]
            fw = scratch.fw[:n_rows]
            np.divide(m, dv[:, None], out=fw)  # = H / divisor_orig exactly
            np.fmod(fw, U32_MAX_F, out=fw)
            m32 = scratch.m32[:n_rows]
            np.copyto(m32, fw, casting="unsafe")  # trunc toward zero (>=0)
            out[ne_idx[doc_pos:end]] = np.minimum.reduceat(m32, local_starts, axis=0)
        else:
            # min-reduce directly on the exact float64 values, then rescale
            # and convert only the reduced (n_docs × S) block — skips one
            # full (shingles × S) copy pass AND the ×2^32 pass (min
            # commutes with a positive scale; ·2^32 of an exact ·2^-32
            # value is exact)
            reduced = np.minimum.reduceat(m, local_starts, axis=0)
            out[ne_idx[doc_pos:end]] = (reduced * 4294967296.0).astype(np.uint32)
    return out


def zero_signature(signature_size: int) -> np.ndarray:
    """All-zero signature for gated-out documents (engine/signature.cr:13-16)."""
    return np.zeros(signature_size, dtype=np.uint32)


# ---------------------------------------------------------------------------
# LSH band fold (engine.cr:426-456)
# ---------------------------------------------------------------------------

def band_hashes_batch(
    signatures: np.ndarray, num_bands: int, rows_per_band: int
) -> np.ndarray:
    """Band hashes → uint64[n_docs, num_bands].

    Per band of ``rows_per_band`` uint32 values:
    ``combined = ((combined << 7) ^ value) mod 2^64`` starting at 0
    (engine.cr:443-456).  NOTE the reference quirk: when ``bands`` overrides
    the config, ``rows`` still comes from the config, so only the first
    ``num_bands * rows_per_band`` signature slots are consumed — callers pass
    both explicitly to reproduce that behavior.
    """
    n = signatures.shape[0]
    used = num_bands * rows_per_band
    r = signatures[:, :used].reshape(n, num_bands, rows_per_band).astype(np.uint64)
    combined = np.zeros((n, num_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(rows_per_band):
            combined = (combined << np.uint64(7)) ^ r[:, :, j]
    return combined


# ---------------------------------------------------------------------------
# similarity kernels (engine.cr:365-421, similarity.cr)
# ---------------------------------------------------------------------------

def signature_similarity(s1: np.ndarray, s2: np.ndarray) -> float:
    """Fraction of equal positions; 0.0 on empty or size mismatch
    (engine.cr:365-375)."""
    if s1.size == 0 or s2.size == 0 or s1.size != s2.size:
        return 0.0
    return float(np.count_nonzero(s1 == s2)) / float(s1.size)


def signature_similarity_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise similarity of two (n, s) signature matrices → float64[n]."""
    if a.size == 0:
        return np.empty(0, dtype=np.float64)
    return (a == b).mean(axis=1)


def overlap_coefficient(a: np.ndarray, b: np.ndarray) -> float:
    """|A ∩ B| / min(|A|, |B|) over *sorted* arrays (engine.cr:378-421,
    similarity.cr:53-69). 0.0 if either empty."""
    if a.size == 0 or b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=False).size
    # reference counts multiset matches two-pointer style; on distinct-sorted
    # inputs (its documented contract) intersect1d is identical — see
    # overlap_coefficient_multiset for exact parity on non-distinct input
    return float(inter) / float(min(a.size, b.size))


def overlap_coefficient_multiset(a: np.ndarray, b: np.ndarray) -> float:
    """Exact twin of the reference's two-pointer ``fast_overlap``
    (similarity.cr:53-69) on NON-distinct input: a value appearing c1 times
    in one array and c2 in the other contributes min(c1, c2) matches;
    denominator = min(len(a), len(b)).  Identical to overlap_coefficient on
    the documented sorted-distinct contract."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.size == 0 or b.size == 0:
        return 0.0
    va, ca = np.unique(a, return_counts=True)
    vb, cb = np.unique(b, return_counts=True)
    _, ia, ib = np.intersect1d(va, vb, assume_unique=True, return_indices=True)
    matches = int(np.minimum(ca[ia], cb[ib]).sum())
    return float(matches) / float(min(a.size, b.size))


def weighted_overlap(a: dict[str, float], b: dict[str, float]) -> float:
    """Σ min(w_a, w_b) over shared keys / min(Σ w_a, Σ w_b)
    (similarity.cr:26-39). 0.0 if either empty."""
    if not a or not b:
        return 0.0
    inter = 0.0
    for k, w in a.items():
        bw = b.get(k)
        if bw is not None:
            inter += min(w, bw)
    return inter / min(sum(a.values()), sum(b.values()))


def detection_probability(similarity: float, num_bands: int, rows_per_band: int) -> float:
    """1 - (1 - s^r)^b (engine.cr:460-464)."""
    return 1.0 - (1.0 - similarity**rows_per_band) ** num_bands


def shared_bands(bands1: np.ndarray, bands2: np.ndarray) -> int:
    """Positional count of equal band hashes (spec'd, unimplemented in ref:
    openspec/specs/band-matching/spec.md:6-23)."""
    n = min(bands1.size, bands2.size)
    return int(np.count_nonzero(bands1[:n] == bands2[:n]))


# ---------------------------------------------------------------------------
# serialization (engine/serialize.cr:5-41)
# ---------------------------------------------------------------------------

def signature_to_bytes(signature: np.ndarray) -> bytes:
    """Explicit little-endian uint32 blob (engine/serialize.cr:5-14).

    This is the repo's ONE canonical wire format.  The reference also has a
    native-endian ``Signature#to_blob`` (engine.cr:48-51); see
    signature_to_bytes_native."""
    return np.ascontiguousarray(signature, dtype="<u4").tobytes()


def signature_to_bytes_native(signature: np.ndarray) -> bytes:
    """Native-endian twin of the reference's ``Signature#to_blob``
    (engine.cr:48-51).  On every little-endian host (x86-64, aarch64 in LE
    mode — all Spark deployment targets) the bytes are identical to
    signature_to_bytes; it exists so ported call sites keep their
    semantics documented.  Round-trips through bytes_to_signature only on
    little-endian hosts (the canonical format is explicitly LE)."""
    return np.ascontiguousarray(signature, dtype=np.uint32).tobytes()


def bytes_to_signature(blob: bytes) -> np.ndarray:
    """Inverse of signature_to_bytes; raises on size % 4 != 0
    (Signature.from_blob validation, engine.cr:55-67)."""
    if len(blob) == 0:
        return np.empty(0, dtype=np.uint32)
    if len(blob) % 4 != 0:
        raise ValueError("Invalid blob size: must be a multiple of 4 bytes")
    return np.frombuffer(blob, dtype="<u4").astype(np.uint32)


# ---------------------------------------------------------------------------
# SimHash extension (north star; Charikar 2002 / Manku et al. WWW'07)
# ---------------------------------------------------------------------------

# Shingle hashes from k=5 ASCII text only occupy the low ~31 bits of the
# u64 (poly sum < 2^31), which would leave simhash bits 31..63 constant —
# two of the four Hamming blocks identical across ALL documents, turning
# the block candidate join into an all-pairs join.  The hashes are
# therefore mixed to full 64-bit entropy with two fixed multiply-shift
# draws (the same exact-limb kernel as MinHash):
#   mixed = (msh(a1,b1,h) << 32) | msh(a2,b2,h)
SIMHASH_MIX_SEED = 0x53494D48  # 'SIMH'


def _simhash_mix(h64: np.ndarray) -> np.ndarray:
    from lexis_minhash_spark.config import seeded_coefficients

    a, b = seeded_coefficients(SIMHASH_MIX_SEED, 2)
    h = np.ascontiguousarray(h64, dtype=np.uint64)
    n = int(h.shape[0])
    out = np.empty(n, dtype=np.uint64)
    use_u64 = _pick_mulshift_backend(2) == "u64"
    coeffs = None if use_u64 else _coeff_limbs_cached(a, b)
    # block with one reused scratch — an unblocked call allocates ~80 B of
    # fresh scratch per shingle, which page-faults on this host class
    rows = max(1, min(BLOCK_ELEMS // 2, n))
    scratch = _get_u64_scratch(rows, 2) if use_u64 else _get_scratch(rows, 2)
    for lo_i in range(0, n, rows):
        hi_i = min(lo_i + rows, n)
        if use_u64:
            mu = _mulshift_high32_u64(h[lo_i:hi_i], a, b, scratch)
            out[lo_i:hi_i] = (mu[:, 0] << np.uint64(32)) | mu[:, 1]
            continue
        m = _mulshift_high32(h[lo_i:hi_i], coeffs, scratch)
        out[lo_i:hi_i] = (m[:, 0].astype(np.uint64) << np.uint64(32)) | m[:, 1].astype(
            np.uint64
        )
    return out


def simhash_from_hashes(
    h64: np.ndarray, weights: np.ndarray | None = None
) -> int:
    """64-bit Charikar simhash of a shingle-hash stream.

    bit_j(fp) = 1 iff Σ_shingles (±w) > 0, where the sign is bit j of the
    MIXED shingle hash (see _simhash_mix).  Empty stream → 0.
    """
    if h64.size == 0:
        return 0
    mixed = _simhash_mix(h64)
    bits = ((mixed[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    signs = 2 * bits - 1
    if weights is not None:
        acc = (signs * weights[:, None]).sum(axis=0)
    else:
        acc = signs.sum(axis=0)
    with np.errstate(over="ignore"):
        bitvals = (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
    return int(bitvals.sum(dtype=np.uint64))


def simhash_batch(
    hashes_concat: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Batched simhash → uint64[n_docs].

    Per-bit-plane loop with reused buffers: acc_j > 0 ⟺ 2·Σ bit_j > count,
    so each of the 64 planes is one shift/and pass + one add.reduceat over
    the shingle stream.  (The former (shingles × 64) int32 sign matrix
    allocated ~250 B/shingle fresh per Arrow batch — a page-fault hotspot on
    this host class, see BENCH.md; shifts/ands on uint64 are SIMD-cheap,
    only u64 multiply is slow.)"""
    n_docs = int(counts.shape[0])
    out = np.zeros(n_docs, dtype=np.uint64)
    if hashes_concat.size == 0:
        return out
    mixed = _simhash_mix(hashes_concat)
    nonempty = counts > 0
    starts_all = np.concatenate(([0], np.cumsum(counts)[:-1]))
    ne_idx = np.nonzero(nonempty)[0]
    idx = starts_all[ne_idx].astype(np.intp)
    ne_counts = counts[ne_idx].astype(np.uint64)
    fps = np.zeros(ne_idx.shape[0], dtype=np.uint64)
    bits = np.empty(mixed.shape[0], dtype=np.uint64)
    for j in range(64):
        np.right_shift(mixed, np.uint64(j), out=bits)
        np.bitwise_and(bits, np.uint64(1), out=bits)
        sums = np.add.reduceat(bits, idx)
        fps |= (2 * sums > ne_counts).astype(np.uint64) << np.uint64(j)
    out[ne_idx] = fps
    return out


def hamming_distance_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise popcount(a XOR b) for uint64 arrays."""
    x = np.ascontiguousarray(a.astype(np.uint64) ^ b.astype(np.uint64))
    # popcount via unpackbits on the byte view (vectorized, no Python loop)
    bytes_view = x.view(np.uint8).reshape(*x.shape, 8)
    return np.unpackbits(bytes_view, axis=-1).sum(axis=-1).astype(np.int64)


def simhash_block_keys(fp: np.ndarray, num_blocks: int = 4) -> np.ndarray:
    """Split each 64-bit fingerprint into ``num_blocks`` equal bit-blocks →
    int64[n, num_blocks] block keys (Manku/Jain/Sarma WWW'07 candidate
    generation: dups within Hamming distance num_blocks-1 share ≥1 block)."""
    width = 64 // num_blocks
    mask = np.uint64((1 << width) - 1)
    shifts = (np.arange(num_blocks, dtype=np.uint64) * np.uint64(width))
    return ((fp[:, None] >> shifts[None, :]) & mask).astype(np.int64)


def rolling_fingerprint(text: str, k: int = 64) -> int:
    """Document fingerprint: min rolling-hash over k-byte windows (cheap
    content-defined fingerprint for the text-analysis extras). Whole-text
    poly hash when shorter than k."""
    b = text.encode("utf-8")
    data = np.frombuffer(b, dtype=np.uint8)
    if data.size == 0:
        return 0
    if data.size < k:
        h = shingle_hashes_bytes(data, data.size)
        return int(h[0])
    return int(shingle_hashes_bytes(data, k).min())


def log_detection_threshold(num_bands: int, rows_per_band: int) -> float:
    """Approximate LSH similarity threshold (1/b)^(1/r) (README.md:318-320)."""
    return math.pow(1.0 / num_bands, 1.0 / rows_per_band)
