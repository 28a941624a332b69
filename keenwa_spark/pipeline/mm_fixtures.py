"""Deterministic multimodal fixture corpus + independent expected-value
oracles (VERDICT r06 missing item 3 / next-round item 4).

The multimodal operators (pipeline/multimodal.py) were pytest-only;
every other first-class component has a registry entry checked against
a DuckDB oracle. Real image/audio files can't live in the testdata, so
the corpus here is GENERATED: a seeded LCG produces pixel buffers and
PCM sample buffers, `pipeline/png.py` encodes the images to real PNG
payloads, and the expected outputs are computed by INDEPENDENT
implementations (numpy / plain arithmetic straight from the known
pixel arrays — never through the PNG codec or the banded join under
test) and emitted as constant VALUES oracles DuckDB can run.

What each oracle independently re-derives:
- aHash near-dup pairs: 8x8 luma grid hash from the raw pixel arrays +
  brute-force O(n^2) popcount — verifying the engine's PNG decode path
  AND the 4x16-bit banded self-join find exactly the same pairs.
- resize stats: nearest-neighbor resample via numpy fancy-indexing +
  zlib.crc32 of the resampled buffer — verifying the engine's
  per-pixel loop byte-for-byte (crc) without sharing its code.
- PCM features: RMS / zero-crossings recomputed here and compared as
  float literals (same-machine numpy arithmetic is bit-stable).

Everything is import-time cheap (40 small images, 24 clips) and fully
deterministic — no wall clock, no random module.
"""

from __future__ import annotations

import zlib
from functools import lru_cache

#: near-dup construction: ids 101..108 clone images 1..8 with ONE
#: pixel nudged by +1 — ahash moves by at most a few bits
N_BASE = 32
N_DUP = 8

PCM_SAMPLE_RATE = 8000


def _lcg_bytes(seed: int, n: int) -> bytes:
    x = seed & 0x7FFFFFFF
    out = bytearray(n)
    for i in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        out[i] = (x >> 16) & 0xFF
    return bytes(out)


@lru_cache(maxsize=1)
def fixture_pixels() -> list[tuple[int, int, int, int, bytes]]:
    """(doc_id, width, height, channels, raw interleaved pixels) — the
    pre-encode ground truth both the engine input and the oracles
    derive from."""
    out = []
    for i in range(1, N_BASE + 1):
        w = 8 + (i * 3) % 9
        h = 8 + (i * 5) % 7
        ch = 1 if i % 3 == 0 else 3
        out.append((i, w, h, ch, _lcg_bytes(7919 * i + 13, w * h * ch)))
    for j in range(N_DUP):
        doc_id, w, h, ch, pix = out[j]
        nudged = bytearray(pix)
        k = (j * 11) % len(nudged)
        nudged[k] = min(nudged[k] + 1, 255)
        out.append((100 + doc_id, w, h, ch, bytes(nudged)))
    return out


@lru_cache(maxsize=1)
def fixture_images() -> list[tuple[int, bytes]]:
    """(doc_id, real PNG payload) — the engine-side input column."""
    from keenwa_spark.pipeline.png import encode_png

    return [
        (doc_id, encode_png(w, h, ch, pix))
        for doc_id, w, h, ch, pix in fixture_pixels()
    ]


#: video fixture shape: per-clip (colorspace, w, h, n_frames); even
#: dims where subsampling requires them, one zero-frame clip (header
#: only — the decoder must emit no rows, not an error)
_VIDEO_SPECS = [
    (700, "C420", 8, 6, 3),
    (701, "C420", 16, 8, 2),
    (702, "C422", 6, 5, 4),
    (703, "C444", 4, 3, 3),
    (704, "Cmono", 10, 7, 5),
    (705, "C420jpeg", 12, 4, 2),
    (706, "C444", 5, 5, 0),
    (707, "C420", 32, 18, 1),
]


@lru_cache(maxsize=1)
def fixture_video_frames() -> list[tuple[int, str, int, int, list[bytes]]]:
    """(doc_id, colorspace, w, h, raw planar frames) — the pre-encode
    ground truth both the engine input and the oracle derive from."""
    from keenwa_spark.pipeline.y4m import _frame_size

    out = []
    for doc_id, cs, w, h, n in _VIDEO_SPECS:
        fsize = _frame_size(cs, w, h)
        frames = [
            _lcg_bytes(15485863 * doc_id + 97 * k + 1, fsize) for k in range(n)
        ]
        out.append((doc_id, cs, w, h, frames))
    return out


@lru_cache(maxsize=1)
def fixture_videos() -> list[tuple[int, bytes]]:
    """(doc_id, real YUV4MPEG2 payload) — the engine-side input column;
    one extra corrupt payload (truncated mid-frame) the decoder must
    DROP, plus one non-Y4M payload."""
    from keenwa_spark.pipeline.y4m import encode_y4m

    out = [
        (doc_id, encode_y4m(w, h, frames, colorspace=cs))
        for doc_id, cs, w, h, frames in fixture_video_frames()
    ]
    good = out[0][1]
    out.append((798, good[: len(good) - 7]))  # truncated final frame
    out.append((799, b"not a video stream at all"))
    return out


@lru_cache(maxsize=1)
def fixture_pcm() -> list[tuple[int, bytes]]:
    """(doc_id, signed-8-bit mono PCM payload), lengths varied, one
    empty clip (the degenerate row the operator must emit zeros for)."""
    out = [(500, b"")]
    for i in range(1, 24):
        out.append((500 + i, _lcg_bytes(104729 * i + 7, 64 + (i * 37) % 500)))
    return out


# ---------------------------------------------------------------------------
# Independent expected-value computations (never through the code under
# test: no png.py decode, no multimodal.py helpers, no banded join)
# ---------------------------------------------------------------------------


def _grid_hash(w: int, h: int, ch: int, pix: bytes) -> int:
    """8x8 average-hash straight from the raw pixel array. The luma
    formula and sequential mean are the OPERATOR'S documented
    definition (shared spec); the path — no PNG roundtrip — is what
    makes this an oracle of the decode+hash pipeline."""
    def luma(x: int, y: int) -> float:
        i = (y * w + x) * ch
        if ch >= 3:
            return 0.299 * pix[i] + 0.587 * pix[i + 1] + 0.114 * pix[i + 2]
        return float(pix[i])

    grid = [
        luma(min((gx * w) // 8, w - 1), min((gy * h) // 8, h - 1))
        for gy in range(8)
        for gx in range(8)
    ]
    mean = sum(grid) / 64.0
    bits = 0
    for j, v in enumerate(grid):
        if v > mean:
            bits |= 1 << j
    return bits


def expected_ahash_pairs(max_hamming: int = 3) -> list[tuple[int, int, int]]:
    """Brute-force (id_a, id_b, hamming) over ALL fixture pairs with
    hamming <= max_hamming — the exact set the banded join must find
    (banding is recall-lossless up to hamming 3 by pigeonhole)."""
    hashes = [
        (doc_id, _grid_hash(w, h, ch, pix))
        for doc_id, w, h, ch, pix in fixture_pixels()
    ]
    pairs = []
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            (ia, ha), (ib, hb) = hashes[i], hashes[j]
            d = bin(ha ^ hb).count("1")
            if d <= max_hamming:
                a, b = min(ia, ib), max(ia, ib)
                pairs.append((a, b, d))
    return sorted(pairs)


def expected_resize_stats(
    out_w: int = 8, out_h: int = 8
) -> list[tuple[int, int, int, int, int, int]]:
    """(doc_id, src_width, src_height, channels, n_bytes, pix_crc32)
    of the nearest-neighbor resample, recomputed via numpy
    fancy-indexing (vs the engine's per-pixel Python loop)."""
    import numpy as np

    out = []
    for doc_id, w, h, ch, pix in fixture_pixels():
        arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, ch)
        ys = (np.arange(out_h) * h) // out_h
        xs = (np.arange(out_w) * w) // out_w
        resized = arr[ys][:, xs].tobytes()
        out.append(
            (doc_id, w, h, ch, len(resized), zlib.crc32(resized) & 0xFFFFFFFF)
        )
    return sorted(out)


def expected_video_frames(
    every_n: int = 1,
) -> list[tuple[int, int, int, int, int, int]]:
    """(doc_id, frame_idx, width, height, frame_bytes, frame_crc) for
    every fixture frame with index % every_n == 0, recomputed straight
    from the raw planar buffers (zlib.crc32 — never through the Y4M
    parser under test). The corrupt/non-Y4M payloads contribute no
    rows, pinning the drop contract."""
    out = []
    for doc_id, _cs, w, h, frames in fixture_video_frames():
        for idx, fb in enumerate(frames):
            if idx % every_n == 0:
                out.append(
                    (doc_id, idx, w, h, len(fb), zlib.crc32(fb) & 0xFFFFFFFF)
                )
    return sorted(out)


def expected_pcm_features() -> list[tuple[int, int, float, float, int]]:
    """(doc_id, n_samples, duration_s, rms, zero_crossings) recomputed
    from the raw sample buffers."""
    import numpy as np

    out = []
    for doc_id, payload in fixture_pcm():
        s = np.frombuffer(payload, dtype=np.int8).astype(np.float64)
        n = len(s)
        if n == 0:
            out.append((doc_id, 0, 0.0, 0.0, 0))
            continue
        rms = float(np.sqrt(np.mean(s * s)))
        zc = int(np.count_nonzero(np.diff(np.signbit(s))))
        out.append((doc_id, n, n / PCM_SAMPLE_RATE, rms, zc))
    return sorted(out)


# ---------------------------------------------------------------------------
# Constant VALUES oracles (ANSI SQL, DuckDB-runnable)
# ---------------------------------------------------------------------------


def _values_sql(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
    """SELECT casted columns FROM (VALUES ...) — empty-safe via a
    WHERE FALSE spine when there are no rows."""
    names = ", ".join(
        f"CAST({n} AS {t}) AS {n}" for n, t in cols
    )
    if not rows:
        plain = ", ".join(f"NULL AS {n}" for n, _ in cols)
        return f"SELECT {names} FROM (SELECT {plain}) v({', '.join(n for n, _ in cols)}) WHERE FALSE"

    def lit(v) -> str:
        if isinstance(v, float):
            return repr(v)
        return str(v)

    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    col_list = ", ".join(n for n, _ in cols)
    return f"SELECT {names} FROM (VALUES {body}) v({col_list})"


def ahash_pairs_oracle_sql(max_hamming: int = 3) -> str:
    return _values_sql(
        expected_ahash_pairs(max_hamming),
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "INT")],
    )


def resize_stats_oracle_sql(out_w: int = 8, out_h: int = 8) -> str:
    return _values_sql(
        expected_resize_stats(out_w, out_h),
        [
            ("doc_id", "BIGINT"),
            ("src_width", "BIGINT"),
            ("src_height", "BIGINT"),
            ("channels", "BIGINT"),
            ("n_bytes", "BIGINT"),
            ("pix_crc32", "BIGINT"),
        ],
    )


def video_frames_oracle_sql(every_n: int = 1) -> str:
    return _values_sql(
        expected_video_frames(every_n),
        [
            ("doc_id", "BIGINT"),
            ("frame_idx", "BIGINT"),
            ("width", "BIGINT"),
            ("height", "BIGINT"),
            ("frame_bytes", "BIGINT"),
            ("frame_crc", "BIGINT"),
        ],
    )


def pcm_features_oracle_sql() -> str:
    return _values_sql(
        expected_pcm_features(),
        [
            ("doc_id", "BIGINT"),
            ("n_samples", "BIGINT"),
            ("duration_s", "DOUBLE"),
            ("rms", "DOUBLE"),
            ("zero_crossings", "BIGINT"),
        ],
    )
