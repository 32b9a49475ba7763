"""Property-based tests (hypothesis) for the pure-Python codecs: the
generator and parser must round-trip for EVERY geometry, not just the
fixture sizes — this is the contract a real PIL/wave swap-in inherits.
No SparkSession needed: the codec bodies are exactly what executes
inside the mapInPandas closures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from odni_apache_beam_consumer_spark.operators import codecs as C

_decode_img = C.pure_python_image_codec()
_decode_wav = C.pure_python_wav_codec()


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=4096),
    h=st.integers(min_value=1, max_value=4096),
    ch=st.sampled_from([1, 3, 4]),
)
def test_bmp_roundtrip(w, h, ch):
    assert _decode_img(C.make_bmp(w, h, channels=ch)) == (w, h, ch)


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=512),
    h=st.integers(min_value=1, max_value=512),
    comment=st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=40,
        ),
    ),
)
def test_ppm_roundtrip(w, h, comment):
    assert _decode_img(C.make_ppm(w, h, comment=comment)) == (w, h, 3)


@settings(max_examples=200, deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=192_000),
    frames=st.integers(min_value=0, max_value=500_000),
    ch=st.integers(min_value=1, max_value=2),
)
def test_wav_roundtrip(rate, frames, ch):
    got_rate, got_ms = _decode_wav(C.make_wav(rate, frames, channels=ch))
    assert got_rate == rate
    assert got_ms == (frames * 1000) // rate


@settings(max_examples=300, deadline=None)
@given(payload=st.binary(max_size=200))
def test_arbitrary_bytes_never_misparse_silently(payload):
    """Random bytes either raise ValueError or — if they happen to start
    with a valid magic — return positive dimensions.  No crashes with
    other exception types, no nonsense values."""
    try:
        w, h, ch = _decode_img(payload)
    except ValueError:
        pass
    else:
        assert w > 0 and h > 0 and ch in (1, 3, 4)
    try:
        rate, ms = _decode_wav(payload)
    except ValueError:
        pass
    else:
        assert rate > 0 and ms >= 0
