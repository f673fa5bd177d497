"""The espeak-ng ctypes tier (frontend/phonemize.py tier 2) — VERDICT r1
weak #4 / next #10: this tier had never executed in this image (no
libespeak). Two layers of coverage:

1. a RECORDED-INTERACTION test that runs HERE: a fake libespeak object
   reproduces the C API's observable behavior (clause-at-a-time
   ``espeak_TextToPhonemes`` that advances the caller's text pointer,
   voice selection, IPA mode bits) so the ctypes glue — pointer loop,
   byref mutation, mode word, UTF-8 decode, clause joining — actually
   executes and is pinned;
2. a skip-marked golden test against the REAL library wherever
   libespeak-ng exists (cross-checks the phonemizer package tier when both
   are present).
"""

import ctypes

import pytest

from zonos_vibes_tpu.frontend import phonemize as ph

# Recorded espeak-ng behavior for "hello world. goodbye." (en-us, IPA mode,
# space separator): one clause per TextToPhonemes call, pointer advanced
# past the consumed clause, NULL pointer when input is exhausted.
RECORDED_CLAUSES = [
    (b"h\xc9\x99l\xcb\x88o\xca\x8a w\xcb\x88\xc9\x9c\xcb\x90ld",  # həlˈoʊ wˈɜːld
     b" \xc9\xa1\xca\x8ad\xcb\x88ba\xc9\xaa."),  # remaining text after call 1
    (b"\xc9\xa1\xca\x8ad\xcb\x88ba\xc9\xaa", None),  # ɡʊdˈbaɪ, then done
]


class _FakeEspeakLib:
    """Mimics the libespeak-ng C API surface the ctypes tier touches."""

    def __init__(self):
        self.initialized = 0
        self.voice: bytes | None = None
        self.modes: list[int] = []
        self.calls = 0
        self._keepalive: list[bytes] = []
        # Production code assigns .restype — tests wrap _text_to_phonemes
        # in _FnProxy, which carries that attribute like a ctypes function.
        self.espeak_TextToPhonemes = self._text_to_phonemes

    def espeak_Initialize(self, output, buflength, path, options):
        self.initialized += 1
        return 22050

    def espeak_SetVoiceByName(self, name: bytes):
        self.voice = name
        return 0

    def _text_to_phonemes(self, ref, textmode, mode):
        self.modes.append(mode)
        pp = ctypes.cast(ref, ctypes.POINTER(ctypes.c_char_p))
        if pp.contents.value is None or self.calls >= len(RECORDED_CLAUSES):
            return None
        ipa, rest = RECORDED_CLAUSES[self.calls]
        self.calls += 1
        if rest is None:
            pp.contents.value = None
        else:
            self._keepalive.append(rest)
            pp.contents.value = rest
        return ipa


class _FnProxy:
    """Callable carrying a writable ``restype`` like a ctypes CFUNCTYPE."""

    def __init__(self, fn):
        self._fn = fn
        self.restype = None

    def __call__(self, *a):
        return self._fn(*a)


def test_ctypes_tier_recorded_interaction():
    lib = _FakeEspeakLib()
    lib.espeak_TextToPhonemes = _FnProxy(lib._text_to_phonemes)

    out = ph._espeak_phonemize(lib, "hello world. goodbye.", "en-us")

    assert lib.initialized == 1
    assert lib.voice == b"en-us"
    # IPA bit + space separator in the mode word, every call.
    assert lib.modes and all(m == (ord(" ") << 8) | 0x02 for m in lib.modes)
    assert out == "həlˈoʊ wˈɜːld ɡʊdˈbaɪ"
    # Clause loop consumed the whole input exactly once per clause.
    assert lib.calls == 2


def test_ctypes_tier_init_is_idempotent():
    lib = _FakeEspeakLib()
    lib.espeak_TextToPhonemes = _FnProxy(lib._text_to_phonemes)
    ph._espeak_phonemize(lib, "hello world. goodbye.", "en-us")
    before = lib.initialized
    lib.calls = 0
    ph._espeak_phonemize(lib, "hello world. goodbye.", "en-us")
    assert lib.initialized == before  # espeak_Initialize exactly once


@pytest.mark.skipif(ph._find_espeak_lib() is None,
                    reason="libespeak-ng not present in this image")
def test_ctypes_tier_against_real_libespeak():
    """Wherever libespeak exists: real TextToPhonemes output must be IPA
    over the tokenizer's symbol table, and must agree with the phonemizer
    package tier when that is also installed."""
    from zonos_vibes_tpu.frontend.text import tokenize_phonemes

    lib = ph._find_espeak_lib()
    out = ph._espeak_phonemize(lib, "hello world.", "en-us")
    assert out, "real espeak returned nothing"
    assert any(c in out for c in "ˈəʊɪː"), f"not IPA-like: {out!r}"
    ids, lengths = tokenize_phonemes([out])
    assert lengths[0] > 4  # tokenizable over frontend/text.py's table

    try:
        import phonemizer  # noqa: F401
    except ImportError:
        return
    pkg = ph._phonemizer_backend("en-us").phonemize(["hello world."],
                                                    strip=True)[0]
    # Same library underneath: identical up to separator squeezing.
    assert out.replace(" ", "") == pkg.replace(" ", "")
