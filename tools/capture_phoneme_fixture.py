"""Cross-tier phoneme fixture capture (VERDICT r4 #7).

Run on any espeak-capable machine (the Docker image build does, where both
the ``phonemizer`` package tier and the ctypes tier are present): phonemize
a fixed multilingual corpus through BOTH tiers, diff them, and write
``tests/data/phoneme_fixture_espeak.json`` so the repo carries a
package-tier golden the ctypes tier is diffed against even in espeak-less
environments (tests/test_phonemize_espeak.py::test_cross_tier_fixture).

Exit codes: 0 = captured and tiers agree; 1 = tier disagreement (phoneme
drift — investigate before shipping); 2 = espeak unavailable.

Usage: python tools/capture_phoneme_fixture.py [out.json]
"""
import json
import sys

sys.path.insert(0, ".")

from zonos_vibes_tpu.frontend import phonemize as ph

# The corpus intentionally covers: stress marks, UTF-8 multi-byte IPA
# (de umlauts, ja kana, cmn tone letters), punctuation preservation, and
# the EN number-normalization pipeline feeding espeak.
CORPUS = [
    ("hello world. goodbye.", "en-us"),
    ("The quick brown fox jumps over the lazy dog, and keeps running.",
     "en-us"),
    ("In 1992, $3.50 bought the 2nd ticket.", "en-us"),
    ("guten morgen, schöne welt!", "de"),
    ("bonjour le monde.", "fr-fr"),
    ("hola mundo, ¿qué tal?", "es"),
    ("こんにちは…", "ja"),
    ("你好!", "cmn"),
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        "tests/data/phoneme_fixture_espeak.json"
    lib = ph._find_espeak_lib()
    try:
        import phonemizer  # noqa: F401
        have_pkg = True
    except ImportError:
        have_pkg = False
    if lib is None:
        print("espeak-ng library not found — nothing to capture",
              file=sys.stderr)
        return 2

    entries = []
    drift = 0
    for text, lang in CORPUS:
        from zonos_vibes_tpu.frontend.text import clean

        cleaned = clean([text], [lang])[0]
        ct = ph._espeak_phonemize_preserving(lib, cleaned, lang)
        entry = {"text": text, "language": lang, "ctypes": ct}
        if have_pkg:
            pkg = ph._phonemizer_backend(lang).phonemize(
                [cleaned], strip=True
            )[0]
            entry["package"] = pkg
            # The two tiers ride the same C library; output must agree up
            # to separator squeezing (the package tier may normalize
            # whitespace differently around punctuation).
            if ct.replace(" ", "") != pkg.replace(" ", ""):
                drift += 1
                entry["DRIFT"] = True
                print(f"DRIFT [{lang}] {text!r}:\n  ctypes : {ct!r}\n"
                      f"  package: {pkg!r}", file=sys.stderr)
        entries.append(entry)

    fixture = {
        "espeak_backend": ph.backend_name(),
        "entries": entries,
        "has_package_tier": have_pkg,
    }
    import os

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(fixture, f, ensure_ascii=False, indent=1)
    print(f"wrote {out_path} ({len(entries)} entries, "
          f"package tier: {have_pkg}, drift: {drift})")
    return 1 if drift else 0


if __name__ == "__main__":
    sys.exit(main())
