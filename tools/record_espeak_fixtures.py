"""Re-record the espeak golden fixtures (tests/fixtures/espeak_golden.json)
on a machine with espeak-ng + phonemizer installed.

The checked-in fixture file was authored from espeak-ng's documented output
conventions (this environment has no espeak); running this tool replaces
every `ipa` field with the live espeak output and pins the exact version, so
downstream PER numbers (tests/test_g2p_fixtures.py, docs/TEXT_FRONTEND.md)
become exact.  Fixture surface mirrors the reference's phonemizer settings
(zonos/conditioning.py:233-292): preserve_punctuation, with_stress.

Usage:
    python tools/record_espeak_fixtures.py [--out tests/fixtures/espeak_golden.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default="tests/fixtures/espeak_golden.json")
    ap.add_argument("--src", default="tests/fixtures/espeak_golden.json",
                    help="fixture file providing the sentence list")
    args = ap.parse_args()

    from zonos_tpu.text.g2p import _espeak_backend

    if _espeak_backend("en-us") is None:
        sys.exit("espeak-ng + phonemizer not available; cannot record fixtures")

    try:
        from espeakng_loader import get_version  # type: ignore

        version = get_version()
    except Exception:
        try:
            from phonemizer.backend import EspeakBackend  # type: ignore

            version = str(EspeakBackend.version())
        except Exception:
            version = "unknown"

    with open(args.src) as f:
        fixtures = json.load(f)

    for lang, rows in fixtures.items():
        if lang.startswith("_"):
            continue
        backend = _espeak_backend(lang)
        if backend is None:
            print(f"skip {lang}: espeak voice unavailable", file=sys.stderr)
            continue
        for row in rows:
            row["ipa"] = backend.phonemize([row["text"]], strip=True)[0]
        print(f"recorded {lang}: {len(rows)} sentences")

    fixtures["_espeak_version"] = version
    fixtures["_synthetic"] = False  # arms test_espeak_path_matches_fixtures
    fixtures["_provenance"] = (
        "Recorded live from espeak-ng via tools/record_espeak_fixtures.py "
        f"(espeak-ng {version}, phonemizer EspeakBackend, with_stress, "
        "preserve_punctuation)."
    )
    with open(args.out, "w") as f:
        json.dump(fixtures, f, ensure_ascii=False, indent=2)
        f.write("\n")
    print(f"wrote {args.out} (espeak-ng {version})")


if __name__ == "__main__":
    main()
