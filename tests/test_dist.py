"""dist/engine.zip staleness gate.

The spark-submit path (scripts/submit_pipeline.py --py-files
dist/engine.zip) ships whatever zip is committed — nothing else checks
that the archive matches the source tree, so an edit without a
`python scripts/make_pyfiles.py` rebuild would silently deploy stale
code.  This test makes that failure loud: it loads the member-selection
rule FROM scripts/make_pyfiles.py (one source of truth — the build and
the check cannot drift) and compares per-member content hashes against
the archive.
"""

from __future__ import annotations

import hashlib
import importlib.util
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _make_pyfiles():
    spec = importlib.util.spec_from_file_location(
        "make_pyfiles", REPO / "scripts" / "make_pyfiles.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _expected_members() -> dict[str, str]:
    return {
        rel: hashlib.sha256(p.read_bytes()).hexdigest()
        for p, rel in _make_pyfiles().iter_members()
    }


def test_engine_zip_matches_source_tree():
    out = REPO / "dist" / "engine.zip"
    assert out.exists(), (
        "dist/engine.zip missing — run: python scripts/make_pyfiles.py"
    )
    expected = _expected_members()
    with zipfile.ZipFile(out) as z:
        in_zip = {
            n: hashlib.sha256(z.read(n)).hexdigest() for n in z.namelist()
        }
    missing = sorted(set(expected) - set(in_zip))
    extra = sorted(set(in_zip) - set(expected))
    stale = sorted(
        n for n in set(expected) & set(in_zip) if expected[n] != in_zip[n]
    )
    assert not (missing or extra or stale), (
        "dist/engine.zip is out of date — run: python scripts/make_pyfiles.py"
        f"\n  missing from zip: {missing[:10]}"
        f"\n  extra in zip:     {extra[:10]}"
        f"\n  stale content:    {stale[:10]}"
    )
